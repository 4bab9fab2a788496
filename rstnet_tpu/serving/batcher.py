"""Multi-session batched serving: one decode step, many concurrent calls.

The reference serves ONE duplex conversation per process (a per-connection
lock around the streaming state, ``MLLM_v2/moshi/server.py:97``). On TPU the
frame step at batch 1 uses a fraction of the chip (the 80 ms real-time budget
is ~10x the step latency), so this module shares one *batched* pipeline —
codec encode step + LM frame step + codec decode step — across up to
``max_sessions`` independent WebSocket sessions:

* Every active connection owns a batch **slot**. Joining resets the slot
  (``LMGen.reset_slots`` + ``MimiModel.reset_*_slots``); per-slot session
  age then masks each slot's attention lookback (``min_pos``) so slots are
  fully isolated while *sharing* the same ring caches, with no per-session
  compilation and no cache copies (see tests/test_generate.py
  ``test_multi_session_staggered_join_matches_solo``).
* A fixed 80 ms frame clock drives the batch. Starved slots (no audio queued
  this tick) are stepped with silence to keep their streams real-time, like
  a real full-duplex conversation where the user can stay quiet.
* All shapes are static: the batch is always ``max_sessions`` wide; empty
  slots compute garbage that is never read. This is the XLA analogue of the
  reference's CUDA-graph capture — one compiled step, replayed forever.
* The whole frame — codec encode + LM step + codec decode + age/PRNG
  bookkeeping — is ONE fused jitted function (``_fused_step``): XLA fuses
  across the module boundaries, and a tick costs one dispatch + one fetch.
  On a remote/tunneled chip the unfused layout paid ~47 ms/tick of pure
  host<->device RPC overhead at ANY batch size (3 uploads + 4 dispatches +
  1 fetch, each a round trip); fused, the only per-tick upload is the
  audio itself. ``pipeline_depth=2`` additionally overlaps the fetch with
  the next frame's compute (see ``auto_pipeline_depth``).

Capacity on one v5e chip with the 2B flagship and int8 ring-KV is the
bench's ``sessions_per_chip`` (``BENCH_SESSIONS=sweep python bench.py``),
promoted only when the steady-state p99 tick time of THIS loop holds the
80 ms budget over >= 300 frames — see BENCH_r05.json / ARCHITECTURE.md
for the current measured value and its full tail distribution.
"""

from __future__ import annotations

import asyncio
import collections
import concurrent.futures
import dataclasses
import logging
import os
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.inference.generate import LMGen

FRAME_SECONDS = 0.08


def auto_pipeline_depth(budget_ms: float = FRAME_SECONDS * 1000.0) -> int:
    """Pick the frame-clock pipeline depth from the measured readback RTT.

    Depth 2 (dispatch frame t, fetch frame t-1) only pays off when the
    host<->device round trip is a material slice of the frame budget — a
    tunneled/remote chip (~30 ms on axon). On a locally-attached TPU the
    fetch is sub-ms and depth 1 avoids the extra frame of latency.
    """
    null_fn = jax.jit(lambda x: x + 1)
    z = jnp.zeros((4,), jnp.int32)
    for _ in range(3):
        np.asarray(null_fn(z))  # compile + settle
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(null_fn(z))
        rtts.append((time.perf_counter() - t0) * 1000.0)
    rtt = sorted(rtts)[len(rtts) // 2]
    return 2 if rtt > 0.2 * budget_ms else 1


@dataclasses.dataclass
class Session:
    """One connection's handle onto a batch slot."""

    slot: int
    inputs: asyncio.Queue  # np.ndarray float32 [frame_size] PCM chunks
    outputs: asyncio.Queue  # (np.ndarray float32 [frame_size], text_token | None)


class SessionBatcher:
    """Batched multi-session duplex pipeline on a fixed frame clock."""

    def __init__(
        self,
        mimi,
        mimi_params,
        lm_gen: LMGen,
        lm_params,
        max_sessions: int = 8,
        dtype=jnp.bfloat16,
        pipeline_depth: int = 1,
        wire_dtype: str = "float32",
        fetch_pool: Optional[int] = None,
    ):
        """``pipeline_depth`` > 1 overlaps the host<->device transfer with
        device compute: tick *t* dispatches frame *t* and fetches frame
        ``t - depth + 1``, so the per-tick cost is ~max(compute, transfer)
        instead of compute + transfer, at the price of ``depth - 1`` frames
        (80 ms each) of added end-to-end latency. Worth it only when the
        readback round-trip is a real fraction of the frame budget (a
        tunneled/remote chip, ~30 ms here); on a locally-attached TPU the
        fetch is sub-ms and depth 1 is strictly better. The server's
        ``--pipeline auto`` measures the RTT and decides.

        ``wire_dtype="int16"`` moves PCM host<->device as 16-bit integers
        (the exact format WebSocket clients send and receive — quantization
        the transport already imposes, not new loss): float conversion
        happens on device inside the fused step, halving the per-tick
        transfer bytes. Matters on a bandwidth-limited tunnel at large B
        (B=64: 2 x 0.5 MB/tick -> 2 x 0.25 MB); irrelevant locally.

        ``fetch_pool`` (default: ``pipeline_depth`` when depth > 1, else
        off) moves each in-flight frame's device->host fetch into a small
        thread pool, submitted at DISPATCH time: worker threads block on
        the transfer while the tick thread keeps dispatching, so
        round-trips overlap each other and the pipeline window, instead
        of one synchronous RTT gating every tick. Measured on the axon
        tunnel: 8 concurrent 240 KB fetches complete in 81 ms across 4
        threads vs 278 ms serially — the transport multiplexes, it was
        the serial fetch loop that serialized it. A transport-jitter
        spike then delays ONE frame inside its (depth-1)-tick slack
        window instead of stalling the frame clock for every session.
        Delivery order is preserved (FIFO pop), and per-frame
        dispatch->delivery latency is tracked separately in
        ``self.delivery_latency`` — the serving claim must hold BOTH
        tails (tick cadence AND delivery) under the frame budget."""
        # Slot isolation relies on *relative* positions (rope/none): a slot
        # joining at global offset t must behave as a fresh stream at 0.
        # Absolute sin embeddings would leak the global clock into late
        # joiners, so reject them up front.
        for tr in (
            getattr(lm_gen.model, "transformer", None),
            mimi.encoder_transformer.transformer,
            mimi.decoder_transformer.transformer,
        ):
            if tr is not None:
                assert tr.positional_embedding in ("rope", "none"), (
                    "multi-session batching needs relative positions "
                    f"(rope/none), got {tr.positional_embedding!r}"
                )
        self.mimi = mimi
        self.mimi_params = mimi_params
        self.lm_gen = lm_gen
        self.lm_params = lm_params
        self.max_sessions = int(max_sessions)
        self.frame_size = mimi.frame_size
        B = self.max_sessions
        # ONE device-resident state pytree (streaming states + per-slot ages
        # + PRNG key) consumed by ONE fused jitted step per tick. Fusing
        # matters twice over: XLA fuses across the enc/LM/dec boundary, and
        # — decisive on a tunneled/remote chip — a tick costs one dispatch
        # + one fetch instead of 3 uploads + 4 dispatches + 1 fetch (each a
        # host<->device round trip; measured ~47 ms/tick of pure RPC
        # overhead at ANY batch size with the unfused layout). Donated: the
        # ring-cache updates write in place instead of copying the whole KV
        # cache every frame (at 32 sessions the LM cache alone is ~3 GB).
        self._state = {
            "enc": mimi.init_encode_state(B),
            "dec": mimi.init_decode_state(B),
            "lm": lm_gen.init_state(B, dtype=dtype),
            "age": jnp.zeros((B,), jnp.int32),
            # decoder age counts only VALID frames: during a slot's LM delay
            # warmup the generated rows hold initial/UNGENERATED ids, which
            # must not advance the slot's decoder state (the solo server
            # skips decode on invalid frames, server.py:86-90); the batched
            # step can't skip per slot, so the fused step re-resets the
            # slot's decoder rows at its first valid frame (mask_decode_
            # slots) and its codec session age counts from there.
            "dec_age": jnp.zeros((B,), jnp.int32),
            "key": jax.random.PRNGKey(int(time.time())),
        }
        self.wire_int16 = wire_dtype in ("int16", "pcm16")
        self._step = jax.jit(self._fused_step, donate_argnums=(2,))
        # host mirrors of the per-slot ages: validity and first-valid-frame
        # decisions are deterministic counters, so the host tracks them
        # without ever reading the device copies
        self.age = np.zeros((B,), np.int32)
        self.dec_age = np.zeros((B,), np.int32)
        self.sessions: dict[int, Session] = {}
        self._free = list(range(B))
        # per-slot generation counter: bumped on every acquire so frames
        # computed for a previous occupant of the slot are never delivered
        # to a new one (the device step runs concurrently with join/leave)
        self._gen = [0] * B
        self._task: Optional[asyncio.Task] = None
        self.pipeline_depth = max(1, int(pipeline_depth))
        # Start the device->host copy of each frame's outputs at DISPATCH
        # time instead of paying a synchronous round trip at fetch time.
        # At depth D a frame sits in flight for D-1 ticks (~50 ms at the
        # measured tick times), so by the time jax.device_get runs the
        # transfer has a full tick of slack — transport-jitter spikes that
        # land in the p99 of a synchronous fetch (the <1.3 ms tail misses
        # at B=96/128, ARCHITECTURE.md "sessions ceiling") are absorbed
        # before the tick clock ever sees them. Probed once lazily: the
        # experimental axon backend may not implement the PJRT async copy.
        # RSTNET_BATCHER_ASYNC_FETCH=0 disables it (A/B lever: on some
        # backends an explicit early copy can be slower than the fused
        # fetch path device_get uses).
        self._async_fetch: Optional[bool] = (
            False if os.environ.get("RSTNET_BATCHER_ASYNC_FETCH") == "0"
            else None
        )
        # threaded fetch pool (see class docstring); env override is the
        # A/B lever: RSTNET_BATCHER_FETCH_POOL=0 disables, =N forces N
        env_pool = os.environ.get("RSTNET_BATCHER_FETCH_POOL")
        if env_pool is not None:
            fetch_pool = int(env_pool)
        if fetch_pool is None:
            fetch_pool = self.pipeline_depth if self.pipeline_depth > 1 else 0
        self.fetch_pool = max(0, int(fetch_pool))
        self._pool = (
            concurrent.futures.ThreadPoolExecutor(
                max_workers=self.fetch_pool,
                thread_name_prefix="batcher-fetch",
            )
            if self.fetch_pool > 0
            else None
        )
        # dispatch->delivery latency per frame (recorded at pop time): the
        # second half of the serving story — the tick distribution proves
        # cadence, this one proves frames reach the host within the
        # PIPELINE's latency budget. A frame delivers (depth-1) ticks
        # after dispatch by construction (that is the documented price of
        # pipelining: +depth-1 frames of end-to-end latency), so the
        # delivery budget is depth x the frame budget — NOT the bare
        # 80 ms, which would forbid the depth-2 pipeline outright.
        from rstnet_tpu.utils.latency import FrameLatencyTracker as _FLT

        self.delivery_latency = _FLT(
            budget_ms=self.pipeline_depth * FRAME_SECONDS * 1000.0
        )
        # dispatched-but-not-fetched steps: (snapshot, fetched-or-future,
        # valid_np, dispatch_ts); bounded by pipeline_depth - 1
        self._inflight: collections.deque = collections.deque()
        self.last_step_ms = 0.0
        # tail-latency telemetry: every batched device step is one frame for
        # every active session, so this IS the per-session frame-latency
        # distribution (reference logs per-frame wall time, server.py:144)
        from rstnet_tpu.utils.latency import FrameLatencyTracker

        self.latency = FrameLatencyTracker(budget_ms=FRAME_SECONDS * 1000.0)
        # guards the streaming states: the device step runs in a worker
        # thread while acquire/release mutate the same states from the
        # event loop on session join/leave
        self._state_lock = threading.Lock()

    # -- the fused frame step (traced once, dispatched once per tick) -------

    def _fused_step(self, mimi_params, lm_params, state, pcm):
        """codec encode + LM frame + codec decode + age/PRNG bookkeeping as
        ONE jitted function: (audio, out, new_state)."""
        mimi, gen = self.mimi, self.lm_gen
        if self.wire_int16:  # wire PCM -> float on device
            pcm = pcm.astype(jnp.float32) * (1.0 / 32767.0)
        key, sub = jax.random.split(state["key"])
        codes, enc = mimi.encode_step(
            mimi_params, state["enc"], pcm, state["age"]
        )
        user = (
            codes[:, : gen.num_user_streams, :] if gen.num_user_streams else None
        )
        out, valid, lm = gen.step(lm_params, state["lm"], sub, user)
        # slots seeing their first valid frame: drop the decoder state their
        # warmup garbage advanced (deterministic from the age counters)
        first_valid = valid & (state["dec_age"] == 0)
        dec_state = mimi.mask_decode_slots(state["dec"], first_valid)
        # warmup rows hold initial/UNGENERATED ids: clamp to legal codes so
        # the (discarded) decode of those rows stays finite
        codes_out = jnp.clip(out[:, 1:, :], 0, mimi.quantizer.bins - 1)
        audio, dec = mimi.decode_step(
            mimi_params, dec_state, codes_out, state["dec_age"]
        )
        new_state = {
            "enc": enc, "dec": dec, "lm": lm,
            "age": state["age"] + 1,
            "dec_age": state["dec_age"] + valid.astype(jnp.int32),
            "key": key,
        }
        if self.wire_int16:  # float -> wire PCM on device
            audio = (jnp.clip(audio, -1.0, 1.0) * 32767.0).astype(jnp.int16)
        return audio, out, new_state

    # back-compat views of the fused state (tests/bench peek; `key` is
    # also settable for deterministic runs)
    @property
    def key(self):
        return self._state["key"]

    @key.setter
    def key(self, value):
        self._state = {**self._state, "key": value}

    @property
    def enc_state(self):
        return self._state["enc"]

    @property
    def dec_state(self):
        return self._state["dec"]

    @property
    def lm_state(self):
        return self._state["lm"]

    # -- slot management ----------------------------------------------------

    def acquire(self) -> Optional[Session]:
        """Join: claim a slot and reset its streams. None when full."""
        if not self._free:
            return None
        slot = self._free.pop(0)
        with self._state_lock:
            # gen bump inside the state lock: _device_step re-checks gens
            # under the same lock, so a bump is never visible without the
            # matching state reset (and vice versa)
            self._gen[slot] += 1
            st = dict(self._state)
            st["enc"] = self.mimi.reset_encode_slots(st["enc"], [slot])
            st["dec"] = self.mimi.reset_decode_slots(st["dec"], [slot])
            st["lm"] = self.lm_gen.reset_slots(st["lm"], [slot])
            st["age"] = st["age"].at[slot].set(0)
            st["dec_age"] = st["dec_age"].at[slot].set(0)
            self._state = st
            self.age[slot] = 0
            self.dec_age[slot] = 0
        sess = Session(slot, asyncio.Queue(maxsize=64), asyncio.Queue(maxsize=64))
        self.sessions[slot] = sess
        return sess

    def release(self, sess: Session) -> None:
        # idempotent: the slot may already have been freed by _fail_sessions
        # before the connection handler's finally runs
        if self.sessions.get(sess.slot) is sess or (
            sess.slot not in self.sessions and sess.slot not in self._free
        ):
            self.sessions.pop(sess.slot, None)
            if sess.slot not in self._free:
                self._free.append(sess.slot)

    # -- the frame clock ----------------------------------------------------

    def _gather_inputs(self) -> tuple[np.ndarray, dict[int, int]]:
        """Pull one frame per active session (event-loop thread only:
        asyncio queues are not thread-safe). Also snapshots each active
        slot's generation so _distribute can drop frames whose slot was
        re-acquired while the device step was in flight."""
        pcm = np.zeros((self.max_sessions, 1, self.frame_size), np.float32)
        snapshot: dict[int, int] = {}
        for slot, sess in list(self.sessions.items()):
            snapshot[slot] = self._gen[slot]
            try:
                pcm[slot, 0] = sess.inputs.get_nowait()
            except asyncio.QueueEmpty:
                pass  # silence keeps the duplex clock running
        return pcm, snapshot

    def _device_step(self, pcm: np.ndarray, snapshot: Optional[dict[int, int]] = None):
        """One frame-clock tick on the device (safe in a worker thread):
        dispatch this frame's batched step, then fetch the OLDEST in-flight
        step once ``pipeline_depth`` steps are queued (at depth 1 that is
        the step just dispatched — the classic synchronous round-trip).

        Returns ``(snapshot, audio_np, out_np, valid_np)`` for the fetched
        (possibly older) frame, or None while the pipeline is still filling.
        """
        with self._state_lock:
            if snapshot is not None:
                # a slot re-acquired after input gather must not consume the
                # previous occupant's audio into the new session's encoder/LM
                # state — feed silence instead (same as an empty input queue)
                for slot, gen in snapshot.items():
                    if self._gen[slot] != gen:
                        pcm[slot] = 0.0
            t0 = time.perf_counter()
            if self.wire_int16:
                pcm = (np.clip(pcm, -1.0, 1.0) * 32767.0).astype(np.int16)
            # ONE dispatch: the fused step carries its own ages and PRNG key
            # on device, so the only per-tick upload is the audio itself
            audio, out, self._state = self._step(
                self.mimi_params, self.lm_params, self._state,
                # the jit call commits the host array itself; an explicit
                # jnp.asarray would upload in a separate client call
                # before dispatch (A/B lever: RSTNET_BATCHER_JNP_UPLOAD=1
                # restores the explicit pre-upload)
                jnp.asarray(pcm)
                if os.environ.get("RSTNET_BATCHER_JNP_UPLOAD") == "1"
                else pcm,
            )
            # validity is deterministic from the ages — no device sync needed
            valid_np = (self.age + 1) > self.lm_gen.max_delay
            # per-dispatch bookkeeping (host mirrors of the device counters)
            self.age += 1
            self.dec_age += valid_np.astype(np.int32)
            if (
                self._pool is None
                and self.pipeline_depth > 1
                and self._async_fetch is not False
            ):
                try:
                    audio.copy_to_host_async()
                    out.copy_to_host_async()
                    self._async_fetch = True
                except Exception:  # noqa: BLE001 - backend lacks async copy
                    self._async_fetch = False
            if self._pool is not None:
                # fetch starts NOW, in a worker thread: the device_get
                # blocks there on compute completion + transfer while this
                # thread keeps the frame clock running; concurrent fetches
                # overlap on the transport (measured ~Nx on the tunnel)
                payload = self._pool.submit(jax.device_get, (audio, out))
            else:
                payload = (audio, out)
            self._inflight.append((snapshot, payload, valid_np, t0))
            if len(self._inflight) < self.pipeline_depth:
                return None  # pipeline still filling: nothing to deliver yet
            old_snap, old_payload, valid_old, t_dispatch = (
                self._inflight.popleft()
            )
            if self._pool is not None:
                # usually already complete: the frame had depth-1 ticks of
                # slack; a transport spike makes THIS wait absorb the
                # remainder instead of a full fresh round trip
                audio_np, out_np = old_payload.result()
            else:
                # ONE batched fetch: on a tunneled device every separate
                # np.asarray pays a full host<->device round trip (~29 ms
                # on axon), so fetching audio and tokens together halves
                # the per-frame transfer cost. At depth > 1 this fetch
                # targets a step dispatched depth-1 ticks ago, whose
                # compute has already overlapped the intervening ticks.
                audio_np, out_np = jax.device_get(old_payload)
            now = time.perf_counter()
            self.delivery_latency.record((now - t_dispatch) * 1000.0)
            self.last_step_ms = (now - t0) * 1000.0
            self.latency.record(self.last_step_ms)
        if self.wire_int16:
            audio_np = audio_np.astype(np.float32) * (1.0 / 32767.0)
        return old_snap, audio_np, out_np, valid_old

    def _distribute(self, result) -> None:
        """Route a fetched frame to session queues (event-loop thread only).

        ``result`` is ``_device_step``'s return: None while the pipeline
        fills, else the fetched frame plus the slot->generation snapshot
        taken when ITS inputs were gathered; a frame is delivered only to
        the SAME occupant it was computed for — a slot released and
        re-acquired mid-flight must not hear one frame of the previous
        conversation."""
        if result is None:
            return
        snapshot, audio_np, out_np, valid_np = result
        snapshot = snapshot or {}
        for slot, sess in list(self.sessions.items()):
            if snapshot.get(slot) != self._gen[slot]:
                continue
            if not valid_np[slot]:
                continue
            try:
                sess.outputs.put_nowait((audio_np[slot, 0], int(out_np[slot, 0, 0])))
            except asyncio.QueueFull:
                logging.warning("slot %d output queue full; dropping frame", slot)

    def step_once(self) -> None:
        """One batched frame across all active sessions (synchronous)."""
        if not self.sessions:
            return
        pcm, snapshot = self._gather_inputs()
        self._distribute(self._device_step(pcm, snapshot))

    def _fail_sessions(self, exc: BaseException) -> None:
        """Terminate every active session after a step failure so clients
        see the error instead of a silently frozen stream."""
        for slot, sess in list(self.sessions.items()):
            # the close sentinel must not be lost to a full queue (the
            # consumer would drain the buffer then block forever on get):
            # drop buffered frames to guarantee space — the stream is dead
            try:
                sess.outputs.put_nowait(None)  # sentinel: stream closed
            except asyncio.QueueFull:
                while True:
                    try:
                        sess.outputs.get_nowait()
                    except asyncio.QueueEmpty:
                        break
                sess.outputs.put_nowait(None)
            self.sessions.pop(slot, None)
            if slot not in self._free:
                self._free.append(slot)
        self._inflight.clear()  # in-flight frames belong to dead sessions
        logging.error("batched frame step failed; closed all sessions: %r", exc)

    async def run(self) -> None:
        """The 80 ms frame clock. Start once per server.

        The device round-trip runs in a worker thread (JAX releases the GIL
        during device execution): at 64 sessions the step uses most of the
        80 ms budget, and blocking the event loop for it would starve every
        connection's websocket IO."""
        loop = asyncio.get_running_loop()
        next_tick = loop.time()
        while True:
            next_tick += FRAME_SECONDS
            if self.sessions:
                try:
                    pcm, snapshot = self._gather_inputs()
                    result = await loop.run_in_executor(
                        None, self._device_step, pcm, snapshot
                    )
                    self._distribute(result)
                except asyncio.CancelledError:
                    raise
                except Exception as e:  # noqa: BLE001 - clock must survive
                    # close current sessions (their streams are broken) but
                    # keep ticking: new sessions reset their slots on join
                    self._fail_sessions(e)
                if self.last_step_ms > FRAME_SECONDS * 1000:
                    logging.warning(
                        "frame step %.1f ms exceeds the %.0f ms budget",
                        self.last_step_ms, FRAME_SECONDS * 1000,
                    )
                n = len(self.latency.samples_ms)
                if n and n % 750 == 0:  # ~once a minute at the frame rate
                    logging.info("frame latency: %s", self.latency.summary())
            delay = next_tick - loop.time()
            if delay <= 0:  # fell behind: resync the clock instead of bursting
                next_tick = loop.time()
                delay = 0.0
            await asyncio.sleep(delay)

    def start(self) -> None:
        if self._task is None or self._task.done():
            self._task = asyncio.get_event_loop().create_task(self.run())

    def warmup(self, n_frames: int = 2) -> None:
        """Compile the batched steps before accepting traffic."""
        sess = self.acquire()
        assert sess is not None
        # enough frames to fill the pipeline and exercise the fetch path
        for _ in range(max(n_frames, self.pipeline_depth + 1)):
            self.step_once()
        np.asarray(self.lm_state["offset"])  # drain the device queue
        self.release(sess)
        self._inflight.clear()
        self.latency.samples_ms.clear()  # compile frames are not serving tail
