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

Measured on one v5e chip with the 2B flagship (see ``BENCH_SESSIONS=sweep
python bench.py``): 64 concurrent real-time sessions per chip with the
int8 ring-KV (``LMGen(kv_int8=True)``), 32 with the bf16 cache.
"""

from __future__ import annotations

import asyncio
import dataclasses
import logging
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.inference.generate import LMGen

FRAME_SECONDS = 0.08


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
    ):
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
        # donate the streaming states: the ring-cache updates then write in
        # place instead of copying the whole KV cache every frame (at 32
        # sessions the LM cache alone is ~3 GB)
        self._encode_step = jax.jit(self.mimi.encode_step, donate_argnums=(1,))
        self._decode_step = jax.jit(self.mimi.decode_step, donate_argnums=(1,))
        self._lm_step = jax.jit(self.lm_gen.step, donate_argnums=(1,))
        B = self.max_sessions
        self.enc_state = mimi.init_encode_state(B)
        self.dec_state = mimi.init_decode_state(B)
        self.lm_state = lm_gen.init_state(B, dtype=dtype)
        self.age = np.zeros((B,), np.int32)
        # decoder age counts only VALID frames: during a slot's LM delay
        # warmup the generated rows hold initial/UNGENERATED ids, which must
        # not advance the slot's decoder state (the solo server skips decode
        # on invalid frames, server.py:86-90); the batched step can't skip
        # per slot, so the slot's decoder is re-reset at its first valid
        # frame and its codec session age starts counting from there.
        self.dec_age = np.zeros((B,), np.int32)
        self.key = jax.random.PRNGKey(int(time.time()))
        self.sessions: dict[int, Session] = {}
        self._free = list(range(B))
        # per-slot generation counter: bumped on every acquire so frames
        # computed for a previous occupant of the slot are never delivered
        # to a new one (the device step runs concurrently with join/leave)
        self._gen = [0] * B
        self._task: Optional[asyncio.Task] = None
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
            self.enc_state = self.mimi.reset_encode_slots(self.enc_state, [slot])
            self.dec_state = self.mimi.reset_decode_slots(self.dec_state, [slot])
            self.lm_state = self.lm_gen.reset_slots(self.lm_state, [slot])
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
        """The batched device round-trip (safe to run in a worker thread)."""
        with self._state_lock:
            if snapshot is not None:
                # a slot re-acquired after input gather must not consume the
                # previous occupant's audio into the new session's encoder/LM
                # state — feed silence instead (same as an empty input queue)
                for slot, gen in snapshot.items():
                    if self._gen[slot] != gen:
                        pcm[slot] = 0.0
            t0 = time.perf_counter()
            age = jnp.asarray(self.age)
            codes, self.enc_state = self._encode_step(
                self.mimi_params, self.enc_state, jnp.asarray(pcm), age
            )
            user_streams = self.lm_gen.num_user_streams
            user = codes[:, :user_streams, :] if user_streams else None
            self.key, sub = jax.random.split(self.key)
            out, _, self.lm_state = self._lm_step(
                self.lm_params, self.lm_state, sub, user
            )
            # validity is deterministic from the ages — no device sync needed
            valid_np = (self.age + 1) > self.lm_gen.max_delay
            first_valid = [int(s) for s in np.nonzero(valid_np & (self.dec_age == 0))[0]]
            if first_valid:
                # discard decoder state advanced by the slot's warmup garbage
                self.dec_state = self.mimi.reset_decode_slots(self.dec_state, first_valid)
            # warmup rows hold initial/UNGENERATED ids: clamp to legal codes
            # so the (discarded) decode of those rows stays finite
            codes_out = jnp.clip(out[:, 1:, :], 0, self.mimi.quantizer.bins - 1)
            audio, self.dec_state = self._decode_step(
                self.mimi_params, self.dec_state, codes_out, jnp.asarray(self.dec_age)
            )
            # ONE batched fetch: on a tunneled device every separate
            # np.asarray pays a full host<->device round trip (~29 ms on
            # axon), so fetching audio and tokens together halves the
            # per-frame transfer cost
            audio_np, out_np = jax.device_get((audio, out))
            self.last_step_ms = (time.perf_counter() - t0) * 1000.0
            self.latency.record(self.last_step_ms)
            self.age += 1
            self.dec_age += valid_np.astype(np.int32)
        return audio_np, out_np, valid_np

    def _distribute(self, snapshot: dict[int, int], audio_np, out_np, valid_np) -> None:
        """Route outputs to session queues (event-loop thread only).

        ``snapshot`` maps slot -> generation at input-gather time; a frame is
        delivered only to the SAME occupant it was computed for — a slot
        released and re-acquired mid-step must not hear one frame of the
        previous conversation."""
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
        self._distribute(snapshot, *self._device_step(pcm, snapshot))

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
                    self._distribute(snapshot, *result)
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
        for _ in range(n_frames):
            self.step_once()
        np.asarray(self.lm_state["offset"])  # drain the device queue
        self.release(sess)
