"""Full-duplex streaming voice server over WebSocket.

Capability parity with ``MLLM_v2/moshi/server.py:44-275``: a ``ServerState``
holding the Mimi codec and the LM generation engine in streaming state, a
warmup pass, and a per-connection chat handler running the 80 ms frame loop:
audio bytes in -> codec encode -> LM frame step -> codec decode -> audio
bytes out + text tokens. One connection at a time (per-connection lock,
streaming state reset), matching the reference.

Framing: the first TEXT message of a connection is a JSON codec handshake
(``{"codec": "opus"|"pcm16"}``); the server answers with the accepted codec
— Opus via the ctypes libopus transport (``serving/opus.py``, ~310 B per
80 ms frame, parity with the reference's ``sphn.OpusStreamWriter`` framing
at ``moshi/server.py:80-136``) when libopus is present, PCM16 (16-bit LE,
1920 samples = 80 ms at 24 kHz) otherwise. A connection that opens with a
binary frame skips the handshake and speaks legacy PCM16. Message protocol
(mirrors the reference's 1-byte tags): ``b"\\x01" + audio`` for audio,
``b"\\x02" + utf8`` for text. A minimal web client is served at ``/``
(reference ``server.py:183-205``).

TPU notes: the whole per-frame compute (encode step + LM step + decode step)
is three jitted calls with fixed shapes; one small host<->device transfer
each way per frame.
"""

from __future__ import annotations

import argparse
import asyncio
import logging
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.inference.generate import LMGen
from rstnet_tpu.serving import opus
from rstnet_tpu.utils.audio import float_to_pcm16, pcm16_to_float  # noqa: F401

TAG_AUDIO = b"\x01"
TAG_TEXT = b"\x02"


def _handshake_reply(raw: str, frame_size: int) -> tuple[object, str]:
    """Negotiate the audio codec from the client's JSON offer; returns
    (transport, reply json)."""
    import json

    try:
        offer = json.loads(raw).get("codec", "pcm16")
    except (ValueError, AttributeError):
        offer = "pcm16"
    codec = opus.negotiate(offer, frame_size)
    return opus.make_transport(codec), json.dumps({"codec": codec})


@dataclass
class ServerState:
    mimi: object  # MimiModel
    mimi_params: object
    lm_gen: LMGen
    lm_params: object
    text_tokenizer: Optional[object] = None
    lock: asyncio.Lock = field(default_factory=asyncio.Lock)
    # catch-up dispatch: when the session buffer holds >= scan_frames whole
    # frames (file streaming, or real-time after a stall), they run as ONE
    # lax.scan'ed device call (LMGen.step_scan) — per-call dispatch, which
    # dominates per-frame latency on a remotely-attached chip, is paid once
    # per scan_frames instead of once per frame. 0 disables.
    scan_frames: int = 0

    def __post_init__(self):
        model = self.lm_gen.model
        self.frame_size = self.mimi.frame_size
        # the whole frame is ONE jitted dispatch (see batcher._fused_step:
        # on a remote/tunneled chip every extra dispatch — including the
        # per-frame jax.random.split — is a host<->device round trip)
        self._fused = jax.jit(self._fused_frame, donate_argnums=(2,))
        self._fused_scan = jax.jit(
            self._fused_frames, static_argnames=("n_frames",), donate_argnums=(2,)
        )
        self.reset()

    def reset(self):
        chunk_frames = max(1, self.scan_frames)
        self._state = {
            "enc": self.mimi.init_encode_state(1, chunk_frames=chunk_frames),
            "dec": self.mimi.init_decode_state(1, chunk_frames=chunk_frames),
            "lm": self.lm_gen.init_state(1, dtype=jnp.float32),
            "dec_age": jnp.zeros((1,), jnp.int32),
            "key": jax.random.PRNGKey(int(time.time())),
        }
        self.steps = 0  # completed frames; validity is deterministic from it

    # back-compat views (tests/tools peek; `key` settable for determinism)
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

    def _fused_frame(self, mimi_params, lm_params, state, chunk):
        """codec encode + LM frame + codec decode + PRNG bookkeeping as ONE
        jitted function. Warmup frames decode clamped garbage that the host
        discards; the decoder state they advanced is dropped by a masked
        reset at the first valid frame (same contract as the batcher, which
        is verified bit-equal to skip-decode solo semantics in
        tests/test_server.py::test_batched_audio_matches_solo_with_delays).
        """
        mimi, gen = self.mimi, self.lm_gen
        key, sub = jax.random.split(state["key"])
        codes, enc = mimi.encode_step(mimi_params, state["enc"], chunk)
        user = (
            codes[:, : gen.num_user_streams, :] if gen.num_user_streams else None
        )
        out, valid, lm = gen.step(lm_params, state["lm"], sub, user)
        first_valid = valid & (state["dec_age"] == 0)
        dec_in = mimi.mask_decode_slots(state["dec"], first_valid)
        codes_out = jnp.clip(out[:, 1:, :], 0, mimi.quantizer.bins - 1)
        audio, dec = mimi.decode_step(mimi_params, dec_in, codes_out)
        new_state = {
            "enc": enc, "dec": dec, "lm": lm,
            "dec_age": state["dec_age"] + valid.astype(jnp.int32),
            "key": key,
        }
        return audio, out, new_state

    def _fused_frames(self, mimi_params, lm_params, state, chunk, n_frames=None):
        """N whole frames in ONE dispatch (encode chunk -> LMGen.step_scan
        -> decode chunk). Caller gates on warmup being over, so every
        scanned frame is valid."""
        mimi, gen = self.mimi, self.lm_gen
        key, sub = jax.random.split(state["key"])
        codes, enc = mimi.encode_step(mimi_params, state["enc"], chunk)
        user = (
            codes[:, : gen.num_user_streams, :] if gen.num_user_streams else None
        )
        out, _, lm = gen.step_scan(
            lm_params, state["lm"], sub, user,
            **({} if gen.num_user_streams else {"n_frames": n_frames}),
        )
        audio, dec = mimi.decode_step(mimi_params, state["dec"], out[:, 1:, :])
        new_state = {
            "enc": enc, "dec": dec, "lm": lm,
            "dec_age": state["dec_age"] + out.shape[-1],
            "key": key,
        }
        return audio, out, new_state

    def warmup(self, n_frames: int = 4) -> None:
        """Compile + steady-state the three jitted steps
        (reference ``server.py:64-73``), plus the catch-up scan shape."""
        if self.scan_frames > 1:
            # the scan path asserts steps > max_delay; enough single frames
            # first, or its compile would hit mid-session instead of here
            n_frames = max(n_frames, self.lm_gen.max_delay + 1)
        for _ in range(n_frames):
            chunk = jnp.zeros((1, 1, self.frame_size))
            self.handle_frame_array(np.asarray(chunk[0, 0]))
        if self.scan_frames > 1 and self.steps > self.lm_gen.max_delay:
            self.handle_frames_array(
                np.zeros(self.scan_frames * self.frame_size, np.float32)
            )
        self.reset()

    def handle_frame_array(self, pcm: np.ndarray) -> tuple[Optional[np.ndarray], Optional[int]]:
        """One 80 ms frame: float samples in -> (float samples out | None,
        text token | None).

        Exactly ONE dispatch and at most ONE host<->device fetch per frame:
        validity is deterministic from the frame counter (LMGen: valid =
        age > max_delay), so warmup frames dispatch without any readback,
        and valid frames fetch (audio, tokens) in a single batched
        ``jax.device_get`` — on a tunneled device every separate dispatch
        or fetch costs a full round trip."""
        assert pcm.shape[-1] == self.frame_size
        chunk = jnp.asarray(pcm, jnp.float32).reshape(1, 1, -1)
        audio, out, self._state = self._fused(
            self.mimi_params, self.lm_params, self._state, chunk
        )
        self.steps += 1
        if self.steps <= self.lm_gen.max_delay:
            return None, None  # warmup frame: nothing to emit, no readback
        audio_np, out_np = jax.device_get((audio, out))
        return audio_np[0, 0], int(out_np[0, 0, 0])

    def handle_frames_array(self, pcm: np.ndarray) -> tuple[np.ndarray, list]:
        """N whole frames in ONE dispatch chain (encode chunk -> LMGen
        step_scan -> decode chunk): [N * frame_size] float samples ->
        (audio samples, N text tokens). Only callable past warmup
        (``steps > max_delay``) so every scanned frame is valid — the
        caller gates on that, keeping the compiled shape set fixed."""
        if self.steps <= self.lm_gen.max_delay:
            # runtime-reachable serving precondition: a bare assert would be
            # stripped under `python -O` and silently emit UNGENERATED
            # warmup tokens as audio/text (ADVICE r3)
            raise RuntimeError(
                "handle_frames_array called during warmup "
                f"(step {self.steps} <= max_delay {self.lm_gen.max_delay}); "
                "route warmup frames through handle_frame_array"
            )
        n = pcm.shape[-1] // self.frame_size
        chunk = jnp.asarray(pcm, jnp.float32).reshape(1, 1, -1)
        audio, out, self._state = self._fused_scan(
            self.mimi_params, self.lm_params, self._state, chunk,
            **({} if self.lm_gen.num_user_streams else {"n_frames": n}),
        )
        self.steps += n
        audio_np, out_np = jax.device_get((audio, out))
        return audio_np[0, 0], [int(t) for t in out_np[0, 0, :]]


TEXT_SKIP_IDS = (0, 3)  # <unk>/<epad> and <pad> (reference server.py:138)


async def _send_frame(ws, audio, text_token, text_tokenizer, transport=None):
    """Send one response frame: audio bytes + decoded (or raw) text token.
    Special text ids (padding/unk) are suppressed like the reference."""
    if transport is None:
        transport = opus.Pcm16Transport()
    await ws.send_bytes(TAG_AUDIO + transport.pack(audio))
    if text_token is None or text_token in TEXT_SKIP_IDS:
        return
    if text_tokenizer is not None:
        text = text_tokenizer.decode([text_token])
        if text:
            await ws.send_bytes(TAG_TEXT + text.encode())
    else:
        await ws.send_bytes(TAG_TEXT + str(text_token).encode())


async def handle_chat_batched(batcher, text_tokenizer, request):
    """Per-connection duplex loop on a shared batched pipeline: the
    connection owns one batch slot; audio is framed into the slot's input
    queue and the slot's output queue is streamed back concurrently."""
    from aiohttp import WSMsgType, web

    ws = web.WebSocketResponse()
    await ws.prepare(request)
    # the slot is acquired only AFTER the codec is decided (handshake reply
    # sent, or legacy first-binary default): the batcher steps acquired
    # slots immediately, and output frames must never be packed with a
    # transport the client didn't negotiate (nor interleave binary audio
    # into the client's wait for the handshake reply)
    holder = {"transport": None}
    sess = None
    out_task = None

    async def pump_outputs(sess):
        try:
            while True:
                item = await sess.outputs.get()
                if item is None:  # batcher failed the session: close loudly
                    logging.error("slot %d terminated by a step failure", sess.slot)
                    await ws.close(code=1011, message=b"server step failed")
                    return
                audio, text_token = item
                await _send_frame(
                    ws, audio, text_token, text_tokenizer, holder["transport"]
                )
        except asyncio.CancelledError:
            raise
        except Exception as e:  # noqa: BLE001 - a dead client must free the slot
            logging.info("slot %d output stream closed (%s)", sess.slot, e)
            await ws.close()

    async def start_session():
        nonlocal sess, out_task
        sess = batcher.acquire()
        if sess is None:
            await ws.close(code=1013, message=b"server full")
            return False
        logging.info("chat session started (slot %d)", sess.slot)
        out_task = asyncio.get_running_loop().create_task(pump_outputs(sess))
        return True

    try:
        buffered = np.zeros((0,), np.float32)
        frame_size = batcher.frame_size
        async for msg in ws:
            if msg.type == WSMsgType.TEXT and holder["transport"] is None:
                holder["transport"], reply = _handshake_reply(msg.data, frame_size)
                await ws.send_str(reply)
                if not await start_session():
                    break
                continue
            if msg.type != WSMsgType.BINARY:
                continue
            data = bytes(msg.data)
            if not data or data[0:1] != TAG_AUDIO:
                continue
            if holder["transport"] is None:  # legacy client: PCM16, no handshake
                holder["transport"] = opus.Pcm16Transport()
            if sess is None and not await start_session():
                break
            buffered = np.concatenate(
                [buffered, holder["transport"].unpack(data[1:])]
            )
            while buffered.shape[0] >= frame_size:
                frame, buffered = buffered[:frame_size], buffered[frame_size:]
                await sess.inputs.put(frame)
    finally:
        if out_task is not None:
            out_task.cancel()
        if sess is not None:
            batcher.release(sess)
            logging.info("chat session ended (slot %d)", sess.slot)
    return ws


async def handle_chat(state: ServerState, request):
    """Per-connection duplex loop (reference ``server.py:75-166``)."""
    from aiohttp import WSMsgType, web

    ws = web.WebSocketResponse()
    await ws.prepare(request)
    from rstnet_tpu.utils.latency import FrameLatencyTracker

    async with state.lock:
        state.reset()
        logging.info("chat session started")
        buffered = np.zeros((0,), np.float32)
        transport = None
        # per-session tail telemetry (the budget is a tail budget): scan
        # catch-up blocks record their amortized per-frame time — the block
        # only exists because >1 frame was already buffered, i.e. the
        # session is catching up faster than real time by construction
        tracker = FrameLatencyTracker()
        state.last_latency_summary = tracker.summary
        async for msg in ws:
            if msg.type == WSMsgType.TEXT and transport is None:
                transport, reply = _handshake_reply(msg.data, state.frame_size)
                await ws.send_str(reply)
                continue
            if msg.type != WSMsgType.BINARY:
                continue
            data = bytes(msg.data)
            if not data or data[0:1] != TAG_AUDIO:
                continue
            if transport is None:  # legacy client: PCM16, no handshake
                transport = opus.Pcm16Transport()
            buffered = np.concatenate([buffered, transport.unpack(data[1:])])
            while buffered.shape[0] >= state.frame_size:
                n_buf = buffered.shape[0] // state.frame_size
                sf = state.scan_frames
                if sf > 1 and n_buf >= sf and state.steps > state.lm_gen.max_delay:
                    # catch-up: sf buffered frames in one device dispatch
                    block, buffered = (
                        buffered[: sf * state.frame_size],
                        buffered[sf * state.frame_size :],
                    )
                    t0 = time.perf_counter()
                    audio, text_tokens = state.handle_frames_array(block)
                    ms = (time.perf_counter() - t0) * 1000
                    logging.info(f"{sf} frames handled in {ms:.1f} ms (scan)")
                    for _ in range(sf):
                        tracker.record(ms / sf)
                    await ws.send_bytes(TAG_AUDIO + transport.pack(audio))
                    for tok in text_tokens:
                        if tok in TEXT_SKIP_IDS:
                            continue
                        if state.text_tokenizer is not None:
                            text = state.text_tokenizer.decode([tok])
                            if text:
                                await ws.send_bytes(TAG_TEXT + text.encode())
                        else:
                            await ws.send_bytes(TAG_TEXT + str(tok).encode())
                    continue
                frame, buffered = (
                    buffered[: state.frame_size],
                    buffered[state.frame_size :],
                )
                t0 = time.perf_counter()
                audio, text_token = state.handle_frame_array(frame)
                ms = (time.perf_counter() - t0) * 1000
                logging.info(f"frame handled in {ms:.1f} ms")
                tracker.record(ms)
                if audio is not None:
                    await _send_frame(
                        ws, audio, text_token, state.text_tokenizer, transport
                    )
        logging.info("chat session ended; frame latency: %s", tracker.summary())
    return ws


async def handle_index(request):
    """Minimal browser client (reference serves a static web UI,
    ``moshi/server.py:183-205``)."""
    import os

    from aiohttp import web

    path = os.path.join(os.path.dirname(__file__), "static", "index.html")
    return web.FileResponse(path)


def build_app(state: ServerState):
    from aiohttp import web

    app = web.Application()
    app.router.add_get("/", handle_index)
    app.router.add_get("/api/chat", lambda req: handle_chat(state, req))

    async def stats(request):
        # tail-latency telemetry of the current/most recent session
        summary = getattr(state, "last_latency_summary", None)
        return web.json_response(summary() if summary else {"n_frames": 0})

    app.router.add_get("/api/stats", stats)
    return app


def build_batched_app(batcher, text_tokenizer=None):
    """App serving up to ``batcher.max_sessions`` concurrent duplex chats
    through one shared batched frame step (see ``serving/batcher.py``)."""
    from aiohttp import web

    app = web.Application()
    app.router.add_get("/", handle_index)
    app.router.add_get(
        "/api/chat", lambda req: handle_chat_batched(batcher, text_tokenizer, req)
    )

    async def stats(request):
        # every batched step is one frame for every active session, so the
        # batcher's distribution IS the per-session frame-latency tail
        return web.json_response(
            {"active_sessions": len(batcher.sessions),
             "pipeline_depth": batcher.pipeline_depth,
             "fetch_pool": batcher.fetch_pool,
             # whether dispatched frames prefetch device->host (absorbs
             # transport jitter at depth>1); None until the first tick
             "async_fetch": batcher._async_fetch,
             # dispatch->delivery tail: cadence (the tick summary below)
             # proves the clock sustains the budget; this proves each
             # frame's bytes reach the host within it too
             "delivery": batcher.delivery_latency.summary(),
             **batcher.latency.summary()}
        )

    app.router.add_get("/api/stats", stats)

    async def start_clock(app):
        batcher.start()

    app.on_startup.append(start_clock)
    return app


def main(argv=None):
    from aiohttp import web

    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", type=int, default=8998)
    parser.add_argument("--mimi-checkpoint", default="")
    parser.add_argument("--lm-checkpoint", default="")
    parser.add_argument("--tokenizer-dir", default="")
    parser.add_argument(
        "--tiny", action="store_true",
        help="small random-weight models (demo/smoke; no checkpoints needed)",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="weight-only int8 LM for serving (~15%% faster frames, "
             "approximate logits)",
    )
    parser.add_argument(
        "--batch", type=int, default=0, metavar="N",
        help="serve up to N concurrent sessions through one shared batched "
             "frame step (0 = reference-style single session)",
    )
    parser.add_argument(
        "--int8-head", action="store_true",
        help="int8 ONLY the 128k-vocab lm_head (largest single weight read "
             "of the frame); near-bf16 logits, ~0.5 GB less HBM traffic",
    )
    parser.add_argument(
        "--int8-dep", action="store_true",
        help="int8 ONLY the depformer slice (projections/gating, input "
             "views, audio heads; dequant in VMEM inside the fused "
             "micro-step kernel), bf16 backbone; composes with --int8-head "
             "for the mixed serving mode",
    )
    parser.add_argument(
        "--ssl", default="", metavar="DIR",
        help="serve wss/https with DIR/cert.pem + DIR/key.pem "
             "(reference server.py --ssl)",
    )
    parser.add_argument(
        "--kv-int8", action="store_true",
        help="store the LM ring K/V as int8 with per-step scales: half the "
             "cache memory and attention HBM traffic per frame",
    )
    parser.add_argument(
        "--pipeline", default="auto", metavar="DEPTH",
        help="batched frame-clock pipeline depth: 1 = synchronous round "
             "trip per tick, 2 = dispatch frame t while fetching frame t-1 "
             "(overlaps the host<->device transfer with compute; +1 frame "
             "of end-to-end latency). 'auto' measures the readback RTT and "
             "picks 2 only when transfer is a material slice of the 80 ms "
             "budget (tunneled/remote chips)",
    )
    parser.add_argument(
        "--fetch-pool", default="auto", metavar="N",
        help="threaded device->host fetch pool for the batched pipeline: "
             "each in-flight frame's fetch is submitted at dispatch time "
             "so round trips overlap (the tunnel transport multiplexes); "
             "'auto' = pipeline depth when depth > 1, 0 disables (the "
             "synchronous single-fetch tick)",
    )
    parser.add_argument(
        "--wire", default="auto", choices=("auto", "pcm16", "f32"),
        help="host<->device PCM format for the batched pipeline: pcm16 "
             "halves per-tick transfer bytes by moving audio as int16 (the "
             "exact client wire format) and converting on device; auto "
             "picks pcm16 whenever the pipeline depth is >1 (i.e. the chip "
             "is remote enough that transfer matters)",
    )
    parser.add_argument(
        "--scan-frames", type=int, default=4, metavar="N",
        help="when a session has >= N whole frames buffered (file "
             "streaming, catch-up after a stall), run them as ONE scanned "
             "device dispatch instead of N (LMGen.step_scan); 0 disables",
    )
    args = parser.parse_args(argv)

    ssl_context = None
    if args.ssl:
        import os as _os
        import ssl as _ssl

        ssl_context = _ssl.SSLContext(_ssl.PROTOCOL_TLS_SERVER)
        ssl_context.load_cert_chain(
            certfile=_os.path.join(args.ssl, "cert.pem"),
            keyfile=_os.path.join(args.ssl, "key.pem"),
        )

    from rstnet_tpu.models.convert import convert_moshi_lm, load_mimi, load_torch_state_dict
    from rstnet_tpu.models.mimi import mimi_24k
    from rstnet_tpu.models.moshi_lm import MoshiLMModel, moshi_7b

    if args.tiny:
        mimi = mimi_24k(n_q_total=8, dimension=64, n_filters=8, num_layers=2,
                        quantizer_dim=32, bins=64)
        mimi_params = mimi.init(jax.random.PRNGKey(0))
        lm = MoshiLMModel(
            delays=(0,) * 17, n_q=16, dep_q=8, card=64, text_card=256, dim=64,
            num_heads=4, num_layers=2, hidden_scale=4.0, context=64,
            existing_text_padding_id=3, depformer_dim=32,
            depformer_dim_feedforward=64, depformer_num_heads=2,
            depformer_num_layers=1,
        )
        lm_params = lm.init(jax.random.PRNGKey(1))
        lm_gen = LMGen(lm, delays=lm.delays, top_k=32, kv_int8=args.kv_int8,
                       kv_unstacked=True)
        if args.batch:
            from rstnet_tpu.serving.batcher import SessionBatcher, auto_pipeline_depth

            depth = (auto_pipeline_depth() if args.pipeline == "auto"
                     else int(args.pipeline))
            wire = ("int16" if depth > 1 else "float32") if args.wire == "auto" \
                else ("int16" if args.wire == "pcm16" else "float32")
            pool = (None if args.fetch_pool == "auto"
                    else int(args.fetch_pool))
            batcher = SessionBatcher(
                mimi, mimi_params, lm_gen, lm_params, max_sessions=args.batch,
                dtype=jnp.float32, pipeline_depth=depth, wire_dtype=wire,
                fetch_pool=pool,
            )
            logging.info("warming up (tiny, batch %d, pipeline depth %d, "
                         "wire %s)...", args.batch, depth, wire)
            batcher.warmup()
            logging.info(f"serving ws://{args.host}:{args.port}/api/chat")
            web.run_app(build_batched_app(batcher), host=args.host, port=args.port,
                        ssl_context=ssl_context)
            return
        state = ServerState(
            mimi=mimi, mimi_params=mimi_params,
            lm_gen=lm_gen, lm_params=lm_params,
            scan_frames=args.scan_frames,
        )
        logging.info("warming up (tiny)...")
        state.warmup()
        logging.info(f"serving ws://{args.host}:{args.port}/api/chat")
        web.run_app(build_app(state), host=args.host, port=args.port,
                    ssl_context=ssl_context)
        return

    mimi = mimi_24k()
    mimi_params = (
        load_mimi(args.mimi_checkpoint, mimi)
        if args.mimi_checkpoint
        else mimi.init(jax.random.PRNGKey(0))
    )
    lm = moshi_7b()
    lm_params = (
        convert_moshi_lm(load_torch_state_dict(args.lm_checkpoint), lm)
        if args.lm_checkpoint
        else lm.init(jax.random.PRNGKey(1), jnp.bfloat16)
    )
    tokenizer = None
    if args.tokenizer_dir:
        from rstnet_tpu.data.tokenizers.text_tokenizer import TextTokenizer

        tokenizer = TextTokenizer(args.tokenizer_dir)
    from rstnet_tpu.ops.pallas_depformer import use_pallas_depformer
    from rstnet_tpu.ops.pallas_ffn import use_pallas_ffn

    if use_pallas_ffn() or use_pallas_depformer():
        # align the depformer gating hidden dim for the fused decode kernels
        # (no-op for moshi_7b whose hidden is already 128-aligned). Must run
        # BEFORE int8 quantization: padding operates on raw weight arrays.
        from rstnet_tpu.modules.transformer import pad_codecformer_gating

        lm_params = dict(lm_params)
        lm_params["depformer"] = pad_codecformer_gating(lm_params["depformer"])
    def _int8_dep_slice(p):
        # the depformer slice (micro-step stacks, per-codebook input views,
        # audio heads) — shared by --int8 and --int8-dep; keeps the int8
        # depformer inside the fused micro-step kernel's envelope instead
        # of mixed-precision fallback
        from rstnet_tpu.modules.transformer import (
            quantize_transformer_int8,
            quantize_weight_int8,
        )

        p = dict(p)
        p["depformer"] = quantize_transformer_int8(p["depformer"])
        p["depformer_in"] = quantize_weight_int8(p["depformer_in"])
        p["linears"] = dict(p["linears"])
        p["linears"]["weight"] = quantize_weight_int8(p["linears"]["weight"])
        return p

    if args.int8:
        from rstnet_tpu.modules.transformer import quantize_transformer_int8

        lm_params = _int8_dep_slice(lm_params)
        lm_params["transformer"] = quantize_transformer_int8(lm_params["transformer"])
    elif args.int8_dep:
        lm_params = _int8_dep_slice(lm_params)
    if args.int8_head and not args.int8:
        from rstnet_tpu.modules.transformer import quantize_weight_int8

        lm_params = dict(lm_params)
        lm_params["text_linear"] = dict(lm_params["text_linear"])
        lm_params["text_linear"]["weight"] = quantize_weight_int8(
            lm_params["text_linear"]["weight"]
        )
    lm_gen = LMGen(lm, delays=lm.delays, kv_int8=args.kv_int8,
                   kv_unstacked=True)
    if args.batch:
        from rstnet_tpu.serving.batcher import SessionBatcher, auto_pipeline_depth

        depth = (auto_pipeline_depth() if args.pipeline == "auto"
                 else int(args.pipeline))
        wire = ("int16" if depth > 1 else "float32") if args.wire == "auto" \
            else ("int16" if args.wire == "pcm16" else "float32")
        pool = None if args.fetch_pool == "auto" else int(args.fetch_pool)
        batcher = SessionBatcher(
            mimi, mimi_params, lm_gen, lm_params, max_sessions=args.batch,
            pipeline_depth=depth, wire_dtype=wire, fetch_pool=pool,
        )
        logging.info("warming up (batch %d, pipeline depth %d, wire %s)...",
                     args.batch, depth, wire)
        batcher.warmup()
        logging.info(f"serving ws://{args.host}:{args.port}/api/chat")
        web.run_app(
            build_batched_app(batcher, tokenizer), host=args.host, port=args.port,
            ssl_context=ssl_context,
        )
        return
    state = ServerState(
        mimi=mimi, mimi_params=mimi_params,
        lm_gen=lm_gen, lm_params=lm_params,
        text_tokenizer=tokenizer,
        scan_frames=args.scan_frames,
    )
    logging.info("warming up...")
    state.warmup()
    logging.info(f"serving ws://{args.host}:{args.port}/api/chat")
    web.run_app(build_app(state), host=args.host, port=args.port,
                ssl_context=ssl_context)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
