"""Duplex server tests: full websocket round trip with tiny models."""

import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rstnet_tpu.inference.generate import LMGen
from rstnet_tpu.serving.server import TAG_AUDIO, TAG_TEXT, ServerState, build_app
from rstnet_tpu.utils.audio import float_to_pcm16, pcm16_to_float
from tests.test_mimi import _my_model as tiny_mimi
from rstnet_tpu.models.moshi_lm import MoshiLMModel


def _tiny_state() -> ServerState:
    mimi = tiny_mimi()  # frame_size 24, 4 codebooks
    mimi_params = mimi.init(jax.random.PRNGKey(0))
    lm = MoshiLMModel(
        delays=(0,) * 9, n_q=8, dep_q=4, card=16, text_card=64, dim=32,
        num_heads=4, num_layers=2, hidden_scale=4.0, norm="rms_norm_f32",
        gating="silu", positional_embedding="rope", context=16,
        existing_text_padding_id=3, depformer_dim=16,
        depformer_dim_feedforward=32, depformer_num_heads=2,
        depformer_num_layers=1, depformer_multi_linear=True,
        depformer_weights_per_step=True, depformer_pos_emb="none",
    )
    lm_params = lm.init(jax.random.PRNGKey(1))
    return ServerState(
        mimi=mimi, mimi_params=mimi_params,
        lm_gen=LMGen(lm, delays=lm.delays), lm_params=lm_params,
    )


def test_frame_handler_direct():
    state = _tiny_state()
    state.warmup(2)
    audio, text_token = state.handle_frame_array(np.zeros(24, np.float32))
    # all delays are zero -> valid from the first frame
    assert audio is not None and audio.shape == (24,)
    assert isinstance(text_token, int)


def test_fused_solo_matches_raw_steps_with_delays():
    """The fused single-dispatch ServerState frame (encode+LM+decode+PRNG
    in one jit, decoder reset at the first valid frame) must reproduce the
    hand-rolled raw-module loop that skips decode during delay warmup —
    the reference solo semantics (moshi/server.py:86-90)."""
    mimi = tiny_mimi()
    mimi_params = mimi.init(jax.random.PRNGKey(0))
    lm = MoshiLMModel(
        delays=(0,) + (1,) * 8, n_q=8, dep_q=4, card=16, text_card=64, dim=32,
        num_heads=4, num_layers=2, hidden_scale=4.0, norm="rms_norm_f32",
        gating="silu", positional_embedding="rope", context=16,
        existing_text_padding_id=3, depformer_dim=16,
        depformer_dim_feedforward=32, depformer_num_heads=2,
        depformer_num_layers=1, depformer_multi_linear=True,
        depformer_weights_per_step=True, depformer_pos_emb="none",
    )
    lm_params = lm.init(jax.random.PRNGKey(1))
    gen = LMGen(lm, delays=lm.delays, use_sampling=False)
    key = jax.random.PRNGKey(7)
    rng = np.random.default_rng(3)
    frames = [rng.normal(0, 0.1, 24).astype(np.float32) for _ in range(5)]

    # raw reference: skip decode while invalid
    es = mimi.init_encode_state(1)
    ds = mimi.init_decode_state(1)
    ls = gen.init_state(1, dtype=jnp.float32)
    want = []
    for pcm in frames:
        chunk = jnp.asarray(pcm).reshape(1, 1, -1)
        codes, es = mimi.encode_step(mimi_params, es, chunk)
        user = codes[:, : gen.num_user_streams, :]
        out, valid, ls = gen.step(lm_params, ls, key, user)
        if bool(valid[0]):
            audio, ds = mimi.decode_step(mimi_params, ds, out[:, 1:, :])
            want.append((np.asarray(audio[0, 0]), int(np.asarray(out[0, 0, 0]))))

    state = ServerState(
        mimi=mimi, mimi_params=mimi_params, lm_gen=gen, lm_params=lm_params,
    )
    state.key = key
    got = []
    for pcm in frames:
        audio, tok = state.handle_frame_array(pcm)
        if audio is not None:
            got.append((audio, tok))
    assert len(got) == len(want) == 4  # one warmup frame at max_delay 1
    for (ga, gt), (wa, wt) in zip(got, want):
        assert gt == wt
        np.testing.assert_allclose(ga, wa, rtol=1e-5, atol=1e-6)


def test_scan_catchup_matches_single_frames():
    """handle_frames_array (N frames, one dispatch chain) produces exactly
    the audio + text of N handle_frame_array calls under greedy decoding —
    the server's catch-up fast path is a pure dispatch optimization."""
    def greedy_state(scan_frames):
        s = _tiny_state()
        return ServerState(
            mimi=s.mimi, mimi_params=s.mimi_params,
            lm_gen=LMGen(s.lm_gen.model, delays=s.lm_gen.delays,
                         use_sampling=False),
            lm_params=s.lm_params, scan_frames=scan_frames,
        )

    a, b = greedy_state(0), greedy_state(4)
    rng = np.random.default_rng(0)
    first = rng.normal(size=24).astype(np.float32) * 0.1
    block = rng.normal(size=4 * 24).astype(np.float32) * 0.1

    # one single frame on both (past warmup: max_delay == 0)
    audio_a0, text_a0 = a.handle_frame_array(first)
    audio_b0, text_b0 = b.handle_frame_array(first)
    np.testing.assert_array_equal(audio_a0, audio_b0)
    assert text_a0 == text_b0

    singles_audio, singles_text = [], []
    for i in range(4):
        au, tx = a.handle_frame_array(block[i * 24 : (i + 1) * 24])
        singles_audio.append(au)
        singles_text.append(tx)
    scan_audio, scan_text = b.handle_frames_array(block)
    assert b.steps == a.steps == 5
    # tokens are exact; audio only to float rounding (chunked conv sums in
    # a different order than 4 single-frame convs)
    np.testing.assert_allclose(
        scan_audio, np.concatenate(singles_audio), atol=1e-5
    )
    assert scan_text == singles_text


def test_websocket_roundtrip():
    from aiohttp.test_utils import TestClient, TestServer

    state = _tiny_state()
    state.warmup(2)
    app = build_app(state)

    async def run():
        async with TestClient(TestServer(app)) as client:
            ws = await client.ws_connect("/api/chat")
            got_audio, got_text = [], []
            # send 3 frames of 24 samples each
            for i in range(3):
                pcm = np.random.default_rng(i).normal(0, 0.1, 24).astype(np.float32)
                await ws.send_bytes(TAG_AUDIO + float_to_pcm16(pcm))
            # read responses until we have 3 audio frames
            for _ in range(10):
                msg = await asyncio.wait_for(ws.receive(), timeout=30)
                if msg.type.name != "BINARY":
                    break
                data = bytes(msg.data)
                if data[:1] == TAG_AUDIO:
                    got_audio.append(pcm16_to_float(data[1:]))
                elif data[:1] == TAG_TEXT:
                    got_text.append(data[1:].decode())
                if len(got_audio) >= 3:
                    break
            await ws.close()
            return got_audio, got_text

    got_audio, got_text = asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())
    assert len(got_audio) == 3
    assert all(a.shape == (24,) for a in got_audio)
    assert got_text  # text tokens streamed as strings without a tokenizer


def test_stats_endpoint_reports_session_tail():
    """/api/stats exposes the per-session frame-latency tail (VERDICT r3
    item 5: serving needs a tail-latency story): after a chat session it
    must report the frames handled with p50/p99 percentiles."""
    from aiohttp.test_utils import TestClient, TestServer

    state = _tiny_state()
    state.warmup(2)
    app = build_app(state)

    async def run():
        async with TestClient(TestServer(app)) as client:
            before = await (await client.get("/api/stats")).json()
            ws = await client.ws_connect("/api/chat")
            for i in range(3):
                pcm = np.random.default_rng(i).normal(0, 0.1, 24).astype(np.float32)
                await ws.send_bytes(TAG_AUDIO + float_to_pcm16(pcm))
            got = 0
            while got < 3:
                msg = await asyncio.wait_for(ws.receive(), timeout=30)
                if msg.type.name != "BINARY":
                    break
                if bytes(msg.data)[:1] == TAG_AUDIO:
                    got += 1
            await ws.close()
            after = await (await client.get("/api/stats")).json()
            return before, after

    before, after = (
        asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())
    )
    assert before == {"n_frames": 0}
    assert after["n_frames"] >= 3
    assert after["p50_ms"] > 0 and after["p99_ms"] >= after["p50_ms"]
    assert "p99_steady_ms" in after


def test_handle_frames_array_warmup_gate_raises():
    """ADVICE r3: the scan path's warmup precondition must be a real error,
    not an -O-strippable assert (warmup frames would decode UNGENERATED
    tokens as audio)."""
    state = _tiny_state()
    state.scan_frames = 2
    with pytest.raises(RuntimeError, match="warmup"):
        state.handle_frames_array(np.zeros(2 * 24, np.float32))


def test_batched_server_two_concurrent_sessions():
    """Two websocket clients share one batched frame step; both receive
    audio frames in real time and slots are isolated."""
    from aiohttp.test_utils import TestClient, TestServer

    from rstnet_tpu.serving.batcher import SessionBatcher
    from rstnet_tpu.serving.server import build_batched_app

    mimi = tiny_mimi()
    mimi_params = mimi.init(jax.random.PRNGKey(0))
    lm = MoshiLMModel(
        delays=(0,) * 9, n_q=8, dep_q=4, card=16, text_card=64, dim=32,
        num_heads=4, num_layers=2, hidden_scale=4.0, norm="rms_norm_f32",
        gating="silu", positional_embedding="rope", context=16,
        existing_text_padding_id=3, depformer_dim=16,
        depformer_dim_feedforward=32, depformer_num_heads=2,
        depformer_num_layers=1, depformer_multi_linear=True,
        depformer_weights_per_step=True, depformer_pos_emb="none",
    )
    lm_params = lm.init(jax.random.PRNGKey(1))
    batcher = SessionBatcher(
        mimi, mimi_params, LMGen(lm, delays=lm.delays), lm_params,
        max_sessions=3, dtype=jnp.float32,
    )
    batcher.warmup()
    app = build_batched_app(batcher)

    async def one_client(client, seed, n_frames=3):
        ws = await client.ws_connect("/api/chat")
        rng = np.random.default_rng(seed)
        for _ in range(n_frames):
            pcm = rng.normal(0, 0.1, 24).astype(np.float32)
            await ws.send_bytes(TAG_AUDIO + float_to_pcm16(pcm))
        got_audio = []
        for _ in range(20):
            msg = await asyncio.wait_for(ws.receive(), timeout=30)
            if msg.type.name != "BINARY":
                break
            data = bytes(msg.data)
            if data[:1] == TAG_AUDIO:
                got_audio.append(pcm16_to_float(data[1:]))
            if len(got_audio) >= n_frames:
                break
        await ws.close()
        return got_audio

    async def run():
        async with TestClient(TestServer(app)) as client:
            a, b = await asyncio.gather(one_client(client, 0), one_client(client, 1))
            return a, b

    a, b = asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())
    assert len(a) == 3 and len(b) == 3
    assert all(x.shape == (24,) for x in a + b)
    assert len(batcher.sessions) == 0 and sorted(batcher._free) == [0, 1, 2]


def test_batched_audio_matches_solo_with_delays():
    """The batched pipeline must not let LM delay-warmup garbage advance a
    slot's decoder state: with greedy sampling, a batched session's audio
    frames equal the solo pipeline (which skips decode on invalid frames)."""
    from rstnet_tpu.serving.batcher import SessionBatcher

    mimi = tiny_mimi()
    mimi_params = mimi.init(jax.random.PRNGKey(0))
    lm = MoshiLMModel(
        delays=(0,) + (1,) * 8, n_q=8, dep_q=4, card=16, text_card=64, dim=32,
        num_heads=4, num_layers=2, hidden_scale=4.0, norm="rms_norm_f32",
        gating="silu", positional_embedding="rope", context=16,
        existing_text_padding_id=3, depformer_dim=16,
        depformer_dim_feedforward=32, depformer_num_heads=2,
        depformer_num_layers=1, depformer_multi_linear=True,
        depformer_weights_per_step=True, depformer_pos_emb="none",
    )
    lm_params = lm.init(jax.random.PRNGKey(1))
    gen = LMGen(lm, delays=lm.delays, use_sampling=False)
    key = jax.random.PRNGKey(7)
    pcm = np.zeros((24,), np.float32)

    # solo reference: skip decode while invalid (ServerState semantics)
    es = mimi.init_encode_state(1)
    ds = mimi.init_decode_state(1)
    ls = gen.init_state(1, dtype=jnp.float32)
    solo_audio = []
    for _ in range(5):
        chunk = jnp.asarray(pcm).reshape(1, 1, -1)
        codes, es = mimi.encode_step(mimi_params, es, chunk)
        user = codes[:, : gen.num_user_streams, :]
        out, valid, ls = gen.step(lm_params, ls, key, user)
        if bool(valid[0]):
            audio, ds = mimi.decode_step(mimi_params, ds, out[:, 1:, :])
            solo_audio.append(np.asarray(audio[0, 0]))

    # batched: one session in a 2-slot batcher, same greedy inputs
    batcher = SessionBatcher(
        mimi, mimi_params, gen, lm_params, max_sessions=2, dtype=jnp.float32
    )
    batcher.key = key
    sess = batcher.acquire()
    for _ in range(5):
        sess.inputs.put_nowait(pcm)
        batcher.step_once()
    got = []
    while not sess.outputs.empty():
        audio, _tok = sess.outputs.get_nowait()
        got.append(audio)
    assert len(got) == len(solo_audio)
    for g, w in zip(got, solo_audio):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)


def _tiny_batcher(max_sessions=2):
    from rstnet_tpu.serving.batcher import SessionBatcher

    mimi = tiny_mimi()
    mimi_params = mimi.init(jax.random.PRNGKey(0))
    lm = MoshiLMModel(
        delays=(0,) * 9, n_q=8, dep_q=4, card=16, text_card=64, dim=32,
        num_heads=4, num_layers=2, hidden_scale=4.0, norm="rms_norm_f32",
        gating="silu", positional_embedding="rope", context=16,
        existing_text_padding_id=3, depformer_dim=16,
        depformer_dim_feedforward=32, depformer_num_heads=2,
        depformer_num_layers=1, depformer_multi_linear=True,
        depformer_weights_per_step=True, depformer_pos_emb="none",
    )
    lm_params = lm.init(jax.random.PRNGKey(1))
    return SessionBatcher(
        mimi, mimi_params, LMGen(lm, delays=lm.delays), lm_params,
        max_sessions=max_sessions, dtype=jnp.float32,
    )


def test_batcher_fetch_modes_and_killswitches(monkeypatch):
    """The depth-2 batcher's three fetch modes (threaded pool [default],
    dispatch-time async copy [pool disabled], fully synchronous [both
    disabled]) must all tick, track delivery latency, and respect their
    env kill-switches. Output parity across modes is pinned by
    test_batcher_pipeline_depth2_matches_depth1 (which runs the default
    pool path) — this test pins the mode selection itself."""
    from rstnet_tpu.serving.batcher import SessionBatcher

    b = _tiny_batcher()
    # (pool_env, async_env) -> (fetch_pool, _async_fetch after ticks)
    cases = [
        (None, None, 2, None),   # default: pool of `depth`, async unused
        ("0", None, 0, True),    # pool off -> dispatch-time async copy
        ("0", "0", 0, False),    # both off -> synchronous fetch
        ("3", None, 3, None),    # forced pool size
    ]
    for pool_env, async_env, want_pool, want_async in cases:
        for name, val in (("RSTNET_BATCHER_FETCH_POOL", pool_env),
                          ("RSTNET_BATCHER_ASYNC_FETCH", async_env)):
            if val is None:
                monkeypatch.delenv(name, raising=False)
            else:
                monkeypatch.setenv(name, val)
        b2 = SessionBatcher(
            b.mimi, b.mimi_params, b.lm_gen, b.lm_params,
            max_sessions=b.max_sessions, dtype=jnp.float32, pipeline_depth=2,
        )
        assert b2.fetch_pool == want_pool, (pool_env, b2.fetch_pool)
        sess = b2.acquire()
        for _ in range(4):
            b2.step_once()
        assert b2._async_fetch is want_async, (pool_env, async_env)
        # frames were delivered and the dispatch->delivery tail is tracked
        d = b2.delivery_latency.summary()
        assert d["n_frames"] >= 3
        assert sess.outputs.qsize() > 0


def test_batched_handshake_reply_precedes_any_audio():
    """The batched handler must not stream audio before the codec handshake
    is decided: the slot is acquired only after the reply is sent, so a
    client that offers a codec never receives frames packed with a
    transport it didn't negotiate."""
    import json

    from aiohttp.test_utils import TestClient, TestServer

    from rstnet_tpu.serving.server import build_batched_app

    batcher = _tiny_batcher()
    batcher.warmup()
    app = build_batched_app(batcher)

    async def run():
        async with TestClient(TestServer(app)) as client:
            ws = await client.ws_connect("/api/chat")
            # several 80 ms clock ticks pass with the offer unsent; a slot
            # acquired at connect time would already have queued audio
            await asyncio.sleep(0.4)
            await ws.send_str(json.dumps({"codec": "pcm16"}))
            msg = await asyncio.wait_for(ws.receive(), timeout=30)
            assert msg.type.name == "TEXT", (
                f"first message after the offer must be the handshake reply, "
                f"got {msg.type.name}"
            )
            assert json.loads(msg.data)["codec"] == "pcm16"
            # the negotiated session then streams audio normally
            for i in range(3):
                pcm = np.random.default_rng(i).normal(0, 0.1, 24).astype(np.float32)
                await ws.send_bytes(TAG_AUDIO + float_to_pcm16(pcm))
            got = 0
            for _ in range(20):
                msg = await asyncio.wait_for(ws.receive(), timeout=30)
                if msg.type.name != "BINARY":
                    break
                if bytes(msg.data)[:1] == TAG_AUDIO:
                    got += 1
                if got >= 2:
                    break
            await ws.close()
            return got

    got = asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())
    assert got >= 2
    assert len(batcher.sessions) == 0


def test_batcher_slot_reacquire_drops_inflight_frame():
    """A frame computed for a released slot must NOT be delivered to a new
    session that re-acquired the slot while the step was in flight."""

    async def run():
        batcher = _tiny_batcher(max_sessions=1)
        sess_a = batcher.acquire()
        slot = sess_a.slot
        pcm, snapshot = batcher._gather_inputs()
        # simulate join/leave racing the in-flight device step
        batcher.release(sess_a)
        sess_b = batcher.acquire()
        assert sess_b.slot == slot  # same physical slot, new occupant
        audio = np.zeros((batcher.max_sessions, 1, batcher.frame_size), np.float32)
        out = np.zeros((batcher.max_sessions, 9, 1), np.int32)
        valid = np.ones((batcher.max_sessions,), bool)
        batcher._distribute((snapshot, audio, out, valid))
        assert sess_b.outputs.empty(), "stale frame leaked into a new session"
        # control: a fresh snapshot for the current occupant does deliver
        _, snap2 = batcher._gather_inputs()
        batcher._distribute((snap2, audio, out, valid))
        assert sess_b.outputs.qsize() == 1

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_batcher_pipeline_depth2_matches_depth1():
    """The depth-2 pipelined frame clock (dispatch frame t, fetch frame t-1,
    overlapping transfer with compute) must deliver the exact same frames as
    the synchronous depth-1 clock, one tick later."""
    from rstnet_tpu.serving.batcher import SessionBatcher

    streams = {}
    for depth in (1, 2):
        b = _tiny_batcher()
        b2 = SessionBatcher(
            b.mimi, b.mimi_params, b.lm_gen, b.lm_params,
            max_sessions=b.max_sessions, dtype=jnp.float32,
            pipeline_depth=depth,
        )
        b2.key = jax.random.PRNGKey(5)
        sess = b2.acquire()
        n = 6
        for i in range(n + depth - 1):  # +depth-1 flush ticks
            if i < n:
                sess.inputs.put_nowait(
                    np.random.default_rng(i).normal(0, 0.1, 24).astype(np.float32)
                )
            b2.step_once()
        got = []
        while not sess.outputs.empty():
            audio, tok = sess.outputs.get_nowait()
            got.append((audio, tok))
        streams[depth] = got
    assert len(streams[1]) == len(streams[2]) > 0
    for (a1, t1), (a2, t2) in zip(streams[1], streams[2]):
        assert t1 == t2
        np.testing.assert_allclose(a1, a2, rtol=1e-5, atol=1e-6)


def test_batcher_int16_wire_matches_float():
    """int16 wire PCM (the client transport format moved host<->device as
    16-bit) must reproduce the float32-wire stream: identical tokens on
    identical (silence) inputs, audio equal to within one LSB of pcm16."""
    from rstnet_tpu.serving.batcher import SessionBatcher

    streams = {}
    for wire in ("float32", "int16"):
        b = _tiny_batcher()
        b2 = SessionBatcher(
            b.mimi, b.mimi_params, b.lm_gen, b.lm_params,
            max_sessions=b.max_sessions, dtype=jnp.float32, wire_dtype=wire,
        )
        b2.key = jax.random.PRNGKey(9)
        sess = b2.acquire()
        for _ in range(5):
            b2.step_once()  # starved slots step with exact silence
        got = []
        while not sess.outputs.empty():
            got.append(sess.outputs.get_nowait())
        streams[wire] = got
    assert len(streams["float32"]) == len(streams["int16"]) > 0
    for (a_f, t_f), (a_i, t_i) in zip(streams["float32"], streams["int16"]):
        assert t_f == t_i  # silence quantizes exactly: same codes, tokens
        np.testing.assert_allclose(a_f, a_i, atol=1.5 / 32767.0)


def test_batcher_step_failure_closes_sessions_and_keeps_clock():
    """A device-step failure must close active sessions with a sentinel (not
    freeze their streams) and leave the batcher usable for new sessions."""

    async def run():
        batcher = _tiny_batcher()
        batcher.warmup()
        sess = batcher.acquire()
        batcher._device_step = lambda pcm, snapshot=None: (_ for _ in ()).throw(
            RuntimeError("injected device failure")
        )
        task = asyncio.get_running_loop().create_task(batcher.run())
        try:
            sentinel = await asyncio.wait_for(sess.outputs.get(), timeout=10)
            assert sentinel is None
            assert not batcher.sessions
            # release after the failure already freed the slot: idempotent
            batcher.release(sess)
            assert sorted(batcher._free) == [0, 1]
            assert batcher.acquire() is not None  # clock survives
        finally:
            task.cancel()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())
