"""LMGen streaming generation tests: delay-pattern correctness, jit-once."""

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.inference.generate import LMGen
from rstnet_tpu.models.lm import UNGENERATED_TOKEN_ID
from tests.test_speech_lm import _model


def test_warmup_then_valid_frames():
    m = _model()
    gen = LMGen(m, delays=(0,) + (1,) * m.config.n_q, use_sampling=True)
    params = m.init(jax.random.PRNGKey(0))
    state = gen.init_state(1, dtype=jnp.float32)
    step = jax.jit(gen.step, donate_argnums=(1,))
    key = jax.random.PRNGKey(7)
    outs = []
    valids = []
    for t in range(6):
        key, sub = jax.random.split(key)
        out, valid, state = step(params, state, sub)
        outs.append(np.asarray(out))
        valids.append(bool(valid))
    # max_delay=1: first frame invalid, rest valid
    assert valids == [False, True, True, True, True, True]
    for out, valid in zip(outs, valids):
        if valid:
            assert (out != UNGENERATED_TOKEN_ID).all()
            assert out.shape == (1, m.config.dep_q + 1, 1)
            assert (out[:, 1:] < m.config.audio_card).all() and (out >= 0).all()


def test_zero_delay_greedy_matches_manual_loop():
    """Greedy LMGen with no delays reproduces a hand-rolled generation loop."""
    m = _model()
    gen = LMGen(m, use_sampling=False)
    params = m.init(jax.random.PRNGKey(0))
    state = gen.init_state(1, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)

    frames = []
    for t in range(4):
        out, valid, state = gen.step(params, state, key)
        assert bool(valid)
        frames.append(np.asarray(out)[0, :, 0])

    # manual loop using the model's raw streaming pieces
    lm_state = m.init_state(1, dtype=jnp.float32)
    frame = m.initial_frame(1)
    manual = []
    for t in range(4):
        hidden, text_logits, lm_state = m.step_global(params, lm_state, frame)
        text_tok = jnp.argmax(text_logits[:, -1], axis=-1)
        cf_state = m.init_codecformer_state(1, dtype=jnp.float32)
        prev = text_tok[:, None]
        toks = [int(text_tok[0])]
        for cb in range(m.config.dep_q):
            logits, cf_state = m.step_codecformer(params, cf_state, cb, prev, hidden)
            prev = jnp.argmax(logits[:, -1], axis=-1)[:, None]
            toks.append(int(prev[0, 0]))
        manual.append(np.asarray(toks))
        frame = jnp.asarray(toks, jnp.int32)[None, :, None]

    np.testing.assert_array_equal(np.stack(frames), np.stack(manual))


def test_audio_max_card_clamp():
    m = _model()
    gen = LMGen(m, use_sampling=True, audio_max_card=4, top_k=0, temp=1.0)
    params = m.init(jax.random.PRNGKey(0))
    state = gen.init_state(2, dtype=jnp.float32)
    key = jax.random.PRNGKey(3)
    for _ in range(3):
        key, sub = jax.random.split(key)
        out, valid, state = gen.step(params, state, sub)
    assert (np.asarray(out)[:, 1:] < 4).all()


def test_multi_session_staggered_join_matches_solo():
    """Batched serving: a slot reset mid-stream behaves exactly like a fresh
    solo session — per-slot age masks the shared ring cache (kv_len), the
    delay warmup restarts, and the neighbouring slots are undisturbed."""
    m = _model()
    gen = LMGen(m, delays=(0,) + (1,) * m.config.n_q, use_sampling=False)
    params = m.init(jax.random.PRNGKey(0))
    step = jax.jit(gen.step)
    key = jax.random.PRNGKey(3)  # greedy: key is unused entropy

    # batched: 3 slots run 4 frames, slot 1 is then reset and runs 6 more
    state = gen.init_state(3, dtype=jnp.float32)
    for _ in range(4):
        out_b, _, state = step(params, state, key)
    state = gen.reset_slots(state, [1])
    assert int(state["age"][1]) == 0 and int(state["age"][0]) == 4
    batched_outs, batched_valids = [], []
    solo_ref_outs = []
    for _ in range(6):
        out_b, valid_b, state = step(params, state, key)
        batched_outs.append(np.asarray(out_b[1]))
        batched_valids.append(bool(valid_b[1]))

    # solo: a fresh 1-slot session runs the same 6 frames
    solo_state = gen.init_state(1, dtype=jnp.float32)
    solo_outs, solo_valids = [], []
    for _ in range(6):
        out_s, valid_s, solo_state = step(params, solo_state, key)
        solo_outs.append(np.asarray(out_s[0]))
        solo_valids.append(bool(valid_s[0]))

    assert batched_valids == solo_valids
    for got, want in zip(batched_outs, solo_outs):
        np.testing.assert_array_equal(got, want)


def test_multi_session_running_slot_unaffected_by_reset():
    """Resetting one slot must not change another slot's stream at all."""
    m = _model()
    gen = LMGen(m, delays=(0,) + (1,) * m.config.n_q, use_sampling=False)
    params = m.init(jax.random.PRNGKey(0))
    step = jax.jit(gen.step)
    key = jax.random.PRNGKey(3)

    state_a = gen.init_state(2, dtype=jnp.float32)
    state_b = gen.init_state(2, dtype=jnp.float32)
    outs_a, outs_b = [], []
    for t in range(8):
        if t == 4:
            state_b = gen.reset_slots(state_b, [1])
        out_a, _, state_a = step(params, state_a, key)
        out_b, _, state_b = step(params, state_b, key)
        outs_a.append(np.asarray(out_a[0]))
        outs_b.append(np.asarray(out_b[0]))
    for got, want in zip(outs_b, outs_a):
        np.testing.assert_array_equal(got, want)


def test_kv_int8_close_to_exact():
    """int8 ring-KV serving: hidden states track the exact bf16 cache
    closely and the greedy token stream stays sane."""
    m = _model()
    params = m.init(jax.random.PRNGKey(0))
    gen = LMGen(m, use_sampling=False)
    gen8 = LMGen(m, use_sampling=False, kv_int8=True)
    step = jax.jit(gen.step)
    step8 = jax.jit(gen8.step)
    key = jax.random.PRNGKey(2)
    state = gen.init_state(1, dtype=jnp.float32)
    state8 = gen8.init_state(1, dtype=jnp.float32)
    assert state8["lm"]["kv"]["k"].dtype == jnp.int8
    n_match = 0
    for t in range(10):
        out, _, state = step(params, state, key)
        out8, _, state8 = step8(params, state8, key)
        n_match += int((np.asarray(out) == np.asarray(out8)).all())
    # random tiny models have near-tied logits; require most frames to agree
    assert n_match >= 7, f"only {n_match}/10 greedy frames matched exact KV"


def test_head_only_int8_keeps_greedy_tokens():
    """quantize_head_for_serving (int8 lm_head only): greedy text argmax
    agrees with bf16 on nearly every position; audio path untouched."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from rstnet_tpu.models.lm import quantize_head_for_serving

    model = _flagship(tiny=True)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    params_h = quantize_head_for_serving(params)
    key = jax.random.PRNGKey(1)
    text = jax.random.randint(key, (2, 1, 12), 0, model.config.padded_vocab_size)
    audio = jax.random.randint(key, (2, model.config.n_q, 12), 0, model.config.audio_card)
    seq = jnp.concatenate([text, audio], axis=1)
    audio_logits, text_logits = jax.jit(model.__call__)(params, seq)
    audio_logits_h, text_logits_h = jax.jit(model.__call__)(params_h, seq)
    # audio path is untouched -> bit-identical
    np.testing.assert_array_equal(np.asarray(audio_logits), np.asarray(audio_logits_h))
    # text argmax agrees almost everywhere under per-channel int8 rounding
    a = np.asarray(jnp.argmax(text_logits, -1)).reshape(-1)
    b = np.asarray(jnp.argmax(text_logits_h, -1)).reshape(-1)
    assert (a == b).mean() >= 0.9
