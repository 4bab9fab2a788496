"""Fused depformer micro-step megakernel: interpret-mode parity on CPU.

The kernel runs one whole depth-transformer micro-step (all layers + audio
head) as a single pallas_call (see ``ops/pallas_depformer.py``); on-TPU wins
are measured by bench probes. Correctness is pinned here two ways: against a
jnp reference with the kernel's exact numerics, and against the model's real
XLA path (``step_codecformer``) with bf16 tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rstnet_tpu.ops.pallas_depformer import (
    depformer_frame_reference,
    depformer_kernel_operands,
    depformer_step_pallas,
)


def _rand_ops(key, L=2, S=4, C=128, heads=2, H=128, card=256):
    ks = jax.random.split(key, 8)
    sc = 0.05
    return {
        "norm1": 1.0 + 0.1 * jax.random.normal(ks[0], (L, C)),
        "in_proj": sc * jax.random.normal(ks[1], (L, S * 3 * C, C)),
        "out_proj": sc * jax.random.normal(ks[2], (L, S * C, C)),
        "norm2": 1.0 + 0.1 * jax.random.normal(ks[3], (L, C)),
        "gin": sc * jax.random.normal(ks[4], (L, S, 2 * H, C)),
        "gout": sc * jax.random.normal(ks[5], (L, S, C, H)),
        "head_w": sc * jax.random.normal(ks[6], (S, card, C)),
        "head_b": 0.1 * jax.random.normal(ks[7], (S, card)),
        "heads": heads,
        "eps": 1e-8,
        "L": L,
        "S": S,
        "C": C,
    }


def _run_kernel_frame(ops, x_steps, kc, vc):
    outs = []
    for cb in range(x_steps.shape[0]):
        logits, kc, vc = depformer_step_pallas(
            x_steps[cb], jnp.int32(cb),
            ops["norm1"], ops["in_proj"], ops["out_proj"], ops["norm2"],
            ops["gin"], ops["gout"], ops["head_w"], ops["head_b"],
            kc, vc, heads=ops["heads"], eps=ops["eps"], interpret=True,
        )
        outs.append(logits)
    return jnp.stack(outs), kc, vc


def test_dep_kernel_matches_reference():
    ops = _rand_ops(jax.random.PRNGKey(0))
    L, S, C = ops["L"], ops["S"], ops["C"]
    x_steps = jax.random.normal(jax.random.PRNGKey(1), (S, 1, C))
    kc = jnp.zeros((L, S, C), jnp.bfloat16)
    vc = jnp.zeros((L, S, C), jnp.bfloat16)
    got, kck, vck = _run_kernel_frame(ops, x_steps, kc, vc)
    want, kcr, vcr = depformer_frame_reference(ops, x_steps, kc, vc)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(kck, np.float32), np.asarray(kcr, np.float32), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(vck, np.float32), np.asarray(vcr, np.float32), rtol=2e-2, atol=2e-2
    )


def test_dep_kernel_causality():
    """Step cb's logits must not depend on cache rows > cb (masked)."""
    ops = _rand_ops(jax.random.PRNGKey(2))
    L, S, C = ops["L"], ops["S"], ops["C"]
    x = jax.random.normal(jax.random.PRNGKey(3), (1, C))
    clean = jnp.zeros((L, S, C), jnp.bfloat16)
    dirty_k = clean.at[:, 2:].set(37.0)  # rows the step-1 mask must hide
    dirty_v = clean.at[:, 2:].set(-11.0)
    args = (ops["norm1"], ops["in_proj"], ops["out_proj"], ops["norm2"],
            ops["gin"], ops["gout"], ops["head_w"], ops["head_b"])
    kw = dict(heads=ops["heads"], eps=ops["eps"], interpret=True)
    l_clean, _, _ = depformer_step_pallas(x, jnp.int32(1), *args, clean, clean, **kw)
    l_dirty, _, _ = depformer_step_pallas(x, jnp.int32(1), *args, dirty_k, dirty_v, **kw)
    np.testing.assert_allclose(np.asarray(l_clean), np.asarray(l_dirty), atol=1e-5)


def _tiny_flagship():
    from rstnet_tpu.models.config import Config
    from rstnet_tpu.models.lm import SpeechTextLM

    cfg = Config(
        name="dep-kernel-test",
        block_size=256,
        vocab_size=256,
        padded_vocab_size=256,
        n_layer=1,
        n_head=2,
        n_embd=128,
        n_query_groups=2,
        rotary_percentage=1.0,
        parallel_residual=False,
        bias=False,
        norm_class_name="RMSNorm",
        mlp_class_name="LLaMAMLP",
        intermediate_size=256,
        context=64,
        audio_card=128,
        codecformer_dim=128,
        n_q=8,
        dep_q=8,
        codecformer_heads=2,
        codecformer_layers=2,
        codecformer_dim_feedforward=128,
    )
    return SpeechTextLM(cfg)


def test_dep_kernel_matches_xla_codecformer_path():
    """Kernel vs the model's real step_codecformer chain (loose bf16 tol)."""
    from rstnet_tpu.modules.transformer import pad_codecformer_gating

    model = _tiny_flagship()
    cfg = model.config
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = {**params, "codecformer": pad_codecformer_gating(params["codecformer"])}
    ops = depformer_kernel_operands(model, params)
    assert ops is not None
    L, S, C = ops["L"], ops["S"], ops["C"]

    hidden = (0.5 * jax.random.normal(jax.random.PRNGKey(1), (1, 1, cfg.n_embd))).astype(
        jnp.bfloat16
    )
    text_token = jnp.array([7], jnp.int32)
    dep_ins = model.codecformer_inputs(params, hidden)

    # XLA path
    cf_state = model.init_codecformer_state(1, dtype=jnp.bfloat16)
    prev = text_token[:, None]
    xla_logits = []
    for cb in range(cfg.dep_q):
        logits, cf_state = model.step_codecformer(
            params, cf_state, cb, prev, hidden, dep_in=dep_ins[:, cb]
        )
        xla_logits.append(logits[:, 0].astype(jnp.float32))
        prev = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)[:, None]

    # kernel path: same per-step inputs (dep_in + prev-token embedding)
    from rstnet_tpu.models.lm import scaled_embedding

    kc = jnp.zeros((L, S, C), jnp.bfloat16)
    vc = jnp.zeros((L, S, C), jnp.bfloat16)
    prev = text_token[:, None]
    ker_logits = []
    for cb in range(cfg.dep_q):
        if cb == 0:
            emb = scaled_embedding(params["codecformer_text_emb"], prev)
        else:
            emb = scaled_embedding(params["codecformer_emb"][cb - 1], prev)
        x = (dep_ins[:, cb, 0] + emb[:, 0]).astype(jnp.bfloat16)
        logits, kc, vc = depformer_step_pallas(
            x, jnp.int32(cb),
            ops["norm1"], ops["in_proj"], ops["out_proj"], ops["norm2"],
            ops["gin"], ops["gout"], ops["head_w"], ops["head_b"],
            kc, vc, heads=ops["heads"], eps=ops["eps"], interpret=True,
        )
        ker_logits.append(logits)
        prev = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]

    for cb, (a, b) in enumerate(zip(xla_logits, ker_logits)):
        a, b = np.asarray(a), np.asarray(b)
        # bf16 matmuls vs bf16 matmuls with different fusion: loose tolerance
        np.testing.assert_allclose(a, b, rtol=0.1, atol=0.08), cb
        assert np.argmax(a) == np.argmax(b), f"greedy token diverged at step {cb}"


def test_lmgen_kernel_path_matches_xla_path(monkeypatch):
    """LMGen.step with RSTNET_PALLAS_DEP=interpret emits (mostly) the same
    greedy frames as the default XLA path. A single bf16 tie-flip legitimately
    cascades through later autoregressive steps, so this asserts a high
    agreement fraction — a wiring bug (wrong weight slice / cache layout)
    would drive agreement to ~chance. Exact per-step logits parity is pinned
    by test_dep_kernel_matches_xla_codecformer_path."""
    from rstnet_tpu.inference.generate import LMGen
    from rstnet_tpu.modules.transformer import pad_codecformer_gating

    model = _tiny_flagship()
    cfg = model.config
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = {**params, "codecformer": pad_codecformer_gating(params["codecformer"])}
    gen = LMGen(model, delays=(0,) + (1,) * cfg.n_q, use_sampling=False)

    def run(n_frames):
        state = gen.init_state(1)
        key = jax.random.PRNGKey(1)
        outs = []
        for _ in range(n_frames):
            key, sub = jax.random.split(key)
            out, valid, state = gen.step(params, state, sub)
            outs.append(np.asarray(out))
        return np.stack(outs)

    monkeypatch.delenv("RSTNET_PALLAS_DEP", raising=False)
    ref = run(4)
    monkeypatch.setenv("RSTNET_PALLAS_DEP", "interpret")
    got = run(4)
    assert got.shape == ref.shape
    agreement = np.mean(got == ref)
    assert agreement >= 0.75, f"token agreement {agreement:.2f}"
    # the first emitted frame has no cascade history: must match exactly
    np.testing.assert_array_equal(got[0], ref[0])


def test_dep_kernel_int8_matches_dequantized_reference():
    from rstnet_tpu.modules.transformer import quantize_weight_int8

    ops = _rand_ops(jax.random.PRNGKey(4))
    L, S, C = ops["L"], ops["S"], ops["C"]
    names = ("in_proj", "out_proj", "gin", "gout", "head_w")
    q = {k: quantize_weight_int8(ops[k]) for k in names}
    scales = {k: q[k]["scale"][..., None].astype(jnp.float32) for k in names}
    # reference runs on the dequantized weights through the same math
    deq_ops = {
        **ops,
        **{k: q[k]["w_int8"].astype(jnp.float32) * scales[k] for k in names},
    }
    x_steps = jax.random.normal(jax.random.PRNGKey(5), (S, 1, C))
    kc = jnp.zeros((L, S, C), jnp.bfloat16)
    vc = jnp.zeros((L, S, C), jnp.bfloat16)
    want, _, _ = depformer_frame_reference(deq_ops, x_steps, kc, vc)
    outs = []
    for cb in range(S):
        logits, kc, vc = depformer_step_pallas(
            x_steps[cb], jnp.int32(cb),
            ops["norm1"], q["in_proj"]["w_int8"], q["out_proj"]["w_int8"],
            ops["norm2"], q["gin"]["w_int8"], q["gout"]["w_int8"],
            q["head_w"]["w_int8"], ops["head_b"],
            kc, vc, heads=ops["heads"], eps=ops["eps"], scales=scales,
            interpret=True,
        )
        outs.append(logits)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(outs)), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_lmgen_kernel_path_int8(monkeypatch):
    """quantize_for_serving params (padded first) stay inside the kernel
    envelope: operands report scales and LMGen's kernel path runs."""
    from rstnet_tpu.inference.generate import LMGen
    from rstnet_tpu.models.lm import quantize_for_serving
    from rstnet_tpu.modules.transformer import pad_codecformer_gating

    model = _tiny_flagship()
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = {**params, "codecformer": pad_codecformer_gating(params["codecformer"])}
    params_q = quantize_for_serving(model, params)
    ops = depformer_kernel_operands(model, params_q)
    assert ops is not None and ops["scales"] is not None

    gen = LMGen(model, delays=(0,) + (1,) * model.config.n_q, use_sampling=False)

    def run(p, n_frames=3):
        state = gen.init_state(1)
        key = jax.random.PRNGKey(1)
        outs = []
        for _ in range(n_frames):
            key, sub = jax.random.split(key)
            out, valid, state = gen.step(p, state, sub)
            outs.append(np.asarray(out))
        return np.stack(outs)

    monkeypatch.setenv("RSTNET_PALLAS_DEP", "interpret")
    got = run(params_q)
    monkeypatch.setenv("RSTNET_PALLAS_DEP", "0")
    ref = run(params_q)
    assert got.shape == ref.shape
    assert np.mean(got == ref) >= 0.75


def test_dep_kernel_operands_gates_unsupported_configs():
    model = _tiny_flagship()
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    # unpadded gating hidden (2*128/3 = 85) -> refused
    assert depformer_kernel_operands(model, params) is None


def test_dep_kernel_operands_moshi_layout():
    from rstnet_tpu.models.moshi_lm import MoshiLMModel
    from rstnet_tpu.modules.transformer import pad_codecformer_gating

    model = MoshiLMModel(
        dim=128, num_heads=2, num_layers=1, hidden_scale=2.0,
        depformer_dim=128, depformer_num_heads=2, depformer_num_layers=2,
        depformer_dim_feedforward=128, card=128, text_card=64, n_q=8, dep_q=8,
        context=32, delays=(0,) * 9,
    )
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = {**params, "depformer": pad_codecformer_gating(params["depformer"])}
    ops = depformer_kernel_operands(model, params)
    assert ops is not None and ops["C"] == 128 and ops["S"] == 8
