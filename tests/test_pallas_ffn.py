"""Fused gated-FFN Pallas kernel: interpret-mode parity on CPU.

The kernel targets small-batch decode (HBM-bound weight streaming); on-TPU
wins are measured by bench probes, correctness is pinned here against the
jnp reference with identical f32 accumulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rstnet_tpu.ops.pallas_ffn import (
    gating_ffn_pallas,
    gating_ffn_pallas_int8,
    gating_ffn_reference,
)


def _quantize_rows(w):
    s = jnp.max(jnp.abs(w), axis=1) / 127.0
    return jnp.round(w / s[:, None]).astype(jnp.int8), s


def _weights(C, H, seed=1):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    wg = jax.random.normal(ks[0], (H, C)) * 0.02
    wv = jax.random.normal(ks[1], (H, C)) * 0.02
    wo = jax.random.normal(ks[2], (C, H)) * 0.02
    return wg, wv, wo


@pytest.mark.parametrize("B,C,H,block_h", [(1, 128, 256, 128), (4, 256, 768, 256)])
def test_ffn_kernel_matches_reference(B, C, H, block_h):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C), jnp.float32)
    wg, wv, wo = _weights(C, H)
    ref = gating_ffn_reference(x, wg, wv, wo)
    out = gating_ffn_pallas(x, wg, wv, wo, block_h=block_h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("step", [0, 3, 7])
def test_ffn_step_kernel_selects_step_weights(step):
    from rstnet_tpu.ops.pallas_ffn import gating_ffn_pallas_step

    B, C, H, S = 2, 128, 256, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C), jnp.float32)
    lin_in = jax.random.normal(jax.random.PRNGKey(1), (S, 2 * H, C)) * 0.02
    lin_out = jax.random.normal(jax.random.PRNGKey(2), (S, C, H)) * 0.02
    ref = gating_ffn_reference(
        x, lin_in[step, :H], lin_in[step, H:], lin_out[step]
    )
    out = gating_ffn_pallas_step(
        x, lin_in, lin_out, jnp.int32(step), block_h=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pad_codecformer_gating_preserves_step_output():
    from rstnet_tpu.modules.transformer import (
        StreamingTransformer,
        pad_codecformer_gating,
    )

    tr = StreamingTransformer(
        d_model=128, num_heads=2, num_layers=2, dim_feedforward=96,
        causal=True, gating="silu", positional_embedding="none",
        weights_per_step=4,
    )
    params = tr.init(jax.random.PRNGKey(0))
    padded = pad_codecformer_gating(params)
    H = params["layers"]["gating"]["linear_in"].shape[-2] // 2
    Hp = padded["layers"]["gating"]["linear_in"].shape[-2] // 2
    assert Hp % 128 == 0 and Hp > H
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 128))
    st1 = tr.init_state(2, dtype=jnp.float32)
    st2 = tr.init_state(2, dtype=jnp.float32)
    for _ in range(3):
        y1, st1 = tr.step(params, st1, x)
        y2, st2 = tr.step(padded, st2, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6, atol=1e-6)


def test_ffn_kernel_int8_matches_dequantized_reference():
    B, C, H = 2, 256, 512
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C), jnp.float32)
    wg, wv, wo = _weights(C, H)
    gq, gsc = _quantize_rows(wg)
    vq, vsc = _quantize_rows(wv)
    oq, osc = _quantize_rows(wo)
    ref = gating_ffn_reference(
        x,
        gq.astype(jnp.float32) * gsc[:, None],
        vq.astype(jnp.float32) * vsc[:, None],
        oq.astype(jnp.float32) * osc[:, None],
    )
    out = gating_ffn_pallas_int8(
        x, gq, gsc, vq, vsc, oq, osc, block_h=256, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
