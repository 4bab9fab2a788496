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
