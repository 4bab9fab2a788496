"""Splash (flash) attention parity vs the masked-einsum reference path,
run in Pallas interpreter mode so it's testable on CPU. The same kernel
(compiled, interpret=False) serves the TPU training forwards
(``rstnet_tpu/models/backbone.py`` routes through it when the shape
qualifies; reference analogue: torch SDPA at ``lit_model.py:328``)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rstnet_tpu.ops.flash_attention import flash_attention, flash_qualifies


def _reference(q, k, v, context, scale):
    """Windowed-causal softmax attention (the backbone fallback path)."""
    H, Hkv = q.shape[1], k.shape[1]
    if Hkv != H:
        k = jnp.repeat(k, H // Hkv, axis=1)
        v = jnp.repeat(v, H // Hkv, axis=1)
    T = q.shape[2]
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32) * scale
    pos = jnp.arange(T)
    delta = pos[:, None] - pos[None, :]
    mask = delta >= 0
    if context is not None:
        mask = mask & (delta < context)
    logits = jnp.where(mask[None, None], logits, float("-inf"))
    att = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", att.astype(v.dtype), v)


@pytest.mark.parametrize("context", [None, 256])
def test_splash_matches_reference(context):
    B, H, T, D = 1, 2, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, T, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, T, D), jnp.float32)
    scale = 1.0 / math.sqrt(D)
    out = flash_attention(q, k, v, context, scale, interpret=True)
    ref = _reference(q, k, v, context, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_splash_gqa_repeat():
    B, H, Hkv, T, D = 1, 4, 2, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, H, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, T, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, T, D), jnp.float32)
    scale = 1.0 / math.sqrt(D)
    out = flash_attention(q, k, v, None, scale, interpret=True)
    ref = _reference(q, k, v, None, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_flash_qualifies_predicate():
    on_tpu = jax.default_backend() == "tpu"
    # only multiples of the 512 block size, no softcap, enabled, TPU backend
    assert flash_qualifies(1024, 3000, None, True) == on_tpu
    assert not flash_qualifies(640, 3000, None, True)   # not a block multiple
    assert not flash_qualifies(1024, 3000, 50.0, True)  # softcapping unsupported
    assert not flash_qualifies(1024, 3000, None, False)
    assert not flash_qualifies(256, 3000, None, True)   # below one block
