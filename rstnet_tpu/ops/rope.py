"""Rotary position embedding, offset-aware for streaming.

Parity with ``MLLM_v2/modules/rope.py:12-68``: interleaved (real, imag)
pairs along the head dim, rotation computed in float32, supports a traced
streaming offset. Also provides the litgpt-style half-split RoPE with
Llama-3.1 frequency adjustments for the backbone (``models/lit_model.py:
441-560``), which uses a different pairing convention.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def apply_rope_interleaved(
    q: jax.Array,
    k: jax.Array,
    offset: jax.Array | int,
    max_period: float = 10_000.0,
) -> tuple[jax.Array, jax.Array]:
    """RoPE over ``[B, H, T, D]`` with (real, imag) interleaved along D."""
    B, H, T, D = q.shape
    assert D % 2 == 0
    ds = jnp.arange(D // 2, dtype=jnp.float32)
    freqs = jnp.exp(ds * (-math.log(max_period) * 2 / D))
    ts = jnp.asarray(offset, jnp.float32) + jnp.arange(T, dtype=jnp.float32)
    angles = freqs[None, :] * ts[:, None]  # [T, D//2]
    rotr = jnp.cos(angles)
    roti = jnp.sin(angles)

    def rotate(x):
        xs = x.reshape(B, H, T, D // 2, 2)
        xr = xs[..., 0].astype(jnp.float32)
        xi = xs[..., 1].astype(jnp.float32)
        or_ = xr * rotr - xi * roti
        oi_ = xr * roti + xi * rotr
        out = jnp.stack([or_.astype(x.dtype), oi_.astype(x.dtype)], axis=-1)
        return out.reshape(B, H, T, D)

    return rotate(q), rotate(k)


def build_rope_cache(
    seq_len: int,
    n_elem: int,
    base: float = 10000.0,
    condense_ratio: int = 1,
    extra_config: Optional[dict] = None,
    positions: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """litgpt-style (cos, sin) cache ``[T, n_elem]``, with optional Llama-3.1
    frequency adjustment (``lit_model.py:441-489`` semantics)."""
    theta = 1.0 / (base ** (jnp.arange(0, n_elem, 2, dtype=jnp.float32) / n_elem))
    if extra_config is not None:
        orig_context = extra_config["original_max_seq_len"]
        factor = extra_config["factor"]
        low_freq_factor = extra_config["low_freq_factor"]
        high_freq_factor = extra_config["high_freq_factor"]
        wavelen = 2 * jnp.pi / theta
        ratio = orig_context / wavelen
        smooth = (ratio - low_freq_factor) / (high_freq_factor - low_freq_factor)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        adjusted = (1 - smooth) * theta / factor + smooth * theta
        theta = jnp.where(wavelen > orig_context / low_freq_factor, theta / factor, theta)
        theta = jnp.where(
            (wavelen <= orig_context / low_freq_factor)
            & (wavelen >= orig_context / high_freq_factor),
            adjusted,
            theta,
        )
    if positions is None:
        positions = jnp.arange(seq_len, dtype=jnp.float32)
    idx_theta = jnp.outer(positions / condense_ratio, theta)  # [T, n_elem/2]
    idx_theta = jnp.concatenate([idx_theta, idx_theta], axis=-1)
    return jnp.cos(idx_theta), jnp.sin(idx_theta)


def apply_rope_halved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """litgpt convention: rotate halves ``[-x2, x1]`` (``lit_model.py:560``).

    x: [B, H, T, D]; cos/sin: [T, D] (or broadcastable).
    """
    d = x.shape[-1]
    x1 = x[..., : d // 2]
    x2 = x[..., d // 2 :]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    y = x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin
    return y.astype(x.dtype)
