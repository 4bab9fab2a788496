"""Flash attention for the training/prefill path via TPU splash kernels.

The reference relies on torch SDPA/Flash attention (``lit_model.py:328``,
``modules/transformer.py:409``); the TPU-native equivalent is the Pallas
splash-attention kernel: O(T) memory instead of materializing the
[B, H, T, T] logits, with the windowed-causal mask (context / sliding
window) expressed as a structured mask the kernel exploits to skip blocks.

Used for offline/training forwards when enabled and the shape qualifies
(TPU backend, no softcapping, seq length a multiple of the block size);
everything else falls back to the masked-einsum path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def splash_available() -> bool:
    return jax.default_backend() == "tpu"


def _make_kernel(T: int, n_heads: int, context: Optional[int], interpret: bool = False):
    # NOT cached across calls: this runs while the caller is being traced,
    # and the constructed kernel can capture values of that trace — an
    # lru_cache here leaks tracers into any later jit of the same shape
    # (seen as UnexpectedTracerError when a second train step is built).
    # The numpy mask-info preprocessing is O((T/block)^2) and happens once
    # per trace, so rebuilding is cheap.
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    if context is not None and context < T:
        mask = sm.LocalMask((T, T), window_size=(context - 1, 0), offset=0)
    else:
        mask = sm.CausalMask((T, T))
    mh = sm.MultiHeadMask([mask] * n_heads)
    return sk.make_splash_mha(mh, head_shards=1, q_seq_shards=1, interpret=interpret)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    context: Optional[int],
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    """q: [B, H, T, D]; k, v: [B, Hkv, T, D] (GQA repeat applied inside).
    Causal with optional window ``delta < context``. Returns [B, H, T, D].
    ``interpret=True`` runs the Pallas kernel in interpreter mode (CPU
    correctness testing only)."""
    B, H, T, D = q.shape
    if k.shape[1] != H:
        rep = H // k.shape[1]
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    kernel = _make_kernel(T, H, context, interpret)
    q = (q * scale).astype(q.dtype)

    def per_batch(qb, kb, vb):
        return kernel(qb, kb, vb)

    return jax.vmap(per_batch)(q, k, v)


def flash_qualifies(
    T: int, context: Optional[int], softcap: Optional[float], enabled: bool
) -> bool:
    """Static predicate: use the splash kernel for this attention call?"""
    return (
        enabled
        and splash_available()
        and softcap is None
        # default splash block size is 512; stick to multiples of it
        and T >= 512
        and T % 512 == 0
    )
