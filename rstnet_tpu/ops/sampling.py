"""Token sampling: temperature, top-k, top-p, audio-vocab clamping.

Capability parity with ``MLLM_v2/utils/sampling.py`` (multinomial:15,
sample_top_k:51, sample_top_p:66, sample_token:85, audio-clamped variants
:107-154). Pure functions over explicit PRNG keys; multinomial uses the
Gumbel trick (``jax.random.categorical``), the jit-native equivalent of the
reference's no-sync exponential trick.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def sample_top_k(key: jax.Array, probs: jax.Array, k: int, approx: bool = True) -> jax.Array:
    """Top-k sampling. On TPU, ``jax.lax.approx_max_k`` avoids the full-sort
    top-k over large vocabularies (recall 0.99 at these k) — a measurable
    per-frame latency win in the generation step."""
    k = min(k, probs.shape[-1])
    if approx and probs.shape[-1] >= 4 * k:
        top_probs, top_idx = jax.lax.approx_max_k(probs, k, recall_target=0.99)
    else:
        top_probs, top_idx = jax.lax.top_k(probs, k)
    choice = jax.random.categorical(key, jnp.log(jnp.maximum(top_probs, 1e-30)))
    return jnp.take_along_axis(top_idx, choice[..., None], axis=-1)[..., 0]


def sample_top_p(key: jax.Array, probs: jax.Array, p: float) -> jax.Array:
    sort_idx = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, sort_idx, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep = cum - sorted_probs <= p
    masked = jnp.where(keep, sorted_probs, 0.0)
    choice = jax.random.categorical(key, jnp.log(jnp.maximum(masked, 1e-30)))
    return jnp.take_along_axis(sort_idx, choice[..., None], axis=-1)[..., 0]


def sample_token(
    key: jax.Array,
    logits: jax.Array,
    use_sampling: bool = True,
    temp: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    max_card: int | None = None,
) -> jax.Array:
    """logits [*, Card] -> tokens [*]. ``max_card`` bans ids >= max_card
    (the reference's sample_token_audio/_2048 special-token exclusion)."""
    logits = logits.astype(jnp.float32)
    if max_card is not None:
        card = logits.shape[-1]
        valid = jnp.arange(card) < max_card
        logits = jnp.where(valid, logits, _NEG_INF)
    if not use_sampling or temp <= 0.0:
        return jnp.argmax(logits, axis=-1)
    if top_p > 0.0:
        return sample_top_p(key, jax.nn.softmax(logits / temp, axis=-1), top_p)
    if top_k > 0:
        # top-k on logits THEN softmax over k: identical distribution to
        # softmax-then-top-k-renormalize, without a full-vocab softmax
        k = min(top_k, logits.shape[-1])
        if logits.shape[-1] >= 4 * k:
            top_logits, top_idx = jax.lax.approx_max_k(logits, k, recall_target=0.99)
        else:
            top_logits, top_idx = jax.lax.top_k(logits, k)
        choice = jax.random.categorical(key, top_logits / temp)
        return jnp.take_along_axis(top_idx, choice[..., None], axis=-1)[..., 0]
    return jax.random.categorical(key, logits / temp)
