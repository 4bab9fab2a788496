"""Attention core: windowed-causal masked attention + ring KV cache.

Capability parity with the reference's streaming attention machinery
(``MLLM_v2/modules/transformer.py:198-419``): a fixed-capacity circular KV
buffer with position recovery (RingKVCache) giving O(context) memory for
unbounded streams, and an additive windowed-causal mask derived from
absolute positions. Pure functions over arrays; the ring write is a static-
shape scatter, so a jitted generation step compiles once (the XLA analogue
of the reference's CUDA-graphed step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def ring_positions(capacity: int, end: jax.Array) -> jax.Array:
    """Absolute time position of each ring slot; -1 for not-yet-written.

    ``end`` is the total number of steps written so far (after the current
    write). Role parity with reference ``RingKVCache.complete`` position
    recovery (``modules/transformer.py:254-277``), with one deliberate fix:
    the reference marks the slot at ``end % capacity`` as invalid even when
    it still holds the oldest in-window entry, so a full ring attends to
    ``capacity - 1`` past steps. Here every written slot keeps its true
    position — chunked streaming is exactly equal to the offline windowed
    mask for any sequence length.
    """
    idx = jnp.arange(capacity, dtype=jnp.int32)
    # Largest position p <= end-1 with p ≡ idx (mod capacity).
    wraps = (end - 1 - idx) // capacity
    pos = idx + wraps * capacity
    return jnp.where(idx >= end, -1, pos)


def ring_kv_buffers(shape: tuple, dtype=jnp.bfloat16, kv_int8: bool = False) -> dict:
    """Ring cache buffers of shape ``[..., capacity, dim_per_head]`` (extra
    leading axes — e.g. a stacked layer axis — are allowed). With
    ``kv_int8`` the K/V slabs are stored as int8 with a per-step scale —
    half the cache memory and half the attention HBM read per decode step;
    the dequantize fuses into the attention matmuls (``masked_attention``).
    The single constructor keeps the quantized-cache layout defined in ONE
    place for every streaming stack."""
    if kv_int8:
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(shape[:-1], jnp.bfloat16),
            "v_scale": jnp.zeros(shape[:-1], jnp.bfloat16),
        }
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def ring_kv_init(
    batch: int, heads: int, capacity: int, dim_per_head: int, dtype=jnp.bfloat16,
    kv_int8: bool = False,
) -> dict:
    return ring_kv_buffers((batch, heads, capacity, dim_per_head), dtype, kv_int8)


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-(…, step) symmetric int8 over the head dim: [..., T, D] ->
    (int8 [..., T, D], scale [..., T])."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def ring_kv_update(
    cache: dict, end: jax.Array, k_new: jax.Array, v_new: jax.Array
) -> tuple[dict, jax.Array, jax.Array]:
    """Write T new KV steps into the ring at ``(end + t) % capacity``.

    Returns (new_cache, positions[capacity], new_end). ``end`` is the count
    of steps written before this call.
    """
    T = k_new.shape[2]
    capacity = cache["k"].shape[2]
    if "k_scale" in cache:
        k_new, k_sc = quantize_kv(k_new)
        v_new, v_sc = quantize_kv(v_new)
    if T == 1:
        # decode hot path: one contiguous slot — dynamic_update_slice is an
        # in-place write, where a traced-index scatter costs ~100us/layer
        pos = (end % capacity).astype(jnp.int32)
        upd = lambda buf, new: jax.lax.dynamic_update_slice_in_dim(  # noqa: E731
            buf, new.astype(buf.dtype), pos, axis=2
        )
        new_cache = {"k": upd(cache["k"], k_new), "v": upd(cache["v"], v_new)}
        if "k_scale" in cache:
            new_cache["k_scale"] = upd(cache["k_scale"], k_sc)
            new_cache["v_scale"] = upd(cache["v_scale"], v_sc)
    else:
        idx = (jnp.arange(T, dtype=jnp.int32) + end) % capacity
        new_cache = {
            "k": cache["k"].at[:, :, idx, :].set(k_new.astype(cache["k"].dtype)),
            "v": cache["v"].at[:, :, idx, :].set(v_new.astype(cache["v"].dtype)),
        }
        if "k_scale" in cache:
            new_cache["k_scale"] = cache["k_scale"].at[:, :, idx].set(k_sc)
            new_cache["v_scale"] = cache["v_scale"].at[:, :, idx].set(v_sc)
    new_end = end + T
    return new_cache, ring_positions(capacity, new_end), new_end


def masked_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pos_q: jax.Array,
    pos_k: jax.Array,
    context: int | None,
    causal: bool = True,
    min_pos: jax.Array | None = None,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
) -> jax.Array:
    """Scaled dot-product attention with windowed-causal position mask.

    q: [B, H, Tq, D]; k, v: [B, Hkv, S, D]; pos_q: [Tq]; pos_k: [S].
    Softmax in float32. Supports GQA when Hkv divides H.

    ``min_pos`` (optional, [B] int32): per-batch-row floor on visible key
    positions — row b attends only keys with ``pos_k >= min_pos[b]``. This is
    the multi-session serving hook: when independent sessions share one
    batched decode step, a slot that joined later sets min_pos to the global
    position of its join, hiding ring-cache keys written by the slot's
    previous occupant without physically clearing any cache.

    ``k_scale``/``v_scale`` ([B, Hkv, S], optional): int8-KV mode — k/v hold
    int8 codes and these per-step scales. The dequantize never materializes
    a bf16 cache: the int8->bf16 convert fuses into each einsum's operand
    read, and the scales fold into the f32 logits / the attention weights.
    """
    B, H, Tq, D = q.shape
    Hkv = k.shape[1]
    scale = 1.0 / (D**0.5)
    # the session floor (and the pos_k >= 0 ring-validity mask it composes
    # with) only exists in the causal branch — a non-causal caller passing
    # min_pos would silently lose slot isolation
    assert min_pos is None or causal, "min_pos requires causal attention"
    # GQA via a grouped einsum: never materialize the repeated K/V (a
    # jnp.repeat would copy the whole ring cache H/Hkv x wider per layer —
    # hundreds of MB of pure HBM traffic per decode frame at context 3000)
    assert H % Hkv == 0
    g = H // Hkv
    qg = q.reshape(B, Hkv, g, Tq, D)
    logits = jnp.einsum(
        "bhgtd,bhsd->bhgts", qg, k.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    if k_scale is not None:
        logits = logits * k_scale.astype(jnp.float32)[:, :, None, None, :]
    if causal:
        delta = pos_q[:, None] - pos_k[None, :]
        mask = (pos_k[None, :] >= 0) & (delta >= 0)
        if context is not None:
            mask = mask & (delta < context)
        if min_pos is not None:
            bmask = mask[None] & (pos_k[None, None, :] >= min_pos[:, None, None])
            logits = jnp.where(bmask[:, None, None], logits, _NEG_INF)
        else:
            logits = jnp.where(mask[None, None, None], logits, _NEG_INF)
    att = jax.nn.softmax(logits, axis=-1)
    av_dtype = q.dtype if v_scale is not None else v.dtype
    att = att.astype(av_dtype)
    if v_scale is not None:
        att = att * v_scale.astype(av_dtype)[:, :, None, None, :]
    out = jnp.einsum("bhgts,bhsd->bhgtd", att, v.astype(av_dtype))
    return out.reshape(B, H, Tq, D)


def prefix_lm_mask(loss_mask: jax.Array, prefix_lm: bool = True) -> jax.Array:
    """Attention mask from a loss mask (parity:
    ``MLLM_v2/utils/train_utils.py:236-276``): loss_mask [B, T] bool marks
    one contiguous target segment; the prefix attends bidirectionally (when
    ``prefix_lm``), targets are causal over prefix+targets, and padding
    after the target segment is never *seen* as a key. Padding-position
    queries still attend causally (their outputs are discarded by the loss
    mask — same as the reference). Returns [B, T, T] bool."""
    B, T = loss_mask.shape
    axis = jnp.arange(T)
    big = jnp.asarray(1 << 30, jnp.int32)
    start = jnp.min(jnp.where(loss_mask, axis[None, :], big), axis=1)
    end = jnp.max(jnp.where(loss_mask, axis[None, :], -big), axis=1)
    causal = (axis[:, None] >= axis[None, :])[None].repeat(B, 0)
    mask = causal
    if prefix_lm:
        mask = jnp.where(start[:, None, None] > axis[None, None, :], True, mask)
    mask = jnp.where(end[:, None, None] < axis[None, None, :], False, mask)
    return mask


def multi_linear(weight: jax.Array, x: jax.Array, offset: jax.Array | int) -> jax.Array:
    """Per-time-step linear: different weights at each step.

    weight: [S, out, in]; x: [B, T, in]; step t uses ``weight[offset + t]``.
    Replaces the reference's Python loop (``modules/transformer.py:155-179``)
    with a gather + batched matmul that XLA maps onto the MXU.
    """
    T = x.shape[1]
    w = jnp.take(weight, jnp.asarray(offset) + jnp.arange(T), axis=0, mode="clip")
    return jnp.einsum("bti,toi->bto", x, w.astype(x.dtype))
