"""Sequence/context-parallel windowed attention (shard_map + ppermute).

TPU-native long-context training strategy. The reference scales context by
*architecture* — a windowed causal mask with ``context=3000`` frames
(``MLLM_v2/models/llama_streaming.py:985-991``) — but never shards one
sequence across devices (SURVEY §5 "Long-context"). Here the window makes
true context parallelism cheap: activations are sharded over the mesh's
``seq`` axis ([B, T, D] -> T/n per device), and since a query at global
position p only attends to keys in ``(p - context, p]``, each device needs
at most ``ceil((context-1)/T_local)`` left-neighbor KV blocks. Those arrive
via ``lax.ppermute`` rounds riding ICI — point-to-point neighbor traffic
instead of the all-gather of the full sequence that GSPMD would insert for
an unannotated attention.

With the canonical geometry (context 3000, local chunk >= 3000) that is ONE
ppermute of one KV block per layer; the arithmetic stays the same dense
MXU-friendly einsum as the single-device path, so stream == offline == CP
numerics (tests/test_context_parallel.py).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

_NEG_INF = float("-inf")


def _num_neighbor_blocks(t_local: int, context: Optional[int], n: int) -> int:
    """KV blocks to fetch from the left: enough to cover ``context-1`` past
    positions (all ``n-1`` for unwindowed causal attention)."""
    if context is None:
        return n - 1
    return min(n - 1, max(0, math.ceil((context - 1) / t_local)))


def _local_windowed_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    window: jax.Array,
    *,
    context: Optional[int],
    scale: float,
    softcap: Optional[float],
    axis_name: str,
) -> jax.Array:
    """Per-device body (runs inside shard_map): q/k/v are the local
    [B, H, T_local, D] chunks of a T-sharded sequence."""
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    B, H, Tl, D = q.shape
    ar = jnp.arange(Tl, dtype=jnp.int32)
    pos_q = i * Tl + ar

    nb = _num_neighbor_blocks(Tl, context, n)
    # Shift KV blocks rightward around the ring; after j rounds this device
    # holds the block of device i-j (wrapped blocks are masked via pos=-1).
    perm = [(s, (s + 1) % n) for s in range(n)]
    k_blocks, v_blocks, pos_blocks = [k], [v], [pos_q]
    kj, vj = k, v
    for j in range(1, nb + 1):
        kj = lax.ppermute(kj, axis_name, perm)
        vj = lax.ppermute(vj, axis_name, perm)
        base = i - j
        pos_blocks.append(jnp.where(base >= 0, base * Tl + ar, -1))
        k_blocks.append(kj)
        v_blocks.append(vj)
    # oldest block first, own block last
    ks = jnp.concatenate(k_blocks[::-1], axis=2)
    vs = jnp.concatenate(v_blocks[::-1], axis=2)
    pos_k = jnp.concatenate(pos_blocks[::-1])

    logits = jnp.einsum(
        "bhtd,bhsd->bhts", q, ks, preferred_element_type=jnp.float32
    ) * scale
    if softcap is not None:
        logits = jnp.tanh(logits / softcap) * softcap
    delta = pos_q[:, None] - pos_k[None, :]
    mask = (pos_k[None, :] >= 0) & (delta >= 0)
    if context is not None:
        mask = mask & (delta < context)
    mask = mask & ((window <= 0) | (delta < window))
    logits = jnp.where(mask[None, None], logits, _NEG_INF)
    att = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", att.astype(vs.dtype), vs)


def context_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    context: Optional[int],
    scale: Optional[float] = None,
    softcap: Optional[float] = None,
    window: jax.Array | int = 0,
    mesh=None,
    axis_name: str = "seq",
) -> jax.Array:
    """Windowed-causal attention over a sequence sharded on ``axis_name``.

    q: [B, H, T, D]; k/v: [B, H, T, D] (GQA heads must be pre-repeated).
    ``window`` is an optional per-layer sliding-window scalar (0 = none),
    applied on top of the static ``context`` window. Differentiable
    (ppermute transposes to the reverse permutation). Other mesh axes stay
    automatic, so this composes with dp/fsdp/tp shardings.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    spec = P(None, None, axis_name, None)
    f = jax.shard_map(
        functools.partial(
            _local_windowed_attention,
            context=context, scale=scale, softcap=softcap, axis_name=axis_name,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec, P()),
        out_specs=spec,
        axis_names={axis_name},
    )
    return f(q, k, v, jnp.asarray(window, jnp.int32))


def seq_axis_size(mesh=None) -> int:
    """Size of the ambient (or given) mesh's ``seq`` axis; 1 if absent."""
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not getattr(mesh, "shape_tuple", None):
        return 1
    return dict(mesh.shape_tuple).get("seq", 1)
