"""Pipeline parallelism: GPipe-style SPMD pipeline over a ``pipe`` mesh axis.

Beyond reference parity (SURVEY §2.7 marks PP "not implemented"): the
backbone's layer loop is already a ``lax.scan`` over layer-stacked params,
so pipelining is a layout change, not a model change — the layer axis
shards over ``pipe`` (each stage holds ``n_layer / P`` contiguous layers)
and microbatches flow stage-to-stage through ``lax.ppermute``. The whole
schedule is one jitted SPMD program: at step t, stage s runs microbatch
``t - s`` through its local layer stack and hands the activation to stage
s+1 over ICI. Bubble fraction is ``(P-1)/(M+P-1)`` — raise the microbatch
count M to amortize. Gradients come from autodiff through the schedule
(the transpose runs the reverse schedule; ppermute transposes to the
reversed edges).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P


def pipe_axis_size(mesh=None) -> int:
    """Size of the ambient (or given) mesh's ``pipe`` axis; 1 if absent."""
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not getattr(mesh, "shape_tuple", None):
        return 1
    return dict(mesh.shape_tuple).get("pipe", 1)


def spmd_pipeline(
    body: Callable[[jax.Array, Any], tuple[jax.Array, Any]],
    x: jax.Array,
    layer_xs: Any,
    *,
    n_stages: int,
    n_micro: int,
    axis_name: str = "pipe",
    mesh=None,
) -> jax.Array:
    """Run a scan-over-layers body as a GPipe pipeline over ``axis_name``.

    body: the ``lax.scan`` layer body ``(h, layer_input) -> (h, _)`` —
    exactly the body the single-device path scans, unchanged.
    x: [B, T, D] activations (B divisible by ``n_micro``).
    layer_xs: pytree of per-layer inputs with a leading layer axis [L, ...]
    (stacked block params, per-layer windows, dropout keys); sharded over
    ``axis_name`` so each stage holds L/P layers.
    Returns [B, T, D], replicated over the pipe axis (one psum at the end).
    Other mesh axes (data/fsdp/tensor/...) stay automatic.
    """
    B = x.shape[0]
    assert B % n_micro == 0, (B, n_micro)
    x_micro = x.reshape(n_micro, B // n_micro, *x.shape[1:])

    def inner(x_micro, local_xs):
        stage = lax.axis_index(axis_name)
        fwd = [(i, i + 1) for i in range(n_stages - 1)]

        def t_step(buf, t):
            inp = lax.dynamic_index_in_dim(
                x_micro, jnp.minimum(t, n_micro - 1), 0, keepdims=False
            )
            h = jnp.where(stage == 0, inp, buf)
            h, _ = lax.scan(body, h, local_xs)
            # hand to the next stage; stage 0 receives zeros (unused)
            nxt = lax.ppermute(h, axis_name, fwd) if n_stages > 1 else h
            return nxt, h

        init = jnp.zeros_like(x_micro[0])
        # mark the carry as varying over the pipe axis (each stage holds a
        # different in-flight microbatch), matching the loop output's type
        init = lax.pcast(init, (axis_name,), to="varying")
        _, hs = lax.scan(t_step, init, jnp.arange(n_micro + n_stages - 1))
        # the last stage's outputs for t in [P-1, P-1+M) are microbatches 0..M-1
        outs = lax.dynamic_slice_in_dim(hs, n_stages - 1, n_micro, axis=0)
        outs = jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs))
        return lax.psum(outs, axis_name)

    out = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(),
        axis_names={axis_name},
    )(x_micro, layer_xs)
    return out.reshape(B, *x.shape[1:])
