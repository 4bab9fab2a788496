"""Pallas TPU kernel: fused residual-VQ nearest-neighbor encode.

The codec's offline tokenization hot path (SURVEY §3.5: 48-way parallel
tokenization jobs) runs Q sequential nearest-neighbor searches over 2048-entry
codebooks. The XLA version materializes a [N, K] distance matrix in HBM per
level; this kernel keeps the residual, distances and the one-hot gather in
VMEM across levels: the grid is (n_blocks, Q) with the level axis innermost,
so Pallas double-buffers each level's codebook from HBM behind the previous
level's compute, and the residual/accumulator live in VMEM scratch for the
whole level sweep.

Falls back to the jnp path off-TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rvq_encode_kernel(x_ref, cb_ref, codes_ref, quant_ref, residual, acc, codes_acc):
    q = pl.program_id(1)
    n_q = pl.num_programs(1)

    @pl.when(q == 0)
    def _():
        residual[:] = x_ref[:].astype(jnp.float32)
        acc[:] = jnp.zeros_like(acc)
        codes_acc[:] = jnp.zeros_like(codes_acc)

    emb = cb_ref[0].astype(jnp.float32)  # [K, D]
    r = residual[:]
    dots = jax.lax.dot_general(
        r, emb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BN, K]
    e_sq = jnp.sum(emb * emb, axis=1)
    dist = e_sq[None, :] - 2.0 * dots
    # manual argmin: Mosaic's cross-lane argmin lowering blows VMEM; two
    # min-reductions + a select are cheap and keep torch's first-index
    # tie-breaking
    lane = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    min_val = jnp.min(dist, axis=1, keepdims=True)
    big = jnp.int32(dist.shape[1])
    idx = jnp.min(jnp.where(dist <= min_val, lane, big), axis=1).astype(jnp.int32)
    # dynamic-lane writes aren't Mosaic-friendly: select into the scratch
    # accumulator, flush the whole [BN, Q] block on the last level
    q_iota = jax.lax.broadcasted_iota(jnp.int32, codes_acc.shape, 1)
    codes_acc[:] = jnp.where(q_iota == q, idx[:, None], codes_acc[:])
    one_hot = (lane == idx[:, None]).astype(jnp.float32)
    quant = jax.lax.dot_general(
        one_hot, emb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    residual[:] = r - quant
    acc[:] = acc[:] + quant

    @pl.when(q == n_q - 1)
    def _():
        codes_ref[:] = codes_acc[:]
        quant_ref[:] = acc[:].astype(quant_ref.dtype)


@partial(jax.jit, static_argnames=("block_n",))
def rvq_encode_pallas(
    x: jax.Array, codebooks: jax.Array, block_n: int = 256
) -> tuple[jax.Array, jax.Array]:
    """x: [N, D] residual-quantize against codebooks [Q, K, D].

    Returns (codes [N, Q] int32, quantized [N, D]). N is padded to block_n
    internally.
    """
    N, D = x.shape
    Q, K, _ = codebooks.shape
    pad = (-N) % block_n
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    n_blocks = (N + pad) // block_n

    codes, quant = pl.pallas_call(
        _rvq_encode_kernel,
        grid=(n_blocks, Q),
        in_specs=[
            pl.BlockSpec((block_n, D), lambda i, q: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, D), lambda i, q: (q, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_n, Q), lambda i, q: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, D), lambda i, q: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N + pad, Q), jnp.int32),
            jax.ShapeDtypeStruct((N + pad, D), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_n, D), jnp.float32),
            pltpu.VMEM((block_n, D), jnp.float32),
            pltpu.VMEM((block_n, Q), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(xp, codebooks)
    return codes[:N], quant[:N]


def rvq_encode(
    x: jax.Array, codebooks: jax.Array, use_pallas: bool | None = None
) -> tuple[jax.Array, jax.Array]:
    """Residual-VQ encode with kernel selection.

    The Pallas kernel is validated in interpreter mode (tests) but currently
    opt-in via RSTNET_PALLAS_RVQ=1: this environment's remote Mosaic compiles
    of the kernel take pathologically long, and the XLA path already encodes
    at ~2000x real time. Revisit with local compilation.
    """
    if use_pallas is None:
        import os

        use_pallas = (
            jax.default_backend() == "tpu"
            and os.environ.get("RSTNET_PALLAS_RVQ", "0") == "1"
        )
    if use_pallas:
        return rvq_encode_pallas(x, codebooks)
    # jnp fallback (same math)
    Q = codebooks.shape[0]
    residual = x.astype(jnp.float32)
    total = jnp.zeros_like(residual)
    codes = []
    for q in range(Q):
        emb = codebooks[q].astype(jnp.float32)
        dist = jnp.sum(emb**2, 1)[None] - 2.0 * residual @ emb.T
        idx = jnp.argmin(dist, 1)
        quant = jnp.take(emb, idx, axis=0)
        codes.append(idx.astype(jnp.int32))
        residual = residual - quant
        total = total + quant
    return jnp.stack(codes, -1), total.astype(x.dtype)
