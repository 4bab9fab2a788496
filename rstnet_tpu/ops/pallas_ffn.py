"""Pallas TPU kernel: fused gated-FFN GEMV chain for small-batch decode.

The batch-1..64 decode step is HBM-bandwidth bound on *weight* reads; the
gated FFN (``ops/gating.py``; reference ``MLLM_v2/modules/gating.py:24-82``)
is the largest weight chunk of both the backbone layer and the depformer
micro-step (~2/3 of per-layer bytes at moshi shapes). XLA executes it as
three separate GEMV kernels with an HBM round-trip for the [B, H] hidden
activations; this kernel streams each weight tile exactly once and keeps the
activations and the [B, C] output accumulator in VMEM:

    out = (act(x @ Wg^T) * (x @ Wv^T)) @ Wo^T

with the grid over hidden-dim blocks so Pallas double-buffers the next
block's three weight tiles behind the current block's compute. The weights
are three separate arrays (backbone LLaMAMLP fc_1/fc_2/proj layout); for the
gating-module layout ([2H, C] stacked ``linear_in``), split once at
serving-prep time — slicing per call would copy in HBM and defeat the
purpose. An int8 variant takes per-row-quantized weights and dequantizes
tiles in VMEM (half the HBM traffic — the whole point of int8 serving).

Constraints: H and C must be multiples of 128 (TPU lane width); choose
``block_h`` dividing H. Opt-in on TPU via RSTNET_PALLAS_FFN=1 (this
environment's remote Mosaic compiles take minutes; correctness is covered in
interpret mode on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rstnet_tpu.ops.gating import get_activation


def _pick_block_h(H: int, target: int = 512) -> int:
    """Largest multiple of 128 that divides H and is <= target."""
    best = 0
    for k in range(1, H // 128 + 1):
        b = 128 * k
        if H % b == 0 and b <= target:
            best = b
    if best == 0:
        raise ValueError(f"hidden dim {H} must be a multiple of 128")
    return best


def _ffn_kernel(x_ref, wg_ref, wv_ref, wo_ref, out_ref, acc, *, activation):
    h = pl.program_id(0)

    @pl.when(h == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[:].astype(jnp.float32)  # [B, C]
    wg = wg_ref[:].astype(jnp.float32)  # [bh, C]
    wv = wv_ref[:].astype(jnp.float32)
    a = jax.lax.dot_general(
        x, wg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [B, bh]
    b = jax.lax.dot_general(
        x, wv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    hid = get_activation(activation)(a) * b
    wo = wo_ref[:].astype(jnp.float32)  # [C, bh]
    acc[:] = acc[:] + jax.lax.dot_general(
        hid, wo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(h == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc[:].astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("activation", "block_h", "interpret"))
def gating_ffn_pallas(
    x: jax.Array,
    w_gate: jax.Array,
    w_val: jax.Array,
    w_out: jax.Array,
    activation: str = "silu",
    block_h: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Fused ``(act(x@Wg.T) * (x@Wv.T)) @ Wo.T`` for decode-sized batches.

    x: [B, C]; w_gate/w_val: [H, C]; w_out: [C, H]. Returns [B, C].
    ``block_h=0`` picks the largest multiple of 128 dividing H (<=512).
    """
    B, C = x.shape
    H, C2 = w_gate.shape
    assert C2 == C and w_val.shape == (H, C) and w_out.shape == (C, H)
    if not block_h:
        block_h = _pick_block_h(H)
    assert H % block_h == 0, (H, block_h)
    n_blocks = H // block_h

    return pl.pallas_call(
        partial(_ffn_kernel, activation=activation),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((B, C), lambda h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, C), lambda h: (h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, C), lambda h: (h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, block_h), lambda h: (0, h), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, C), lambda h: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, w_gate, w_val, w_out)


def _ffn_int8_kernel(
    x_ref, wg_ref, gs_ref, wv_ref, vs_ref, wo_ref, os_ref, out_ref, acc, *, activation
):
    h = pl.program_id(0)

    @pl.when(h == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[:].astype(jnp.float32)
    # int8 tiles dequantized in VMEM: per-row scales for Wg/Wv ([bh, 1]),
    # per-row (output-channel) scales for Wo ([C, 1])
    wg = wg_ref[:].astype(jnp.float32) * gs_ref[:].astype(jnp.float32)
    wv = wv_ref[:].astype(jnp.float32) * vs_ref[:].astype(jnp.float32)
    a = jax.lax.dot_general(
        x, wg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    b = jax.lax.dot_general(
        x, wv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    hid = get_activation(activation)(a) * b
    wo = wo_ref[:].astype(jnp.float32) * os_ref[:].astype(jnp.float32)
    acc[:] = acc[:] + jax.lax.dot_general(
        hid, wo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(h == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc[:].astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("activation", "block_h", "out_dtype", "interpret"))
def gating_ffn_pallas_int8(
    x: jax.Array,
    w_gate_q: jax.Array,
    gate_scale: jax.Array,
    w_val_q: jax.Array,
    val_scale: jax.Array,
    w_out_q: jax.Array,
    out_scale: jax.Array,
    activation: str = "silu",
    block_h: int = 0,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """int8-weight variant: w_gate_q/w_val_q [H, C] int8 with per-row scales
    [H] (or [H, 1]); w_out_q [C, H] int8 with per-row scale [C] (or [C, 1]).
    Returns [B, C]."""
    B, C = x.shape
    H, _ = w_gate_q.shape
    if not block_h:
        block_h = _pick_block_h(H)
    assert H % block_h == 0, (H, block_h)
    n_blocks = H // block_h
    out_dtype = out_dtype or x.dtype
    gs = gate_scale.reshape(H, 1)
    vs = val_scale.reshape(H, 1)
    os_ = out_scale.reshape(C, 1)

    return pl.pallas_call(
        partial(_ffn_int8_kernel, activation=activation),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((B, C), lambda h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, C), lambda h: (h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, 1), lambda h: (h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, C), lambda h: (h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, 1), lambda h: (h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, block_h), lambda h: (0, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, C), lambda h: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C), out_dtype),
        scratch_shapes=[pltpu.VMEM((B, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, w_gate_q, gs, w_val_q, vs, w_out_q, os_)


def _ffn_step_kernel(s_ref, x_ref, wg_ref, wv_ref, wo_ref, out_ref, acc, *, activation):
    del s_ref  # only used by the index maps
    h = pl.program_id(0)

    @pl.when(h == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[:].astype(jnp.float32)  # [B, C]
    wg = wg_ref[0].astype(jnp.float32)  # [bh, C]
    wv = wv_ref[0].astype(jnp.float32)
    a = jax.lax.dot_general(
        x, wg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    b = jax.lax.dot_general(
        x, wv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    hid = get_activation(activation)(a) * b
    wo = wo_ref[0].astype(jnp.float32)  # [C, bh]
    acc[:] = acc[:] + jax.lax.dot_general(
        hid, wo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(h == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc[:].astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("activation", "block_h", "interpret"))
def gating_ffn_pallas_step(
    x: jax.Array,
    lin_in: jax.Array,
    lin_out: jax.Array,
    step: jax.Array,
    activation: str = "silu",
    block_h: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Per-step-weight fused FFN for the depformer micro-step.

    x: [B, C]; lin_in: [S, 2H, C] (each step's gating ``linear_in``, gate
    rows then value rows); lin_out: [S, C, H]; step: int32 scalar selecting
    the micro-step's weight slice. The step index is a scalar-prefetch
    operand, so the kernel DMAs only the selected slice — no HBM gather or
    copy of the [S, ...] stacks (the XLA path's ``jnp.take``).
    """
    B, C = x.shape
    S, H2, C2 = lin_in.shape
    assert C2 == C and H2 % 2 == 0
    H = H2 // 2
    assert lin_out.shape == (S, C, H)
    if not block_h:
        block_h = _pick_block_h(H)
    assert H % block_h == 0, (H, block_h)
    n_blocks = H // block_h
    val_off = n_blocks  # value rows start at block index H/block_h in lin_in
    step = jnp.clip(jnp.asarray(step, jnp.int32), 0, S - 1).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((B, C), lambda h, s: (0, 0)),
            pl.BlockSpec((1, block_h, C), lambda h, s: (s[0], h, 0)),
            pl.BlockSpec((1, block_h, C), lambda h, s: (s[0], h + val_off, 0)),
            pl.BlockSpec((1, C, block_h), lambda h, s: (s[0], 0, h)),
        ],
        out_specs=pl.BlockSpec((B, C), lambda h, s: (0, 0)),
        scratch_shapes=[pltpu.VMEM((B, C), jnp.float32)],
    )
    return pl.pallas_call(
        partial(_ffn_step_kernel, activation=activation),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(step, x, lin_in, lin_in, lin_out)


def use_pallas_ffn() -> bool:
    """Opt-in gate for the fused decode FFN (RSTNET_PALLAS_FFN=1, TPU only)."""
    import os

    return (
        jax.default_backend() == "tpu"
        and os.environ.get("RSTNET_PALLAS_FFN", "0") == "1"
    )


def gating_ffn_reference(
    x: jax.Array,
    w_gate: jax.Array,
    w_val: jax.Array,
    w_out: jax.Array,
    activation: str = "silu",
) -> jax.Array:
    """jnp reference with the same f32 accumulation as the kernel."""
    xf = x.astype(jnp.float32)
    gate = xf @ w_gate.astype(jnp.float32).T
    val = xf @ w_val.astype(jnp.float32).T
    out = (get_activation(activation)(gate) * val) @ w_out.astype(jnp.float32).T
    return out.astype(x.dtype)
