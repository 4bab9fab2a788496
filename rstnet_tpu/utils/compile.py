"""Compilation & memory policy helpers.

Capability parity with ``MLLM_v2/utils/compile.py`` (torch_compile_lazy,
simple_checkpoint, CUDAGraphed) and ``utils/autocast.py``, in their XLA
forms: ``jax.jit`` is graph capture, ``jax.checkpoint`` with a named policy
is activation checkpointing, and a dtype policy replaces autocast. Env vars
mirror the reference's escape hatches (NO_JAX_JIT ~ NO_TORCH_COMPILE /
NO_CUDA_GRAPH).
"""

from __future__ import annotations

import os
from functools import wraps
from typing import Callable

import jax
import numpy as np
import jax.numpy as jnp

from rstnet_tpu.core import cast_floating


def jit_lazy(fn: Callable, **jit_kwargs) -> Callable:
    """jit unless NO_JAX_JIT=1 (the reference's NO_TORCH_COMPILE escape)."""
    if os.environ.get("NO_JAX_JIT", "0") == "1":
        return fn
    return jax.jit(fn, **jit_kwargs)


REMAT_POLICIES = {
    # recompute everything in backward: minimal memory
    "full": None,
    # keep matmul outputs (good default for transformer blocks)
    "dots": jax.checkpoint_policies.checkpoint_dots,
    # keep matmul outputs except when flowing into attention
    "dots_no_batch": jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
    # save nothing that can be recomputed cheaply, offload nothing
    "nothing_saveable": jax.checkpoint_policies.nothing_saveable,
}


def simple_checkpoint(fn: Callable, policy: str = "dots") -> Callable:
    """Activation checkpointing (reference ``Checkpoint``/``simple_checkpoint``
    ``utils/compile.py:57-120``): trades FLOPs for HBM under jit."""
    return jax.checkpoint(fn, policy=REMAT_POLICIES[policy])


class DtypePolicy:
    """bf16-true policy (reference trains bf16 with f32 norms): cast params
    and inputs to ``compute_dtype``; norms internally compute in f32."""

    def __init__(self, compute_dtype=jnp.bfloat16):
        self.compute_dtype = compute_dtype

    def cast_params(self, params):
        return cast_floating(params, self.compute_dtype)

    def cast_inputs(self, *args):
        out = tuple(
            a.astype(self.compute_dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a
            for a in args
        )
        return out if len(out) > 1 else out[0]


def graph_step(fn: Callable, donate_state: bool = True) -> Callable:
    """The CUDA-graph replacement: one jitted step with donated state
    buffers — traced once, replayed with no host-side graph rebuilding
    (reference ``CUDAGraphed`` ``utils/compile.py:189-277``)."""
    return jit_lazy(fn, donate_argnums=(1,) if donate_state else ())


def profile_trace(log_dir: str):
    """jax.profiler context for trace capture (replaces the reference's
    wall-clock-only timers with real device traces, SURVEY §5)."""
    return jax.profiler.trace(log_dir)


def decode_layer_unroll(n_layers: int, kv_cache, chunk_len: int) -> int:
    """Full-or-rolled layer-scan unroll for decode steps.

    Unrolling the layer loop lets XLA prefetch each layer's weights during
    the previous layer's compute (a measured decode-latency win at B=1),
    but every unrolled ring-cache update materializes a COPY of that
    layer's whole [B, H, capacity, head_dim] K/V slab as an HLO temp — at
    8B serving scale (context 3000) a fully unrolled 32-layer step carries
    ~4.5 GB of such temps at B=24 and fails HBM buffer assignment, while
    B=1 costs only ~200 MB and B=16 (~3 GB) still fits. PARTIAL unroll is
    never used: a while loop whose body re-updates slices of the carried
    stacked cache crashes the TPU compile helper outright (measured
    2026-08-19 at 8B for unroll 5/7/10). So: FULL unroll when the total
    slab-copy cost fits ``RSTNET_UNROLL_TEMP_BUDGET`` bytes (default
    4 GiB), otherwise a fully rolled scan whose carry aliases in place.
    CPU always rolls (unroll only multiplies compile time there).
    """
    if chunk_len > 8 or jax.default_backend() != "tpu":
        return 1
    k = kv_cache["k"]  # [L, B, H, cap, hd]
    per_layer = 2 * int(np.prod(k.shape[1:])) * k.dtype.itemsize
    budget = int(os.environ.get("RSTNET_UNROLL_TEMP_BUDGET", 4 << 30))
    return n_layers if n_layers * per_layer <= budget else 1
