"""Device mesh construction.

The single mechanism replacing the reference's NCCL process groups, DDP,
FSDP and DeepSpeed ZeRO wrappers (SURVEY §2.7): one
``jax.sharding.Mesh`` with named axes

* ``data``   — data parallelism (gradients pmean over ICI)
* ``pipe``   — pipeline parallelism: layer-stacked block params shard their
               leading layer axis; microbatches flow stage-to-stage via
               ppermute (``parallel/pipeline.py``)
* ``seq``    — sequence/context parallelism: long-sequence activations are
               sharded over time; windowed causal attention exchanges one
               boundary KV block per step (``ops/context_parallel.py``)
* ``fsdp``   — parameter/optimizer-state sharding (ZeRO-3 equivalent;
               XLA inserts the all-gather/reduce-scatter pairs)
* ``expert`` — expert parallelism: MoE expert weights sharded over their
               leading expert axis
* ``tensor`` — tensor parallelism for the backbone matmuls

Axis order is device-layout order: ``tensor`` innermost (needs the fastest
ICI links), ``data`` outermost (tolerates DCN on multislice).

Multi-host: call ``jax.distributed.initialize()`` first (the torchrun
replacement); the same mesh then spans all processes over ICI/DCN.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "pipe", "seq", "fsdp", "expert", "tensor")


def make_mesh(
    shape: Optional[dict[str, int]] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    axes: Sequence[str] = AXES,
) -> Mesh:
    """Build a mesh over all (or given) devices.

    ``shape`` maps axis name -> size; missing axes default to 1, and a single
    ``-1`` axis absorbs the remaining devices (like a reshape). With no shape
    at all, everything goes to ``fsdp`` — the ZeRO-like default that matches
    the reference's FSDP full-shard training.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = {"fsdp": -1}
    sizes = [shape.get(a, 1) for a in axes]
    if -1 in sizes:
        known = math.prod(s for s in sizes if s != -1)
        if n % known != 0:
            raise ValueError(
                f"mesh shape {shape} needs a multiple of {known} devices but "
                f"{n} are visible; adjust the shape or provision more devices "
                f"(for CPU testing: XLA_FLAGS=--xla_force_host_platform_"
                f"device_count=<n> JAX_PLATFORMS=cpu before importing jax)"
            )
        sizes[sizes.index(-1)] = n // known
    if math.prod(sizes) != n:
        raise ValueError(
            f"mesh {dict(zip(axes, sizes))} covers {math.prod(sizes)} devices "
            f"but {n} are visible ({[d.platform for d in devices[:4]]}...). "
            f"Pass a shape whose product equals the device count, use -1 for "
            f"one axis to absorb the remainder, or provision virtual devices "
            f"with XLA_FLAGS=--xla_force_host_platform_device_count=<n> "
            f"JAX_PLATFORMS=cpu before importing jax."
        )
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(axes))


def initialize_distributed(**kwargs) -> None:
    """Multi-host rendezvous (replaces torchrun env:// init,
    ``pre_training_full.py:61``). No-op on a single process."""
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        pass  # already initialized or single-process
