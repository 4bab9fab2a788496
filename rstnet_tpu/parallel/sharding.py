"""Sharding rules: the spec IS the parallelism strategy.

Replaces the reference's FSDP/ZeRO wrapper classes (SURVEY §2.7): parameters
get NamedShardings over the ``(data, fsdp, tensor)`` mesh and XLA inserts the
all-gather / reduce-scatter pairs that FSDP and ZeRO-2 hand-coded.

* ``tensor`` — Megatron-style: column-parallel on up-projections (QKV, FFN
  in-proj, embeddings, heads), row-parallel on down-projections (attn out,
  FFN out), so each block needs one all-reduce per sublayer.
* ``expert`` — MoE expert stacks (``experts`` subtrees, leading axis = the
  expert index) shard that axis; the router/gate is replicated.
* ``fsdp``   — every weight additionally sharded on its largest remaining
  divisible axis.
* batch      — sharded over ``(data, fsdp)`` combined.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rstnet_tpu.core import Params

# path suffixes that are column-parallel (shard output dim = axis -2 of a
# [out, in] torch-layout weight) vs row-parallel (shard input dim = axis -1)
_COL_KEYS = ("attn", "fc", "fc_1", "fc_2", "in_proj", "linear_in", "linear1", "wte",
             "input_emb", "codecformer_text_emb", "codecformer_emb", "lm_head",
             "audio_linears", "codecformer_in", "input_proj", "gate")
_ROW_KEYS = ("proj", "out_proj", "linear_out", "linear2", "output_proj")


def _path_keys(path) -> list[str]:
    return [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]


def _spec_for(path, leaf, mesh: Mesh) -> P:
    keys = _path_keys(path)
    shape = np.shape(leaf)
    ndim = len(shape)
    spec: list[Any] = [None] * ndim
    tensor_size = mesh.shape.get("tensor", 1)
    fsdp_size = mesh.shape.get("fsdp", 1)

    if ndim == 0:
        return P()
    is_weight = bool(keys) and (
        keys[-1] in ("weight", "A", "B")
        or keys[-1] in (
            "input_emb", "codecformer_text_emb", "codecformer_emb",
            "codecformer_in", "wte", "embedding_sum",
        )
    )

    # pipe axis: layer-stacked block params ([L, ...]) shard the layer axis
    # so each pipeline stage holds its contiguous slice of layers
    pipe_size = mesh.shape.get("pipe", 1)
    if (
        pipe_size > 1 and "blocks" in keys and ndim >= 1
        and shape[0] % pipe_size == 0
    ):
        spec[0] = "pipe"

    # expert axis: MoE expert stacks shard their expert index. Per-expert
    # weights are [E, out, in] (plus a leading layer axis when blocks are
    # lax.scan-stacked), biases [E, out] — the expert axis sits just before
    # the linear dims.
    expert_size = mesh.shape.get("expert", 1)
    if expert_size > 1 and "experts" in keys:
        e_axis = ndim - 3 if keys[-1] == "weight" else ndim - 2
        if 0 <= e_axis and shape[e_axis] % expert_size == 0:
            spec[e_axis] = "expert"

    # tensor axis
    if tensor_size > 1 and is_weight and ndim >= 2:
        name = next((k for k in reversed(keys[:-1] if keys[-1] == "weight" else keys)
                     if k in _COL_KEYS + _ROW_KEYS), None)
        if keys[-1] == "B":
            axis = ndim - 2  # LoRA B rows follow the base out-dim
        elif keys[-1] == "A":
            axis = None  # LoRA A is tiny; replicate over tensor
        elif name in _ROW_KEYS:
            axis = ndim - 1
        elif name in _COL_KEYS or keys[-1] in _COL_KEYS:
            axis = ndim - 2
        else:
            axis = None
        if axis is not None and spec[axis] is None and shape[axis] % tensor_size == 0:
            spec[axis] = "tensor"

    # fsdp axis: largest remaining divisible dim
    if fsdp_size > 1 and ndim >= 1:
        order = sorted(range(ndim), key=lambda i: -shape[i])
        for axis in order:
            if spec[axis] is None and shape[axis] % fsdp_size == 0 and shape[axis] >= fsdp_size:
                spec[axis] = "fsdp"
                break
    return P(*spec)


def infer_param_shardings(mesh: Mesh, params: Params):
    """NamedSharding tree for a param (or optimizer-state) pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf, mesh)), params
    )


def shard_params(mesh: Mesh, params: Params) -> Params:
    return jax.device_put(params, infer_param_shardings(mesh, params))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch arrays: leading dim sharded over (data, fsdp) combined; the
    trailing (time) dim over ``seq`` when the mesh has a seq axis (context
    parallelism — activations then inherit the T sharding)."""
    spec: list[Any] = [("data", "fsdp")] + [None] * (ndim - 1)
    if ndim >= 2 and mesh.shape.get("seq", 1) > 1:
        spec[-1] = "seq"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
