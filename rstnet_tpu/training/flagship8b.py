"""Flagship-scale (8B) PEFT training construction.

The reference's flagship recipe trains a **Llama-3.1-8B** backbone with LoRA
at batch_scale 2500 tokens/GPU on A100-class hardware
(``MLLM_v2/egs/pretraining/run.sh:141``, ``utils/dataloader.py:173``,
``trainer/pre_training_lora.py``). On one 16 GB TPU v5e chip the same
fine-tune fits by holding the frozen backbone in weight-only int8
(:func:`rstnet_tpu.models.backbone.quantize_backbone_int8`) and training
only the LoRA overlay + the new speech modules (codecformer, audio
embeddings/heads) — the partitioned PEFT step
(:func:`rstnet_tpu.training.train_step.make_peft_train_step`) never
differentiates the frozen tree, so no 8B-sized gradient or optimizer
buffers ever exist.

Everything here is built from ``jax.eval_shape`` + per-leaf random fill:
the bf16 base tree alone (16 GB) would not fit on the chip, so the
quantized tree is materialized directly, leaf by leaf. Throughput and
memory depend only on shapes/dtypes, not values.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from rstnet_tpu.core import Params
from rstnet_tpu.models.config import Config
from rstnet_tpu.models.lm import SpeechTextLM
from rstnet_tpu.models.lora import attach_lora, init_lora, lora_trainable_mask


def flagship_8b_config(lora_r: int = 16, lora_alpha: int = 32, **overrides) -> Config:
    """Llama-3.1-8B backbone + the canonical Moshi-scale codecformer
    (1024x6, ``moshi/models/loaders.py:68-98``), LoRA fields set, remat on
    (training at this scale is memory-bound, not FLOP-bound)."""
    kw = dict(
        context=3000, audio_card=2048, n_q=8, dep_q=8,
        codecformer_dim=1024, codecformer_heads=16, codecformer_layers=6,
        codecformer_dim_feedforward=1024,
        lora_r=lora_r, lora_alpha=lora_alpha,
        remat=True,
        use_flash_attention=jax.default_backend() == "tpu",
    )
    kw.update(overrides)
    return Config.from_name("Llama-3.1-8B", **kw)


def peft_8b_mask(params: Params) -> Params:
    """Trainable mask for the flagship PEFT split: inside the backbone only
    LoRA leaves train (reference ``mark_only_lora_as_trainable``,
    ``llama_streaming.py:409``); every non-backbone tree (codecformer, audio
    embeddings/heads) is new-initialized and trains fully, as in the
    reference's LoRA pretraining (``pre_training_lora.py:93-94``)."""
    mask = lora_trainable_mask(params)
    for k in params:
        if k != "backbone":
            mask[k] = jax.tree.map(lambda _: True, params[k])
    return mask


def abstract_peft_8b(
    cfg: Optional[Config] = None, base_int8: bool = True, dtype=jnp.bfloat16
):
    """(model, param_shapes, mask) without materializing anything.

    ``param_shapes`` is the eval_shape tree of init -> attach_lora ->
    (optionally) quantize_backbone_int8; LoRA factors ride inside the
    backbone tree and are excluded from quantization by name.
    """
    from rstnet_tpu.models.backbone import quantize_backbone_int8

    cfg = cfg or flagship_8b_config()
    model = SpeechTextLM(cfg)

    def build(key):
        k0, k1 = jax.random.split(key)
        params = model.init(k0, dtype)
        params["backbone"] = attach_lora(
            params["backbone"], init_lora(cfg, k1, dtype)
        )
        if base_int8:
            params["backbone"] = quantize_backbone_int8(params["backbone"])
        return params

    shapes = jax.eval_shape(build, jax.random.PRNGKey(0))
    mask = peft_8b_mask(shapes)
    return model, shapes, mask


def materialize_random(shapes: Params, key: jax.Array, shardings=None) -> Params:
    """Fill an eval_shape tree with plausible random values, leaf by leaf
    (never holding a second full-tree copy). int8 leaves get uniform
    symmetric weights; float leaves N(0, 0.02) — the init scale of the
    real model, so losses stay finite and gradients well-conditioned.

    Memory discipline: each fill is compiled WITH its target sharding
    (``out_shardings``) so the leaf is born sharded — materialize-then-
    device_put briefly held a replicated copy per device under an active
    mesh — and is blocked on before the next fill is dispatched. Without
    the block, async dispatch queues every leaf's int32/float32 transients
    ahead of a slow (1-vCPU) executor and peak RSS hits tens of GB for a
    ~3 GB tree (observed r5)."""
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(key, len(leaves))
    sh_leaves = (
        jax.tree_util.tree_flatten(shardings)[0] if shardings is not None
        else [None] * len(leaves)
    )

    def _fill(k, s):
        if s.dtype == jnp.int8:
            # uniform random bytes reinterpreted as int8: same coverage as
            # randint(-127, 128) for a random fill, with a 1-byte transient
            # instead of randint's int32 (4x) one
            return jax.lax.bitcast_convert_type(
                jax.random.bits(k, s.shape, jnp.uint8), jnp.int8
            )
        if jnp.issubdtype(s.dtype, jnp.integer):
            return jnp.zeros(s.shape, s.dtype)
        return jax.random.normal(k, s.shape, s.dtype) * jnp.asarray(0.02, s.dtype)

    out = []
    for k, s, sh in zip(keys, leaves, sh_leaves):
        if sh is not None:
            leaf = jax.jit(_fill, static_argnums=(1,), out_shardings=sh)(k, s)
        else:
            leaf = jax.jit(_fill, static_argnums=(1,))(k, s)
        out.append(jax.block_until_ready(leaf))
    return treedef.unflatten(out)


def bytes_table(tree: Params) -> dict:
    """Total bytes by dtype class — the memory-budget accounting."""
    total = 0
    by = {}
    for leaf in jax.tree.leaves(tree):
        b = leaf.size * jnp.dtype(leaf.dtype).itemsize
        total += b
        key = str(jnp.dtype(leaf.dtype))
        by[key] = by.get(key, 0) + b
    return {"total_gb": round(total / 2**30, 3),
            **{f"{k}_gb": round(v / 2**30, 3) for k, v in by.items()}}


def build_peft_8b(
    key: jax.Array,
    cfg: Optional[Config] = None,
    base_int8: bool = True,
    dtype=jnp.bfloat16,
    mesh=None,
):
    """(model, trainable, frozen, mask) materialized (random values), with
    the frozen backbone already int8 when ``base_int8``. When ``mesh`` is
    given, leaves are placed with :func:`infer_param_shardings` (fsdp/tensor
    axes) as they are created — the multi-chip path."""
    from rstnet_tpu.training.train_step import partition_params

    model, shapes, mask = abstract_peft_8b(cfg, base_int8, dtype)
    shardings = None
    if mesh is not None:
        from rstnet_tpu.parallel.sharding import infer_param_shardings

        shardings = infer_param_shardings(mesh, shapes)
    params = materialize_random(shapes, key, shardings)
    trainable, frozen = partition_params(params, mask)
    return model, trainable, frozen, mask
