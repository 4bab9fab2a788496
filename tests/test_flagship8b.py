"""8B-flagship PEFT geometry: structure, sharding/memory math, and an
(env-gated) executed fsdp step at true 8B shapes on the virtual mesh.

Capability anchor: the reference's flagship recipe trains a Llama-3.1-8B
backbone with LoRA (``MLLM_v2/egs/pretraining/run.sh:141``,
``trainer/pre_training_lora.py``); here the same fine-tune is shown to fit
one 16 GB chip (int8 frozen base) and to shard over an fsdp mesh.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rstnet_tpu.parallel.mesh import make_mesh
from rstnet_tpu.parallel.sharding import infer_param_shardings
from rstnet_tpu.training.flagship8b import (
    abstract_peft_8b,
    build_peft_8b,
    bytes_table,
    flagship_8b_config,
)
from rstnet_tpu.training.train_step import partition_params

HBM_GB = 16.0  # one v5e chip


def _leaf_bytes(s) -> int:
    return int(np.prod(s.shape)) * jnp.dtype(s.dtype).itemsize


def _shard_bytes(shapes, shardings) -> int:
    """Per-device bytes under the given shardings (max over devices =
    every shard the same size for these even divisions)."""
    total = 0
    for s, sh in zip(jax.tree.leaves(shapes), jax.tree.leaves(shardings)):
        shard = sh.shard_shape(s.shape)
        total += int(np.prod(shard)) * jnp.dtype(s.dtype).itemsize
    return total


def test_abstract_8b_structure():
    model, shapes, mask = abstract_peft_8b()
    trainable, frozen = partition_params(shapes, mask)
    n_total = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    n_train = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(trainable))
    assert 8.0e9 < n_total < 9.2e9, n_total  # true 8B geometry
    assert n_train < 0.08 * n_total  # PEFT: <8% trains
    assert any(s.dtype == jnp.int8 for s in jax.tree.leaves(frozen))
    assert all(s.dtype != jnp.int8 for s in jax.tree.leaves(trainable))
    # backbone LoRA factors live on the trainable side
    assert "blocks" in trainable["backbone"]
    # single-chip budget: frozen + trainable + 2x Adam moments < HBM
    fb = bytes_table(frozen)["total_gb"]
    tb = bytes_table(trainable)["total_gb"]
    assert fb + 3 * tb < HBM_GB - 3.0, (fb, tb)  # >=3 GB activation headroom


def test_8b_fsdp_sharding_math():
    """The fsdp mesh divides the 8B state: per-device bytes of params +
    optimizer moments fit one chip's HBM with activation headroom, and the
    big stacked leaves are actually split (not replicated)."""
    mesh = make_mesh({"data": 1, "fsdp": 8, "tensor": 1})
    _, shapes, mask = abstract_peft_8b()
    trainable, frozen = partition_params(shapes, mask)

    fr_sh = infer_param_shardings(mesh, frozen)
    tr_sh = infer_param_shardings(mesh, trainable)
    per_dev = _shard_bytes(frozen, fr_sh) + 3 * _shard_bytes(trainable, tr_sh)
    full = sum(_leaf_bytes(s) for s in jax.tree.leaves(shapes))
    # the dominant (int8 backbone) leaves must shard ~8x; small norms stay
    # replicated, so allow 2x over the ideal full/8
    assert per_dev < full / 8 * 2, (per_dev / 2**30, full / 2**30)
    assert per_dev / 2**30 < 4.0  # trivially fits a 16 GB chip per-device

    # spot-check: the stacked qkv int8 stack is split over fsdp
    qkv = frozen["backbone"]["blocks"]["attn"]["w_int8"]
    qkv_sh = fr_sh["backbone"]["blocks"]["attn"]["w_int8"]
    assert "fsdp" in tuple(qkv_sh.spec), qkv_sh.spec
    shard = qkv_sh.shard_shape(qkv.shape)
    assert int(np.prod(shard)) == int(np.prod(qkv.shape)) // 8


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("RSTNET_TRAIN8B", "0") != "1",
    reason="true-8B virtual-mesh step: ~10 GB RAM and minutes of CPU; "
    "run with RSTNET_TRAIN8B=1 (results recorded in ARCHITECTURE.md)",
)
def test_8b_fsdp_one_step_executes():
    """ONE PEFT train step at true 8B geometry on the 8-device virtual
    mesh: real shapes, real int8 frozen base, tiny batch. Proves the
    sharded program compiles AND executes with a finite loss."""
    from rstnet_tpu.training.schedulers import warmup_lr
    from rstnet_tpu.training.train_step import (
        init_train_state,
        make_loss_fn,
        make_optimizer,
        make_peft_train_step,
    )
    from rstnet_tpu.parallel.sharding import batch_sharding

    mesh = make_mesh({"data": 1, "fsdp": 8, "tensor": 1})
    cfg = flagship_8b_config(use_flash_attention=False)
    with jax.set_mesh(mesh):
        model, trainable, frozen, _ = build_peft_8b(
            jax.random.PRNGKey(0), cfg=cfg, mesh=mesh
        )
        tx = make_optimizer(warmup_lr(1e-4, 100))
        step = make_peft_train_step(make_loss_fn(model), tx)
        state = init_train_state(trainable, tx)
        B, S = 8, 32
        key = jax.random.PRNGKey(1)
        batch = {
            "tokens": jnp.concatenate(
                [
                    jax.random.randint(key, (B, 1, S), 0, cfg.padded_vocab_size),
                    jax.random.randint(key, (B, cfg.n_q, S), 0, cfg.audio_card),
                ],
                axis=1,
            ),
            "masks": jnp.ones((B, 1 + cfg.n_q, S), jnp.float32),
        }
        batch = jax.device_put(batch, batch_sharding(mesh, 3))
        state, metrics = step(state, frozen, batch)
        loss = float(jax.block_until_ready(metrics["loss"]))
    assert np.isfinite(loss), loss
    print(f"8B fsdp step ok: mesh={dict(mesh.shape)} loss={loss:.4f}")
