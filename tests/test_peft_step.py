"""Partitioned PEFT train step: trainable/frozen split, masked-step
equivalence, int8 frozen base (the fit-8B-LoRA-on-one-chip path), and the
trainer CLI's --base_int8 mode.

Reference behavior matched: ``mark_only_lora_as_trainable``
(``MLLM_v2/models/llama_streaming.py:409``) + the 8B LoRA recipe
(``MLLM_v2/egs/pretraining/run.sh:141``); the int8 frozen base is a
TPU-first extension (HBM, not CUDA, is the capacity limit).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rstnet_tpu.models.config import Config
from rstnet_tpu.models.lm import SpeechTextLM
from rstnet_tpu.models.lora import attach_lora, init_lora, lora_trainable_mask
from rstnet_tpu.training.schedulers import warmup_lr
from rstnet_tpu.training.train_step import (
    combine_params,
    init_train_state,
    make_loss_fn,
    make_optimizer,
    make_peft_train_step,
    make_train_step,
    partition_params,
)

CFG = dict(
    name="peft-tiny", block_size=64, vocab_size=96, padded_vocab_size=96,
    n_layer=2, n_head=4, n_embd=32, n_query_groups=2, rotary_percentage=1.0,
    parallel_residual=False, bias=False, norm_class_name="RMSNorm",
    mlp_class_name="LLaMAMLP", intermediate_size=64, context=32,
    audio_card=66, n_q=4, dep_q=4, codecformer_dim=16, codecformer_heads=2,
    codecformer_layers=2, codecformer_dim_feedforward=32,
    lora_r=4, lora_alpha=8,
)


def _lora_setup(dtype=jnp.float32):
    cfg = Config(**CFG)
    model = SpeechTextLM(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype)
    overlay = init_lora(cfg, jax.random.PRNGKey(1), dtype)
    params["backbone"] = attach_lora(params["backbone"], overlay)
    mask = lora_trainable_mask(params)
    for k in ("codecformer", "input_emb", "codecformer_text_emb",
              "codecformer_emb", "codecformer_in", "audio_linears"):
        mask[k] = jax.tree.map(lambda _: True, params[k])
    return cfg, model, params, mask


def _batch(cfg, key=2, B=2, S=8):
    k = jax.random.PRNGKey(key)
    tokens = jnp.concatenate(
        [
            jax.random.randint(k, (B, 1, S), 0, cfg.padded_vocab_size),
            jax.random.randint(k, (B, cfg.n_q, S), 0, cfg.audio_card - 2),
        ],
        axis=1,
    )
    return {"tokens": tokens, "masks": jnp.ones((B, 1 + cfg.n_q, S), jnp.float32)}


def test_partition_combine_roundtrip():
    cfg, model, params, mask = _lora_setup()
    trainable, frozen = partition_params(params, mask)
    # every trainable leaf is a LoRA factor or in an always-trainable tree
    n_trainable = len(jax.tree.leaves(trainable))
    n_frozen = len(jax.tree.leaves(frozen))
    assert n_trainable > 0 and n_frozen > 0
    assert n_trainable + n_frozen == len(jax.tree.leaves(params))
    back = combine_params(trainable, frozen)
    assert jax.tree.structure(back) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_peft_step_matches_masked_step():
    """The partitioned step must produce the same trainable updates as the
    full step with an optax trainable mask (f32, 3 steps)."""
    cfg, model, params, mask = _lora_setup()
    loss_fn = make_loss_fn(model)
    batch = _batch(cfg)

    tx_full = make_optimizer(warmup_lr(1e-3, 10), trainable_mask=mask)
    full_step = make_train_step(loss_fn, tx_full, trainable_mask=mask, donate=False)
    full_state = init_train_state(params, tx_full)

    tx_peft = make_optimizer(warmup_lr(1e-3, 10))
    trainable, frozen = partition_params(params, mask)
    peft_step = make_peft_train_step(loss_fn, tx_peft, donate=False)
    peft_state = init_train_state(trainable, tx_peft)

    for _ in range(3):
        full_state, m_full = full_step(full_state, batch)
        peft_state, m_peft = peft_step(peft_state, frozen, batch)
        np.testing.assert_allclose(
            float(m_peft["loss"]), float(m_full["loss"]), rtol=1e-5
        )

    # trainable leaves agree; frozen leaves in the full state are untouched
    full_trainable, full_frozen = partition_params(full_state["params"], mask)
    for a, b in zip(jax.tree.leaves(peft_state["params"]), jax.tree.leaves(full_trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree.leaves(full_frozen), jax.tree.leaves(frozen)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_peft_step_int8_frozen_base():
    """int8 frozen backbone: the step must run (no grads ever requested for
    the int8 leaves), losses must stay finite and decrease over a few steps
    of memorizing one batch, and the frozen tree is bit-identical after."""
    from rstnet_tpu.models.backbone import quantize_backbone_int8

    cfg, model, params, _ = _lora_setup(jnp.float32)
    params["backbone"] = quantize_backbone_int8(params["backbone"])
    mask = lora_trainable_mask(params)
    for k in ("codecformer", "input_emb", "codecformer_text_emb",
              "codecformer_emb", "codecformer_in", "audio_linears"):
        mask[k] = jax.tree.map(lambda _: True, params[k])
    trainable, frozen = partition_params(params, mask)
    assert any(
        leaf.dtype == jnp.int8 for leaf in jax.tree.leaves(frozen)
    ), "int8 base must land on the frozen side"
    assert all(leaf.dtype != jnp.int8 for leaf in jax.tree.leaves(trainable))

    loss_fn = make_loss_fn(model)
    tx = make_optimizer(warmup_lr(3e-3, 1))
    step = make_peft_train_step(loss_fn, tx, donate=False)
    state = init_train_state(trainable, tx)
    batch = _batch(cfg)
    frozen_before = jax.tree.map(np.asarray, frozen)
    losses = []
    for _ in range(8):
        state, metrics = step(state, frozen, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    for a, b in zip(jax.tree.leaves(frozen), jax.tree.leaves(frozen_before)):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_peft_step_grad_accum_matches_full_batch():
    cfg, model, params, mask = _lora_setup()
    loss_fn = make_loss_fn(model)
    trainable, frozen = partition_params(params, mask)
    tx = make_optimizer(warmup_lr(1e-3, 10))

    big = _batch(cfg, B=4)
    micro = jax.tree.map(lambda x: x.reshape((2, 2) + x.shape[1:]), big)

    one = make_peft_train_step(loss_fn, tx, donate=False)
    acc = make_peft_train_step(loss_fn, tx, grad_accum=2, donate=False)
    s1, m1 = one(init_train_state(trainable, tx), frozen, big)
    s2, m2 = acc(init_train_state(trainable, tx), frozen, micro)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1["params"]), jax.tree.leaves(s2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_trainer_cli_base_int8(tmp_path):
    """--base_int8 end-to-end through the trainer CLI (tiny synthetic run):
    trains, checkpoints only the trainable tree, and resumes."""
    import json

    from rstnet_tpu.training.trainer import main

    rng = np.random.default_rng(0)
    audio = {
        f"u{i}": rng.integers(0, 60, (8, int(rng.integers(8, 16)))).astype(np.int16)
        for i in range(8)
    }
    np.savez(tmp_path / "audio.npz", **audio)
    (tmp_path / "a.json").write_text(
        json.dumps({"task": "audio_only", "keys": {"audio_seq": str(tmp_path / "audio.npz")}})
    )
    (tmp_path / "model.yaml").write_text(
        """
name: peft-cli-tiny
block_size: 256
vocab_size: 512
padded_vocab_size: 512
n_layer: 2
n_head: 2
n_embd: 16
n_query_groups: 1
rotary_percentage: 1.0
parallel_residual: false
bias: false
norm_class_name: RMSNorm
mlp_class_name: LLaMAMLP
intermediate_size: 32
context: 64
"""
    )
    exp = tmp_path / "exp"
    argv = [
        "--train_data_jsons", str(tmp_path / "a.json"),
        "--valid_data_jsons", str(tmp_path / "a.json"),
        "--model_config", str(tmp_path / "model.yaml"),
        "--exp_dir", str(exp),
        "--batch_scale", "80", "--max_length", "64", "--n_epoch", "1",
        "--warmup_steps", "5", "--global_learning_rate", "1e-3",
        "--audio_card", "66", "--n_q", "8", "--dep_q", "8",
        "--codecformer_dim", "16", "--codecformer_heads", "2",
        "--codecformer_layers", "2", "--codecformer_dim_feedforward", "32",
        "--lora_r", "4", "--base_int8", "true", "--dtype", "float32",
        "--flash_attention", "false", "--n_worker", "0",
    ]
    main(argv)
    import glob

    ckpts = glob.glob(str(exp / "*.checkpoint"))
    assert ckpts, "no checkpoint written"
    # the checkpoint holds only the trainable tree: no int8 leaf inside
    import pathlib

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(pathlib.Path(ckpts[0]) / "state")
    leaves = jax.tree.leaves(state["params"])
    assert leaves and all(leaf.dtype != jnp.int8 for leaf in leaves)
    # resume continues (epoch 2)
    main(argv[: argv.index("--n_epoch") + 1] + ["2"] + argv[argv.index("--n_epoch") + 2 :])
