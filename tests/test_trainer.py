"""Trainer CLI smoke tests: end-to-end training, checkpoint/resume, reporter."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rstnet_tpu.utils.reporter import Reporter


def _write_synthetic(tmp_path):
    rng = np.random.default_rng(0)
    audio = {
        f"u{i}": rng.integers(0, 60, (8, int(rng.integers(8, 16)))).astype(np.int16)
        for i in range(12)
    }
    text = {f"t{i}": rng.integers(0, 256, (int(rng.integers(5, 10)),)) for i in range(6)}
    np.savez(tmp_path / "audio.npz", **audio)
    np.savez(tmp_path / "text.npz", **text)
    (tmp_path / "a.json").write_text(
        json.dumps({"task": "audio_only", "keys": {"audio_seq": str(tmp_path / "audio.npz")}})
    )
    (tmp_path / "t.json").write_text(
        json.dumps({"task": "text_only", "keys": {"text_seq": str(tmp_path / "text.npz")}})
    )
    (tmp_path / "model.yaml").write_text(
        """
name: trainer-smoke
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


def _trainer_args(tmp_path, exp_dir, extra=()):
    return [
        "--train_data_jsons", str(tmp_path / "*.json"),
        "--valid_data_jsons", str(tmp_path / "a.json"),
        "--model_config", str(tmp_path / "model.yaml"),
        "--exp_dir", str(exp_dir),
        "--batch_scale", "80",
        "--max_length", "64",
        "--n_epoch", "2",
        "--warmup_steps", "10",
        "--global_learning_rate", "1e-3",
        "--dtype", "float32",
        "--audio_card", "64",
        "--text_empty_token", "500",
        "--text_pad_token", "501",
        "--semantic_empty_token", "60",
        "--acoustic_empty_token", "60",
        "--semantic_pad_token", "61",
        "--acoustic_pad_token", "61",
        "--codecformer_dim", "16",
        "--codecformer_heads", "2",
        "--codecformer_layers", "1",
        "--codecformer_dim_feedforward", "32",
        "--keep_last_ckpt", "2",
        "--print_freq", "2",
        "--minibatch_debug", "3",
        *extra,
    ]


@pytest.mark.slow
def test_trainer_end_to_end_with_resume(tmp_path):
    from rstnet_tpu.training import trainer

    _write_synthetic(tmp_path)
    exp = tmp_path / "exp"
    trainer.main(_trainer_args(tmp_path, exp, extra=("--n_epoch", "1")))
    ckpts = sorted(os.listdir(exp))
    assert "ep1.checkpoint" in ckpts
    # resume: second epoch only
    trainer.main(_trainer_args(tmp_path, exp, extra=("--n_epoch", "2")))
    assert (exp / "ep2.checkpoint").exists()


@pytest.mark.slow
def test_trainer_moshi_family(tmp_path):
    """Pure-Moshi fine-tuning path (v1 trainers) incl. LoRA on the temporal
    transformer."""
    from rstnet_tpu.training import trainer

    _write_synthetic(tmp_path)
    exp = tmp_path / "exp_moshi"
    args = [a for a in _trainer_args(tmp_path, exp, extra=("--n_epoch", "1"))
            if a != "--model_config" and not str(a).endswith("model.yaml")]
    trainer.main(args + [
        "--model_family", "moshi", "--moshi_dim", "32", "--moshi_num_layers", "2",
        "--moshi_num_heads", "4", "--moshi_text_card", "512",
        "--n_q", "8", "--dep_q", "4",
        "--lora_r", "2", "--lora_alpha", "4",
    ])
    assert (exp / "ep1.checkpoint").exists()


@pytest.mark.slow
def test_trainer_lora_mode(tmp_path):
    from rstnet_tpu.training import trainer

    _write_synthetic(tmp_path)
    exp = tmp_path / "exp_lora"
    trainer.main(
        _trainer_args(
            tmp_path, exp,
            extra=("--lora_r", "2", "--lora_alpha", "4", "--n_epoch", "1"),
        )
    )
    assert (exp / "ep1.checkpoint").exists()


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from rstnet_tpu.training.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        rotate_checkpoints,
        save_checkpoint,
    )

    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.asarray(7, jnp.int32),
    }
    for ep in (1, 2, 3):
        save_checkpoint(tmp_path / f"ep{ep}.checkpoint", state, {"reporter": {"epoch": ep}})
    assert latest_checkpoint(tmp_path).name == "ep3.checkpoint"
    target = jax.tree.map(jnp.zeros_like, state)
    restored, extras = restore_checkpoint(tmp_path / "ep3.checkpoint", target)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3))
    assert extras["reporter"]["epoch"] == 3
    rotate_checkpoints(tmp_path, keep_last=1)
    assert len(list(tmp_path.glob("*.checkpoint"))) == 1


def test_reporter():
    r = Reporter()
    for ep in (1, 2, 3):
        r.set_epoch(ep)
        with r.observe("train") as sub:
            for i in range(4):
                sub.register({"loss": 10.0 / ep + i * 0.1})
                sub.next()
        with r.observe("valid") as sub:
            sub.register({"loss": 5.0 / ep})
            sub.next()
    assert r.best_epoch("valid", "loss", "min") == 3
    assert not r.check_early_stopping(2, "valid", "loss")
    msg = r.log_message()
    assert "train" in msg and "valid" in msg
    # state roundtrip
    r2 = Reporter()
    r2.load_state_dict(r.state_dict())
    assert r2.get_epoch() == 3
    assert r2.best_epoch("valid", "loss") == 3


def test_subreporter_windows_and_timers():
    r = Reporter()
    with r.observe("train", epoch=1) as sub:
        with sub.measure_time("fwd"):
            pass
        for item in sub.measure_iter_time(range(3), "iter_time"):
            sub.register({"x": item})
            sub.next()
        msg = sub.log_message(-2)
        assert "x=" in msg
    assert "x" in r.stats[1]["train"]


def test_checkpoint_elastic_reshard(tmp_path):
    """Elastic resume: a checkpoint saved under one mesh shape restores
    under a different mesh shape (orbax reshards to the target's
    NamedShardings), with identical values."""
    import numpy as np
    from jax.sharding import Mesh

    from rstnet_tpu.parallel.sharding import shard_params
    from rstnet_tpu.training.checkpoint import restore_checkpoint, save_checkpoint
    from tests.test_speech_lm import _model

    m = _model()
    params = m.init(jax.random.PRNGKey(0))
    flat_ref = jax.tree_util.tree_leaves(jax.tree.map(np.asarray, params))

    mesh_a = Mesh(np.array(jax.devices()[:4]).reshape(1, 2, 2), ("data", "fsdp", "tensor"))
    mesh_b = Mesh(np.array(jax.devices()[:8]).reshape(1, 4, 2), ("data", "fsdp", "tensor"))
    sharded_a = shard_params(mesh_a, params)
    save_checkpoint(tmp_path / "ep1.checkpoint", {"params": sharded_a}, {"epoch": 1})

    template_b = shard_params(mesh_b, jax.tree.map(jnp.zeros_like, params))
    restored, extras = restore_checkpoint(
        tmp_path / "ep1.checkpoint", {"params": template_b}
    )
    assert extras["epoch"] == 1
    flat_got = jax.tree_util.tree_leaves(jax.tree.map(np.asarray, restored["params"]))
    for got, want in zip(flat_got, flat_ref):
        np.testing.assert_array_equal(got, want)
    # the restored arrays live on mesh B
    leaf = jax.tree_util.tree_leaves(restored["params"])[0]
    assert leaf.sharding.mesh.shape["fsdp"] == 4


@pytest.mark.slow
def test_trainer_grad_accum(tmp_path):
    """--grad_accum 2 trains end to end (deferred optimizer updates over
    the bucketed loader) and saves a resumable checkpoint without the
    transient accumulator buffers."""
    from rstnet_tpu.training import trainer
    from rstnet_tpu.training.checkpoint import latest_checkpoint, restore_checkpoint

    _write_synthetic(tmp_path)
    exp = tmp_path / "exp_accum"
    trainer.main(_trainer_args(tmp_path, exp, extra=("--grad_accum", "2", "--n_epoch", "1")))
    ckpt = latest_checkpoint(exp)
    assert ckpt is not None
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        raw = ckptr.restore(ckpt / "state")
    assert "acc_grads" not in raw and "micro" not in raw
    assert int(np.asarray(raw["step"])) >= 1
