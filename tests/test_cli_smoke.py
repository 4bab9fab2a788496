"""End-to-end CLI chain smoke: trainer -> lm_eval -> infer_cli on one tiny
experiment. Locks in three behaviors that only surfaced when driving the
CLIs for real: the trainer dumping the *resolved* config for inference
reuse, lm_eval rebuilding the exact trained model from train_args.yaml,
and infer_cli not length-filtering away every example (prefix is sliced,
not filtered; reference flow: MLLM_v2/infer_no_streaming.py)."""

import json

import numpy as np
import pytest


def _write_synthetic(tmp_path):
    rng = np.random.default_rng(0)
    audio = {
        f"u{i}": rng.integers(0, 60, (8, int(rng.integers(30, 40)))).astype(np.int16)
        for i in range(6)
    }
    np.savez(tmp_path / "audio.npz", **audio)
    (tmp_path / "a.json").write_text(
        json.dumps({"task": "audio_only", "keys": {"audio_seq": str(tmp_path / "audio.npz")}})
    )
    (tmp_path / "model.yaml").write_text(
        """
name: cli-smoke
block_size: 256
vocab_size: 512
padded_vocab_size: 512
n_layer: 1
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


COMMON = [
    "--batch_scale", "80", "--max_length", "64",
    "--dtype", "float32", "--audio_card", "64",
    "--text_empty_token", "500", "--text_pad_token", "501",
    "--semantic_empty_token", "60", "--acoustic_empty_token", "60",
    "--semantic_pad_token", "61", "--acoustic_pad_token", "61",
    "--codecformer_dim", "16", "--codecformer_heads", "2",
    "--codecformer_layers", "1", "--codecformer_dim_feedforward", "32",
]


@pytest.mark.slow
def test_train_eval_generate_chain(tmp_path):
    from rstnet_tpu.evalsuite import lm_eval
    from rstnet_tpu.inference import infer_cli
    from rstnet_tpu.training import trainer

    _write_synthetic(tmp_path)
    exp = tmp_path / "exp"
    trainer.main([
        "--train_data_jsons", str(tmp_path / "a.json"),
        "--model_config", str(tmp_path / "model.yaml"),
        "--exp_dir", str(exp),
        "--n_epoch", "1", "--minibatch_debug", "2", "--print_freq", "1",
        *COMMON,
    ])
    # the trainer must dump the resolved config + args for downstream CLIs
    assert (exp / "config.yaml").is_file() and (exp / "train_args.yaml").is_file()

    metrics = lm_eval.main([
        "--checkpoint_dir", str(exp),
        "--data_jsons", str(tmp_path / "a.json"),
        "--output", str(tmp_path / "ppl.json"),
    ])
    saved = json.loads((tmp_path / "ppl.json").read_text())
    for k in ("ppl_audio", "ppl_text", "loss_audio", "loss_text"):
        assert k in saved and np.isfinite(saved[k]), (k, saved)
    assert saved["ppl_audio"] == pytest.approx(metrics["ppl_audio"])

    out_dir = tmp_path / "gen"
    infer_cli.main([
        "--exp_dir", str(exp),
        "--data_jsons", str(tmp_path / "a.json"),
        "--output_dir", str(out_dir),
        "--task", "continuation",
        "--prefix_frames", "8", "--max_new_frames", "4",
        "--max_examples", "2",
    ])
    outs = sorted(out_dir.glob("*.npy"))
    # regression: the length filter used to drop every example (max_length
    # compared prefix+new against full grids) -> zero outputs
    assert len(outs) == 2, list(out_dir.iterdir())
    grid = np.load(outs[0])
    assert grid.ndim == 2 and grid.shape[0] == 9  # 1 text + n_q audio rows
    assert grid.shape[1] >= 4
