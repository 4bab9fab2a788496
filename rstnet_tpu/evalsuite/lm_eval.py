"""LM evaluation CLI: teacher-forced perplexity over a data manifest.

Capability parity with the reference's evaluation mode
(``MLLM_v2/infer_no_streaming.py --inference_mode teacher-force``,
:122-128,144-146,174-182): loads the trained model + data jsons and reports
audio/text CE, perplexity and accuracy.
"""

from __future__ import annotations

import argparse
import json
import logging

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_config", default="",
                        help="optional; defaults to the exp dir's saved config")
    parser.add_argument("--checkpoint_dir", default="", help="trainer exp dir")
    parser.add_argument("--data_jsons", required=True)
    parser.add_argument("--batch_scale", type=int, default=1000)
    parser.add_argument("--max_length", type=int, default=1000)
    parser.add_argument("--parallel_number", type=int, default=9)
    parser.add_argument("--output", default="")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)

    from rstnet_tpu.data.dataloader import build_data_iterator, find_data_jsons
    from rstnet_tpu.data.task_definition import load_data_for_all_tasks
    from rstnet_tpu.inference.offline import OfflineInference
    from rstnet_tpu.models.config import Config
    from rstnet_tpu.models.lm import SpeechTextLM
    from rstnet_tpu.data.tokenizers.abs_tokenizer import AbsTokenizer

    import os

    train_args_path = (
        os.path.join(args.checkpoint_dir, "train_args.yaml")
        if args.checkpoint_dir
        else ""
    )
    if train_args_path and os.path.isfile(train_args_path):
        # rebuild exactly the trained model (config + CLI overrides)
        import argparse as _ap

        import yaml

        from rstnet_tpu.training.trainer import build_model

        with open(train_args_path) as f:
            saved = yaml.safe_load(f)
        if args.model_config:
            saved["model_config"] = args.model_config
        model = build_model(_ap.Namespace(**saved))
    else:
        cfg = Config.from_file(args.model_config)
        model = SpeechTextLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.float32)
    if args.checkpoint_dir:
        from rstnet_tpu.training.checkpoint import latest_checkpoint, restore_checkpoint

        ckpt = latest_checkpoint(args.checkpoint_dir)
        assert ckpt is not None, f"no checkpoint in {args.checkpoint_dir}"
        # restore only the params subtree of the saved train state
        state, _ = restore_checkpoint(ckpt, {"params": params}, partial=True)
        params = state["params"]

    class StoredTokens(AbsTokenizer):
        def find_length(self, x):
            return int(np.shape(x)[-1])

    data_dict, text_dict = load_data_for_all_tasks(find_data_jsons(args.data_jsons))
    it = build_data_iterator(
        data_dict, text_dict, {"audio": StoredTokens(), "text": StoredTokens()},
        batch_scale=args.batch_scale, max_length=args.max_length,
        parallel_number=args.parallel_number, is_train=False,
    )
    inf = OfflineInference(model, params)
    # corpus-level aggregation: weight every batch by its valid-token count
    # (token-budget batches vary widely in size; a flat per-batch average
    # would bias CE/accuracy, and ppl must be exp of the aggregated CE)
    wsum: dict[str, float] = {}
    n_audio = n_text = 0.0
    n = 0
    dep_q = model.config.dep_q
    for batch in it:
        m = inf.teacher_forced_metrics(
            jnp.asarray(batch["tokens"]), jnp.asarray(batch["masks"])
        )
        na, nt = m["n_audio_tokens"], m["n_text_tokens"]
        for k, w in (("loss_audio", na), ("acc_audio", na),
                     ("loss_text", nt), ("acc_text", nt)):
            wsum[k] = wsum.get(k, 0.0) + m[k] * w
        n_audio += na
        n_text += nt
        n += 1
    report = {
        "loss_audio": wsum.get("loss_audio", 0.0) / max(n_audio, 1.0),
        "acc_audio": wsum.get("acc_audio", 0.0) / max(n_audio, 1.0),
        "loss_text": wsum.get("loss_text", 0.0) / max(n_text, 1.0),
        "acc_text": wsum.get("acc_text", 0.0) / max(n_text, 1.0),
    }
    import math

    report["ppl_audio"] = math.exp(report["loss_audio"] / dep_q)
    report["ppl_text"] = math.exp(report["loss_text"])
    report["n_batches"] = n
    report["n_audio_tokens"] = n_audio
    report["n_text_tokens"] = n_text
    print(json.dumps(report, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main()
