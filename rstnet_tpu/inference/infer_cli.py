"""Flagship LM inference CLI: batch generation + detokenization to wav.

Capability parity with ``MLLM_v2/infer_no_streaming.py`` (main:62,
InferenceImp:168): load the trained model (config.yaml written by the
trainer), iterate a data manifest, run task-conditioned generation
(text_only / audio_only continuation, TTS = text forced, ASR = audio
forced), undo the delay pattern and decode audio codes through the Mimi
codec to wavs — but KV-cached O(T) instead of the reference's O(T^2) loop.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp_dir", required=True, help="trainer experiment dir")
    parser.add_argument("--model_config", default="", help="override config path")
    parser.add_argument("--data_jsons", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--task", default="continuation",
                        choices=["continuation", "tts", "asr"])
    parser.add_argument("--prefix_frames", type=int, default=25)
    parser.add_argument("--max_new_frames", type=int, default=125, help="~10s at 12.5Hz")
    parser.add_argument("--mimi_checkpoint", default="", help="for detokenization")
    parser.add_argument("--max_examples", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)

    from rstnet_tpu.data.collate import Collator, SpecialTokens
    from rstnet_tpu.data.dataloader import build_data_iterator, find_data_jsons
    from rstnet_tpu.data.task_definition import load_data_for_all_tasks
    from rstnet_tpu.data.tokenizers.abs_tokenizer import AbsTokenizer
    from rstnet_tpu.inference.offline import OfflineInference
    from rstnet_tpu.models.config import Config
    from rstnet_tpu.models.lm import SpeechTextLM
    from rstnet_tpu.training.checkpoint import latest_checkpoint, restore_checkpoint

    config_path = args.model_config or f"{args.exp_dir}/config.yaml"
    cfg = Config.from_file(config_path)
    model = SpeechTextLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.float32)
    ckpt = latest_checkpoint(args.exp_dir)
    if ckpt is not None:
        state, _ = restore_checkpoint(ckpt, {"params": params}, partial=True)
        params = state["params"]
        logging.info(f"loaded {ckpt}")

    class StoredTokens(AbsTokenizer):
        def find_length(self, x):
            return int(np.shape(x)[-1])

    data_dict, text_dict = load_data_for_all_tasks(find_data_jsons(args.data_jsons))
    # no length filtering: the prefix is sliced from each grid below
    it = build_data_iterator(
        data_dict, text_dict, {"audio": StoredTokens(), "text": StoredTokens()},
        batch_scale=10_000, max_length=-1,
        parallel_number=cfg.n_q + 1, is_train=False,
    )
    inf = OfflineInference(model, params)
    collator = it.collator
    detok = None
    if args.mimi_checkpoint:
        from rstnet_tpu.data.tokenizers.mimi_tokenizer import MimiTokenizer

        detok = MimiTokenizer(checkpoint_path=args.mimi_checkpoint)

    os.makedirs(args.output_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    n = 0
    for batch in it:
        tokens = batch["tokens"]
        for b in range(tokens.shape[0]):
            if n >= args.max_examples:
                break
            grid = tokens[b : b + 1]
            true_len = int(batch["lengths"][b])
            T0 = min(args.prefix_frames, grid.shape[-1])
            forced = None
            if args.task == "tts":
                forced = np.full(
                    (1, grid.shape[1], grid.shape[2]), -1, np.int64
                )
                forced[:, 0] = grid[:, 0]  # text row teacher-forced
            elif args.task == "asr":
                forced = np.full(
                    (1, grid.shape[1], grid.shape[2]), -1, np.int64
                )
                forced[:, 1:] = grid[:, 1:]  # audio rows teacher-forced
            if forced is not None:
                # never force bucket-padding frames past the true length
                forced[:, :, true_len:] = -1
            key, sub = jax.random.split(key)
            out = inf.generate(
                grid[:, :, :T0], args.max_new_frames, sub, forced=forced
            )
            result = collator.reverse_delay(out[0])
            utt = batch["example_ids"][b]
            np.save(Path(args.output_dir) / f"{utt}.npy", result)
            if detok is not None:
                # clamp to REAL codec codes: the empty/pad specials (the top
                # two ids of the audio vocab) are not codebook entries
                bins = int(detok.model.quantizer.cardinality)
                audio_codes = np.clip(result[1:], 0, bins - 1)
                wav = detok.detokenize(audio_codes.astype(np.int32))
                from rstnet_tpu.utils.audio import write_wav

                write_wav(str(Path(args.output_dir) / f"{utt}.wav"), wav, detok.sr)
            n += 1
        if n >= args.max_examples:
            break
    logging.info(f"generated {n} examples into {args.output_dir}")


if __name__ == "__main__":
    main()
