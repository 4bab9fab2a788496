"""Offline codec/text tokenization CLI.

Capability parity with
``MLLM_v2/egs/pretraining/local/offline_codec_tokenization.py`` and
``data_scripts/offline_tokenization.py``: iterate a wav.scp (or a text scp),
tokenize each utterance (audio -> int16 Mimi codes; text -> BPE ids or
word-aligned frames from whisperX segment jsons), and save one .npz shard —
the storage format the training data layer consumes.
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np


def _ensure_parent(path: str) -> None:
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)

from rstnet_tpu.tools.scp_tools import read_scp
from rstnet_tpu.utils.audio import read_wav


def _wav_entries(scp: str) -> list[tuple[str, str]]:
    """Accept both ``utt path`` and bare-path scp conventions."""
    from pathlib import Path

    return [
        (Path(k).stem, k) if not v else (k, v) for k, v in read_scp(scp)
    ]


def tokenize_audio_scp(scp: str, out: str, checkpoint: str = "") -> int:
    from rstnet_tpu.data.tokenizers.mimi_tokenizer import MimiTokenizer

    tok = MimiTokenizer(checkpoint_path=checkpoint or None)
    data = {}
    for utt, path in _wav_entries(scp):
        try:
            wav, sr = read_wav(path)
        except Exception as e:  # noqa: BLE001
            logging.warning(f"skipping {utt}: {e}")
            continue
        data[utt] = tok.tokenize(wav[0], sr)
    _ensure_parent(out)
    np.savez(out, **data)
    return len(data)


def tokenize_ssl_scp(scp: str, out: str, checkpoint: str) -> int:
    """wav.scp -> 12.5 Hz WhisperVQ semantic tokens (reference
    ``offline_codec_tokenization.py`` tokenizer=ssl, :50-62)."""
    from rstnet_tpu.data.tokenizers.ssl_tokenizer import SSLTokenizer

    tok = SSLTokenizer(checkpoint=checkpoint)
    data = {}
    for utt, path in _wav_entries(scp):
        try:
            wav, sr = read_wav(path)
        except Exception as e:  # noqa: BLE001
            logging.warning(f"skipping {utt}: {e}")
            continue
        data[utt] = tok.tokenize(wav[0], sr)[None]  # [1, T] single codebook
    _ensure_parent(out)
    np.savez(out, **data)
    return len(data)


def tokenize_text_scp(scp: str, out: str, tokenizer_dir: str) -> int:
    from rstnet_tpu.data.tokenizers.text_tokenizer import TextTokenizer

    tok = TextTokenizer(tokenizer_dir)
    data = {}
    for utt, text in read_scp(scp):
        data[utt] = tok.tokenize(text)
    _ensure_parent(out)
    np.savez(out, **data)
    return len(data)


def tokenize_aligned_json_scp(scp: str, out: str, tokenizer_dir: str) -> int:
    """scp of whisperX-style jsons -> word-aligned 12.5 Hz text frames."""
    from rstnet_tpu.data.tokenizers.text_tokenizer import TextTokenizer

    tok = TextTokenizer(tokenizer_dir)
    data = {}
    for utt, path in read_scp(scp):
        with open(path) as f:
            meta = json.load(f)
        word_list = tok.tokenize_segment(meta["segments"])
        data[utt] = tok.pad_tokens(word_list, meta["duration"])[None]  # [1, T]
    _ensure_parent(out)
    np.savez(out, **data)
    return len(data)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scp", required=True)
    parser.add_argument("--output", required=True, help=".npz shard")
    parser.add_argument("--mode", default="audio",
                        choices=["audio", "ssl", "text", "aligned_text"])
    parser.add_argument("--mimi-checkpoint", default="")
    parser.add_argument("--ssl-checkpoint", default="",
                        help="GLM-4-Voice tokenizer checkpoint dir (mode=ssl)")
    parser.add_argument("--tokenizer-dir", default="")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)
    if args.mode == "audio":
        n = tokenize_audio_scp(args.scp, args.output, args.mimi_checkpoint)
    elif args.mode == "ssl":
        n = tokenize_ssl_scp(args.scp, args.output, args.ssl_checkpoint)
    elif args.mode == "text":
        n = tokenize_text_scp(args.scp, args.output, args.tokenizer_dir)
    else:
        n = tokenize_aligned_json_scp(args.scp, args.output, args.tokenizer_dir)
    logging.info(f"wrote {n} utterances to {args.output}")


if __name__ == "__main__":
    main()
