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


def _duplex_grid(tok, chans: np.ndarray, sr: int) -> np.ndarray:
    """Two channel waveforms -> pre-stacked ``[17, T]`` int32 grid.

    Row 0 is the text stream (filled with text-pad; ASR text alignment is a
    separate stage), rows 1-8 the user channel's Mimi codes, rows 9-16 the
    assistant channel's — the v1 ``moshi_ft`` storage format
    (``MLLM/utils/task_definition.py:57-69``).
    """
    from rstnet_tpu.data.collate import SpecialTokens

    c0 = tok.tokenize(chans[0], sr)
    c1 = tok.tokenize(chans[1], sr)
    T = min(c0.shape[1], c1.shape[1])
    K = c0.shape[0]
    grid = np.full((1 + 2 * K, T), SpecialTokens.text_pad, np.int32)
    grid[1 : 1 + K] = c0[:, :T]
    grid[1 + K :] = c1[:, :T]
    return grid


def tokenize_duplex_scp(scp: str, out: str, checkpoint: str = "") -> int:
    """Stereo wav.scp -> ``[17, T]`` duplex grids (one channel per side).

    Fisher-style corpora store each conversation side on its own channel
    (reference ``MLLM/egs/moshi_ft/run.sh:52-120``). Mono inputs get a
    silent peer channel (a one-sided conversation).
    """
    from rstnet_tpu.data.tokenizers.mimi_tokenizer import MimiTokenizer

    tok = MimiTokenizer(checkpoint_path=checkpoint or None)
    data = {}
    for utt, path in _wav_entries(scp):
        try:
            wav, sr = read_wav(path)
        except Exception as e:  # noqa: BLE001
            logging.warning(f"skipping {utt}: {e}")
            continue
        if wav.shape[0] < 2:
            wav = np.concatenate([wav[:1], np.zeros_like(wav[:1])], axis=0)
        data[utt] = _duplex_grid(tok, wav[:2], sr)
    _ensure_parent(out)
    np.savez(out, **data)
    return len(data)


def tokenize_duplex_sessions(
    sessions_json: str, out: str, checkpoint: str = ""
) -> int:
    """Pipeline ``sessions.json`` -> ``[17, T]`` duplex grids.

    Each session's member segments are rendered onto two channels by
    speaker (the session's first speaker is the user side, all others the
    assistant side), then both channels are Mimi-tokenized and stacked —
    the diarization-driven equivalent of Fisher's per-channel recording
    (reference ``emilia/main.py`` speaker labels + ``moshi_ft`` prep).
    """
    from rstnet_tpu.data.tokenizers.mimi_tokenizer import MimiTokenizer
    from rstnet_tpu.utils.audio import resample_linear

    tok = MimiTokenizer(checkpoint_path=checkpoint or None)
    with open(sessions_json) as f:
        sessions = json.load(f)
    data = {}
    for i, sess in enumerate(sessions):
        s0, s1 = float(sess["start"]), float(sess["end"])
        n = max(1, int(round((s1 - s0) * tok.sr)))
        chans = np.zeros((2, n), np.float32)
        first = sess["speakers"][0] if sess.get("speakers") else None
        ok = True
        for m in sess["segments"]:
            try:
                wav, msr = read_wav(m["path"])
            except Exception as e:  # noqa: BLE001
                logging.warning(f"session {i}: skipping {m.get('utt')}: {e}")
                ok = False
                break
            seg = wav[0]
            if msr != tok.sr:
                seg = resample_linear(seg[None], msr, tok.sr)[0]
            off = max(0, int(round((float(m["start"]) - s0) * tok.sr)))
            end = min(off + len(seg), n)
            ch = 0 if m.get("speaker") == first else 1
            chans[ch, off:end] = seg[: end - off]
        if not ok:
            continue
        utt = sess.get("utt") or f"session_{i:06d}"
        data[utt] = _duplex_grid(tok, chans, tok.sr)
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
    parser.add_argument("--scp", default="",
                        help="wav/text scp (all modes except --sessions)")
    parser.add_argument("--sessions", default="",
                        help="pipeline sessions.json (mode=duplex)")
    parser.add_argument("--output", required=True, help=".npz shard")
    parser.add_argument("--mode", default="audio",
                        choices=["audio", "ssl", "text", "aligned_text", "duplex"])
    parser.add_argument("--mimi-checkpoint", default="")
    parser.add_argument("--ssl-checkpoint", default="",
                        help="GLM-4-Voice tokenizer checkpoint dir (mode=ssl)")
    parser.add_argument("--tokenizer-dir", default="")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)
    if not args.scp and not (args.mode == "duplex" and args.sessions):
        parser.error("--scp is required (or --sessions with --mode duplex)")
    if args.mode == "duplex":
        if args.sessions:
            n = tokenize_duplex_sessions(
                args.sessions, args.output, args.mimi_checkpoint
            )
        else:
            n = tokenize_duplex_scp(args.scp, args.output, args.mimi_checkpoint)
    elif args.mode == "audio":
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
