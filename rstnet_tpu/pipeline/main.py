"""In-the-wild data pipeline orchestrator.

Capability parity with the Emilia-style pipeline
(``MLLM_v2/egs/pretraining/data_scripts/emilia/main.py``, 722 LoC) and the
moshi_ft prep chain (``MLLM/egs/moshi_ft/run.sh:52-280``): for each wav in an
scp — standardize (mono, target rate, loudness) -> optional source
separation -> VAD segmentation -> optional ASR+alignment -> optional quality
filter -> write segment wavs + a metadata json per utterance. Config-driven
(json), stages skip gracefully when their external model is absent.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from pathlib import Path

import numpy as np

from rstnet_tpu.pipeline import adapters
from rstnet_tpu.pipeline.vad import ENGINES, energy_vad
from rstnet_tpu.tools.scp_tools import read_scp
from rstnet_tpu.utils.audio import read_wav, resample_linear, write_wav

DEFAULT_CONFIG = {
    "target_sr": 24000,
    "loudness_norm": 0.95,
    "use_separation": False,
    "vad": {"engine": "energy", "min_speech_s": 1.0, "min_gap_s": 0.4},
    "min_segment_s": 1.0,
    "max_segment_s": 30.0,
    "use_asr": False,
    "asr_model": "large-v2",
    "use_dnsmos_filter": False,
    "dnsmos_threshold": 3.0,
}


def standardize(wav: np.ndarray, sr: int, cfg: dict) -> tuple[np.ndarray, int]:
    mono = wav.mean(axis=0) if wav.ndim > 1 else wav
    target = cfg["target_sr"]
    if sr != target:
        mono = resample_linear(mono[None], sr, target)[0]
    peak = np.abs(mono).max()
    if peak > 0:
        mono = mono / peak * cfg["loudness_norm"]
    return mono.astype(np.float32), target


def process_utterance(utt: str, wav_path: str, out_dir: Path, cfg: dict) -> list[dict]:
    wav, sr = read_wav(wav_path)
    audio, sr = standardize(wav, sr, cfg)
    if cfg.get("use_separation"):
        audio = adapters.separate_vocals(audio, sr)
    vad_cfg = dict(cfg.get("vad", {}))
    engine = ENGINES.get(vad_cfg.pop("engine", "energy"), energy_vad)
    segments = engine(audio, sr, **vad_cfg)
    results = []
    for i, seg in enumerate(segments):
        dur = seg.end - seg.start
        if dur < cfg["min_segment_s"]:
            continue
        end = min(seg.end, seg.start + cfg["max_segment_s"])
        clip = audio[int(seg.start * sr) : int(end * sr)]
        if cfg.get("use_dnsmos_filter") and not adapters.dnsmos_filter(
            clip, sr, cfg["dnsmos_threshold"]
        ):
            continue
        seg_id = f"{utt}_{i:04d}"
        seg_path = out_dir / "wav" / f"{seg_id}.wav"
        os.makedirs(seg_path.parent, exist_ok=True)
        write_wav(str(seg_path), clip, sr)
        meta = {"utt": seg_id, "source": wav_path, "start": seg.start, "end": end,
                "duration": end - seg.start, "path": str(seg_path)}
        if cfg.get("use_asr"):
            try:
                meta.update(adapters.whisperx_transcribe(str(seg_path), cfg["asr_model"]))
            except RuntimeError as e:
                logging.warning(f"{seg_id}: ASR skipped ({e})")
        results.append(meta)
    return results


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scp", required=True, help="wav.scp of raw recordings")
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--config", default="", help="pipeline config json")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)
    cfg = dict(DEFAULT_CONFIG)
    if args.config:
        with open(args.config) as f:
            cfg.update(json.load(f))
    out_dir = Path(args.out_dir)
    os.makedirs(out_dir, exist_ok=True)
    all_meta = []
    for utt, path in read_scp(args.scp):
        try:
            all_meta.extend(process_utterance(utt, path, out_dir, cfg))
        except Exception as e:  # noqa: BLE001
            logging.warning(f"{utt} failed: {e}")
    with open(out_dir / "segments.json", "w") as f:
        json.dump(all_meta, f, indent=2)
    # emit wav.scp of produced segments for the tokenization stage
    with open(out_dir / "wav.scp", "w") as f:
        for m in all_meta:
            f.write(f"{m['utt']} {m['path']}\n")
    logging.info(f"pipeline produced {len(all_meta)} segments")
    return {"segments": len(all_meta)}


if __name__ == "__main__":
    main()
