"""Codec batch encode/decode round-trip CLI.

Capability parity with ``AudioCodec/MimiCodec/inference.py``: read wavs from
an scp, encode to codes with the trained codec, decode back, and write
paired ref/deg wavs for the metric suite.
"""

from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from rstnet_tpu.utils.audio import read_wav, resample_linear, write_wav


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="codec yaml config")
    parser.add_argument("--checkpoint_dir", required=True)
    parser.add_argument("--scp", required=True)
    parser.add_argument("--out_dir", required=True)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)

    from rstnet_tpu.training.checkpoint import latest_checkpoint, restore_checkpoint
    from rstnet_tpu.training.codec_trainer import build_from_config

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    model, _, _ = build_from_config(cfg)
    params, buffers = model.init(jax.random.PRNGKey(0))
    ckpt = latest_checkpoint(args.checkpoint_dir)
    if ckpt is not None:
        state, _ = restore_checkpoint(
            ckpt, {"g": {"params": params, "buffers": buffers}}, partial=True
        )
        params, buffers = state["g"]["params"], state["g"]["buffers"]
        logging.info(f"loaded {ckpt}")
    encode = jax.jit(model.encode)
    decode = jax.jit(model.decode)

    ref_dir = Path(args.out_dir) / "ref"
    deg_dir = Path(args.out_dir) / "deg"
    os.makedirs(ref_dir, exist_ok=True)
    os.makedirs(deg_dir, exist_ok=True)
    n = 0
    hop = model.hop_length * model.resample_stride
    from rstnet_tpu.tools.offline_tokenization import _wav_entries

    # bare-path or utt+path scp convention — one shared parser
    entries = _wav_entries(args.scp)
    for utt, path in entries:
        wav, sr = read_wav(path)
        wav = resample_linear(wav[:1], sr, model.sample_rate)
        T = wav.shape[-1]
        pad = (-T) % hop
        padded = np.pad(wav, ((0, 0), (0, pad)))
        codes = encode(params, buffers, jnp.asarray(padded[None]))
        rec = np.asarray(decode(params, buffers, codes))[0, 0, :T]
        write_wav(str(ref_dir / f"{utt}.wav"), wav[0], model.sample_rate)
        write_wav(str(deg_dir / f"{utt}.wav"), rec, model.sample_rate)
        n += 1
    logging.info(f"round-tripped {n} utterances into {args.out_dir}")
    return n


if __name__ == "__main__":
    main()
