"""SSL token resynthesis CLI: semantic tokens -> 22.05 kHz wavs.

Completes the GLM-4-Voice loop at the recipe level (reference
``MLLM_v2/tools/tokenizer/GLM4V/semantic.py:143-151`` detokenize, driven by
its inference scripts): reads token shards produced by
``offline_tokenization --mode ssl`` (or a wav scp to round-trip
tokenize -> detokenize) and writes one wav per utterance through the
in-repo JAX CosyVoice flow + HiFT stack (``models/glm4v_decoder.py``).
"""

from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tokens", default="",
                        help=".npz token shard (utt -> [T] int ids)")
    parser.add_argument("--scp", default="",
                        help="wav scp to tokenize->detokenize round-trip "
                             "(needs --ssl-checkpoint)")
    parser.add_argument("--ssl-checkpoint", default="",
                        help="GLM-4-Voice tokenizer checkpoint dir "
                             "(only for --scp round-trips)")
    parser.add_argument("--decoder-checkpoint", required=True,
                        help="glm-4-voice-decoder dir "
                             "(config.yaml + flow.pt + hift.pt)")
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--stream", action="store_true",
                        help="block-streaming synthesis (mel-overlap fades "
                             "+ source cache) instead of offline")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)
    if not args.tokens and not args.scp:
        parser.error("one of --tokens / --scp is required")

    import jax.numpy as jnp

    from rstnet_tpu.models.glm4v_decoder import load_glm4v_decoder
    from rstnet_tpu.utils.audio import write_wav

    decoder = load_glm4v_decoder(args.decoder_checkpoint)
    sr = decoder.hift.config.sampling_rate
    os.makedirs(args.out_dir, exist_ok=True)

    def items():
        if args.tokens:
            shard = np.load(args.tokens)
            for utt in shard.files:
                yield utt, np.asarray(shard[utt], np.int32).reshape(-1)
        else:
            from rstnet_tpu.data.tokenizers.ssl_tokenizer import SSLTokenizer
            from rstnet_tpu.utils.audio import read_wav

            tok = SSLTokenizer(checkpoint=args.ssl_checkpoint)
            with open(args.scp) as fh:
                for line in fh:
                    utt, path = line.strip().split(None, 1)
                    wav, in_sr = read_wav(path)
                    yield utt, tok.tokenize(wav.mean(0), in_sr)

    n = 0
    for utt, ids in items():
        if ids.size == 0:
            logging.warning("%s: empty token stream, skipped", utt)
            continue
        token = jnp.asarray(ids[None])
        wav = (decoder.stream_inference(token) if args.stream
               else decoder.offline_inference(token))
        out = Path(args.out_dir) / f"{utt}.wav"
        write_wav(str(out), np.asarray(wav)[0], sr)
        n += 1
        logging.info("%s -> %s (%.2f s)", utt, out, wav.shape[1] / sr)
    logging.info("resynthesized %d utterances", n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
