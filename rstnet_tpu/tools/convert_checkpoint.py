"""Checkpoint conversion CLI: public PyTorch checkpoints -> orbax params.

Converts kyutai Mimi/Moshi safetensors and litgpt ``lit_model.pth`` files
into this framework's param trees and saves them as orbax checkpoints (or
flat .npz), so training/inference never needs torch at runtime.

Usage:
  python -m rstnet_tpu.tools.convert_checkpoint --kind mimi \
      --input tokenizer-e351c8d8-checkpoint125.safetensors --output mimi_params
  python -m rstnet_tpu.tools.convert_checkpoint --kind moshi --input model.safetensors ...
  python -m rstnet_tpu.tools.convert_checkpoint --kind backbone \
      --model_name Llama-3.2-1B --input lit_model.pth ...
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--kind", required=True, choices=["mimi", "moshi", "backbone"])
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--format", default="orbax", choices=["orbax", "npz"])
    parser.add_argument("--model_name", default="", help="backbone registry name")
    parser.add_argument("--model_config", default="", help="backbone config yaml")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)

    from rstnet_tpu.models import convert

    sd = convert.load_torch_state_dict(args.input)
    if args.kind == "mimi":
        from rstnet_tpu.models.mimi import mimi_24k

        model = mimi_24k()
        params = convert.convert_mimi(sd, model)
    elif args.kind == "moshi":
        from rstnet_tpu.models.moshi_lm import moshi_7b

        model = moshi_7b()
        params = convert.convert_moshi_lm(sd, model)
    else:
        from rstnet_tpu.models.config import Config

        cfg = (
            Config.from_file(args.model_config)
            if args.model_config
            else Config.from_name(args.model_name)
        )
        params = convert.convert_backbone(sd, cfg)

    if args.format == "npz":
        from rstnet_tpu.training.checkpoint import export_numpy

        export_numpy(args.output, params)
    else:
        from rstnet_tpu.training.checkpoint import save_model

        save_model(args.output, params)
    from rstnet_tpu.core import model_size_report

    logging.info(f"converted {args.kind}: {model_size_report(params)} -> {args.output}")


if __name__ == "__main__":
    main()
