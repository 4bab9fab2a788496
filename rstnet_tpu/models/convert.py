"""Checkpoint converters: PyTorch reference state dicts -> rstnet_tpu params.

Loads public checkpoints unchanged (kyutai Mimi/Moshi safetensors, litgpt
``lit_model.pth``) by mapping the reference's module names
(``moshi/models/compression.py``, ``modules/transformer.py``) onto this
framework's stacked-param pytrees. All inputs are name -> numpy array.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.core import Params
from rstnet_tpu.models.mimi import MimiModel
from rstnet_tpu.modules.seanet import SEANetDecoder, SEANetEncoder
from rstnet_tpu.modules.transformer import ProjectedTransformer, StreamingTransformer
from rstnet_tpu.quantization.rvq import (
    ResidualVectorQuantizer,
    SplitResidualVectorQuantizer,
)

Array = np.ndarray
SD = Mapping[str, Array]


def _get(sd: SD, name: str) -> jnp.ndarray:
    return jnp.asarray(np.asarray(sd[name]))


def _conv_params(sd: SD, prefix: str, has_bias: bool) -> Params:
    """Conv params at ``prefix`` (e.g. ``...conv.conv``), resolving plain,
    weight_norm (weight_g/weight_v) and parametrize-style names."""
    p: Params = {}
    if f"{prefix}.weight" in sd:
        p["weight"] = _get(sd, f"{prefix}.weight")
    elif f"{prefix}.weight_g" in sd:
        p["weight_g"] = _get(sd, f"{prefix}.weight_g")
        p["weight_v"] = _get(sd, f"{prefix}.weight_v")
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        p["weight_g"] = _get(sd, f"{prefix}.parametrizations.weight.original0")
        p["weight_v"] = _get(sd, f"{prefix}.parametrizations.weight.original1")
    else:
        raise KeyError(f"no conv weight found under {prefix}")
    if has_bias and f"{prefix}.bias" in sd:
        p["bias"] = _get(sd, f"{prefix}.bias")
    return p


def convert_streaming_transformer(
    sd: SD, prefix: str, module: StreamingTransformer
) -> Params:
    """Stack the reference's per-layer weights into [L, ...] params."""
    L = module.num_layers

    def stack(fmt: str) -> jnp.ndarray:
        return jnp.stack([_get(sd, fmt.format(i=i)) for i in range(L)])

    layers: Params = {
        "in_proj": stack(f"{prefix}.layers.{{i}}.self_attn.in_proj_weight"),
        "out_proj": stack(f"{prefix}.layers.{{i}}.self_attn.out_proj.weight"),
    }
    for n in ("norm1", "norm2"):
        if f"{prefix}.layers.0.{n}.alpha" in sd:
            alphas = [
                np.asarray(sd[f"{prefix}.layers.{i}.{n}.alpha"]).reshape(-1)
                for i in range(L)
            ]
            layers[n] = {"alpha": jnp.stack([jnp.asarray(a) for a in alphas])}
        else:
            layers[n] = {
                "weight": stack(f"{prefix}.layers.{{i}}.{n}.weight"),
                "bias": stack(f"{prefix}.layers.{{i}}.{n}.bias"),
            }
    if module.gating == "none":
        layers["linear1"] = stack(f"{prefix}.layers.{{i}}.linear1.weight")
        layers["linear2"] = stack(f"{prefix}.layers.{{i}}.linear2.weight")
    elif module.weights_per_step:
        S = module.weights_per_step
        layers["gating"] = {
            "linear_in": jnp.stack([
                jnp.stack([_get(sd, f"{prefix}.layers.{i}.gating.{s}.linear_in.weight") for s in range(S)])
                for i in range(L)
            ]),
            "linear_out": jnp.stack([
                jnp.stack([_get(sd, f"{prefix}.layers.{i}.gating.{s}.linear_out.weight") for s in range(S)])
                for i in range(L)
            ]),
        }
    else:
        layers["gating"] = {
            "linear_in": stack(f"{prefix}.layers.{{i}}.gating.linear_in.weight"),
            "linear_out": stack(f"{prefix}.layers.{{i}}.gating.linear_out.weight"),
        }
    if module.layer_scale is not None:
        layers["layer_scale_1"] = {"scale": stack(f"{prefix}.layers.{{i}}.layer_scale_1.scale")}
        layers["layer_scale_2"] = {"scale": stack(f"{prefix}.layers.{{i}}.layer_scale_2.scale")}
    return {"layers": layers}


def convert_projected_transformer(
    sd: SD, prefix: str, module: ProjectedTransformer
) -> Params:
    p = {
        "transformer": convert_streaming_transformer(
            sd, f"{prefix}.transformer", module.transformer
        )
    }
    if f"{prefix}.input_proj.weight" in sd:
        p["input_proj"] = _get(sd, f"{prefix}.input_proj.weight")
    for i in range(len(module.output_dimensions)):
        name = f"{prefix}.output_projs.{i}.weight"
        if name in sd:
            p[f"output_proj_{i}"] = _get(sd, name)
    return p


def convert_seanet(sd: SD, prefix: str, module: SEANetEncoder | SEANetDecoder) -> Params:
    """Map the reference's flat Sequential (activations included in indices)
    onto this framework's parameterized-layer list."""
    layers = []
    for pos, entry in enumerate(module.layout):
        kind = entry[0]
        if kind == "act":
            continue
        if kind == "conv":
            layers.append(_conv_params(sd, f"{prefix}.model.{pos}.conv.conv", entry[1].bias))
        elif kind == "convtr":
            layers.append(
                _conv_params(sd, f"{prefix}.model.{pos}.convtr.convtr", entry[1].bias)
            )
        elif kind == "resnet":
            block = entry[1]
            bp: Params = {"block": []}
            # reference block = Sequential(act, conv, act, conv, ...)
            for j in range(len(block.convs)):
                bp["block"].append(
                    _conv_params(sd, f"{prefix}.model.{pos}.block.{2 * j + 1}.conv.conv", True)
                )
            if block.shortcut is not None:
                bp["shortcut"] = _conv_params(sd, f"{prefix}.model.{pos}.shortcut.conv.conv", True)
            layers.append(bp)
    return {"layers": layers}


def convert_rvq(sd: SD, prefix: str, module: ResidualVectorQuantizer) -> Params:
    p: Params = {}
    if module.has_input_proj:
        p["input_proj"] = _get(sd, f"{prefix}.input_proj.weight")[..., 0]
    if module.has_output_proj:
        p["output_proj"] = _get(sd, f"{prefix}.output_proj.weight")[..., 0]

    def stack(name: str) -> jnp.ndarray:
        return jnp.stack([
            _get(sd, f"{prefix}.vq.layers.{k}._codebook.{name}") for k in range(module.n_q)
        ])

    init_name = "_initialized" if f"{prefix}.vq.layers.0._codebook._initialized" in sd else "inited"
    p["layers"] = {
        "embedding_sum": stack("embedding_sum"),
        "cluster_usage": stack("cluster_usage"),
        "initialized": stack(init_name).reshape(module.n_q).astype(jnp.float32),
    }
    return p


def convert_split_rvq(sd: SD, prefix: str, module: SplitResidualVectorQuantizer) -> Params:
    return {
        "rvq_first": convert_rvq(sd, f"{prefix}.rvq_first", module.rvq_first),
        "rvq_rest": convert_rvq(sd, f"{prefix}.rvq_rest", module.rvq_rest),
    }


def convert_mimi(sd: SD, model: MimiModel) -> Params:
    """Full Mimi checkpoint (e.g. kyutai tokenizer safetensors) -> params."""
    p: Params = {
        "encoder": convert_seanet(sd, "encoder", model.encoder),
        "decoder": convert_seanet(sd, "decoder", model.decoder),
        "encoder_transformer": convert_projected_transformer(
            sd, "encoder_transformer", model.encoder_transformer
        ),
        "decoder_transformer": convert_projected_transformer(
            sd, "decoder_transformer", model.decoder_transformer
        ),
        "quantizer": convert_split_rvq(sd, "quantizer", model.quantizer),
    }
    if model.downsample is not None:
        p["downsample"] = _conv_params(sd, "downsample.conv.conv.conv", False)
        p["upsample"] = _conv_params(sd, "upsample.convtr.convtr.convtr", False)
    return p


def _lin(sd: SD, prefix: str, want_bias: bool = True) -> Params:
    """Linear at ``prefix``; resolves both plain ``X.weight`` and the
    reference's LoRALinear nesting ``X.linear.weight``."""
    for cand in (prefix, f"{prefix}.linear"):
        if f"{cand}.weight" in sd:
            p: Params = {"weight": _get(sd, f"{cand}.weight")}
            if want_bias and f"{cand}.bias" in sd:
                p["bias"] = _get(sd, f"{cand}.bias")
            return p
    raise KeyError(f"no linear weight under {prefix}")


def convert_backbone(sd: SD, cfg, prefix: str = "") -> Params:
    """litgpt-layout checkpoint (``models/lit_model.py`` naming, also the
    flagship's LoRA-nested variant) -> Backbone params."""

    def block(i: int) -> Params:
        b = f"{prefix}transformer.h.{i}"
        p: Params = {
            "norm_1": _norm_sd(sd, f"{b}.norm_1"),
            "attn": _lin(sd, f"{b}.attn.attn"),
            "proj": _lin(sd, f"{b}.attn.proj"),
        }
        if not cfg.shared_attention_norm:
            p["norm_2"] = _norm_sd(sd, f"{b}.norm_2")
        if cfg.post_attention_norm:
            p["post_attention_norm"] = _norm_sd(sd, f"{b}.post_attention_norm")
        if cfg.post_mlp_norm:
            p["post_mlp_norm"] = _norm_sd(sd, f"{b}.post_mlp_norm")
        if cfg.mlp_class_name == "GptNeoxMLP":
            p["mlp"] = {"fc": _lin(sd, f"{b}.mlp.fc"), "proj": _lin(sd, f"{b}.mlp.proj")}
        elif cfg.mlp_class_name in ("LLaMAMLP", "GemmaMLP"):
            p["mlp"] = {
                "fc_1": _lin(sd, f"{b}.mlp.fc_1"),
                "fc_2": _lin(sd, f"{b}.mlp.fc_2"),
                "proj": _lin(sd, f"{b}.mlp.proj"),
            }
        else:  # LLaMAMoE
            p["mlp"] = {
                "gate": _lin(sd, f"{b}.mlp.gate"),
                "experts": jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[
                        {
                            "fc_1": _lin(sd, f"{b}.mlp.experts.{e}.fc_1"),
                            "fc_2": _lin(sd, f"{b}.mlp.experts.{e}.fc_2"),
                            "proj": _lin(sd, f"{b}.mlp.experts.{e}.proj"),
                        }
                        for e in range(cfg.n_expert)
                    ],
                ),
            }
        return p

    blocks = [block(i) for i in range(cfg.n_layer)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "wte": _get(sd, f"{prefix}transformer.wte.weight"),
        "blocks": stacked,
        "ln_f": _norm_sd(sd, f"{prefix}transformer.ln_f"),
        "lm_head": _lin(sd, f"{prefix}lm_head"),
    }


def _norm_sd(sd: SD, prefix: str) -> Params:
    p: Params = {"weight": _get(sd, f"{prefix}.weight")}
    if f"{prefix}.bias" in sd:
        p["bias"] = _get(sd, f"{prefix}.bias")
    return p


def convert_speech_lm(sd: SD, model) -> Params:
    """Flagship GPT checkpoint (``models/llama_streaming.py`` naming) ->
    SpeechTextLM params."""
    cfg = model.config
    p: Params = {
        "backbone": convert_backbone(sd, cfg),
        "codecformer": convert_streaming_transformer(sd, "codecformer", model.codecformer),
        "input_emb": jnp.stack(
            [_get(sd, f"input_emb.{k}.weight") for k in range(cfg.n_q)]
        ),
        "codecformer_text_emb": _get(sd, "codecformer_text_emb.weight"),
        "codecformer_emb": jnp.stack(
            [_get(sd, f"codecformer_emb.{k}.weight") for k in range(cfg.dep_q - 1)]
        ),
        "codecformer_in": jnp.stack(
            [
                _lin(sd, f"codecformer_in.{k}", False)["weight"]
                for k in range(cfg.dep_q if cfg.codecformer_multi_linear else 1)
            ]
        ),
        "audio_linears": {
            "weight": jnp.stack(
                [_lin(sd, f"audio_linears.{k}", False)["weight"] for k in range(cfg.dep_q)]
            )
        },
    }
    if cfg.codecformer_bias_proj:
        p["audio_linears"]["bias"] = jnp.stack(
            [_get(sd, f"audio_linears.{k}.bias") for k in range(cfg.dep_q)]
        )
    if cfg.codecformer_norm_emb:
        # post-embedding layer norms (ScaledEmbedding(norm=True))
        p["input_emb_norm"] = {
            "weight": jnp.stack(
                [_get(sd, f"input_emb.{k}.norm.weight") for k in range(cfg.n_q)]
            )[:, None, :],
            "bias": jnp.stack(
                [_get(sd, f"input_emb.{k}.norm.bias") for k in range(cfg.n_q)]
            )[:, None, :],
        }
        p["codecformer_emb_norm"] = {
            "weight": jnp.stack(
                [_get(sd, f"codecformer_emb.{k}.norm.weight") for k in range(cfg.dep_q - 1)]
            ),
            "bias": jnp.stack(
                [_get(sd, f"codecformer_emb.{k}.norm.bias") for k in range(cfg.dep_q - 1)]
            ),
        }
        p["codecformer_text_emb_norm"] = {
            "weight": _get(sd, "codecformer_text_emb.norm.weight"),
            "bias": _get(sd, "codecformer_text_emb.norm.bias"),
        }
    return p


def convert_moshi_lm(sd: SD, model) -> Params:
    """Moshi checkpoint (kyutai ``model.safetensors`` naming,
    ``moshi/models/lm.py``) -> MoshiLMModel params."""
    p: Params = {
        "emb": jnp.stack([_get(sd, f"emb.{k}.weight") for k in range(model.n_q)]),
        "text_emb": _get(sd, "text_emb.weight"),
        "text_linear": _lin(sd, "text_linear"),
        "transformer": convert_streaming_transformer(sd, "transformer", model.transformer),
        "out_norm": _norm_params(sd, "out_norm"),
        "depformer_in": jnp.stack(
            [
                _lin(sd, f"depformer_in.{k}", False)["weight"]
                for k in range(model.dep_q if model.depformer_multi_linear else 1)
            ]
        ),
        "depformer_emb": jnp.stack(
            [_get(sd, f"depformer_emb.{k}.weight") for k in range(model.dep_q - 1)]
        ),
        "depformer_text_emb": _get(sd, "depformer_text_emb.weight"),
        "depformer": convert_streaming_transformer(sd, "depformer", model.depformer),
        "linears": {
            "weight": jnp.stack(
                [_lin(sd, f"linears.{k}", False)["weight"] for k in range(model.dep_q)]
            )
        },
    }
    if f"linears.0.bias" in sd:
        p["linears"]["bias"] = jnp.stack(
            [_get(sd, f"linears.{k}.bias") for k in range(model.dep_q)]
        )
    return p


def _norm_params(sd: SD, prefix: str) -> Params:
    if f"{prefix}.alpha" in sd:
        return {"alpha": jnp.asarray(np.asarray(sd[f"{prefix}.alpha"]).reshape(-1))}
    return _norm_sd(sd, prefix)


def load_torch_state_dict(path: str) -> dict[str, Array]:
    """Load a checkpoint file (.safetensors or torch .pt/.pth) as numpy."""
    if str(path).endswith((".safetensors", ".sft", ".sfts")):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    pkg = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(pkg, dict) and "model" in pkg and isinstance(pkg["model"], dict):
        pkg = pkg["model"]
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in pkg.items()}


def load_mimi(path: str, model: MimiModel) -> Params:
    return convert_mimi(load_torch_state_dict(path), model)
