"""LoRA as a pure param-tree transform.

Capability parity with the reference's LoRA layer zoo
(``MLLM_v2/models/llama_streaming.py:35-442``: LoRALinear, LoRAQKVLinear with
GQA-aware packing, mark_only_lora_as_trainable, merge_lora_weights), designed
functionally: LoRA factors live as ``lora`` / ``lora_{q,k,v}`` sub-dicts
inside the affected linears' param dicts; the forward fuses the low-rank
branch; ``merge_lora`` folds factors into the base weights as a pure function
(no in-place mutation, no wrapper classes); the trainable set is just a
boolean pytree mask handed to the optimizer.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from rstnet_tpu.core import Params
from rstnet_tpu.models.config import Config


def _ab_init(key, r: int, in_dim: int, out_dim: int, dtype) -> Params:
    # Reference semantics: A kaiming-uniform, B zeros -> initial delta is 0.
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "A": jax.random.uniform(key, (r, in_dim), dtype, -bound, bound),
        "B": jnp.zeros((out_dim, r), dtype),
    }


def init_lora(cfg: Config, key: jax.Array, dtype=jnp.float32) -> Params:
    """Build a LoRA overlay matching the Backbone params structure (stacked
    [L, ...] inside ``blocks``). Merge it with ``attach_lora``."""
    assert cfg.lora_r > 0
    r = cfg.lora_r
    n_embd, hs = cfg.n_embd, cfg.head_size
    keys = jax.random.split(key, cfg.n_layer * 8 + 1)

    def per_layer(i: int) -> Params:
        ks = jax.random.split(keys[i], 8)
        attn: Params = {}
        if cfg.lora_query:
            attn["lora_q"] = _ab_init(ks[0], r, n_embd, cfg.n_head * hs, dtype)
        if cfg.lora_key:
            attn["lora_k"] = _ab_init(ks[1], r, n_embd, cfg.n_query_groups * hs, dtype)
        if cfg.lora_value:
            attn["lora_v"] = _ab_init(ks[2], r, n_embd, cfg.n_query_groups * hs, dtype)
        out: Params = {}
        if attn:
            out["attn"] = attn
        if cfg.lora_projection:
            out["proj"] = {"lora": _ab_init(ks[3], r, cfg.n_head * hs, n_embd, dtype)}
        if cfg.lora_mlp:
            if cfg.mlp_class_name == "GptNeoxMLP":
                out["mlp"] = {
                    "fc": {"lora": _ab_init(ks[4], r, n_embd, cfg.intermediate_size, dtype)},
                    "proj": {"lora": _ab_init(ks[5], r, cfg.intermediate_size, n_embd, dtype)},
                }
            else:
                out["mlp"] = {
                    "fc_1": {"lora": _ab_init(ks[4], r, n_embd, cfg.intermediate_size, dtype)},
                    "fc_2": {"lora": _ab_init(ks[5], r, n_embd, cfg.intermediate_size, dtype)},
                    "proj": {"lora": _ab_init(ks[6], r, cfg.intermediate_size, n_embd, dtype)},
                }
        return out

    stacked = _stack_layers([per_layer(i) for i in range(cfg.n_layer)])
    overlay: Params = {"blocks": stacked} if stacked else {}
    if cfg.lora_head:
        overlay["lm_head"] = {
            "lora": _ab_init(keys[-1], r, n_embd, cfg.padded_vocab_size, dtype)
        }
    return overlay


def _stack_layers(layers: list[Params]) -> Params:
    if not layers or not layers[0]:
        return {}
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def init_lora_streaming_transformer(
    transformer, key: jax.Array, r: int, alpha: int, dtype=jnp.float32
) -> Params:
    """LoRA overlay for a ``StreamingTransformer`` (LoRA-Moshi fine-tuning;
    parity: ``MLLM_v2/modules/transformer_lora.py`` + ``models/model_lora.py``).
    Attaches factors to the packed in_proj and out_proj of every layer."""
    L, d = transformer.num_layers, transformer.d_model
    assert not transformer.weights_per_step, "LoRA on per-step weights unsupported"
    keys = jax.random.split(key, L)

    def per_layer(k):
        k1, k2 = jax.random.split(k)
        scaling = jnp.asarray(alpha / r, dtype)
        lin = _ab_init(k1, r, d, 3 * d, dtype)
        lout = _ab_init(k2, r, d, d, dtype)
        return {
            "lora_in_proj": {**lin, "scaling": scaling},
            "lora_out_proj": {**lout, "scaling": scaling},
        }

    return {"layers": jax.tree.map(lambda *xs: jnp.stack(xs), *[per_layer(k) for k in keys])}


def attach_lora(params: Params, overlay: Params) -> Params:
    """Deep-merge the LoRA overlay into base params (pure)."""
    if not isinstance(overlay, dict) or not isinstance(params, dict):
        return overlay
    out = dict(params)
    for k, v in overlay.items():
        out[k] = attach_lora(params.get(k, {}), v) if k in params else v
    return out


def strip_lora(params: Params) -> Params:
    """Remove all LoRA factors (pure)."""
    if not isinstance(params, dict):
        return params
    return {
        k: strip_lora(v)
        for k, v in params.items()
        if not (k == "lora" or k.startswith("lora_"))
    }


def is_lora_path(path: tuple) -> bool:
    return any(
        getattr(p, "key", None) == "lora" or str(getattr(p, "key", "")).startswith("lora_")
        for p in path
    )


def lora_trainable_mask(params: Params) -> Params:
    """Boolean pytree: True only on LoRA leaves
    (reference ``mark_only_lora_as_trainable``, llama_streaming.py:409)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: is_lora_path(path), params
    )


def merge_lora(cfg: Config, params: Params) -> Params:
    """Fold LoRA factors into base weights and drop them (pure function;
    reference ``merge_lora_weights``/``LoRALinear.merge``,
    llama_streaming.py:99-131,1120)."""
    scaling = cfg.lora_alpha / cfg.lora_r

    def merge_linear(p: Params) -> Params:
        if "lora" not in p:
            return p
        out = dict(p)
        lora = out.pop("lora")
        delta = (lora["B"] @ lora["A"]) * scaling
        out["weight"] = p["weight"] + delta.astype(p["weight"].dtype)
        return out

    def merge_attn(p: Params) -> Params:
        """Scatter q/k/v deltas into the packed QKV weight
        (grouped layout [G x (q_per_kv q-rows, 1 k-row, 1 v-row)] x head_size,
        the reference's ``LoRAQKVLinear.zero_pad`` semantics)."""
        if not any(k in p for k in ("lora_q", "lora_k", "lora_v")):
            return p
        out = dict(p)
        G = cfg.n_query_groups
        q_per_kv = cfg.n_head // G
        hs = cfg.head_size
        W = p["weight"]  # [..., packed, in] (leading L axis when stacked)
        lead = W.shape[:-2]
        Wv = W.reshape(lead + (G, q_per_kv + 2, hs, W.shape[-1]))
        for name, rows in (("lora_q", q_per_kv), ("lora_k", 1), ("lora_v", 1)):
            if name not in p:
                continue
            lora = out.pop(name)
            delta = (lora["B"] @ lora["A"]) * scaling  # [..., G*rows*hs, in]
            delta = delta.reshape(lead + (G, rows, hs, W.shape[-1])).astype(W.dtype)
            if name == "lora_q":
                Wv = Wv.at[..., :, :q_per_kv, :, :].add(delta)
            elif name == "lora_k":
                Wv = Wv.at[..., :, q_per_kv : q_per_kv + 1, :, :].add(delta)
            else:
                Wv = Wv.at[..., :, q_per_kv + 1 :, :, :].add(delta)
        out["weight"] = Wv.reshape(W.shape)
        return out

    def walk(p: Params, name: str = "") -> Params:
        if not isinstance(p, dict):
            return p
        if name == "attn" and "weight" in p:
            return merge_attn(p)
        if "weight" in p:
            p = merge_linear(p)
        return {k: walk(v, k) if isinstance(v, dict) else v for k, v in p.items()}

    # blocks are stacked along L; merging is vmappable but plain ops broadcast
    # fine since all factors carry the leading L axis already.
    return walk(params)


def lora_filter(params: Params) -> Params:
    """Keep only the LoRA factor subtrees — the PEFT checkpoint is just the
    adapters (parity: ``lora_filter``/``mark_only_lora_as_trainable``,
    ``MLLM_v2/models/llama_streaming.py:409-446``). The inverse is
    ``attach_lora`` onto a freshly-initialized (or pretrained) base tree."""
    def walk(p: Params) -> Params:
        out = {}
        for k, v in p.items():
            # any "lora"/"lora_*" subtree is an adapter (matches is_lora_path
            # and strip_lora — includes the streaming transformer's
            # lora_in_proj/lora_out_proj overlays)
            if k == "lora" or k.startswith("lora_"):
                out[k] = v
            elif isinstance(v, dict):
                sub = walk(v)
                if sub:
                    out[k] = sub
        return out

    return walk(params)
