"""Decoder-only LLM backbone (litgpt-capability) with streaming ring-KV.

Capability parity with ``MLLM_v2/models/lit_model.py`` (GPT:19, Block:179,
CausalSelfAttention:243, GptNeoxMLP/LLaMAMLP/GemmaMLP/LLaMAMoE:376-438,
build_rope_cache:441, RMSNorm:693) and the streaming rewrite of
``models/llama_streaming.py:775-1010`` (LLAMAStreamingTransformer, windowed
causal bias, offset-indexed RoPE): MHA/GQA/MQA in one packed QKV layout,
partial rotary with Llama-3.1 adjustments, sliding-window layers, logit
softcapping, MoE, parallel/sequential residual, and a ring-KV streaming step.

TPU-first: blocks are stacked along a leading layer axis and iterated with
``lax.scan``; per-layer sliding-window sizes ride the scan as data; the KV
cache stores *unexpanded* GQA heads. LoRA attaches as optional ``lora``
sub-dicts on any linear (see ``rstnet_tpu/models/lora.py``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from rstnet_tpu.core import Params, State, lora_dropout
from rstnet_tpu.models.config import Config, rope_extra_config
from rstnet_tpu.ops.attention import ring_kv_buffers, ring_kv_update
from rstnet_tpu.ops.rope import apply_rope_halved, build_rope_cache

_NEG_INF = float("-inf")


def linear(params: Params, x: jax.Array, scaling: float = 1.0, drop=None) -> jax.Array:
    """Linear with optional fused LoRA branch (``lora`` sub-dict) and
    optional weight-only int8 quantization (``w_int8`` + per-out-channel
    ``scale``): decode at batch 1 is HBM-bound on weight reads, so int8
    storage halves the frame-step traffic; dequant fuses into the matmul.
    ``drop``: optional ``(rate, key)`` LoRA-branch dropout (training only)."""
    if "w_int8" in params:
        w = params["w_int8"].astype(x.dtype) * params["scale"].astype(x.dtype)[:, None]
        y = x @ w.T
    else:
        y = x @ params["weight"].T.astype(x.dtype)
    if "lora" in params:
        lp = params["lora"]
        xd = lora_dropout(x, drop)
        y = y + (xd @ lp["A"].T.astype(x.dtype)) @ lp["B"].T.astype(x.dtype) * scaling
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def quantize_linear_int8(p: Params) -> Params:
    """Per-output-channel symmetric int8 weight quantization (pure)."""
    out = {k: v for k, v in p.items() if k != "weight"}
    w = p["weight"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-1) / 127.0  # [..., out]
    scale = jnp.maximum(scale, 1e-8)
    out["w_int8"] = jnp.clip(jnp.round(w / scale[..., None]), -127, 127).astype(jnp.int8)
    out["scale"] = scale
    return out


def quantize_backbone_int8(params: Params) -> Params:
    """Quantize the backbone's big linears (attn/proj/mlp/lm_head) to int8
    for serving; norms, embeddings and biases stay bf16/f32."""

    def walk(p, name=""):
        if not isinstance(p, dict):
            return p
        if "weight" in p and name in (
            "attn", "proj", "fc", "fc_1", "fc_2", "lm_head", "gate",
        ) and p["weight"].ndim >= 2:
            return quantize_linear_int8(p)
        return {k: walk(v, k) for k, v in p.items()}

    return walk(params)


def _linear_init(key, out_dim, in_dim, use_bias, dtype):
    bound = 1.0 / math.sqrt(in_dim)
    k1, k2 = jax.random.split(key)
    p = {"weight": jax.random.uniform(k1, (out_dim, in_dim), dtype, -bound, bound)}
    if use_bias:
        p["bias"] = jax.random.uniform(k2, (out_dim,), dtype, -bound, bound)
    return p


@dataclasses.dataclass(frozen=True)
class Backbone:
    """The temporal transformer. Operates on embeddings (callers fuse their
    own token/audio embeddings); ``wte`` is provided for text-only use."""

    config: Config

    @property
    def cfg(self) -> Config:
        return self.config

    # -- init ----------------------------------------------------------------

    def _init_block(self, key: jax.Array, dtype) -> Params:
        cfg = self.cfg
        keys = jax.random.split(key, 10)
        qkv_shape = (cfg.n_head + 2 * cfg.n_query_groups) * cfg.head_size
        p: Params = {
            "norm_1": _norm_init(cfg, dtype),
            "attn": _linear_init(keys[0], qkv_shape, cfg.n_embd, cfg.attn_bias or cfg.bias, dtype),
            "proj": _linear_init(keys[1], cfg.n_embd, cfg.head_size * cfg.n_head, cfg.bias, dtype),
            "mlp": self._init_mlp(keys[2], dtype),
        }
        if not cfg.shared_attention_norm:
            p["norm_2"] = _norm_init(cfg, dtype)
        if cfg.post_attention_norm:
            p["post_attention_norm"] = _norm_init(cfg, dtype)
        if cfg.post_mlp_norm:
            p["post_mlp_norm"] = _norm_init(cfg, dtype)
        return p

    def _init_mlp(self, key: jax.Array, dtype) -> Params:
        cfg = self.cfg
        keys = jax.random.split(key, 4)
        if cfg.mlp_class_name == "GptNeoxMLP":
            return {
                "fc": _linear_init(keys[0], cfg.intermediate_size, cfg.n_embd, cfg.bias, dtype),
                "proj": _linear_init(keys[1], cfg.n_embd, cfg.intermediate_size, cfg.bias, dtype),
            }
        if cfg.mlp_class_name in ("LLaMAMLP", "GemmaMLP"):
            return {
                "fc_1": _linear_init(keys[0], cfg.intermediate_size, cfg.n_embd, cfg.bias, dtype),
                "fc_2": _linear_init(keys[1], cfg.intermediate_size, cfg.n_embd, cfg.bias, dtype),
                "proj": _linear_init(keys[2], cfg.n_embd, cfg.intermediate_size, cfg.bias, dtype),
            }
        if cfg.mlp_class_name == "LLaMAMoE":
            ekeys = jax.random.split(keys[1], cfg.n_expert)

            def one(k):
                ks = jax.random.split(k, 3)
                return {
                    "fc_1": _linear_init(ks[0], cfg.intermediate_size, cfg.n_embd, False, dtype),
                    "fc_2": _linear_init(ks[1], cfg.intermediate_size, cfg.n_embd, False, dtype),
                    "proj": _linear_init(ks[2], cfg.n_embd, cfg.intermediate_size, False, dtype),
                }

            return {
                "gate": _linear_init(keys[0], cfg.n_expert, cfg.n_embd, False, dtype),
                "experts": jax.vmap(one)(ekeys),
            }
        raise ValueError(cfg.mlp_class_name)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        cfg = self.cfg
        keys = jax.random.split(key, cfg.n_layer + 3)
        blocks = jax.vmap(lambda k: self._init_block(k, dtype))(keys[: cfg.n_layer])
        p: Params = {
            "wte": jax.random.normal(keys[-3], (cfg.padded_vocab_size, cfg.n_embd), dtype) * 0.02,
            "blocks": blocks,
            "ln_f": _norm_init(cfg, dtype),
            "lm_head": _linear_init(keys[-2], cfg.padded_vocab_size, cfg.n_embd, cfg.lm_head_bias, dtype),
        }
        return p

    # -- rope ----------------------------------------------------------------

    def rope(self, positions: jax.Array) -> tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        return build_rope_cache(
            0, cfg.rope_n_elem, base=cfg.rope_base,
            condense_ratio=cfg.rope_condense_ratio,
            extra_config=rope_extra_config(cfg),
            positions=positions.astype(jnp.float32),
        )

    # -- per-layer window sizes (sliding-window placement) --------------------

    def layer_windows(self) -> jax.Array:
        """Per-layer attention window (0 = use config.context / full)."""
        cfg = self.cfg
        out = []
        for i in range(cfg.n_layer):
            if cfg.sliding_window_size is not None and i % cfg.sliding_window_layer_stride == 0:
                out.append(cfg.sliding_window_size)
            else:
                out.append(0)
        return jnp.asarray(out, jnp.int32)

    # -- attention ------------------------------------------------------------

    def _qkv(self, block: Params, x: jax.Array, drop=None):
        cfg = self.cfg
        B, T, _ = x.shape
        scaling = cfg.lora_alpha / cfg.lora_r if cfg.lora_r else 1.0
        qkv = linear(block["attn"], x, scaling, drop)
        q_per_kv = cfg.n_head // cfg.n_query_groups
        qkv = qkv.reshape(B, T, cfg.n_query_groups, q_per_kv + 2, cfg.head_size)
        qkv = jnp.transpose(qkv, (0, 2, 3, 1, 4))  # [B, G, q_per_kv+2, T, hs]
        q = qkv[:, :, :q_per_kv].reshape(B, cfg.n_head, T, cfg.head_size)
        k = qkv[:, :, q_per_kv].reshape(B, cfg.n_query_groups, T, cfg.head_size)
        v = qkv[:, :, q_per_kv + 1].reshape(B, cfg.n_query_groups, T, cfg.head_size)

        # One shared dropped input for q/k/v, matching the reference's
        # LoRAQKVLinear (a single nn.Dropout feeds the packed A).
        xd = lora_dropout(x, drop)

        def lora_delta(lp, heads):
            d = (xd @ lp["A"].T.astype(x.dtype)) @ lp["B"].T.astype(x.dtype) * scaling
            return jnp.transpose(d.reshape(B, T, heads, cfg.head_size), (0, 2, 1, 3))

        attn = block["attn"]
        if "lora_q" in attn:
            q = q + lora_delta(attn["lora_q"], cfg.n_head)
        if "lora_k" in attn:
            k = k + lora_delta(attn["lora_k"], cfg.n_query_groups)
        if "lora_v" in attn:
            v = v + lora_delta(attn["lora_v"], cfg.n_query_groups)
        return q, k, v

    def _rope_qk(self, q, k, cos, sin):
        n = self.cfg.rope_n_elem
        q = jnp.concatenate([apply_rope_halved(q[..., :n], cos, sin), q[..., n:]], -1)
        k = jnp.concatenate([apply_rope_halved(k[..., :n], cos, sin), k[..., n:]], -1)
        return q, k

    def _attention(self, q, k, v, pos_q, pos_k, window, allow_flash: bool = False,
                   min_pos=None, kv_scales=(None, None)):
        """Windowed-causal attention with GQA repeat, f32 softmax, and
        optional logit softcapping. ``window``: traced per-layer scalar
        (0 = no sliding window; config.context still applies).

        Training forwards route through the Pallas splash kernel when the
        config enables it and the shape qualifies — O(T) memory at context
        3000 instead of the [B, H, T, T] logits tensor."""
        cfg = self.cfg
        if allow_flash and cfg.sequence_parallel:
            from rstnet_tpu.ops.context_parallel import (
                context_parallel_attention,
                seq_axis_size,
            )
            from rstnet_tpu.parallel.pipeline import pipe_axis_size

            n_seq = seq_axis_size()
            # nested shard_map is unsupported: when the layer loop is
            # pipelined (manual over `pipe`), attention stays dense and the
            # seq axis falls back to GSPMD's automatic partitioning
            in_pipeline = cfg.pipeline_parallel and pipe_axis_size() > 1
            if n_seq > 1 and q.shape[2] % n_seq == 0 and not in_pipeline:
                if k.shape[1] != q.shape[1]:
                    rep = q.shape[1] // k.shape[1]
                    k = jnp.repeat(k, rep, axis=1)
                    v = jnp.repeat(v, rep, axis=1)
                return context_parallel_attention(
                    q, k, v,
                    context=cfg.context,
                    scale=1.0 / math.sqrt(cfg.attention_scores_scalar or cfg.head_size),
                    softcap=cfg.attention_logit_softcapping,
                    window=window,
                )
        if allow_flash and cfg.sliding_window_size is None:
            from rstnet_tpu.ops.flash_attention import flash_attention, flash_qualifies

            if flash_qualifies(
                q.shape[2], cfg.context, cfg.attention_logit_softcapping,
                cfg.use_flash_attention,
            ):
                scale = 1.0 / math.sqrt(cfg.attention_scores_scalar or cfg.head_size)
                return flash_attention(q, k, v, cfg.context, scale)
        B, H, Tq, D = q.shape
        Hkv = k.shape[1]
        # NOTE: the masking/GQA/int8 core below intentionally mirrors
        # ops/attention.masked_attention plus the backbone-only extras
        # (softcap, per-layer sliding window, attention_scores_scalar).
        # Fixes to the min_pos/ring-validity/int8-scale logic must be
        # applied to BOTH paths.
        # GQA via a grouped einsum — never materialize the repeated K/V
        # (a repeat would copy the ring cache H/Hkv x wider per layer)
        g = H // Hkv
        qg = q.reshape(B, Hkv, g, Tq, D)
        scale = 1.0 / math.sqrt(cfg.attention_scores_scalar or cfg.head_size)
        k_scale, v_scale = kv_scales
        logits = jnp.einsum(
            "bhgtd,bhsd->bhgts", qg, k.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * scale
        if k_scale is not None:
            # int8-KV ring: fold the per-step dequant scale into the logits
            logits = logits * k_scale.astype(jnp.float32)[:, :, None, None, :]
        if cfg.attention_logit_softcapping is not None:
            cap = cfg.attention_logit_softcapping
            logits = jnp.tanh(logits / cap) * cap
        delta = pos_q[:, None] - pos_k[None, :]
        mask = (pos_k[None, :] >= 0) & (delta >= 0)
        if cfg.context is not None:
            mask = mask & (delta < cfg.context)
        mask = mask & ((window <= 0) | (delta < window))
        if min_pos is not None:
            # per-batch-row session floor (multi-session batched decode: a
            # slot that joined later must not see keys from before its join)
            bmask = mask[None] & (pos_k[None, None, :] >= min_pos[:, None, None])
            logits = jnp.where(bmask[:, None, None], logits, _NEG_INF)
        else:
            logits = jnp.where(mask[None, None, None], logits, _NEG_INF)
        att = jax.nn.softmax(logits, axis=-1)
        av_dtype = q.dtype if v_scale is not None else v.dtype
        att = att.astype(av_dtype)
        if v_scale is not None:
            att = att * v_scale.astype(av_dtype)[:, :, None, None, :]
        out = jnp.einsum("bhgts,bhsd->bhgtd", att, v.astype(av_dtype))
        return out.reshape(B, H, Tq, D)

    # -- block ----------------------------------------------------------------

    def _block(self, block: Params, x, cos, sin, pos_q, pos_k, window, kv_cache, offset,
               drop_key=None, min_pos=None):
        cfg = self.cfg
        B, T, _ = x.shape

        def site(i):
            # Independent LoRA-dropout mask per projection site in the block.
            if drop_key is None:
                return None
            return (cfg.lora_dropout, jax.random.fold_in(drop_key, i))

        x_normed = _norm_apply(cfg, block["norm_1"], x)
        q, k, v = self._qkv(block, x_normed, site(0))
        q, k = self._rope_qk(q, k, cos, sin)
        allow_flash = kv_cache is None and isinstance(offset, int) and offset == 0
        kv_scales = (None, None)
        if kv_cache is not None:
            kv_cache, pos_k, _ = ring_kv_update(kv_cache, offset, k, v)
            k, v = kv_cache["k"], kv_cache["v"]
            kv_scales = (kv_cache.get("k_scale"), kv_cache.get("v_scale"))
        y = self._attention(
            q, k, v, pos_q, pos_k, window, allow_flash, min_pos, kv_scales
        )
        y = jnp.transpose(y, (0, 2, 1, 3)).reshape(B, T, cfg.head_size * cfg.n_head)
        scaling = cfg.lora_alpha / cfg.lora_r if cfg.lora_r else 1.0
        attn_out = linear(block["proj"], y, scaling, site(1))
        if cfg.post_attention_norm:
            attn_out = _norm_apply(cfg, block["post_attention_norm"], attn_out)
        if cfg.parallel_residual:
            mlp_in = x_normed if cfg.shared_attention_norm else _norm_apply(cfg, block["norm_2"], x)
            x = self._mlp(block["mlp"], mlp_in, site(2)) + attn_out + x
        else:
            x = attn_out + x
            h = self._mlp(block["mlp"], _norm_apply(cfg, block["norm_2"], x), site(2))
            if cfg.post_mlp_norm:
                h = _norm_apply(cfg, block["post_mlp_norm"], h)
            x = h + x
        return x, kv_cache

    def _mlp(self, mlp: Params, x: jax.Array, drop=None) -> jax.Array:
        cfg = self.cfg
        scaling = cfg.lora_alpha / cfg.lora_r if cfg.lora_r else 1.0
        approx = cfg.gelu_approximate != "none"

        def sub(i):
            if drop is None:
                return None
            return (drop[0], jax.random.fold_in(drop[1], i))

        if cfg.mlp_class_name == "GptNeoxMLP":
            h = jax.nn.gelu(linear(mlp["fc"], x, scaling, sub(0)), approximate=approx)
            return linear(mlp["proj"], h, scaling, sub(1))
        if cfg.mlp_class_name == "LLaMAMLP":
            h = jax.nn.silu(linear(mlp["fc_1"], x, scaling, sub(0))) * linear(
                mlp["fc_2"], x, scaling, sub(1)
            )
            return linear(mlp["proj"], h, scaling, sub(2))
        if cfg.mlp_class_name == "GemmaMLP":
            h = jax.nn.gelu(linear(mlp["fc_1"], x, scaling, sub(0)), approximate=approx) * linear(
                mlp["fc_2"], x, scaling, sub(1)
            )
            return linear(mlp["proj"], h, scaling, sub(2))
        if cfg.mlp_class_name == "LLaMAMoE":
            return self._moe(mlp, x)
        raise ValueError(cfg.mlp_class_name)

    def _moe(self, mlp: Params, x: jax.Array) -> jax.Array:
        """Dense top-k mixture-of-experts (``lit_model.py:414-438``): router
        softmax over top-k, combine via a dense one-hot weight matrix —
        XLA-friendly; expert parallelism shards the expert axis later."""
        cfg = self.cfg
        B, T, C = x.shape
        flat = x.reshape(-1, C)
        router = linear(mlp["gate"], flat)
        probs, indices = lax.top_k(router, cfg.n_expert_per_token)
        probs = jax.nn.softmax(probs.astype(jnp.float32), axis=-1).astype(x.dtype)
        combine = jax.nn.one_hot(indices, cfg.n_expert, dtype=x.dtype) * probs[..., None]
        combine = jnp.sum(combine, axis=1)  # [N, E]
        e = mlp["experts"]
        h1 = jnp.einsum("nd,eid->nei", flat, e["fc_1"]["weight"].astype(x.dtype))
        h2 = jnp.einsum("nd,eid->nei", flat, e["fc_2"]["weight"].astype(x.dtype))
        h = jax.nn.silu(h1) * h2
        y = jnp.einsum("nei,edi->ned", h, e["proj"]["weight"].astype(x.dtype))
        y = jnp.einsum("ned,ne->nd", y, combine)
        return y.reshape(B, T, C)

    # -- forward ---------------------------------------------------------------

    def embed(self, params: Params, tokens: jax.Array) -> jax.Array:
        x = jnp.take(params["wte"], tokens, axis=0)
        if self.cfg.scale_embeddings:
            x = x * jnp.asarray(self.cfg.n_embd**0.5, x.dtype)
        return x

    def __call__(
        self, params: Params, x: jax.Array, offset: jax.Array | int = 0,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Offline forward over embeddings: [B, T, D] -> [B, T, D] (post ln_f).
        ``dropout_rng`` activates LoRA-branch dropout (``config.lora_dropout``)
        for training forwards; None (the default) is fully deterministic."""
        cfg = self.cfg
        T = x.shape[1]
        positions = jnp.asarray(offset) + jnp.arange(T)
        cos, sin = self.rope(positions)
        cos = cos.astype(x.dtype)
        sin = sin.astype(x.dtype)
        pos = positions.astype(jnp.int32)
        windows = self.layer_windows()
        use_drop = dropout_rng is not None and cfg.lora_r > 0 and cfg.lora_dropout > 0.0

        if use_drop:
            layer_keys = jax.random.split(dropout_rng, cfg.n_layer)

            def body(h, inp):
                block, window, dkey = inp
                h, _ = self._block(block, h, cos, sin, pos, pos, window, None, 0, dkey)
                return h, None

            xs = (params["blocks"], windows, layer_keys)
        else:

            def body(h, inp):
                block, window = inp
                h, _ = self._block(block, h, cos, sin, pos, pos, window, None, 0)
                return h, None

            xs = (params["blocks"], windows)

        if self.cfg.remat:
            policy = (
                None  # save nothing: recompute the whole block in backward
                if self.cfg.remat_policy == "nothing"
                else jax.checkpoint_policies.checkpoint_dots
            )
            body = jax.checkpoint(body, policy=policy)
        if cfg.pipeline_parallel:
            from rstnet_tpu.parallel.pipeline import pipe_axis_size, spmd_pipeline

            n_pipe = pipe_axis_size()
            n_micro = cfg.pipeline_microbatches or n_pipe
            if (
                n_pipe > 1 and cfg.n_layer % n_pipe == 0
                and x.shape[0] % n_micro == 0
            ):
                x = spmd_pipeline(
                    body, x, xs, n_stages=n_pipe, n_micro=n_micro
                )
                return _norm_apply(self.cfg, params["ln_f"], x)
        x, _ = lax.scan(body, x, xs)
        return _norm_apply(self.cfg, params["ln_f"], x)

    def logits(
        self, params: Params, hidden: jax.Array,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.cfg
        scaling = cfg.lora_alpha / cfg.lora_r if cfg.lora_r else 1.0
        drop = None
        if dropout_rng is not None and cfg.lora_r > 0 and cfg.lora_dropout > 0.0:
            drop = (cfg.lora_dropout, dropout_rng)
        out = linear(params["lm_head"], hidden, scaling, drop)
        if cfg.final_logit_softcapping is not None:
            cap = cfg.final_logit_softcapping
            out = jnp.tanh(out / cap) * cap
        return out

    def forward_tokens(self, params: Params, tokens: jax.Array) -> jax.Array:
        return self.logits(params, self(params, self.embed(params, tokens)))

    # -- streaming --------------------------------------------------------------

    def init_state(self, batch_size: int, dtype=jnp.bfloat16, chunk_size: int = 1,
                   kv_int8: bool = False, kv_unstacked: bool = False) -> State:
        """``kv_int8``: store the ring K/V as int8 with per-step scales —
        half the cache memory and attention HBM traffic (serving option).

        ``kv_unstacked``: ONE ring buffer per layer (a list) instead of a
        stacked ``[L, ...]`` array. The decode step then python-loops the
        layers so every layer's cache update aliases its own donated leaf
        in place — the stacked layout costs either a per-layer slab COPY
        when the layer scan unrolls or a double-buffered whole-cache carry
        when it rolls, and at 8B serving scale (context 3000) those copies
        are what capped sessions/chip (see utils/compile.py
        ``decode_layer_unroll``). Stacked stays the default: training and
        the scan-based offline paths want one leaf per logical tensor."""
        cfg = self.cfg
        assert cfg.context is not None, "streaming needs config.context to bound the KV ring"
        cap = cfg.context + chunk_size - 1
        if kv_unstacked:
            shape = (batch_size, cfg.n_query_groups, cap, cfg.head_size)
            kv = [ring_kv_buffers(shape, dtype, kv_int8) for _ in range(cfg.n_layer)]
        else:
            shape = (cfg.n_layer, batch_size, cfg.n_query_groups, cap, cfg.head_size)
            kv = ring_kv_buffers(shape, dtype, kv_int8)
        return {"kv": kv, "offset": jnp.zeros((), jnp.int32)}

    def step(self, params: Params, state: State, x: jax.Array,
             min_pos: Optional[jax.Array] = None) -> tuple[jax.Array, State]:
        """Streaming chunk over embeddings with ring-KV caches.

        ``min_pos`` ([B] int32, optional): per-batch-row limit on attention
        lookback (multi-session batched serving; see ``masked_attention``)."""
        T = x.shape[1]
        unstacked = isinstance(state["kv"], (list, tuple))
        cap = (state["kv"][0] if unstacked else state["kv"])["k"].shape[-2]
        assert T <= cap - self.cfg.context + 1, (
            f"chunk of {T} steps exceeds the ring's chunk_size "
            f"({cap - self.cfg.context + 1}): older in-window keys would be "
            "silently evicted — init_state with chunk_size >= the chunk length"
        )
        offset = state["offset"]
        positions = offset + jnp.arange(T)
        cos, sin = self.rope(positions)
        cos = cos.astype(x.dtype)
        sin = sin.astype(x.dtype)
        pos_q = positions.astype(jnp.int32)
        windows = self.layer_windows()

        if unstacked:
            # per-layer cache leaves: python loop, each layer's ring update
            # aliases its own donated buffer in place (no slab copies, no
            # double-buffered stacked carry — the large-batch serving path)
            new_kvs = []
            for i in range(self.cfg.n_layer):
                block = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
                x, nk = self._block(
                    block, x, cos, sin, pos_q, None, windows[i],
                    state["kv"][i], offset, min_pos=min_pos,
                )
                new_kvs.append(nk)
            x = _norm_apply(self.cfg, params["ln_f"], x)
            return x, {"kv": new_kvs, "offset": offset + T}

        def body(h, inp):
            block, window, kv = inp
            h, new_kv = self._block(
                block, h, cos, sin, pos_q, None, window, kv, offset, min_pos=min_pos
            )
            return h, new_kv

        # unroll the layer loop for short decode steps, bounded by the
        # per-layer KV-slab temp cost (full unroll at B=1; rolled for large
        # batched serving where unrolled cache updates copy ~70 MB/layer —
        # the 8B B=24 HBM buffer-assignment failure)
        from rstnet_tpu.utils.compile import decode_layer_unroll

        unroll = decode_layer_unroll(self.cfg.n_layer, state["kv"], T)
        x, new_kv = lax.scan(
            body, x, (params["blocks"], windows, state["kv"]), unroll=unroll
        )
        x = _norm_apply(self.cfg, params["ln_f"], x)
        return x, {"kv": new_kv, "offset": offset + T}


def _norm_init(cfg: Config, dtype) -> Params:
    if cfg.norm_class_name == "RMSNorm":
        return {"weight": jnp.ones((cfg.n_embd,), dtype)}
    return {"weight": jnp.ones((cfg.n_embd,), dtype), "bias": jnp.zeros((cfg.n_embd,), dtype)}


def _norm_apply(cfg: Config, params: Params, x: jax.Array) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if cfg.norm_class_name == "RMSNorm":
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        normed = xf * lax.rsqrt(var + cfg.norm_eps)
        w = params["weight"].astype(jnp.float32)
        if "Gemma" in cfg.name or "gemma" in cfg.name:
            w = 1.0 + w
        return (normed * w).astype(dtype)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * lax.rsqrt(var + cfg.norm_eps)
    return (
        normed * params["weight"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    ).astype(dtype)
