"""Streaming transformer with ring KV cache and per-step (depformer) weights.

Capability parity with ``MLLM_v2/modules/transformer.py:293-750``
(StreamingMultiheadAttention / StreamingTransformerLayer /
StreamingTransformer / ProjectedTransformer), re-designed TPU-first:

* Layer parameters are **stacked** along a leading layer axis and the layer
  loop is a ``lax.scan`` — one traced layer body regardless of depth, so a
  32-layer model compiles as fast as a 1-layer one.
* Streaming state is an explicit pytree: per-layer ring KV caches stacked
  ``[L, B, H, capacity, D]`` plus a single step counter. A jitted
  ``step(params, state, x)`` replaces the reference's CUDA-graphed replay.
* ``weights_per_step`` (the depth-transformer trick: a different set of
  projection/FFN weights per codebook step) is a step-indexed einsum over a
  stacked ``[S, ...]`` weight tensor instead of a Python loop over time.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from rstnet_tpu.core import Params, State, lora_dropout
from rstnet_tpu.ops.attention import (
    masked_attention,
    multi_linear,
    ring_kv_buffers,
    ring_kv_update,
)
from rstnet_tpu.ops.gating import ActivationGating, get_activation
from rstnet_tpu.ops.pallas_ffn import gating_ffn_pallas_step, use_pallas_ffn
from rstnet_tpu.ops.norms import LayerScale, Norm
from rstnet_tpu.ops.rope import apply_rope_interleaved


def create_sin_embedding(
    positions: jax.Array, dim: int, max_period: float = 10_000.0, dtype=jnp.float32
) -> jax.Array:
    """Sinusoidal positional embedding, [*, T] positions -> [*, T, dim]."""
    assert dim % 2 == 0
    half = dim // 2
    positions = positions.astype(dtype)[..., None]
    adim = jnp.arange(half, dtype=dtype)
    phase = positions / (max_period ** (adim / (half - 1)))
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)


def _linear_init(key, out_dim, in_dim, dtype):
    bound = 1.0 / math.sqrt(in_dim)
    return jax.random.uniform(key, (out_dim, in_dim), dtype, -bound, bound)


def resolve_weight(w, dtype):
    """Plain array, or a weight-only int8 dict {w_int8, scale} (serving)."""
    if isinstance(w, dict):
        return w["w_int8"].astype(dtype) * w["scale"].astype(dtype)[..., None]
    return w.astype(dtype)


def quantize_weight_int8(w: jax.Array) -> dict:
    """Per-output-channel symmetric int8 (works on stacked [..., out, in])."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=-1) / 127.0, 1e-8)
    return {
        "w_int8": jnp.clip(jnp.round(wf / scale[..., None]), -127, 127).astype(jnp.int8),
        "scale": scale,
    }


def quantize_transformer_int8(params: Params) -> Params:
    """Quantize a StreamingTransformer's projections + gating for serving."""
    layers = dict(params["layers"])
    for name in ("in_proj", "out_proj", "linear1", "linear2"):
        if name in layers and not isinstance(layers[name], dict):
            layers[name] = quantize_weight_int8(layers[name])
    if "gating" in layers:
        layers["gating"] = {
            k: quantize_weight_int8(v) for k, v in layers["gating"].items()
        }
    return {**params, "layers": layers}


def pad_codecformer_gating(params: Params, multiple: int = 128) -> Params:
    """Pad per-step gating weights so the fused decode FFN kernel applies.

    The Pallas micro-step kernel needs the gating hidden dim to be a
    multiple of the TPU lane width; many configs (e.g. dim_feedforward ==
    d_model) produce hidden = 2*ff/3 that isn't. Zero rows are inert — the
    value half multiplies the gate half to zero — so padding once at
    serving-prep time changes nothing numerically, on either FFN path.

    ``params``: a StreamingTransformer param tree whose layers hold stacked
    per-step gating weights (linear_in [S, 2H, C], linear_out [S, C, H]).
    """
    layers = dict(params["layers"])
    gating = layers.get("gating")
    if gating is None or isinstance(gating["linear_in"], dict):
        return params
    lin_in, lin_out = gating["linear_in"], gating["linear_out"]
    H = lin_in.shape[-2] // 2
    pad = (-H) % multiple
    if pad == 0:
        return params
    gate, val = lin_in[..., :H, :], lin_in[..., H:, :]
    zrow = jnp.zeros(lin_in.shape[:-2] + (pad,) + lin_in.shape[-1:], lin_in.dtype)
    layers["gating"] = {
        "linear_in": jnp.concatenate([gate, zrow, val, zrow], axis=-2),
        "linear_out": jnp.pad(
            lin_out, [(0, 0)] * (lin_out.ndim - 1) + [(0, pad)]
        ),
    }
    return {**params, "layers": layers}


@dataclasses.dataclass(frozen=True)
class StreamingTransformer:
    """Causal transformer with streaming ring-KV state.

    ``weights_per_step > 0`` gives every time step its own attention
    projections and FFN (used by the depth transformer over codebooks);
    sequences then must not exceed ``weights_per_step`` steps from offset 0.
    """

    d_model: int
    num_heads: int
    num_layers: int
    dim_feedforward: int = 2048
    causal: bool = False
    context: Optional[int] = None
    gating: str = "none"  # "none" -> dense MLP with `activation`
    norm: str = "layer_norm"
    positional_embedding: str = "sin"  # {sin, rope, sin_rope, none}
    max_period: float = 10_000.0
    positional_scale: float = 1.0
    layer_scale: Optional[float] = None
    weights_per_step: int = 0
    activation: str = "gelu"
    lora_dropout: float = 0.0  # LoRA-branch dropout rate (training forwards)
    # rematerialize each layer in training backward passes. Besides HBM,
    # this avoids a TPU layout trap: a depth transformer's [.., S, S]
    # attention logits (S = weights_per_step, e.g. 8) pad their trailing
    # (8, 8) tile to (8, 128) — 16x — and a scan over layers would stack
    # that waste across all layers in the saved residuals
    remat: bool = False

    def __post_init__(self):
        assert self.d_model % self.num_heads == 0
        assert self.positional_embedding in ("sin", "rope", "sin_rope", "none")

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    @property
    def _mult(self) -> int:
        return max(1, self.weights_per_step)

    @property
    def _norm(self) -> Norm:
        return Norm(self.norm, self.d_model)

    @property
    def _layer_scale(self) -> Optional[LayerScale]:
        if self.layer_scale is None:
            return None
        return LayerScale(self.d_model, self.layer_scale)

    @property
    def kv_capacity(self) -> int:
        if self.context is not None:
            return self.context
        if self.weights_per_step:
            return self.weights_per_step
        raise ValueError("streaming needs a context (or weights_per_step) to bound the KV cache")

    # -- init ---------------------------------------------------------------

    def _init_layer(self, key: jax.Array, dtype) -> Params:
        d, mult = self.d_model, self._mult
        keys = jax.random.split(key, 8)
        p: Params = {
            "norm1": self._norm.init(keys[0], dtype),
            "norm2": self._norm.init(keys[1], dtype),
            "in_proj": _linear_init(keys[2], mult * 3 * d, d, dtype),
            "out_proj": _linear_init(keys[3], mult * d, d, dtype),
        }
        if self.gating == "none":
            assert not self.weights_per_step, "weights_per_step requires gating"
            p["linear1"] = _linear_init(keys[4], self.dim_feedforward, d, dtype)
            p["linear2"] = _linear_init(keys[5], d, self.dim_feedforward, dtype)
        else:
            g = ActivationGating(d, self.dim_feedforward, self.gating)
            if self.weights_per_step:
                gkeys = jax.random.split(keys[4], self.weights_per_step)
                gp = jax.vmap(lambda k: g.init(k, dtype))(gkeys)
            else:
                gp = g.init(keys[4], dtype)
            p["gating"] = gp
        ls = self._layer_scale
        if ls is not None:
            p["layer_scale_1"] = ls.init(keys[6], dtype)
            p["layer_scale_2"] = ls.init(keys[7], dtype)
        return p

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, self.num_layers)
        return {"layers": jax.vmap(lambda k: self._init_layer(k, dtype))(keys)}

    # -- layer body ---------------------------------------------------------

    def _lora(self, layer: Params, name: str, x: jax.Array, drop=None) -> jax.Array:
        """Optional low-rank branch on a projection (LoRA-Moshi fine-tuning,
        parity: ``MLLM_v2/modules/transformer_lora.py``). ``drop``: optional
        ``(rate, key)`` dropout on the branch input (training only)."""
        lp = layer.get(f"lora_{name}")
        if lp is None:
            return 0.0
        xd = lora_dropout(x, drop)
        return (xd @ lp["A"].T.astype(x.dtype)) @ lp["B"].T.astype(x.dtype) * lp[
            "scaling"
        ].astype(x.dtype)

    def _project_qkv(self, layer: Params, x: jax.Array, offset, drop=None) -> tuple:
        B, T, d = x.shape
        w_in = resolve_weight(layer["in_proj"], x.dtype)
        if self.weights_per_step:
            w = w_in.reshape(self.weights_per_step, 3 * d, d)
            projected = multi_linear(w, x, offset)
        else:
            projected = x @ w_in.T + self._lora(layer, "in_proj", x, drop)
        # reference layout: (p h d) packing with p=3 → [3, B, H, T, Dh]
        proj = projected.reshape(B, T, 3, self.num_heads, self.head_dim)
        proj = jnp.transpose(proj, (2, 0, 3, 1, 4))
        return proj[0], proj[1], proj[2]

    def _out_proj(self, layer: Params, x: jax.Array, offset, drop=None) -> jax.Array:
        w_out = resolve_weight(layer["out_proj"], x.dtype)
        if self.weights_per_step:
            w = w_out.reshape(self.weights_per_step, self.d_model, self.d_model)
            return multi_linear(w, x, offset)
        return x @ w_out.T + self._lora(layer, "out_proj", x, drop)

    def _ffn(self, layer: Params, x: jax.Array, offset) -> jax.Array:
        h = self._norm(layer["norm2"], x)
        if self.gating == "none":
            act = get_activation(self.activation)
            w1 = resolve_weight(layer["linear1"], h.dtype)
            w2 = resolve_weight(layer["linear2"], h.dtype)
            update = act(h @ w1.T) @ w2.T
        elif self.weights_per_step:
            T = x.shape[1]
            raw_in = layer["gating"]["linear_in"]
            # shape-derived hidden: pad_codecformer_gating may have padded it
            # to a multiple of 128 for the fused kernel (zero rows are inert)
            hidden = raw_in.shape[1] // 2 if isinstance(raw_in, jax.Array) else 0
            if (
                T == 1
                and use_pallas_ffn()
                and isinstance(raw_in, jax.Array)
                and hidden % 128 == 0
                and self.d_model % 128 == 0
            ):
                # fused decode micro-step: the step's weight slice is DMA'd
                # directly via scalar prefetch (no HBM gather of the stack)
                update = gating_ffn_pallas_step(
                    h[:, 0, :],
                    layer["gating"]["linear_in"].astype(h.dtype),
                    layer["gating"]["linear_out"].astype(h.dtype),
                    jnp.asarray(offset),
                    activation=self.gating,
                )[:, None, :]
            else:
                steps = jnp.asarray(offset) + jnp.arange(T)
                lin_in = resolve_weight(raw_in, h.dtype)
                lin_out = resolve_weight(layer["gating"]["linear_out"], h.dtype)
                w_in = jnp.take(lin_in, steps, axis=0, mode="clip")
                w_out = jnp.take(lin_out, steps, axis=0, mode="clip")
                g = jnp.einsum("btd,thd->bth", h, w_in)
                gate, val = jnp.split(g, 2, axis=-1)
                gated = get_activation(self.gating)(gate) * val
                update = jnp.einsum("bth,tdh->btd", gated, w_out)
        else:
            gp = {k: resolve_weight(v, h.dtype) for k, v in layer["gating"].items()}
            g = ActivationGating(self.d_model, self.dim_feedforward, self.gating)
            update = g(gp, h)
        if self._layer_scale is not None:
            update = LayerScale(self.d_model, 0.0)(layer["layer_scale_2"], update)
        return x + update

    def _attn(
        self, layer: Params, x: jax.Array, offset, kv_cache: Optional[dict],
        drop_key=None, min_pos=None,
    ) -> tuple[jax.Array, Optional[dict]]:
        def site(i):
            if drop_key is None:
                return None
            return (self.lora_dropout, jax.random.fold_in(drop_key, i))

        h = self._norm(layer["norm1"], x)
        q, k, v = self._project_qkv(layer, h, offset, site(0))
        T = x.shape[1]
        if self.positional_embedding in ("rope", "sin_rope"):
            q, k = apply_rope_interleaved(q, k, offset, self.max_period)
        if kv_cache is None:
            # keys live at the same absolute positions as the queries — an
            # asymmetric pos_k = arange(T) would shift the causal/window
            # deltas by `offset` and break the mask for offset != 0
            pos = jnp.asarray(offset, jnp.int32) + jnp.arange(T, dtype=jnp.int32)
            attn = masked_attention(q, k, v, pos, pos, self.context, self.causal)
            new_cache = None
        else:
            assert self.causal, "streaming only for causal attention"
            new_cache, pos_k, _ = ring_kv_update(kv_cache, jnp.asarray(offset), k, v)
            pos_q = jnp.asarray(offset, jnp.int32) + jnp.arange(T, dtype=jnp.int32)
            attn = masked_attention(
                q, new_cache["k"], new_cache["v"], pos_q, pos_k, self.context, True,
                min_pos=min_pos,
                k_scale=new_cache.get("k_scale"), v_scale=new_cache.get("v_scale"),
            )
        B = x.shape[0]
        attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(B, T, self.d_model)
        update = self._out_proj(layer, attn, offset, site(1))
        if self._layer_scale is not None:
            update = LayerScale(self.d_model, 0.0)(layer["layer_scale_1"], update)
        return x + update, new_cache

    def _layer(self, layer: Params, x, offset, kv_cache, drop_key=None, min_pos=None):
        x, new_cache = self._attn(layer, x, offset, kv_cache, drop_key, min_pos)
        x = self._ffn(layer, x, offset)
        return x, new_cache

    # -- offline ------------------------------------------------------------

    def __call__(
        self, params: Params, x: jax.Array, offset: jax.Array | int = 0,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Offline forward, [B, T, C] -> [B, T, C] (full causal mask).
        ``dropout_rng`` activates LoRA-branch dropout (``self.lora_dropout``)
        for training forwards; None is fully deterministic."""
        B, T, C = x.shape
        if self.positional_embedding in ("sin", "sin_rope"):
            positions = jnp.asarray(offset) + jnp.arange(T)
            pos_emb = create_sin_embedding(positions, C, self.max_period)[None]
            x = x + self.positional_scale * pos_emb.astype(x.dtype)

        if dropout_rng is not None and self.lora_dropout > 0.0:
            layer_keys = jax.random.split(dropout_rng, self.num_layers)

            def body(h, inp):
                layer, dkey = inp
                h, _ = self._layer(layer, h, offset, None, dkey)
                return h, None

            if self.remat:
                body = jax.checkpoint(body)
            x, _ = lax.scan(body, x, (params["layers"], layer_keys))
            return x

        def body(h, layer):
            h, _ = self._layer(layer, h, offset, None)
            return h, None

        if self.remat:
            body = jax.checkpoint(body)
        x, _ = lax.scan(body, x, params["layers"])
        return x

    # -- streaming ----------------------------------------------------------

    def init_state(self, batch_size: int, dtype=jnp.bfloat16, chunk_size: int = 1,
                   kv_int8: bool = False, kv_unstacked: bool = False) -> State:
        """Streaming state. ``chunk_size`` is the max steps fed per ``step``
        call: the ring keeps ``context + chunk_size - 1`` slots so that the
        earliest query of a chunk still sees its full attention window
        (chunk_size=1 → capacity == context, the generation-loop case).
        ``kv_int8`` stores the ring K/V as int8 with per-step scales — half
        the cache memory and attention HBM traffic (serving option).
        ``kv_unstacked`` keeps one donated ring per layer so decode cache
        updates alias in place (large-batch serving; see
        ``models/backbone.py::init_state``)."""
        cap = self.kv_capacity + chunk_size - 1
        if kv_unstacked:
            shape = (batch_size, self.num_heads, cap, self.head_dim)
            kv = [ring_kv_buffers(shape, dtype, kv_int8) for _ in range(self.num_layers)]
        else:
            shape = (self.num_layers, batch_size, self.num_heads, cap, self.head_dim)
            kv = ring_kv_buffers(shape, dtype, kv_int8)
        return {"kv": kv, "offset": jnp.zeros((), jnp.int32)}

    def step(self, params: Params, state: State, x: jax.Array,
             min_pos: Optional[jax.Array] = None) -> tuple[jax.Array, State]:
        """Streaming chunk of T steps (T=1 for generation).

        ``min_pos`` ([B] int32, optional): per-batch-row attention lookback
        limit (multi-session batched serving; see ``masked_attention``)."""
        B, T, C = x.shape
        unstacked = isinstance(state["kv"], (list, tuple))
        cap = (state["kv"][0] if unstacked else state["kv"])["k"].shape[-2]
        assert T <= cap - self.kv_capacity + 1, (
            f"chunk of {T} steps exceeds the ring's chunk_size "
            f"({cap - self.kv_capacity + 1}): older in-window keys would be "
            "silently evicted — init_state with chunk_size >= the chunk length"
        )
        offset = state["offset"]
        if self.positional_embedding in ("sin", "sin_rope"):
            positions = offset + jnp.arange(T)
            pos_emb = create_sin_embedding(positions, C, self.max_period)[None]
            x = x + self.positional_scale * pos_emb.astype(x.dtype)

        if unstacked:
            # per-layer donated cache leaves (see backbone.py step)
            new_kvs = []
            for i in range(self.num_layers):
                layer = jax.tree_util.tree_map(lambda a, i=i: a[i], params["layers"])
                x, nk = self._layer(layer, x, offset, state["kv"][i], min_pos=min_pos)
                new_kvs.append(nk)
            return x, {"kv": new_kvs, "offset": offset + T}

        def body(h, inp):
            layer, kv = inp
            h, new_kv = self._layer(layer, h, offset, kv, min_pos=min_pos)
            return h, new_kv

        # Decode steps are latency-bound: unrolling the layer loop lets XLA
        # prefetch each layer's weights during the previous layer's compute
        # instead of dynamic-slicing them per scan iteration — bounded by
        # the per-layer KV-slab temp cost (utils/compile.py).
        from rstnet_tpu.utils.compile import decode_layer_unroll

        unroll = decode_layer_unroll(self.num_layers, state["kv"], T)
        x, new_kv = lax.scan(
            body, x, (params["layers"], state["kv"]), unroll=unroll
        )
        return x, {"kv": new_kv, "offset": offset + T}



@dataclasses.dataclass(frozen=True)
class ProjectedTransformer:
    """Transformer with input/output dimension projections and optional
    ``[B, C, T]`` conv layout (parity: ``moshi/modules/transformer.py:698-750``)."""

    transformer: StreamingTransformer
    input_dimension: int
    output_dimensions: tuple[int, ...]
    conv_layout: bool = False

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, 2 + len(self.output_dimensions))
        p: Params = {"transformer": self.transformer.init(keys[0], dtype)}
        d = self.transformer.d_model
        if d != self.input_dimension:
            p["input_proj"] = _linear_init(keys[1], d, self.input_dimension, dtype)
        for i, od in enumerate(self.output_dimensions):
            if od != d:
                p[f"output_proj_{i}"] = _linear_init(keys[2 + i], od, d, dtype)
        return p

    def _pre(self, params, x):
        if self.conv_layout:
            x = jnp.swapaxes(x, 1, 2)
        if "input_proj" in params:
            x = x @ params["input_proj"].T
        return x

    def _post(self, params, z):
        ys = []
        for i, od in enumerate(self.output_dimensions):
            y = z @ params[f"output_proj_{i}"].T if f"output_proj_{i}" in params else z
            if self.conv_layout:
                y = jnp.swapaxes(y, 1, 2)
            ys.append(y)
        return tuple(ys)

    def __call__(self, params: Params, x: jax.Array) -> tuple[jax.Array, ...]:
        z = self.transformer(params["transformer"], self._pre(params, x))
        return self._post(params, z)

    def init_state(self, batch_size: int, dtype=jnp.bfloat16, chunk_size: int = 1) -> State:
        return self.transformer.init_state(batch_size, dtype, chunk_size)

    def step(self, params: Params, state: State, x: jax.Array, min_pos=None):
        z, state = self.transformer.step(
            params["transformer"], state, self._pre(params, x), min_pos=min_pos
        )
        return self._post(params, z), state
