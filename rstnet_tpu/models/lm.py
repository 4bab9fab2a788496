"""Flagship speech-text LM: pretrained LLM backbone + codecformer.

Capability parity with ``MLLM_v2/models/llama_streaming.py:520-766`` (GPT):
the *global* temporal transformer is any Backbone from the config registry
(LoRA-injectable); the *local* codecformer is a depth transformer over the
``dep_q`` audio codebooks with per-step weights. Input fusion sums one text
embedding and ``n_q`` audio-codebook embeddings per frame
(``forward_global:665-692``); the codecformer consumes per-codebook linear
views of the backbone output plus previous-codebook embeddings
(``forward_local:694-725``); ``forward_codecformer:727-749`` is the
single-step inference path.

Special ids (``llama_streaming.py:592-624``): ``zero_token_id=-1`` embeds to
exactly zero; ``initial_token_id=audio_card``; text initial id is
tokenizer-dependent (config field); ``ungenerated=-2`` marks positions to be
sampled during partial teacher forcing.

TPU-first notes: the n_q embedding-sum is one flattened gather instead of a
Python loop; ``forward_local`` runs all B*T frames through the codecformer as
a batch of dep_q-step sequences; per-codebook linears are stacked einsums.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Optional

import jax
import jax.numpy as jnp

from rstnet_tpu.core import Params, State
from rstnet_tpu.models.backbone import Backbone, linear
from rstnet_tpu.models.config import Config
from rstnet_tpu.modules.transformer import (
    StreamingTransformer,
    quantize_transformer_int8,
    quantize_weight_int8,
    resolve_weight,
)

ZERO_TOKEN_ID = -1
UNGENERATED_TOKEN_ID = -2


def _emb_layer_norm(y: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    yf = y.astype(jnp.float32)
    mu = yf.mean(-1, keepdims=True)
    var = yf.var(-1, keepdims=True)
    out = (yf - mu) * jax.lax.rsqrt(var + 1e-5) * w.astype(jnp.float32) + b.astype(
        jnp.float32
    )
    return out.astype(y.dtype)


def scaled_embedding(
    table: jax.Array, tokens: jax.Array, zero_idx: int = ZERO_TOKEN_ID, norm=None
) -> jax.Array:
    """Embedding where ``zero_idx`` rows output exactly 0
    (``llama_streaming.py:493-518``). ``norm`` (optional {weight, bias}):
    post-embedding layer norm (``codecformer_norm_emb``) — applied before
    the zero-mask, matching the reference's ScaledEmbedding order."""
    is_zero = tokens == zero_idx
    y = jnp.take(table, jnp.clip(tokens, 0, None), axis=0, mode="clip")
    if norm is not None:
        y = _emb_layer_norm(y, norm["weight"], norm["bias"])
    return jnp.where(is_zero[..., None], 0.0, y)


@dataclasses.dataclass(frozen=True)
class SpeechTextLM:
    config: Config

    @cached_property
    def backbone(self) -> Backbone:
        return Backbone(self.config)

    @cached_property
    def codecformer(self) -> StreamingTransformer:
        cfg = self.config
        return StreamingTransformer(
            d_model=cfg.codecformer_dim,
            num_heads=cfg.codecformer_heads,
            num_layers=cfg.codecformer_layers,
            dim_feedforward=cfg.codecformer_dim_feedforward,
            causal=True,
            context=None,
            gating="silu",
            norm=cfg.codecformer_norm,
            positional_embedding="none",
            max_period=10000,
            layer_scale=None,
            weights_per_step=cfg.dep_q if cfg.codecformer_weights_per_step else 0,
            remat=cfg.remat and cfg.codecformer_remat,
        )

    # -- special tokens -------------------------------------------------------

    @property
    def zero_token_id(self) -> int:
        return ZERO_TOKEN_ID

    @property
    def initial_token_id(self) -> int:
        return self.config.audio_card

    @property
    def codec_card(self) -> int:
        # Trainer convention: audio_card counts the empty(card-2)/pad(card-1)
        # specials, so the REAL codec codes are the first audio_card - 2 ids
        # (reference sample_token_audio bans ids >= 2048).
        return self.config.audio_card - 2

    @property
    def text_initial_token_id(self) -> int:
        # Tokenizer-dependent reserved token (llama3: 128002, qwen: 151655).
        return getattr(self.config, "text_initial_id", None) or (
            128002 if self.config.padded_vocab_size > 128000 else 3
        )

    @property
    def ungenerated_token_id(self) -> int:
        return UNGENERATED_TOKEN_ID

    @property
    def num_codebooks(self) -> int:
        return self.config.n_q + 1

    # -- init -------------------------------------------------------------------

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        cfg = self.config
        keys = jax.random.split(key, 8)
        card1 = cfg.audio_card + 1
        p: Params = {
            "backbone": self.backbone.init(keys[0], dtype),
            "codecformer": self.codecformer.init(keys[1], dtype),
            "input_emb": jax.random.normal(keys[2], (cfg.n_q, card1, cfg.n_embd), dtype),
            "codecformer_text_emb": jax.random.normal(
                keys[3], (cfg.padded_vocab_size, cfg.codecformer_dim), dtype
            ),
            "codecformer_emb": jax.random.normal(
                keys[4], (cfg.dep_q - 1, card1, cfg.codecformer_dim), dtype
            ),
            # one input view per codebook, or a single shared view when
            # codecformer_multi_linear=False (llama_streaming.py Config)
            "codecformer_in": jax.random.uniform(
                keys[5],
                (cfg.dep_q if cfg.codecformer_multi_linear else 1,
                 cfg.codecformer_dim, cfg.n_embd),
                dtype, -1.0 / cfg.n_embd**0.5, 1.0 / cfg.n_embd**0.5,
            ),
            "audio_linears": {
                "weight": jax.random.uniform(
                    keys[6], (cfg.dep_q, cfg.audio_card, cfg.codecformer_dim), dtype,
                    -1.0 / cfg.codecformer_dim**0.5, 1.0 / cfg.codecformer_dim**0.5,
                )
            },
        }
        if cfg.codecformer_bias_proj:
            p["audio_linears"]["bias"] = jnp.zeros((cfg.dep_q, cfg.audio_card), dtype)
        if cfg.codecformer_norm_emb:
            # post-embedding layer norms (reference ScaledEmbedding(norm=True))
            D, C = cfg.n_embd, cfg.codecformer_dim
            p["input_emb_norm"] = {
                "weight": jnp.ones((cfg.n_q, 1, D), dtype),
                "bias": jnp.zeros((cfg.n_q, 1, D), dtype),
            }
            p["codecformer_emb_norm"] = {
                "weight": jnp.ones((cfg.dep_q - 1, C), dtype),
                "bias": jnp.zeros((cfg.dep_q - 1, C), dtype),
            }
            p["codecformer_text_emb_norm"] = {
                "weight": jnp.ones((C,), dtype), "bias": jnp.zeros((C,), dtype),
            }
        return p

    # -- input fusion -----------------------------------------------------------

    def initial_frame(self, batch_size: int) -> jax.Array:
        """[B, 1+n_q, 1] start-of-sequence frame (``_get_initial_token``)."""
        text = jnp.full((batch_size, 1, 1), self.text_initial_token_id, jnp.int32)
        audio = jnp.full((batch_size, self.config.n_q, 1), self.initial_token_id, jnp.int32)
        return jnp.concatenate([text, audio], axis=1)

    def fuse_embeddings(self, params: Params, sequence: jax.Array) -> jax.Array:
        """Sum text + n_q audio embeddings: [B, 1+n_q, T] -> [B, T, D].

        One flattened gather over the stacked [n_q, card+1, D] table replaces
        the reference's per-codebook Python loop (llama_streaming.py:676-683).
        """
        cfg = self.config
        card1 = cfg.audio_card + 1
        audio_tokens = sequence[:, 1:, :]  # [B, n_q, T]
        flat_table = params["input_emb"].reshape(cfg.n_q * card1, cfg.n_embd)
        idx = jnp.clip(audio_tokens, 0, cfg.audio_card) + (
            jnp.arange(cfg.n_q, dtype=audio_tokens.dtype)[None, :, None] * card1
        )
        emb = jnp.take(flat_table, idx, axis=0)  # [B, n_q, T, D]
        if "input_emb_norm" in params:
            np_ = params["input_emb_norm"]
            emb = _emb_layer_norm(emb, np_["weight"][None], np_["bias"][None])
        emb = jnp.where((audio_tokens == self.zero_token_id)[..., None], 0.0, emb)
        x = jnp.sum(emb, axis=1)  # [B, T, D]
        # the text row honors zero_token_id too (embeds to exactly 0, like
        # the audio rows and MoshiLMModel's scaled_embedding) — a bare clip
        # would silently add token 0's embedding instead
        x = x + scaled_embedding(params["backbone"]["wte"], sequence[:, 0, :])
        if cfg.scale_embeddings:
            x = x * jnp.asarray(cfg.n_embd**0.5, x.dtype)
        return x

    # -- training forward ---------------------------------------------------------

    def forward_global(
        self, params: Params, sequence: jax.Array, dropout_rng=None
    ) -> tuple[jax.Array, jax.Array]:
        """[B, 1+n_q, T] -> (transformer_out [B,T,D], text_logits [B,T,V]).
        ``dropout_rng`` enables LoRA-branch dropout (training only)."""
        x = self.fuse_embeddings(params, sequence)
        r_body = r_head = None
        if dropout_rng is not None:
            r_body, r_head = jax.random.split(dropout_rng)
        hidden = self.backbone(params["backbone"], x, dropout_rng=r_body)
        return hidden, self.backbone.logits(params["backbone"], hidden, dropout_rng=r_head)

    def forward_local(
        self,
        params: Params,
        text_tokens: jax.Array,
        audio_targets: jax.Array,
        transformer_out: jax.Array,
    ) -> jax.Array:
        """Codecformer teacher-forced forward.

        text_tokens: [B, T] (target text, step-0 conditioning);
        audio_targets: [B, dep_q, T] (targets; steps 1.. use codebook k-1);
        transformer_out: [B, T, D]. Returns audio logits [B, T, dep_q, card].
        """
        cfg = self.config
        B, T, D = transformer_out.shape
        # Per-codebook linear views of the backbone output.
        dep_in = jnp.einsum(
            "btd,kcd->btkc", transformer_out,
            self._codecformer_in_weight(params, transformer_out.dtype),
        )  # [B, T, dep_q, C]
        # Previous-token embeddings per step.
        tnorm = params.get("codecformer_text_emb_norm")
        anorm = params.get("codecformer_emb_norm")
        prev = [scaled_embedding(params["codecformer_text_emb"], text_tokens, norm=tnorm)]
        for k in range(cfg.dep_q - 1):
            prev.append(
                scaled_embedding(
                    params["codecformer_emb"][k], audio_targets[:, k, :],
                    norm=None if anorm is None else
                    {"weight": anorm["weight"][k], "bias": anorm["bias"][k]},
                )
            )
        prev_emb = jnp.stack(prev, axis=2)  # [B, T, dep_q, C]
        x = (dep_in + prev_emb).reshape(B * T, cfg.dep_q, cfg.codecformer_dim)
        out = self.codecformer(params["codecformer"], x)  # [B*T, dep_q, C]
        logits = jnp.einsum(
            "nkc,kvc->nkv", out,
            resolve_weight(params["audio_linears"]["weight"], out.dtype),
        )
        if "bias" in params["audio_linears"]:
            logits = logits + params["audio_linears"]["bias"].astype(logits.dtype)
        return logits.reshape(B, T, cfg.dep_q, cfg.audio_card)

    def __call__(
        self, params: Params, sequence: jax.Array, dropout_rng=None
    ) -> tuple[jax.Array, jax.Array]:
        """Training forward (``llama_streaming.py:651-663``).

        sequence: [B, 1+n_q, S] token grid (text row 0, audio rows 1..n_q).
        Returns (audio_logits [B,S,dep_q,card], text_logits [B,S,V]).
        ``dropout_rng`` enables LoRA-branch dropout when the config sets
        ``lora_dropout > 0`` (LoRA fine-tuning forwards).
        """
        B, K, S = sequence.shape
        assert K == self.num_codebooks
        start = jnp.broadcast_to(self.initial_frame(B), (B, K, 1)).astype(sequence.dtype)
        global_input = jnp.concatenate([start, sequence[:, :, :-1]], axis=2)
        transformer_out, text_logits = self.forward_global(
            params, global_input, dropout_rng
        )
        forward_local = self.forward_local
        if self.config.remat:
            # the depformer's B*T x dep_q activations are the biggest
            # training tensor after the logits; recompute them in backward
            forward_local = jax.checkpoint(forward_local)
        audio_logits = forward_local(
            params,
            sequence[:, 0, :],
            sequence[:, 1 : self.config.dep_q + 1, :],
            transformer_out,
        )
        return audio_logits, text_logits

    # -- streaming inference pieces ------------------------------------------------

    def init_state(self, batch_size: int, dtype=jnp.bfloat16,
                   kv_int8: bool = False, kv_unstacked: bool = False) -> State:
        return self.backbone.init_state(
            batch_size, dtype, kv_int8=kv_int8, kv_unstacked=kv_unstacked
        )

    def step_global(
        self, params: Params, state: State, frame: jax.Array,
        min_pos: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array, State]:
        """One temporal step: frame [B, 1+n_q, 1] -> (hidden [B,1,D],
        text_logits [B,1,V], state). ``min_pos`` [B]: per-slot attention
        lookback limit for multi-session batched serving."""
        x = self.fuse_embeddings(params, frame)
        hidden, state = self.backbone.step(params["backbone"], state, x, min_pos=min_pos)
        return hidden, self.backbone.logits(params["backbone"], hidden), state

    def _codecformer_in_weight(self, params: Params, dtype) -> jax.Array:
        """[dep_q, C, D] input-view weights; a single shared view
        (codecformer_multi_linear=False) broadcasts to all codebooks."""
        w = resolve_weight(params["codecformer_in"], dtype)
        if w.shape[0] == 1 and self.config.dep_q > 1:
            w = jnp.broadcast_to(w, (self.config.dep_q,) + w.shape[1:])
        return w

    def codecformer_inputs(self, params: Params, transformer_out: jax.Array) -> jax.Array:
        """All dep_q per-codebook linear views of the backbone output in ONE
        matmul: [B, T, D] -> [B, dep_q, T, C]. The views don't depend on the
        sampled tokens, so the decode loop hoists them out of the 8
        sequential micro-steps."""
        w_in = self._codecformer_in_weight(params, transformer_out.dtype)
        return jnp.einsum("btd,kcd->bktc", transformer_out, w_in)

    def step_codecformer(
        self,
        params: Params,
        cf_state: State,
        cb_index: int,
        prev_token: jax.Array,
        transformer_out: jax.Array,
        dep_in: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, State]:
        """One depth step (static ``cb_index``): prev_token [B, 1],
        transformer_out [B, 1, D] -> (logits [B, 1, card], cf_state).
        ``dep_in`` (optional): this step's precomputed [B, 1, C] view from
        ``codecformer_inputs``. Parity: ``forward_codecformer``
        (llama_streaming.py:727-749)."""
        cfg = self.config
        if dep_in is None:
            w_in = resolve_weight(params["codecformer_in"], transformer_out.dtype)
            k = cb_index if cfg.codecformer_multi_linear else 0
            dep_in = transformer_out @ w_in[k].T
        emb = self.codecformer_step_embedding(params, cb_index, prev_token)
        x = dep_in + emb  # [B, 1, C]
        out, cf_state = self.codecformer.step(params["codecformer"], cf_state, x)
        w_al = resolve_weight(params["audio_linears"]["weight"], out.dtype)
        logits = out @ w_al[cb_index].T
        if "bias" in params["audio_linears"]:
            logits = logits + params["audio_linears"]["bias"][cb_index].astype(logits.dtype)
        return logits, cf_state

    def codecformer_step_embedding(
        self, params: Params, cb_index: int, prev_token: jax.Array
    ) -> jax.Array:
        """Previous-token embedding for micro-step ``cb_index`` (step 0 embeds
        the sampled text token, later steps the previous codebook's token)."""
        if cb_index == 0:
            return scaled_embedding(
                params["codecformer_text_emb"], prev_token,
                norm=params.get("codecformer_text_emb_norm"),
            )
        anorm = params.get("codecformer_emb_norm")
        return scaled_embedding(
            params["codecformer_emb"][cb_index - 1], prev_token,
            norm=None if anorm is None else
            {"weight": anorm["weight"][cb_index - 1],
             "bias": anorm["bias"][cb_index - 1]},
        )

    def init_codecformer_state(self, batch_size: int, dtype=jnp.bfloat16) -> State:
        return self.codecformer.init_state(batch_size, dtype)


def quantize_for_serving(model: SpeechTextLM, params: Params) -> Params:
    """Weight-only int8 quantization of the decode hot path: backbone
    linears, codecformer projections/gating, per-codebook views and output
    heads. Embeddings, norms and biases stay in their original dtype.
    ~2x less HBM weight traffic per frame (the batch-1 decode bottleneck)."""
    from rstnet_tpu.models.backbone import quantize_backbone_int8

    out = quantize_dep_for_serving(params)
    out["backbone"] = quantize_backbone_int8(params["backbone"])
    return out


def quantize_dep_for_serving(params: Params) -> Params:
    """int8 the depformer slice ONLY (codecformer projections/gating,
    per-codebook input views, audio heads), leaving the backbone bf16.

    The depformer micro-steps are pure weight-traffic (8 sequential tiny
    GEMVs per frame); int8 halves their per-step DMA — inside the Pallas
    megakernel the dequant happens per-output-row in VMEM. Composes with
    :func:`quantize_head_for_serving` for the mixed serving mode (bf16
    backbone math, int8 head + depformer)."""
    out = dict(params)
    out["codecformer"] = quantize_transformer_int8(params["codecformer"])
    out["codecformer_in"] = quantize_weight_int8(params["codecformer_in"])
    out["audio_linears"] = dict(params["audio_linears"])
    out["audio_linears"]["weight"] = quantize_weight_int8(
        params["audio_linears"]["weight"]
    )
    return out


def quantize_head_for_serving(params: Params) -> Params:
    """int8 the 128k-vocab lm_head ONLY, leaving the rest bf16.

    The head is the single largest weight read of the batch-1 decode
    (padded_vocab x n_embd, ~0.5 GB bf16 at llama3 vocab); its logits feed
    top-k sampling, which is robust to per-channel int8 rounding — the
    cheapest slice of the full --int8 mode for the default bf16 path."""
    from rstnet_tpu.models.backbone import quantize_linear_int8

    out = dict(params)
    out["backbone"] = dict(params["backbone"])
    out["backbone"]["lm_head"] = quantize_linear_int8(params["backbone"]["lm_head"])
    return out
