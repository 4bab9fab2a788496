"""Moshi LMModel: the pure Moshi RQ-Transformer (temporal + depth).

Capability parity with ``MLLM_v2/moshi/models/lm.py:58-488`` (inference
arch) and the training variant ``MLLM_v2/models/model.py:98-428``: a
from-scratch temporal transformer (dim 4096 x 32 layers for the 7B model,
silu gating, rms_norm_f32, rope, context 3000) over 1 text + n_q audio
streams, with per-codebook ``ScaledEmbedding(card+1)``, a depformer
(1024 x 6 layers, weights-per-step over dep_q codebooks, per-codebook
``depformer_in`` linear views) and per-codebook output heads. Canonical
hyperparameters follow ``moshi/models/loaders.py:68-98``.

Exposes the same step protocol as ``SpeechTextLM`` (initial_frame,
step_global, step_codecformer, init_state) so ``LMGen`` and the trainer
drive either model unchanged.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import jax
import jax.numpy as jnp

from rstnet_tpu.core import Params, State
from rstnet_tpu.models.lm import ZERO_TOKEN_ID, scaled_embedding
from rstnet_tpu.modules.transformer import StreamingTransformer, resolve_weight
from rstnet_tpu.ops.norms import Norm


@dataclasses.dataclass(frozen=True)
class MoshiLMModel:
    delays: tuple[int, ...] = (0,) * 17
    n_q: int = 16
    dep_q: int = 8
    card: int = 2048
    text_card: int = 32000
    dim: int = 4096
    num_heads: int = 32
    num_layers: int = 32
    hidden_scale: float = 4.125
    norm: str = "rms_norm_f32"
    gating: str = "silu"
    positional_embedding: str = "rope"
    max_period: float = 10000.0
    context: int = 3000
    causal: bool = True
    existing_text_padding_id: int | None = 3
    bias_proj: bool = False
    depformer_dim: int = 1024
    depformer_dim_feedforward: int | None = None
    depformer_num_heads: int = 16
    depformer_num_layers: int = 6
    depformer_multi_linear: bool = True
    depformer_weights_per_step: bool = True
    depformer_pos_emb: str = "none"
    lora_dropout: float = 0.0  # temporal-transformer LoRA-branch dropout

    def __post_init__(self):
        assert len(self.delays) == self.num_codebooks

    # -- submodules -----------------------------------------------------------

    @cached_property
    def transformer(self) -> StreamingTransformer:
        return StreamingTransformer(
            d_model=self.dim, num_heads=self.num_heads, num_layers=self.num_layers,
            dim_feedforward=int(self.hidden_scale * self.dim), causal=self.causal,
            context=self.context, gating=self.gating, norm=self.norm,
            positional_embedding=self.positional_embedding, max_period=self.max_period,
            lora_dropout=self.lora_dropout,
        )

    @cached_property
    def depformer(self) -> StreamingTransformer:
        ff = self.depformer_dim_feedforward or int(self.hidden_scale * self.depformer_dim)
        return StreamingTransformer(
            d_model=self.depformer_dim, num_heads=self.depformer_num_heads,
            num_layers=self.depformer_num_layers, dim_feedforward=ff, causal=self.causal,
            context=None, gating=self.gating, norm=self.norm,
            positional_embedding=self.depformer_pos_emb, max_period=self.max_period,
            weights_per_step=self.dep_q if self.depformer_weights_per_step else 0,
        )

    @property
    def out_norm(self) -> Norm:
        return Norm(self.norm, self.dim)

    # -- special tokens / protocol shims ---------------------------------------

    @property
    def config(self) -> "MoshiLMModel":
        return self  # LMGen reads model.config.dep_q / n_q / audio_card

    @property
    def audio_card(self) -> int:
        return self.card

    @property
    def codec_card(self) -> int:
        # Moshi audio logits span exactly ``card`` REAL codec codes — the
        # empty/pad specials live outside the logits vocabulary (unlike the
        # trainer-convention SpeechTextLM, whose audio_card counts them).
        return self.card

    @property
    def num_codebooks(self) -> int:
        return self.n_q + 1

    @property
    def zero_token_id(self) -> int:
        return ZERO_TOKEN_ID

    @property
    def initial_token_id(self) -> int:
        return self.card

    @property
    def text_initial_token_id(self) -> int:
        return self.text_card

    @property
    def text_padding_token_id(self) -> int:
        if self.existing_text_padding_id is None:
            return self.text_card
        return self.existing_text_padding_id

    @property
    def ungenerated_token_id(self) -> int:
        return -2

    @property
    def _extra_text(self) -> int:
        return 1 if self.existing_text_padding_id is None else 0

    # -- init -------------------------------------------------------------------

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, 10)
        card1 = self.card + 1
        d, dd = self.dim, self.depformer_dim
        rnd = jax.random.normal
        bound = lambda n: 1.0 / n**0.5  # noqa: E731
        uni = lambda k, shape, n: jax.random.uniform(  # noqa: E731
            k, shape, dtype, -bound(n), bound(n)
        )
        p: Params = {
            "emb": rnd(keys[0], (self.n_q, card1, d), dtype),
            "text_emb": rnd(keys[1], (self.text_card + 1, d), dtype),
            "text_linear": {
                "weight": uni(keys[2], (self.text_card + self._extra_text, d), d)
            },
            "transformer": self.transformer.init(keys[3], dtype),
            "out_norm": self.out_norm.init(keys[4], dtype),
            "depformer_in": uni(
                keys[5],
                (self.dep_q if self.depformer_multi_linear else 1, dd, d), d,
            ),
            "depformer_emb": rnd(keys[6], (self.dep_q - 1, card1, dd), dtype),
            "depformer_text_emb": rnd(keys[7], (self.text_card + 1, dd), dtype),
            "depformer": self.depformer.init(keys[8], dtype),
            "linears": {"weight": uni(keys[9], (self.dep_q, self.card, dd), dd)},
        }
        if self.bias_proj:
            p["text_linear"]["bias"] = jnp.zeros((self.text_card + self._extra_text,), dtype)
            p["linears"]["bias"] = jnp.zeros((self.dep_q, self.card), dtype)
        return p

    # -- embedding fusion ---------------------------------------------------------

    def initial_frame(self, batch_size: int) -> jax.Array:
        text = jnp.full((batch_size, 1, 1), self.text_initial_token_id, jnp.int32)
        audio = jnp.full((batch_size, self.n_q, 1), self.initial_token_id, jnp.int32)
        return jnp.concatenate([text, audio], axis=1)

    def fuse_embeddings(self, params: Params, sequence: jax.Array) -> jax.Array:
        card1 = self.card + 1
        audio_tokens = sequence[:, 1:, :]
        flat = params["emb"].reshape(self.n_q * card1, self.dim)
        idx = jnp.clip(audio_tokens, 0, self.card) + (
            jnp.arange(self.n_q, dtype=audio_tokens.dtype)[None, :, None] * card1
        )
        emb = jnp.take(flat, idx, axis=0)
        emb = jnp.where((audio_tokens == self.zero_token_id)[..., None], 0.0, emb)
        x = jnp.sum(emb, axis=1)
        return x + scaled_embedding(params["text_emb"], sequence[:, 0, :])

    # -- forward (training & single-step) -------------------------------------------

    def _text_logits(self, params: Params, hidden: jax.Array) -> jax.Array:
        w = params["text_linear"]["weight"]
        if isinstance(w, dict):  # weight-only int8 head (--int8-head)
            logits = (hidden @ w["w_int8"].T.astype(hidden.dtype)) * w[
                "scale"
            ].astype(hidden.dtype)
        else:
            logits = hidden @ w.T.astype(hidden.dtype)
        if "bias" in params["text_linear"]:
            logits = logits + params["text_linear"]["bias"].astype(logits.dtype)
        return logits

    def forward_text(self, params: Params, sequence: jax.Array, dropout_rng=None):
        """Offline temporal forward: [B, 1+n_q, T] -> (hidden, text_logits).
        ``dropout_rng`` enables LoRA-branch dropout (LoRA fine-tuning)."""
        x = self.fuse_embeddings(params, sequence)
        hidden = self.transformer(params["transformer"], x, dropout_rng=dropout_rng)
        hidden = self.out_norm(params["out_norm"], hidden)
        return hidden, self._text_logits(params, hidden)

    def _dep_in(self, params: Params, hidden: jax.Array, cb_index) -> jax.Array:
        w = resolve_weight(params["depformer_in"], hidden.dtype)
        idx = cb_index if self.depformer_multi_linear else 0
        return hidden @ w[idx].T

    def forward_local(
        self, params: Params, text_tokens: jax.Array, audio_targets: jax.Array,
        hidden: jax.Array,
    ) -> jax.Array:
        """Teacher-forced depformer: -> [B, T, dep_q, card]
        (training variant ``models/model.py:321-363``)."""
        B, T, _ = hidden.shape
        w_dep = resolve_weight(params["depformer_in"], hidden.dtype)
        if not self.depformer_multi_linear:
            w_dep = jnp.repeat(w_dep, self.dep_q, 0)
        dep_in = jnp.einsum("btd,kcd->btkc", hidden, w_dep)
        prev = [scaled_embedding(params["depformer_text_emb"], text_tokens)]
        for k in range(self.dep_q - 1):
            prev.append(scaled_embedding(params["depformer_emb"][k], audio_targets[:, k, :]))
        x = (dep_in + jnp.stack(prev, axis=2)).reshape(B * T, self.dep_q, self.depformer_dim)
        out = self.depformer(params["depformer"], x)
        logits = jnp.einsum(
            "nkc,kvc->nkv", out, resolve_weight(params["linears"]["weight"], out.dtype)
        )
        if "bias" in params["linears"]:
            logits = logits + params["linears"]["bias"].astype(logits.dtype)
        return logits.reshape(B, T, self.dep_q, self.card)

    def __call__(self, params: Params, sequence: jax.Array, dropout_rng=None):
        """Training forward: [B, 1+n_q, S] -> (audio_logits, text_logits)."""
        B, K, S = sequence.shape
        assert K == self.num_codebooks
        start = jnp.broadcast_to(self.initial_frame(B), (B, K, 1)).astype(sequence.dtype)
        global_input = jnp.concatenate([start, sequence[:, :, :-1]], axis=2)
        hidden, text_logits = self.forward_text(params, global_input, dropout_rng)
        audio_logits = self.forward_local(
            params, sequence[:, 0, :], sequence[:, 1 : self.dep_q + 1, :], hidden
        )
        return audio_logits, text_logits

    # -- streaming protocol -----------------------------------------------------------

    def init_state(self, batch_size: int, dtype=jnp.bfloat16,
                   kv_int8: bool = False, kv_unstacked: bool = False) -> State:
        return self.transformer.init_state(
            batch_size, dtype, kv_int8=kv_int8, kv_unstacked=kv_unstacked
        )

    def step_global(self, params: Params, state: State, frame: jax.Array, min_pos=None):
        x = self.fuse_embeddings(params, frame)
        hidden, state = self.transformer.step(params["transformer"], state, x, min_pos=min_pos)
        hidden = self.out_norm(params["out_norm"], hidden)
        return hidden, self._text_logits(params, hidden), state

    def init_codecformer_state(self, batch_size: int, dtype=jnp.bfloat16) -> State:
        return self.depformer.init_state(batch_size, dtype)

    def codecformer_inputs(self, params: Params, hidden: jax.Array) -> jax.Array:
        """All dep_q per-codebook ``depformer_in`` views of the backbone
        output in ONE matmul: [B, T, D] -> [B, dep_q, T, C]. They don't
        depend on sampled tokens, so LMGen hoists them out of the
        sequential micro-steps."""
        w = resolve_weight(params["depformer_in"], hidden.dtype)
        if not self.depformer_multi_linear:
            w = jnp.repeat(w, self.dep_q, 0)
        return jnp.einsum("btd,kcd->bktc", hidden, w)

    def codecformer_step_embedding(
        self, params: Params, cb_index: int, prev_token: jax.Array
    ) -> jax.Array:
        """Previous-token embedding for micro-step ``cb_index``."""
        if cb_index == 0:
            return scaled_embedding(params["depformer_text_emb"], prev_token)
        return scaled_embedding(params["depformer_emb"][cb_index - 1], prev_token)

    def step_codecformer(
        self, params: Params, cf_state: State, cb_index: int,
        prev_token: jax.Array, hidden: jax.Array, dep_in=None,
    ):
        """One depformer micro-step (``forward_depformer``, lm.py:286).
        ``dep_in`` (optional): this step's precomputed [B, 1, C] view from
        ``codecformer_inputs``."""
        if dep_in is None:
            dep_in = self._dep_in(params, hidden, cb_index)
        emb = self.codecformer_step_embedding(params, cb_index, prev_token)
        x = dep_in + emb
        out, cf_state = self.depformer.step(params["depformer"], cf_state, x)
        w_lin = resolve_weight(params["linears"]["weight"], out.dtype)
        logits = out @ w_lin[cb_index].T
        if "bias" in params["linears"]:
            logits = logits + params["linears"]["bias"][cb_index].astype(logits.dtype)
        return logits, cf_state


def moshi_7b(delays: tuple[int, ...] | None = None) -> MoshiLMModel:
    """Canonical Moshi 7B hyperparameters (``moshi/models/loaders.py:68-98``)."""
    return MoshiLMModel(
        delays=tuple(delays or ((0, 0) + (1,) * 7 + (0,) + (1,) * 7)),
        n_q=16, dep_q=8, card=2048, text_card=32000, dim=4096, num_heads=32,
        num_layers=32, hidden_scale=4.125, norm="rms_norm_f32", gating="silu",
        positional_embedding="rope", context=3000, existing_text_padding_id=3,
        depformer_dim=1024, depformer_dim_feedforward=int(4.125 * 1024),
        depformer_num_heads=16, depformer_num_layers=6,
        depformer_multi_linear=True, depformer_weights_per_step=True,
        depformer_pos_emb="none",
    )
