"""Offline/batch inference: teacher-forced perplexity and prefix generation.

Capability parity with ``MLLM_v2/infer_no_streaming.py:62-327``: a
teacher-forced mode computing per-stream CE/perplexity over a validation
iterator, and task-conditioned generation (text_only / audio_only / TTS /
ASR prefixes) followed by ``reverse_delay`` and codec detokenization.

TPU-first fix: generation uses the jitted ring-KV streaming step — O(T) per
token — instead of the reference's full re-forward over the whole prefix at
every step (``infer_no_streaming.py:232-240``, O(T^2)).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.core import Params
from rstnet_tpu.losses.ce import cross_entropy_and_accuracy
from rstnet_tpu.ops.sampling import sample_token


@dataclasses.dataclass
class OfflineInference:
    model: object  # SpeechTextLM or MoshiLMModel
    params: Params
    temp: float = 0.8
    temp_text: float = 0.7
    top_k: int = 250
    top_k_text: int = 25
    use_sampling: bool = True
    audio_ignore_id: int = 2049
    text_ignore_id: int = 128003
    # number of REAL codec codes: sampled audio ids are clamped below this
    # (the reference's sample_token_audio bans the empty/pad specials that
    # sit at the top of the audio vocabulary). None -> the model family's
    # own ``codec_card`` (Moshi: card; SpeechTextLM: audio_card - 2).
    codec_card: Optional[int] = None

    def __post_init__(self):
        self._forward = jax.jit(lambda p, s: self.model(p, s))
        self._step = jax.jit(self._one_step, static_argnames=("teacher_force",))

    # -- teacher-forced evaluation --------------------------------------------

    def teacher_forced_metrics(self, tokens: jax.Array, masks: jax.Array) -> dict:
        """CE / accuracy / perplexity over a [B, 1+n_q, S] grid
        (``infer_no_streaming.py:144-146,174-182``)."""
        dep_q = self.model.config.dep_q
        audio_logits, text_logits = self._forward(self.params, tokens)
        loss_audio, m_audio = cross_entropy_and_accuracy(
            audio_logits, tokens[:, 1 : dep_q + 1], masks[:, 1 : dep_q + 1],
            (1.0,) * dep_q, (self.audio_ignore_id,) * dep_q,
        )
        loss_text, m_text = cross_entropy_and_accuracy(
            text_logits[:, :, None, :], tokens[:, 0:1], masks[:, 0:1],
            (1.0,), (self.text_ignore_id,),
        )
        return {
            "loss_audio": float(loss_audio),
            "loss_text": float(loss_text),
            "ppl_audio": float(jnp.exp(loss_audio / dep_q)),
            "ppl_text": float(jnp.exp(loss_text)),
            "acc_audio": float(m_audio["acc_all"]),
            "acc_text": float(m_text["acc_all"]),
            # valid-token counts: corpus-level aggregation must weight
            # batches by these, not average per-batch means
            "n_audio_tokens": float(jnp.sum(masks[:, 1 : dep_q + 1])),
            "n_text_tokens": float(jnp.sum(masks[:, 0:1])),
        }

    # -- prefix-conditioned generation ------------------------------------------

    def _one_step(
        self, params, lm_state, frame, key, forced_text, forced_audio, teacher_force: bool
    ):
        """One temporal step: feed ``frame``, sample (or force) the next one."""
        model = self.model
        dep_q = model.config.dep_q
        hidden, text_logits, lm_state = model.step_global(params, lm_state, frame)
        key, k_text = jax.random.split(key)
        text_tok = sample_token(
            k_text, text_logits[:, -1], self.use_sampling, self.temp_text, self.top_k_text
        )
        if teacher_force:
            text_tok = jnp.where(forced_text >= 0, forced_text, text_tok)
        cf_state = model.init_codecformer_state(
            frame.shape[0], dtype=hidden.dtype
        )
        prev = text_tok[:, None]
        audio_toks = []
        for cb in range(dep_q):
            logits, cf_state = model.step_codecformer(params, cf_state, cb, prev, hidden)
            key, k_cb = jax.random.split(key)
            # ban any empty/pad specials inside the audio logits vocabulary
            # (reference sample_token_audio, ban >= 2048). Each model family
            # reports how many REAL codec codes its logits cover: Moshi
            # logits span only real codes; the trainer-convention
            # SpeechTextLM includes 2 specials at the top of audio_card.
            max_card = self.codec_card
            if max_card is None:
                max_card = getattr(
                    model, "codec_card", model.config.audio_card - 2
                )
            tok = sample_token(
                k_cb, logits[:, -1], self.use_sampling, self.temp, self.top_k,
                max_card=max_card,
            )
            if teacher_force:
                tok = jnp.where(forced_audio[:, cb] >= 0, forced_audio[:, cb], tok)
            prev = tok[:, None]
            audio_toks.append(tok)
        next_frame = jnp.concatenate(
            [text_tok[:, None, None]] + [a[:, None, None] for a in audio_toks], axis=1
        )
        return next_frame, lm_state

    def generate(
        self,
        prefix: np.ndarray,
        max_new: int,
        key: jax.Array,
        prefix_len: Optional[int] = None,
        forced: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Generate continuation of a [B, 1+n_q, T0] prefix grid.

        ``forced`` (-1 where free) enables partial teacher forcing (e.g.
        TTS: text forced, audio generated — the ``ungenerated_token_id``
        mechanism of the reference). Returns [B, 1+n_q, T0 + max_new]; for
        duplex configs (n_q > dep_q) the extra user-stream rows are
        teacher-forced from the prefix while it lasts and hold the initial
        token afterwards.
        """
        model = self.model
        cfg = model.config
        B, K, T0 = prefix.shape
        dep_q = cfg.dep_q
        n_gen = dep_q + 1  # rows the model generates (text + dep_q audio)
        prefix_len = prefix_len if prefix_len is not None else T0
        lm_state = model.init_state(B, dtype=jnp.float32)
        frames = []
        frame = jnp.asarray(model.initial_frame(B))  # [B, 1+n_q, 1]
        no_force_t = jnp.full((B,), -1, jnp.int32)
        no_force_a = jnp.full((B, dep_q), -1, jnp.int32)
        initial = jnp.asarray(model.initial_frame(B))
        total = prefix_len + max_new
        for t in range(total):
            if t < prefix_len:
                # teacher-force the whole frame from the prefix
                f_text = jnp.asarray(prefix[:, 0, t])
                f_audio = jnp.asarray(prefix[:, 1 : n_gen, t])
            elif forced is not None and t < forced.shape[-1]:
                f_text = jnp.asarray(forced[:, 0, t])
                f_audio = jnp.asarray(forced[:, 1 : n_gen, t])
            else:
                f_text, f_audio = no_force_t, no_force_a
            key, sub = jax.random.split(key)
            gen_frame, lm_state = self._step(
                self.params, lm_state, frame, sub, f_text, f_audio, teacher_force=True
            )  # [B, 1+dep_q, 1]
            if K > n_gen:
                # duplex configs (n_q > dep_q): the extra rows are user
                # streams — teacher-forced from the prefix while it lasts,
                # the initial token afterwards (no user audio offline)
                if t < prefix_len:
                    user = jnp.asarray(prefix[:, n_gen:, t : t + 1])
                else:
                    user = initial[:, n_gen:, :]
                frame = jnp.concatenate([gen_frame, user], axis=1)
            else:
                frame = gen_frame
            frames.append(frame)  # device arrays; one host sync at the end
        out = np.asarray(jnp.concatenate(frames, axis=2))
        return out[:, :, :total]
