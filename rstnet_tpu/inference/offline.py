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
            tok = sample_token(
                k_cb, logits[:, -1], self.use_sampling, self.temp, self.top_k,
                max_card=model.config.audio_card,
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
        """Generate continuation of a [B, 1+dep_q, T0] prefix grid.

        ``forced`` (same shape as the output, -1 where free) enables partial
        teacher forcing (e.g. TTS: text forced, audio generated — the
        ``ungenerated_token_id`` mechanism of the reference). Returns
        [B, 1+dep_q, T0 + max_new].
        """
        model = self.model
        B, K, T0 = prefix.shape
        prefix_len = prefix_len if prefix_len is not None else T0
        lm_state = model.init_state(B, dtype=jnp.float32)
        frames = [np.asarray(prefix[:, :, :1])]
        frame = jnp.asarray(model.initial_frame(B))
        no_force_t = jnp.full((B,), -1, jnp.int32)
        no_force_a = jnp.full((B, model.config.dep_q), -1, jnp.int32)
        total = prefix_len + max_new
        for t in range(total):
            if t < prefix_len:
                # teacher-force the whole frame from the prefix
                f_text = jnp.asarray(prefix[:, 0, t])
                f_audio = jnp.asarray(prefix[:, 1:, t])
            elif forced is not None and t < forced.shape[-1]:
                f_text = jnp.asarray(forced[:, 0, t])
                f_audio = jnp.asarray(forced[:, 1:, t])
            else:
                f_text, f_audio = no_force_t, no_force_a
            key, sub = jax.random.split(key)
            next_frame, lm_state = self._step(
                self.params, lm_state, frame, sub, f_text, f_audio, teacher_force=True
            )
            frame = next_frame
            frames.append(np.asarray(frame))
        out = np.concatenate(frames[1:], axis=2)  # drop the initial-token slot
        return out[:, :, :total]
