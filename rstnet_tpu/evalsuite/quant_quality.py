"""Quantization quality bounds for the int8 serving modes.

The serving claims (``--int8``, ``--kv-int8``, the mixed head+depformer
mode) were previously backed only by greedy-token agreement at tiny scale;
this module quantifies the quality cost on the SAME streaming decode path
the server runs — ring KV cache, int8 K/V rings included — with three
checkpoint-free measures against the bf16 reference:

1. **Streaming teacher-forced CE/PPL** over a fixed token grid: every frame
   is forced, the model is scored on its next-frame logits. Running this
   through ``step_global``/``step_codecformer`` (not the offline forward) is
   what exercises ``kv_int8``'s quantized ring reads.
2. **Per-step sampled-token agreement**: at every step both models see the
   identical forced history and the identical PRNG key; the agreement rate
   of their sampled tokens at serving temperatures bounds how often a
   deployed int8 stack would emit a different token than bf16 would have.
   (A free-running comparison would conflate quantization error with chaotic
   divergence: one flipped token changes all subsequent history.)
3. **Greedy agreement** (argmax match) — the temperature-free variant of 2.

The caller turns the per-step sampled streams into decoded-audio SI-SNR by
decoding both with the same Mimi (see ``bench.py::bench_int8_quality``).

Capability anchor: the reference serves strictly bf16 and computes
teacher-forced PPL offline (``MLLM_v2/infer_no_streaming.py:144-146``);
int8 serving is a TPU-side extension, so its quality bound is measured
here rather than inherited.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.core import Params
from rstnet_tpu.models.lm import SpeechTextLM
from rstnet_tpu.ops.sampling import sample_token


@dataclasses.dataclass(frozen=True)
class TFStreamResult:
    """Per-variant result of a teacher-forced streaming pass."""

    ce_text: float       # mean CE (nats/token) over text row
    ce_audio: float      # mean CE (nats/token) over the dep_q audio rows
    ppl_text: float
    ppl_audio: float
    sampled: np.ndarray  # [B, 1+dep_q, T] per-step sampled tokens
    greedy: np.ndarray   # [B, 1+dep_q, T] per-step argmax tokens


def teacher_forced_stream(
    model: SpeechTextLM,
    params: Params,
    grid: np.ndarray,
    key: jax.Array,
    kv_int8: bool = False,
    kv_unstacked: bool = False,
    temp: float = 0.8,
    temp_text: float = 0.7,
    top_k: int = 250,
    top_k_text: int = 25,
    audio_max_card: Optional[int] = None,
    state_dtype=jnp.bfloat16,
) -> TFStreamResult:
    """Score + sample every next-frame under forced history.

    grid: [B, K, T] token grid (text row 0, audio rows 1..n_q). The pass
    replays the offline forward's exact conditioning (``SpeechTextLM.
    __call__`` shifts inputs by one against the model's initial frame):
    step t feeds [initial, grid[..., :-1]][t] and scores grid[..., t] —
    so the streaming CE equals the offline teacher-forced CE position for
    position (tested). PRNG keys derive from ``key`` by step index, so two
    calls with the same key sample under identical randomness — the
    agreement measure's requirement.
    """
    cfg = model.config
    B, K, T = grid.shape
    assert K == model.num_codebooks and T >= 2
    dep_q = cfg.dep_q
    n_gen = dep_q + 1
    grid = jnp.asarray(grid, jnp.int32)
    start = jnp.broadcast_to(model.initial_frame(B), (B, K, 1)).astype(grid.dtype)
    inputs = jnp.concatenate([start, grid[:, :, :-1]], axis=2)
    frames = jnp.moveaxis(inputs, 2, 0)               # [T, B, K]
    targets = jnp.moveaxis(grid[:, :n_gen, :], 2, 0)  # [T, B, n_gen]

    def step(params, lm_state, xs):
        frame, target, t = xs
        k_step = jax.random.fold_in(key, t)
        hidden, text_logits, lm_state = model.step_global(
            params, lm_state, frame[:, :, None]
        )
        tl = text_logits[:, 0].astype(jnp.float32)     # [B, V]
        lp_text = jnp.take_along_axis(
            jax.nn.log_softmax(tl, axis=-1), target[:, 0:1], axis=-1
        )[:, 0]
        k_step, k_text = jax.random.split(k_step)
        sampled_text = sample_token(k_text, tl, True, temp_text, top_k_text)
        greedy_text = jnp.argmax(tl, axis=-1).astype(jnp.int32)

        cf_state = model.init_codecformer_state(B, dtype=hidden.dtype)
        prev = target[:, 0:1]  # forced text conditions the depformer
        lps, sampled, greedy = [lp_text], [sampled_text], [greedy_text]
        for cb in range(dep_q):
            logits, cf_state = model.step_codecformer(
                params, cf_state, cb, prev, hidden
            )
            al = logits[:, 0].astype(jnp.float32)      # [B, card]
            lps.append(
                jnp.take_along_axis(
                    jax.nn.log_softmax(al, axis=-1),
                    target[:, cb + 1 : cb + 2], axis=-1,
                )[:, 0]
            )
            k_step, k_cb = jax.random.split(k_step)
            sampled.append(
                sample_token(k_cb, al, True, temp, top_k, max_card=audio_max_card)
            )
            greedy.append(jnp.argmax(al, axis=-1).astype(jnp.int32))
            prev = target[:, cb + 1 : cb + 2]  # forced audio conditions on
        return lm_state, (
            jnp.stack(lps, axis=1),      # [B, n_gen]
            jnp.stack(sampled, axis=1),  # [B, n_gen]
            jnp.stack(greedy, axis=1),
        )

    # params/frames/targets MUST be jit arguments, not captured constants:
    # a closed-over 2B-param tree is serialized into the HLO itself (~4 GB
    # of literals) and shipped to the (remote) compiler per variant
    def run(params, lm_state, frames, targets):
        return jax.lax.scan(
            lambda c, xs: step(params, c, xs),
            lm_state,
            (frames, targets, jnp.arange(T, dtype=jnp.int32)),
        )

    lm_state = model.init_state(
        B, state_dtype, kv_int8=kv_int8, kv_unstacked=kv_unstacked
    )
    _, (lps, sampled, greedy) = jax.jit(run)(params, lm_state, frames, targets)
    lps = np.asarray(lps, np.float64)                  # [T, B, n_gen]
    ce_text = float(-lps[:, :, 0].mean())
    ce_audio = float(-lps[:, :, 1:].mean())
    return TFStreamResult(
        ce_text=ce_text,
        ce_audio=ce_audio,
        ppl_text=float(np.exp(ce_text)),
        ppl_audio=float(np.exp(ce_audio)),
        sampled=np.moveaxis(np.asarray(sampled), 0, 2),
        greedy=np.moveaxis(np.asarray(greedy), 0, 2),
    )


def agreement(a: np.ndarray, b: np.ndarray) -> float:
    """Fraction of token positions where two [B, n_gen, T] streams agree."""
    assert a.shape == b.shape
    return float((a == b).mean())


def compare_quant_variants(
    model: SpeechTextLM,
    params_bf16: Params,
    variants: dict,
    grid: np.ndarray,
    key: jax.Array,
    **sample_kwargs,
) -> dict:
    """Quality table: each variant vs the bf16 reference on one grid.

    ``variants``: name -> (params, kv_int8 flag). Returns a dict of rows;
    the ``bf16`` row is the reference (deltas zero by construction).
    """
    ref = teacher_forced_stream(model, params_bf16, grid, key, **sample_kwargs)
    rows = {
        "bf16": {
            "ppl_text": round(ref.ppl_text, 4),
            "ppl_audio": round(ref.ppl_audio, 4),
            "d_ce_text": 0.0,
            "d_ce_audio": 0.0,
            "agree_sampled": 1.0,
            "agree_greedy": 1.0,
        }
    }
    results = {"bf16": ref}
    for name, (p, kv8) in variants.items():
        r = teacher_forced_stream(model, p, grid, key, kv_int8=kv8, **sample_kwargs)
        rows[name] = {
            "ppl_text": round(r.ppl_text, 4),
            "ppl_audio": round(r.ppl_audio, 4),
            "d_ce_text": round(r.ce_text - ref.ce_text, 6),
            "d_ce_audio": round(r.ce_audio - ref.ce_audio, 6),
            "agree_sampled": round(agreement(r.sampled, ref.sampled), 4),
            "agree_greedy": round(agreement(r.greedy, ref.greedy), 4),
        }
        results[name] = r
    return {"rows": rows, "results": results}
