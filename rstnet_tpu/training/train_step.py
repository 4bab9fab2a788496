"""The pjit training step: one function replaces the reference's three
trainer variants (full FSDP / LoRA FSDP / DeepSpeed ZeRO-2 —
``MLLM_v2/trainer/pre_training_{full,lora,lora_ds}.py``): the *sharding of
params and optimizer state* is the strategy, and the *trainable mask* is the
full-vs-LoRA switch.

Loss semantics mirror ``pre_training_full.py:204-219``: audio CE over rows
1..dep_q with weights [2,1,...], text CE over row 0, summed; metrics are
globally averaged by construction (the loss is computed on the global
sharded batch, so no explicit all_reduce is needed).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from rstnet_tpu.core import Params
from rstnet_tpu.losses.ce import cross_entropy_and_accuracy
from rstnet_tpu.models.lm import SpeechTextLM

TEXT_PAD_TOKEN = 128003
ACOUSTIC_PAD_TOKEN = 2049


def make_loss_fn(
    model: SpeechTextLM,
    audio_loss_weights: Optional[tuple[float, ...]] = None,
    text_loss_weight: float = 1.0,
    audio_ignore_id: int = ACOUSTIC_PAD_TOKEN,
    text_ignore_id: int = TEXT_PAD_TOKEN,
) -> Callable:
    dep_q = model.config.dep_q
    if audio_loss_weights is None:
        audio_loss_weights = (2.0,) + (1.0,) * (dep_q - 1)

    def loss_fn(
        params: Params, batch: dict, dropout_rng: Optional[jax.Array] = None
    ) -> tuple[jax.Array, dict]:
        seqs = batch["tokens"]  # [B, 1+n_q, S]
        masks = batch["masks"].astype(jnp.float32)
        audio_logits, text_logits = model(params, seqs, dropout_rng=dropout_rng)
        loss_audio, m_audio = cross_entropy_and_accuracy(
            audio_logits,
            seqs[:, 1 : dep_q + 1],
            masks[:, 1 : dep_q + 1],
            audio_loss_weights,
            (audio_ignore_id,) * dep_q,
        )
        loss_text, m_text = cross_entropy_and_accuracy(
            text_logits[:, :, None, :],
            seqs[:, 0:1],
            masks[:, 0:1],
            (text_loss_weight,),
            (text_ignore_id,),
        )
        loss = loss_audio + loss_text
        metrics = {
            "loss": loss,
            "loss_audio": loss_audio,
            "loss_text": loss_text,
            "acc_audio": m_audio["acc_all"],
            "acc_text": m_text["acc_all"],
            "acc_audio_tgt": m_audio["acc_target"],
            "acc_text_tgt": m_text["acc_target"],
        }
        return loss, metrics

    return loss_fn


def make_optimizer(
    learning_rate_schedule,
    betas: tuple[float, float] = (0.9, 0.95),
    weight_decay: float = 1e-3,
    eps: float = 1e-8,
    grad_clip: Optional[float] = None,
    trainable_mask: Optional[Params] = None,
    skip_nonfinite: int = 0,
) -> optax.GradientTransformation:
    """AdamW matching the reference's hyperparameters
    (``pre_training_full.py:138-145``); ``trainable_mask`` (bool pytree)
    freezes everything else — the LoRA-vs-full switch. ``skip_nonfinite > 0``
    drops updates with NaN/inf gradients (up to that many in a row) — the
    guard the reference wanted but left commented out
    (``pre_training_full.py:227-231``); being inside jit it stays in lockstep
    across replicas."""
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(
        optax.adamw(
            learning_rate=learning_rate_schedule,
            b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay,
        )
    )
    tx = optax.chain(*chain)
    if skip_nonfinite > 0:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=skip_nonfinite)
    if trainable_mask is not None:
        tx = optax.masked(tx, trainable_mask)
    return tx


def init_train_state(
    params: Params, tx: optax.GradientTransformation
) -> dict:
    return {"params": params, "opt_state": tx.init(params), "step": jnp.zeros((), jnp.int32)}


def make_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    grad_accum: int = 1,
    trainable_mask: Optional[Params] = None,
    donate: bool = True,
    dropout_seed: Optional[int] = None,
):
    """Build the jitted train step.

    With ``grad_accum > 1`` the batch carries a leading microbatch axis
    ``[A, B, ...]`` and gradients are averaged over a ``lax.scan`` —
    the XLA-native replacement for the reference's ``b_idx % grad_accum``
    deferred-step loop (``pre_training_full.py:226-236``).

    ``dropout_seed`` (not None) threads a per-step PRNG key into
    ``loss_fn(params, batch, rng)`` — the LoRA-dropout path; the key is
    derived from ``state["step"]`` inside jit so resume stays deterministic.
    """

    def compute_grads(params, batch, rng=None):
        if rng is None:
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch
            )
        else:
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng
            )
        return grads, metrics

    def step_fn(state: dict, batch: dict) -> tuple[dict, dict]:
        params = state["params"]
        base_rng = None
        if dropout_seed is not None:
            base_rng = jax.random.fold_in(
                jax.random.PRNGKey(dropout_seed), state["step"]
            )
        if grad_accum > 1:
            def scan_body(acc, inp):
                micro, idx = inp
                rng = None if base_rng is None else jax.random.fold_in(base_rng, idx)
                grads, metrics = compute_grads(params, micro, rng)
                acc_g, acc_m = acc
                return (
                    jax.tree.map(jnp.add, acc_g, grads),
                    jax.tree.map(jnp.add, acc_m, metrics),
                ), None

            zero_g = jax.tree.map(jnp.zeros_like, params)
            first = jax.tree.map(lambda x: x[0], batch)
            m_shape = jax.eval_shape(lambda p, b: compute_grads(p, b)[1], params, first)
            zero_m = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), m_shape)
            (grads, msum), _ = jax.lax.scan(
                scan_body, (zero_g, zero_m),
                (batch, jnp.arange(grad_accum, dtype=jnp.int32)),
            )
            grads = jax.tree.map(lambda g: g / grad_accum, grads)
            metrics = jax.tree.map(lambda m: m / grad_accum, msum)
        else:
            grads, metrics = compute_grads(params, batch, base_rng)
        if trainable_mask is not None:
            grads = jax.tree.map(
                lambda g, m: g if m else jnp.zeros_like(g), grads, trainable_mask
            )
        updates, opt_state = tx.update(grads, state["opt_state"], params)
        params = optax.apply_updates(params, updates)
        return {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_grad_accum_steps(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    trainable_mask: Optional[Params] = None,
    dropout_seed: Optional[int] = None,
):
    """Cross-batch gradient accumulation: ``(accum_step, apply_step)``.

    The reference defers the optimizer update every ``b_idx % grad_accum``
    batches (``pre_training_full.py:226-236``). The scan variant inside
    ``make_train_step`` needs all microbatches stacked with ONE shape; the
    token-budget bucketed loader yields them one at a time with varying
    shapes, so this pair accumulates across separate jitted calls instead:
    ``accum_step(state, batch)`` adds the batch's gradients into
    ``state["acc_grads"]`` (one program per bucket shape, state donated);
    ``apply_step(state)`` averages over the accumulated count, applies the
    optimizer update and zeroes the accumulator (one program total).

    The caller seeds ``state["acc_grads"] = zeros_like(params)`` and
    ``state["micro"] = 0`` (see the trainer); they are NOT checkpointed —
    like the reference, a resume restarts mid-window accumulation.
    """

    def compute_grads(params, batch, rng=None):
        if rng is None:
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        else:
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng
            )
        return grads, metrics

    def accum_fn(state: dict, batch: dict) -> tuple[dict, dict]:
        rng = None
        if dropout_seed is not None:
            rng = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(dropout_seed), state["step"]),
                state["micro"],
            )
        grads, metrics = compute_grads(state["params"], batch, rng)
        acc = jax.tree.map(
            lambda a, g: a + g.astype(a.dtype), state["acc_grads"], grads
        )
        return {**state, "acc_grads": acc, "micro": state["micro"] + 1}, metrics

    def apply_fn(state: dict) -> dict:
        n = jnp.maximum(state["micro"], 1).astype(jnp.float32)
        grads = jax.tree.map(lambda g: g / n, state["acc_grads"])
        if trainable_mask is not None:
            grads = jax.tree.map(
                lambda g, m: g if m else jnp.zeros_like(g), grads, trainable_mask
            )
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {
            **state,
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
            "acc_grads": jax.tree.map(jnp.zeros_like, state["acc_grads"]),
            "micro": jnp.zeros((), jnp.int32),
        }

    return (
        jax.jit(accum_fn, donate_argnums=(0,)),
        jax.jit(apply_fn, donate_argnums=(0,)),
    )


def partition_params(params: Params, trainable_mask: Params) -> tuple[Params, Params]:
    """Split ``params`` into (trainable, frozen) trees along a bool mask.

    Both trees keep the full structure with ``None`` at the other side's
    leaf positions (``None`` is an empty pytree node, so JAX transforms and
    optax simply skip those slots). This is the memory-honest PEFT split:
    unlike ``trainable_mask`` on :func:`make_train_step` — which still
    *computes* every frozen gradient and relies on XLA dead-code
    elimination — a partitioned step never differentiates the frozen tree
    at all, so (a) no frozen-gradient buffers exist even transiently, and
    (b) the frozen side may hold non-differentiable dtypes (the int8
    serving quantization of ``models/backbone.py::quantize_backbone_int8``),
    which is what makes an 8B LoRA fine-tune fit one 16 GB chip
    (reference recipe: ``MLLM_v2/egs/pretraining/run.sh:141`` trains an 8B
    backbone with LoRA).
    """
    trainable = jax.tree.map(lambda p, m: p if m else None, params, trainable_mask)
    frozen = jax.tree.map(lambda p, m: None if m else p, params, trainable_mask)
    return trainable, frozen


def combine_params(trainable: Params, frozen: Params) -> Params:
    """Inverse of :func:`partition_params` (pure; works under jit)."""
    return jax.tree.map(
        lambda t, f: f if t is None else t,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )


def make_peft_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    grad_accum: int = 1,
    donate: bool = True,
    dropout_seed: Optional[int] = None,
):
    """Train step over a partitioned (trainable, frozen) param split.

    ``step_fn(state, frozen, batch) -> (state, metrics)`` where ``state``
    holds only the trainable tree + its optimizer state (donated); the
    frozen tree is a separate non-donated argument so one device copy is
    reused every step (passing it as an argument — not a closure capture —
    keeps multi-GB frozen weights out of the compiled executable's
    constants). Gradients exist only for the trainable tree. Semantics
    otherwise match :func:`make_train_step` (same loss, same grad-accum
    scan, same dropout threading).
    """

    def compute_grads(trainable, frozen, batch, rng=None):
        def peft_loss(t):
            if rng is None:
                return loss_fn(combine_params(t, frozen), batch)
            return loss_fn(combine_params(t, frozen), batch, rng)

        (_, metrics), grads = jax.value_and_grad(peft_loss, has_aux=True)(trainable)
        return grads, metrics

    def step_fn(state: dict, frozen: Params, batch: dict) -> tuple[dict, dict]:
        trainable = state["params"]
        base_rng = None
        if dropout_seed is not None:
            base_rng = jax.random.fold_in(
                jax.random.PRNGKey(dropout_seed), state["step"]
            )
        if grad_accum > 1:
            def scan_body(acc, inp):
                micro, idx = inp
                rng = None if base_rng is None else jax.random.fold_in(base_rng, idx)
                grads, metrics = compute_grads(trainable, frozen, micro, rng)
                acc_g, acc_m = acc
                return (
                    jax.tree.map(jnp.add, acc_g, grads),
                    jax.tree.map(jnp.add, acc_m, metrics),
                ), None

            zero_g = jax.tree.map(jnp.zeros_like, trainable)
            first = jax.tree.map(lambda x: x[0], batch)
            m_shape = jax.eval_shape(
                lambda t, f, b: compute_grads(t, f, b)[1], trainable, frozen, first
            )
            zero_m = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), m_shape)
            (grads, msum), _ = jax.lax.scan(
                scan_body, (zero_g, zero_m),
                (batch, jnp.arange(grad_accum, dtype=jnp.int32)),
            )
            grads = jax.tree.map(lambda g: g / grad_accum, grads)
            metrics = jax.tree.map(lambda m: m / grad_accum, msum)
        else:
            grads, metrics = compute_grads(trainable, frozen, batch, base_rng)
        updates, opt_state = tx.update(grads, state["opt_state"], trainable)
        trainable = optax.apply_updates(trainable, updates)
        return {
            "params": trainable,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(loss_fn: Callable):
    def eval_fn(params: Params, batch: dict) -> dict:
        _, metrics = loss_fn(params, batch)
        return metrics

    return jax.jit(eval_fn)
