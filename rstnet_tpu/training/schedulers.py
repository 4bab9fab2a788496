"""LR schedulers as optax-compatible schedule functions.

Parity with ``MLLM_v2/utils/train_utils.py:197-234`` (WarmupLR — Noam warmup
normalized so peak lr == base lr) and the scheduler ABCs of
``utils/abs_scheduler.py`` (here: any ``step -> lr`` callable).
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_lr(base_lr: float, warmup_steps: int = 25000):
    """lr(step) = base_lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5).

    Step is 1-indexed (step 0 maps to 1), max lr == base_lr at warmup_steps.
    """

    def schedule(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32) + 1.0, 1.0)
        return base_lr * warmup_steps**0.5 * jnp.minimum(s**-0.5, s * warmup_steps**-1.5)

    return schedule


def constant_lr(base_lr: float):
    return lambda step: jnp.asarray(base_lr, jnp.float32)


def exponential_decay_lr(base_lr: float, gamma: float, steps_per_epoch: int = 1):
    """Codec-style ExponentialLR (``AudioCodec/MimiCodec/train.py`` scheduler
    config): lr decays by ``gamma`` per epoch."""

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) / steps_per_epoch
        return base_lr * gamma**epoch

    return schedule
