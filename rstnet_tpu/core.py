"""Core helpers shared across the framework: PRNG plumbing, param utilities.

The module convention (see package docstring): modules are frozen dataclasses
holding only *static* configuration, so they are hashable and can be closed
over by jit. Parameters and streaming state are plain nested-dict pytrees.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Iterator

import jax
import jax.numpy as jnp

Params = Any  # nested dict pytree of jnp arrays
State = Any  # nested dict pytree of jnp arrays


class RngStream:
    """Splits a PRNG key into a stream of fresh keys (init-time only)."""

    def __init__(self, key: jax.Array):
        self._key = key

    def __call__(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub


def param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def param_bytes(params: Params) -> int:
    return sum(int(p.size * p.dtype.itemsize) for p in jax.tree.leaves(params))


def cast_floating(tree: Params, dtype) -> Params:
    """Cast floating-point leaves of a pytree to ``dtype``; leave ints alone."""

    def _cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(_cast, tree)


def flatten_dict(tree: Params, prefix: str = "", sep: str = ".") -> Iterator[tuple[str, Any]]:
    """Yield (dotted-path, leaf) pairs from a nested dict/list pytree."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from flatten_dict(v, f"{prefix}{sep}{k}" if prefix else str(k), sep)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from flatten_dict(v, f"{prefix}{sep}{i}" if prefix else str(i), sep)
    else:
        yield prefix, tree


def config_fields(obj) -> dict:
    """Static config of a module dataclass, for repr/serialization."""
    return {f.name: getattr(obj, f.name) for f in dataclasses.fields(obj)}


def seed_everything(seed: int) -> "jax.Array":
    """Seed host-side RNGs and return a root PRNG key (parity:
    ``utils/train_utils.py:30-51`` — determinism on TPU comes from jit +
    explicit keys rather than cudnn flags)."""
    import random as _random

    import numpy as _np

    _random.seed(seed)
    _np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def lora_dropout(x: "jax.Array", drop) -> "jax.Array":
    """Dropout on a LoRA branch input (reference semantics: torch
    ``LoRALinear`` applies ``nn.Dropout`` to x before the A matrix,
    ``MLLM_v2/models/llama_streaming.py:35-98``). ``drop`` is a
    ``(rate, key)`` pair, or ``None`` to disable (inference / rate 0) —
    inverted dropout, so expectation is preserved and eval needs no rescale."""
    if drop is None:
        return x
    rate, key = drop
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def model_size_report(params: Params) -> str:
    """Human-readable size summary (codec ``cal_model_size`` equivalent)."""
    n = param_count(params)
    b = param_bytes(params)
    return f"{n / 1e6:.2f}M params, {b / 1e6:.1f} MB"
