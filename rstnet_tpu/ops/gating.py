"""Gated feed-forward (GLU-family) layers.

Parity with ``MLLM_v2/modules/gating.py:24-82``: the hidden size is chosen so
the gated FFN matches the parameter count of a dense 4x FFN (21/8 rule), the
in-projection produces ``2*hidden`` that is split into (gate, value), and any
elementwise activation can gate. Per-step stacked weights (for the depth
transformer's ``weights_per_step``) are handled by the caller via einsum over
a leading step axis — no Python loops over time.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp

from rstnet_tpu.core import Params

_ACTIVATIONS: dict[str, Callable] = {
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "leaky_relu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "softsign": jax.nn.soft_sign,
    "identity": lambda x: x,
}


def get_activation(name: str) -> Callable:
    return _ACTIVATIONS[name]


def gating_hidden_dim(dim: int, dim_feedforward: int) -> int:
    """Hidden width rule so gated-FFN params ~= dense-FFN params."""
    if dim_feedforward == 4 * dim:
        return (21 * dim) // 8
    return (2 * dim_feedforward) // 3


def _linear_init(key, out_dim, in_dim, dtype):
    bound = 1.0 / math.sqrt(in_dim)
    return jax.random.uniform(key, (out_dim, in_dim), dtype, -bound, bound)


@dataclasses.dataclass(frozen=True)
class ActivationGating:
    """y = W_out (act(a) * b) where [a; b] = W_in x."""

    dim: int
    dim_feedforward: int
    activation: str = "silu"

    @property
    def hidden(self) -> int:
        return gating_hidden_dim(self.dim, self.dim_feedforward)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        k1, k2 = jax.random.split(key)
        return {
            "linear_in": _linear_init(k1, 2 * self.hidden, self.dim, dtype),
            "linear_out": _linear_init(k2, self.dim, self.hidden, dtype),
        }

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        act = get_activation(self.activation)
        h = x @ params["linear_in"].T
        gate, val = jnp.split(h, 2, axis=-1)
        return (act(gate) * val) @ params["linear_out"].T
