"""Normalization layers (capability parity with
``MLLM_v2/modules/transformer.py:27-124``: LayerNormF32, RMSNorm, LayerScale,
create_norm_fn). Pure functions over param dicts; f32 variants compute in
float32 and cast back — the TPU-preferred bf16-params/f32-norm policy.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rstnet_tpu.core import Params


def rms_norm(x: jax.Array, alpha: jax.Array, eps: float, compute_f32: bool) -> jax.Array:
    x_dtype = x.dtype
    if compute_f32:
        x = x.astype(jnp.float32)
    var = eps + jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return (x * (alpha.astype(var.dtype) * jax.lax.rsqrt(var))).astype(x_dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float, compute_f32: bool
) -> jax.Array:
    x_dtype = x.dtype
    if compute_f32:
        x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(y.dtype) + bias.astype(y.dtype)
    return y.astype(x_dtype)


@dataclasses.dataclass(frozen=True)
class Norm:
    """Factory-style norm module: one of
    {layer_norm, layer_norm_f32, rms_norm, rms_norm_f32, none}."""

    kind: str
    dim: int

    def __post_init__(self):
        assert self.kind in ("layer_norm", "layer_norm_f32", "rms_norm", "rms_norm_f32", "none")

    @property
    def eps(self) -> float:
        return 1e-8 if self.kind.endswith("_f32") else 1e-5

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        del key
        if self.kind == "none":
            return {}
        if self.kind.startswith("rms_norm"):
            # f32 norms keep their scale in f32 regardless of model dtype.
            pdtype = jnp.float32 if self.kind.endswith("_f32") else dtype
            return {"alpha": jnp.ones((self.dim,), pdtype)}
        pdtype = jnp.float32 if self.kind.endswith("_f32") else dtype
        return {"weight": jnp.ones((self.dim,), pdtype), "bias": jnp.zeros((self.dim,), pdtype)}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.kind == "none":
            return x
        f32 = self.kind.endswith("_f32")
        if self.kind.startswith("rms_norm"):
            return rms_norm(x, params["alpha"], self.eps, f32)
        return layer_norm(x, params["weight"], params["bias"], self.eps, f32)


@dataclasses.dataclass(frozen=True)
class LayerScale:
    """Diagonal residual-branch rescaling [Touvron et al 2021]."""

    channels: int
    init_value: float = 1e-4

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        del key
        return {"scale": jnp.full((self.channels,), self.init_value, dtype)}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return params["scale"].astype(x.dtype) * x
