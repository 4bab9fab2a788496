"""Residual VQ and the split (semantic/acoustic) quantizer.

Capability parity with ``MLLM_v2/moshi/quantization/{core_vq.py:419-503,
vq.py:21-318}``: N stacked codebooks quantize successive residuals; 1x1
projections into/out of the codebook space; ``SplitResidualVectorQuantizer``
runs 1 semantic RVQ and N-1 acoustic RVQ in parallel over the same input and
sums their decodes. Codebooks are stacked ``[n_q, bins, dim]`` and the
residual loop is a ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from rstnet_tpu.core import Params
from rstnet_tpu.quantization.codebook import EuclideanCodebook


@dataclasses.dataclass(frozen=True)
class ResidualVectorQuantizer:
    dimension: int = 128
    input_dimension: Optional[int] = None
    output_dimension: Optional[int] = None
    n_q: int = 8
    bins: int = 1024
    decay: float = 0.99
    threshold_usage_ratio: float = 0.1
    replaced_usage_ratio: float = 1.0
    codebook_offset: int = 0
    force_projection: bool = False

    @property
    def in_dim(self) -> int:
        return self.input_dimension or self.dimension

    @property
    def out_dim(self) -> int:
        return self.output_dimension or self.dimension

    @property
    def codebook(self) -> EuclideanCodebook:
        return EuclideanCodebook(
            self.dimension, self.bins, self.decay,
            threshold_usage_ratio=self.threshold_usage_ratio,
            replaced_usage_ratio=self.replaced_usage_ratio,
        )

    @property
    def has_input_proj(self) -> bool:
        return self.in_dim != self.dimension or self.force_projection

    @property
    def has_output_proj(self) -> bool:
        return self.out_dim != self.dimension or self.force_projection

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        cb_keys = jax.random.split(k3, self.n_q)
        p: Params = {
            "layers": jax.vmap(lambda k: self.codebook.init(k, dtype))(cb_keys)
        }
        if self.has_input_proj:
            bound = 1.0 / jnp.sqrt(self.in_dim)
            p["input_proj"] = jax.random.uniform(
                k1, (self.dimension, self.in_dim), dtype, -bound, bound
            )
        if self.has_output_proj:
            bound = 1.0 / jnp.sqrt(self.dimension)
            p["output_proj"] = jax.random.uniform(
                k2, (self.out_dim, self.dimension), dtype, -bound, bound
            )
        return p

    def _project_in(self, params: Params, x: jax.Array) -> jax.Array:
        # x: [B, C, T] -> [B, T, D]
        x = jnp.swapaxes(x, 1, 2)
        if self.has_input_proj:
            x = x @ params["input_proj"].T
        return x

    def _project_out(self, params: Params, q: jax.Array) -> jax.Array:
        if self.has_output_proj:
            q = q @ params["output_proj"].T
        return jnp.swapaxes(q, 1, 2)

    def encode(self, params: Params, x: jax.Array, n_q: Optional[int] = None) -> jax.Array:
        """[B, C, T] -> codes [B, K, T]."""
        n_q = n_q or self.n_q
        h = self._project_in(params, x)
        cb = self.codebook
        layers = jax.tree.map(lambda a: a[:n_q], params["layers"])

        def body(residual, layer):
            codes = cb.quantize(layer, residual)
            quantized = cb.decode(layer, codes)
            return residual - quantized, codes

        _, codes = lax.scan(body, h, layers)  # codes: [K, B, T]
        return jnp.transpose(codes, (1, 0, 2))

    def decode(self, params: Params, codes: jax.Array) -> jax.Array:
        """codes [B, K, T] -> [B, C, T]."""
        K = codes.shape[1]
        cb = self.codebook
        layers = jax.tree.map(lambda a: a[:K], params["layers"])

        def body(acc, inp):
            layer, layer_codes = inp
            return acc + cb.decode(layer, layer_codes), None

        B, _, T = codes.shape
        init = jnp.zeros((B, T, self.dimension), self.embedding_dtype(params))
        q, _ = lax.scan(body, init, (layers, jnp.transpose(codes, (1, 0, 2))))
        return self._project_out(params, q)

    def embedding_dtype(self, params: Params):
        return params["layers"]["embedding_sum"].dtype

    @property
    def total_codebooks(self) -> int:
        return self.n_q

    @property
    def cardinality(self) -> int:
        return self.bins


@dataclasses.dataclass(frozen=True)
class SplitResidualVectorQuantizer:
    """1 semantic + (n_q - 1) acoustic RVQ over the same input
    (``moshi/quantization/vq.py:166-318``)."""

    dimension: int = 256
    input_dimension: Optional[int] = None
    output_dimension: Optional[int] = None
    n_q: int = 8
    n_q_semantic: int = 1
    bins: int = 2048
    decay: float = 0.99

    def __post_init__(self):
        assert self.n_q > self.n_q_semantic

    @property
    def rvq_first(self) -> ResidualVectorQuantizer:
        return ResidualVectorQuantizer(
            dimension=self.dimension, input_dimension=self.input_dimension,
            output_dimension=self.output_dimension, n_q=self.n_q_semantic,
            bins=self.bins, decay=self.decay, force_projection=True,
        )

    @property
    def rvq_rest(self) -> ResidualVectorQuantizer:
        return ResidualVectorQuantizer(
            dimension=self.dimension, input_dimension=self.input_dimension,
            output_dimension=self.output_dimension, n_q=self.n_q - self.n_q_semantic,
            bins=self.bins, decay=self.decay, force_projection=True, codebook_offset=1,
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        k1, k2 = jax.random.split(key)
        return {
            "rvq_first": self.rvq_first.init(k1, dtype),
            "rvq_rest": self.rvq_rest.init(k2, dtype),
        }

    def encode(self, params: Params, x: jax.Array, n_q: Optional[int] = None) -> jax.Array:
        n_q = n_q or self.n_q
        codes = self.rvq_first.encode(params["rvq_first"], x)
        if n_q > self.n_q_semantic:
            acoustic = self.rvq_rest.encode(
                params["rvq_rest"], x, n_q - self.n_q_semantic
            )
            codes = jnp.concatenate([codes, acoustic], axis=1)
        return codes

    def decode(self, params: Params, codes: jax.Array) -> jax.Array:
        quantized = self.rvq_first.decode(
            params["rvq_first"], codes[:, : self.n_q_semantic]
        )
        if codes.shape[1] > self.n_q_semantic:
            quantized = quantized + self.rvq_rest.decode(
                params["rvq_rest"], codes[:, self.n_q_semantic :]
            )
        return quantized

    @property
    def total_codebooks(self) -> int:
        return self.n_q

    @property
    def cardinality(self) -> int:
        return self.bins
