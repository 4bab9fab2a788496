"""Quantizer base interface: QuantizedResult + the no-op DummyQuantizer.

Capability parity with ``AudioCodec/MimiCodec/quantization/base.py:23-131``
(and the identical ``MLLM_v2/moshi/quantization/base.py``): a result record
carrying (quantized latent, codes, bandwidth, penalty, metrics) and a
pass-through quantizer used to train/debug codecs without quantization —
codes are the raw latents with a singleton codebook axis.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class QuantizedResult:
    x: jax.Array  # quantized latent [B, C, T]
    codes: jax.Array  # [B, K, T]
    bandwidth: jax.Array  # kbits/s, batch-averaged
    penalty: Optional[jax.Array] = None
    metrics: dict = dataclasses.field(default_factory=dict)


@dataclasses.dataclass(frozen=True)
class DummyQuantizer:
    """Fake RVQ: identity transform, "codes" are the float latents with a
    codebook axis of 1 (reference ``base.py:100-131``)."""

    dimension: int = 128
    frame_rate: float = 12.5

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        del key, dtype
        return {}

    def forward(self, params: dict, x: jax.Array) -> QuantizedResult:
        q = x[:, None]  # [B, 1, C, T] "codes"
        bw = jnp.asarray(
            q.shape[2] * 32 * self.frame_rate / 1000.0, jnp.float32
        )  # f32 latents at frame_rate
        return QuantizedResult(x, q, bw, penalty=jnp.zeros((), x.dtype))

    def __call__(self, params: dict, x: jax.Array) -> QuantizedResult:
        return self.forward(params, x)

    def encode(self, params: dict, x: jax.Array) -> jax.Array:
        return x[:, None]

    def decode(self, params: dict, codes: jax.Array) -> jax.Array:
        return codes[:, 0]

    @property
    def total_codebooks(self) -> int:
        return 1

    @property
    def num_codebooks(self) -> int:
        return 1

    @property
    def cardinality(self) -> int:
        return 1
