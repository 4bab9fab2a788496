"""Learned frame-rate resamplers (Mimi: 75 Hz encoder rate <-> 12.5 Hz tokens).

Parity with ``MLLM_v2/modules/resample.py`` (ConvDownsample1d:14,
ConvTrUpsample1d:68): stride-S conv/transposed-conv with kernel 2S, causal,
bias-free; optionally channel-wise (grouped). Mimi uses learnt=True, with the
upsampler channel-wise (the reference's ``upsample_channel_wise_bug``).
Non-learnt mode uses fixed averaging weights and, for the upsampler, output
renormalization — supported offline only.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import jax
import jax.numpy as jnp

from rstnet_tpu.core import Params, State
from rstnet_tpu.ops.conv import StreamingConv1d, StreamingConvTranspose1d


@dataclasses.dataclass(frozen=True)
class ConvDownsample1d:
    stride: int
    dimension: int | None = None
    causal: bool = False
    learnt: bool = False
    channel_wise: bool = False

    @cached_property
    def conv(self) -> StreamingConv1d:
        if self.learnt:
            assert self.dimension is not None
            ch = self.dimension
            groups = self.dimension if self.channel_wise else 1
        else:
            ch, groups = 1, 1
        return StreamingConv1d(
            ch, ch, kernel_size=2 * self.stride, stride=self.stride,
            causal=self.causal, groups=groups, bias=False, pad_mode="replicate",
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        if self.learnt:
            return self.conv.init(key, dtype)
        w = jnp.full((1, 1, 2 * self.stride), 1.0 / (2 * self.stride), dtype)
        return {"weight": w}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.learnt:
            return self.conv(params, x)
        B, C, T = x.shape
        y = self.conv(params, x.reshape(B * C, 1, T))
        return y.reshape(B, C, -1)

    def init_state(self, batch_size: int, dtype=jnp.float32) -> State:
        assert self.learnt, "streaming resample implemented for learnt convs"
        return self.conv.init_state(batch_size, dtype)

    def step(self, params: Params, state: State, x: jax.Array):
        return self.conv.step(params, state, x)


@dataclasses.dataclass(frozen=True)
class ConvTrUpsample1d:
    stride: int
    dimension: int | None = None
    causal: bool = False
    learnt: bool = False
    channel_wise: bool = False

    @cached_property
    def convtr(self) -> StreamingConvTranspose1d:
        if self.learnt:
            assert self.dimension is not None
            ch = self.dimension
            groups = self.dimension if self.channel_wise else 1
        else:
            ch, groups = 1, 1
        return StreamingConvTranspose1d(
            ch, ch, kernel_size=2 * self.stride, stride=self.stride,
            causal=self.causal, groups=groups, bias=False,
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        if self.learnt:
            return self.convtr.init(key, dtype)
        return {"weight": jnp.ones((1, 1, 2 * self.stride), dtype)}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.learnt:
            return self.convtr(params, x)
        B, C, T = x.shape
        xf = x.reshape(B * C, 1, T)
        y = self.convtr(params, xf)
        ones = jnp.ones_like(xf[:1])
        norm = self.convtr(params, ones)
        return (y / norm).reshape(B, C, -1)

    def init_state(self, batch_size: int, dtype=jnp.float32) -> State:
        assert self.learnt, "streaming resample implemented for learnt convs"
        return self.convtr.init_state(batch_size, dtype)

    def step(self, params: Params, state: State, x: jax.Array):
        return self.convtr.step(params, state, x)
