"""Streaming 1-D convolutions with explicit fixed-shape state pytrees.

Capability parity with the reference's streaming conv substrate
(``MLLM_v2/modules/streaming.py:205-303`` RawStreamingConv1d /
RawStreamingConvTranspose1d and ``MLLM_v2/modules/conv.py:168-329``
StreamingConv1d / StreamingConvTranspose1d), re-designed TPU-first:

* Offline: causal (or asymmetric) padding + one ``lax.conv_general_dilated``.
* Streaming: the carried state is a **fixed-shape** buffer. For a causal conv
  with effective kernel ``K_eff`` and stride ``S``, the carry is exactly the
  trailing ``K_eff - S`` input samples; a zeros-initialized carry *is* the
  causal left padding (for ``pad_mode='constant'``), so the very first chunk
  needs no special-casing. Chunk lengths must be multiples of the stride —
  always true for codec frames (hop 1920 at 24 kHz = 80 ms), and exactly the
  restriction that makes every step shape-static and jit-once compilable
  (the XLA analogue of the reference's CUDA-graph step).

Layouts follow the PyTorch convention to keep checkpoint conversion trivial:
activations ``[B, C, T]``; conv weight ``[out, in/groups, K]``; transposed
conv weight ``[in, out/groups, K]``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from rstnet_tpu.core import Params, State


def conv1d(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """Valid (unpadded) 1-D convolution, NCH layout, torch weight layout."""
    y = lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride,),
        padding=((0, 0),),
        rhs_dilation=(dilation,),
        feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        y = y + bias[None, :, None]
    return y


def conv_transpose1d(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    stride: int = 1,
    groups: int = 1,
) -> jax.Array:
    """Unpadded 1-D transposed convolution (torch ``ConvTranspose1d`` with
    padding=0): output length ``S*(T-1) + K``.

    Implemented as input dilation + flipped-kernel convolution, which XLA
    lowers onto the MXU directly.
    """
    in_ch, out_per_group, k = weight.shape
    # [in, out/g, K] -> per-group [out/g, in/g, K], flipped along K.
    w = weight.reshape(groups, in_ch // groups, out_per_group, k)
    w = jnp.flip(jnp.transpose(w, (0, 2, 1, 3)), axis=-1)
    w = w.reshape(groups * out_per_group, in_ch // groups, k)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=((k - 1, k - 1),),
        lhs_dilation=(stride,),
        feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        y = y + bias[None, :, None]
    return y


def pad1d(x: jax.Array, paddings: tuple[int, int], mode: str = "constant") -> jax.Array:
    """Pad the last axis, supporting reflect padding on inputs shorter than
    the pad (reference semantics: ``MLLM_v2/modules/conv.py:77-99``)."""
    pad_left, pad_right = paddings
    assert pad_left >= 0 and pad_right >= 0
    if mode == "reflect":
        length = x.shape[-1]
        max_pad = max(pad_left, pad_right)
        extra = 0
        if length <= max_pad:
            extra = max_pad - length + 1
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, extra)])
        padded = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_left, pad_right)], mode="reflect")
        end = padded.shape[-1] - extra
        return padded[..., :end]
    jnp_mode = {"constant": "constant", "replicate": "edge"}[mode]
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_left, pad_right)], mode=jnp_mode)


def unpad1d(x: jax.Array, paddings: tuple[int, int]) -> jax.Array:
    pad_left, pad_right = paddings
    end = x.shape[-1] - pad_right
    return x[..., pad_left:end]


def _torch_conv_init(key, out_ch, in_per_group, k, use_bias, dtype):
    """Match torch Conv1d default init (kaiming uniform, a=sqrt(5))."""
    fan_in = in_per_group * k
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    wkey, bkey = jax.random.split(key)
    # kaiming_uniform(a=sqrt(5)) == uniform(-sqrt(1/fan_in), sqrt(1/fan_in))
    weight = jax.random.uniform(wkey, (out_ch, in_per_group, k), dtype, -bound, bound)
    params = {"weight": weight}
    if use_bias:
        params["bias"] = jax.random.uniform(bkey, (out_ch,), dtype, -bound, bound)
    return params


def _resolve_weight(params: Params) -> jax.Array:
    """Weight, resolving optional weight-norm parametrization (``weight_g`` *
    ``weight_v``/||v||, norm over all dims but 0 — torch ``weight_norm``)."""
    if "weight" in params:
        return params["weight"]
    v = params["weight_v"]
    g = params["weight_g"]
    norm = jnp.sqrt(jnp.sum(jnp.square(v.astype(jnp.float32)), axis=(1, 2), keepdims=True))
    return (g.astype(jnp.float32) * v.astype(jnp.float32) / norm).astype(v.dtype)


@dataclasses.dataclass(frozen=True)
class StreamingConv1d:
    """Causal/same-padded conv with a fixed-shape streaming carry.

    Equivalent capability to reference ``StreamingConv1d``
    (``MLLM_v2/modules/conv.py:168-254``) + ``RawStreamingConv1d``
    (``modules/streaming.py:205-244``), merged into one module.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    causal: bool = False
    norm: str = "none"  # {"none", "weight_norm"}
    pad_mode: str = "constant"  # {"constant", "reflect", "replicate"}

    def __post_init__(self):
        assert self.stride <= self.effective_kernel_size, "stride must be <= kernel"
        assert self.norm in ("none", "weight_norm")
        assert self.pad_mode in ("constant", "reflect", "replicate")

    @property
    def effective_kernel_size(self) -> int:
        return (self.kernel_size - 1) * self.dilation + 1

    @property
    def padding_total(self) -> int:
        return self.effective_kernel_size - self.stride

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        p = _torch_conv_init(
            key, self.out_channels, self.in_channels // self.groups, self.kernel_size,
            self.bias, dtype,
        )
        if self.norm == "weight_norm":
            w = p.pop("weight")
            norm = jnp.sqrt(jnp.sum(jnp.square(w), axis=(1, 2), keepdims=True))
            p["weight_g"] = norm
            p["weight_v"] = w
        return p

    def _extra_padding(self, length: int) -> int:
        """End padding so the last window is full (``conv.py:50-57``)."""
        k, s, pt = self.effective_kernel_size, self.stride, self.padding_total
        n_frames = (length - k + pt) / s + 1
        ideal = (math.ceil(n_frames) - 1) * s + (k - pt)
        return ideal - length

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        """Offline forward, ``[B, C, T] -> [B, C', T']``."""
        weight = _resolve_weight(params)
        extra = self._extra_padding(x.shape[-1])
        pt = self.padding_total
        if self.causal:
            x = pad1d(x, (pt, extra), self.pad_mode)
        else:
            pad_right = pt // 2
            x = pad1d(x, (pt - pad_right, pad_right + extra), self.pad_mode)
        return conv1d(
            x, weight, params.get("bias"),
            stride=self.stride, dilation=self.dilation, groups=self.groups,
        )

    # -- streaming --------------------------------------------------------

    def init_state(self, batch_size: int, dtype=jnp.float32) -> State:
        assert self.causal, "streaming is only supported for causal convs"
        state = {
            "buf": jnp.zeros((batch_size, self.in_channels, self.padding_total), dtype)
        }
        if self.pad_mode != "constant":
            # per-batch-row: in multi-session serving a slot can be reset to
            # a fresh stream (first=True) while its neighbours keep running
            state["first"] = jnp.ones((batch_size,), jnp.bool_)
        return state

    def step(self, params: Params, state: State, x: jax.Array) -> tuple[jax.Array, State]:
        """One streaming chunk. ``x: [B, C, T]`` with ``T % stride == 0``."""
        T = x.shape[-1]
        assert T % self.stride == 0 and T >= self.stride, (
            f"chunk length {T} must be a positive multiple of stride {self.stride}"
        )
        pt = self.padding_total
        buf = state["buf"]
        if self.pad_mode != "constant" and pt > 0:
            # First chunk: the causal left pad reflects/replicates chunk content.
            assert T > pt or self.pad_mode == "replicate", (
                "reflect streaming needs chunk length > padding_total"
            )
            if self.pad_mode == "reflect":
                pad = jnp.flip(x[..., 1 : pt + 1], axis=-1)
            else:
                pad = jnp.repeat(x[..., :1], pt, axis=-1)
            buf = jnp.where(state["first"][:, None, None], pad, buf)
        full = jnp.concatenate([buf, x], axis=-1)
        num_frames = T // self.stride
        in_len = (num_frames - 1) * self.stride + self.effective_kernel_size
        y = conv1d(
            full[..., :in_len], _resolve_weight(params), params.get("bias"),
            stride=self.stride, dilation=self.dilation, groups=self.groups,
        )
        new_state = {"buf": full[..., T:]}
        if self.pad_mode != "constant":
            new_state["first"] = jnp.zeros_like(state["first"])
        return y, new_state


@dataclasses.dataclass(frozen=True)
class StreamingConvTranspose1d:
    """Transposed conv with causal trimming and a fixed-shape partial-output
    carry (reference ``StreamingConvTranspose1d`` ``conv.py:265-329`` +
    ``RawStreamingConvTranspose1d`` ``streaming.py:255-303``)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    bias: bool = True
    causal: bool = False
    norm: str = "none"
    trim_right_ratio: float = 1.0

    def __post_init__(self):
        assert self.stride <= self.kernel_size
        assert self.causal or self.trim_right_ratio == 1.0
        assert self.norm in ("none", "weight_norm")

    @property
    def padding_total(self) -> int:
        return self.kernel_size - self.stride

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        # torch ConvTranspose1d: weight [in, out/groups, K]; fan_in uses
        # out_channels/groups * K (torch's _calculate_fan_in for transposed).
        out_per_group = self.out_channels // self.groups
        fan_in = out_per_group * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in)
        wkey, bkey = jax.random.split(key)
        w = jax.random.uniform(
            wkey, (self.in_channels, out_per_group, self.kernel_size), dtype, -bound, bound
        )
        p = {"weight": w}
        if self.bias:
            p["bias"] = jax.random.uniform(bkey, (self.out_channels,), dtype, -bound, bound)
        if self.norm == "weight_norm":
            w = p.pop("weight")
            norm = jnp.sqrt(jnp.sum(jnp.square(w), axis=(1, 2), keepdims=True))
            p["weight_g"] = norm
            p["weight_v"] = w
        return p

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        weight = _resolve_weight(params)
        y = conv_transpose1d(
            x, weight, params.get("bias"), stride=self.stride, groups=self.groups
        )
        pt = self.padding_total
        if self.causal:
            pad_right = math.ceil(pt * self.trim_right_ratio)
            y = unpad1d(y, (pt - pad_right, pad_right))
        else:
            pad_right = pt // 2
            y = unpad1d(y, (pt - pad_right, pad_right))
        return y

    # -- streaming --------------------------------------------------------

    def init_state(self, batch_size: int, dtype=jnp.float32) -> State:
        assert self.causal
        return {
            "partial": jnp.zeros((batch_size, self.out_channels, self.padding_total), dtype)
        }

    def step(self, params: Params, state: State, x: jax.Array) -> tuple[jax.Array, State]:
        """One streaming chunk: ``[B, C, T] -> [B, C', T*stride]``.

        The carried ``partial`` holds the bias-free tail of the previous
        chunk's transposed conv that still receives contributions from this
        chunk (reference ``streaming.py:281-303``).
        """
        T = x.shape[-1]
        weight = _resolve_weight(params)
        bias = params.get("bias")
        y = conv_transpose1d(x, weight, bias, stride=self.stride, groups=self.groups)
        pt = self.padding_total
        if pt > 0:
            y = y.at[..., :pt].add(state["partial"])
            out = y[..., : self.stride * T]
            partial = y[..., self.stride * T :]
            if bias is not None:
                partial = partial - bias[None, :, None]
            new_state = {"partial": partial}
        else:
            out = y
            new_state = state
        return out, new_state
