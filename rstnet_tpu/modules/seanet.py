"""SEANet causal convolutional encoder/decoder for the streaming codec.

Capability parity with ``MLLM_v2/modules/seanet.py`` (SEANetEncoder:97,
SEANetDecoder:244, SEANetResnetBlock:21): ELU conv stacks with residual
blocks, stride-ratio down/upsampling (Mimi: ratios [8,6,5,4], 24kHz -> 75Hz),
norm-disable-outer-blocks, and optional final activation. Built on the
fixed-shape streaming conv substrate, so the whole network streams in
80 ms chunks with one jit-compiled step.

Parameters are a flat list aligned with a static layout plan (one entry per
parameterized sublayer); activations are interleaved by the plan.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Optional

import jax
import jax.numpy as jnp

from rstnet_tpu.core import Params, State
from rstnet_tpu.ops.conv import StreamingConv1d, StreamingConvTranspose1d

_ACT = {
    "ELU": lambda x: jax.nn.elu(x, 1.0),
    "elu": lambda x: jax.nn.elu(x, 1.0),
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "Tanh": jnp.tanh,
    "tanh": jnp.tanh,
    "snake": lambda x: x + jnp.sin(x) ** 2,
}


@dataclasses.dataclass(frozen=True)
class SEANetResnetBlock:
    """act -> conv(k, dilation) -> act -> conv(1) with identity skip."""

    dim: int
    kernel_sizes: tuple[int, ...] = (3, 1)
    dilations: tuple[int, ...] = (1, 1)
    activation: str = "ELU"
    norm: str = "none"
    causal: bool = False
    pad_mode: str = "constant"
    compress: int = 2
    true_skip: bool = True

    @cached_property
    def convs(self) -> tuple[StreamingConv1d, ...]:
        hidden = self.dim // self.compress
        out = []
        n = len(self.kernel_sizes)
        for i, (k, d) in enumerate(zip(self.kernel_sizes, self.dilations)):
            in_chs = self.dim if i == 0 else hidden
            out_chs = self.dim if i == n - 1 else hidden
            out.append(
                StreamingConv1d(
                    in_chs, out_chs, k, dilation=d, norm=self.norm,
                    causal=self.causal, pad_mode=self.pad_mode,
                )
            )
        return tuple(out)

    @cached_property
    def shortcut(self) -> Optional[StreamingConv1d]:
        if self.true_skip:
            return None
        return StreamingConv1d(
            self.dim, self.dim, 1, norm=self.norm, causal=self.causal,
            pad_mode=self.pad_mode,
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, len(self.convs) + 1)
        p = {"block": [c.init(k, dtype) for c, k in zip(self.convs, keys)]}
        if self.shortcut is not None:
            p["shortcut"] = self.shortcut.init(keys[-1], dtype)
        return p

    def _branch(self, params, x, states=None):
        act = _ACT[self.activation]
        new_states = []
        for i, conv in enumerate(self.convs):
            x = act(x)
            if states is None:
                x = conv(params["block"][i], x)
            else:
                x, s = conv.step(params["block"][i], states["block"][i], x)
                new_states.append(s)
        return x, ({"block": new_states} if states is not None else None)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        u = x if self.shortcut is None else self.shortcut(params["shortcut"], x)
        v, _ = self._branch(params, x)
        return u + v

    def init_state(self, batch_size: int, dtype=jnp.float32) -> State:
        s = {"block": [c.init_state(batch_size, dtype) for c in self.convs]}
        if self.shortcut is not None:
            s["shortcut"] = self.shortcut.init_state(batch_size, dtype)
        return s

    def step(self, params: Params, state: State, x: jax.Array):
        if self.shortcut is None:
            u, short_state = x, None
        else:
            u, short_state = self.shortcut.step(params["shortcut"], state["shortcut"], x)
        v, new_state = self._branch(params, x, state)
        if short_state is not None:
            new_state["shortcut"] = short_state
        return u + v, new_state


@dataclasses.dataclass(frozen=True)
class SEANetEncoder:
    """[B, channels, T] audio -> [B, dimension, T/hop] latents."""

    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 3
    ratios: tuple[int, ...] = (8, 5, 4, 2)  # decoder order; reversed here
    activation: str = "ELU"
    norm: str = "none"
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = "constant"
    true_skip: bool = True
    compress: int = 2
    disable_norm_outer_blocks: int = 0

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.ratios:
            out *= r
        return out

    @property
    def n_blocks(self) -> int:
        return len(self.ratios) + 2

    @cached_property
    def layout(self) -> tuple[tuple, ...]:
        """Static plan: ("conv", m) | ("resnet", m) | ("act",)."""
        dno = self.disable_norm_outer_blocks
        plan: list[tuple] = []
        mult = 1
        plan.append((
            "conv",
            StreamingConv1d(
                self.channels, mult * self.n_filters, self.kernel_size,
                norm="none" if dno >= 1 else self.norm,
                causal=self.causal, pad_mode=self.pad_mode,
            ),
        ))
        for i, ratio in enumerate(reversed(self.ratios)):
            block_norm = "none" if dno >= i + 2 else self.norm
            for j in range(self.n_residual_layers):
                plan.append((
                    "resnet",
                    SEANetResnetBlock(
                        mult * self.n_filters,
                        kernel_sizes=(self.residual_kernel_size, 1),
                        dilations=(self.dilation_base**j, 1),
                        activation=self.activation, norm=block_norm,
                        causal=self.causal, pad_mode=self.pad_mode,
                        compress=self.compress, true_skip=self.true_skip,
                    ),
                ))
            plan.append(("act",))
            plan.append((
                "conv",
                StreamingConv1d(
                    mult * self.n_filters, mult * self.n_filters * 2,
                    kernel_size=ratio * 2, stride=ratio, norm=block_norm,
                    causal=self.causal, pad_mode=self.pad_mode,
                ),
            ))
            mult *= 2
        plan.append(("act",))
        plan.append((
            "conv",
            StreamingConv1d(
                mult * self.n_filters, self.dimension, self.last_kernel_size,
                norm="none" if dno == self.n_blocks else self.norm,
                causal=self.causal, pad_mode=self.pad_mode,
            ),
        ))
        return tuple(plan)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        mods = [e for e in self.layout if e[0] != "act"]
        keys = jax.random.split(key, len(mods))
        return {"layers": [m.init(k, dtype) for (_, m), k in zip(mods, keys)]}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        act = _ACT[self.activation]
        i = 0
        for entry in self.layout:
            if entry[0] == "act":
                x = act(x)
            else:
                x = entry[1](params["layers"][i], x)
                i += 1
        return x

    def init_state(self, batch_size: int, dtype=jnp.float32) -> State:
        return {
            "layers": [
                e[1].init_state(batch_size, dtype) for e in self.layout if e[0] != "act"
            ]
        }

    def step(self, params: Params, state: State, x: jax.Array):
        act = _ACT[self.activation]
        i = 0
        new_states = []
        for entry in self.layout:
            if entry[0] == "act":
                x = act(x)
            else:
                x, s = entry[1].step(params["layers"][i], state["layers"][i], x)
                new_states.append(s)
                i += 1
        return x, {"layers": new_states}


@dataclasses.dataclass(frozen=True)
class SEANetDecoder:
    """[B, dimension, T] latents -> [B, channels, T*hop] audio."""

    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 3
    ratios: tuple[int, ...] = (8, 5, 4, 2)
    activation: str = "ELU"
    final_activation: Optional[str] = None
    norm: str = "none"
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = "constant"
    true_skip: bool = True
    compress: int = 2
    disable_norm_outer_blocks: int = 0
    trim_right_ratio: float = 1.0

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.ratios:
            out *= r
        return out

    @property
    def n_blocks(self) -> int:
        return len(self.ratios) + 2

    @cached_property
    def layout(self) -> tuple[tuple, ...]:
        dno = self.disable_norm_outer_blocks
        plan: list[tuple] = []
        mult = int(2 ** len(self.ratios))
        plan.append((
            "conv",
            StreamingConv1d(
                self.dimension, mult * self.n_filters, self.kernel_size,
                norm="none" if dno == self.n_blocks else self.norm,
                causal=self.causal, pad_mode=self.pad_mode,
            ),
        ))
        for i, ratio in enumerate(self.ratios):
            block_norm = "none" if dno >= self.n_blocks - (i + 1) else self.norm
            plan.append(("act",))
            plan.append((
                "convtr",
                StreamingConvTranspose1d(
                    mult * self.n_filters, mult * self.n_filters // 2,
                    kernel_size=ratio * 2, stride=ratio, norm=block_norm,
                    causal=self.causal, trim_right_ratio=self.trim_right_ratio,
                ),
            ))
            for j in range(self.n_residual_layers):
                plan.append((
                    "resnet",
                    SEANetResnetBlock(
                        mult * self.n_filters // 2,
                        kernel_sizes=(self.residual_kernel_size, 1),
                        dilations=(self.dilation_base**j, 1),
                        activation=self.activation, norm=block_norm,
                        causal=self.causal, pad_mode=self.pad_mode,
                        compress=self.compress, true_skip=self.true_skip,
                    ),
                ))
            mult //= 2
        plan.append(("act",))
        plan.append((
            "conv",
            StreamingConv1d(
                self.n_filters, self.channels, self.last_kernel_size,
                norm="none" if dno >= 1 else self.norm,
                causal=self.causal, pad_mode=self.pad_mode,
            ),
        ))
        return tuple(plan)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        mods = [e for e in self.layout if e[0] != "act"]
        keys = jax.random.split(key, len(mods))
        return {"layers": [m.init(k, dtype) for (_, m), k in zip(mods, keys)]}

    def _final_act(self, x):
        if self.final_activation is not None:
            return _ACT[self.final_activation](x)
        return x

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        act = _ACT[self.activation]
        i = 0
        for entry in self.layout:
            if entry[0] == "act":
                x = act(x)
            else:
                x = entry[1](params["layers"][i], x)
                i += 1
        return self._final_act(x)

    def init_state(self, batch_size: int, dtype=jnp.float32) -> State:
        return {
            "layers": [
                e[1].init_state(batch_size, dtype) for e in self.layout if e[0] != "act"
            ]
        }

    def step(self, params: Params, state: State, x: jax.Array):
        act = _ACT[self.activation]
        i = 0
        new_states = []
        for entry in self.layout:
            if entry[0] == "act":
                x = act(x)
            else:
                x, s = entry[1].step(params["layers"][i], state["layers"][i], x)
                new_states.append(s)
                i += 1
        return self._final_act(x), {"layers": new_states}
