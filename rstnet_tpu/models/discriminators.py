"""GAN discriminators for codec training.

Capability parity with ``AudioCodec/MimiCodec/modules/discriminators/``:

* MultiFrequencyDiscriminator (``frequency_discriminator.py:8-127``) — the
  default ``d_list`` entry: per-hop-length normalized STFTs in the ``double``
  (mag + log-mag) mel-scaled domain, each fed to a 7-stage 3x3 conv2d stack.
* MultiPeriodDiscriminator (``period_discriminator.py:13``) — HiFiGAN-style
  reshape-to-period conv2d stacks.
* MultiScaleDiscriminator (``scale_discriminator.py:12``) — grouped conv1d
  stacks over average-pooled scales.
* MultiResolutionDiscriminator (``mrd.py:8``) — raw-STFT 2D conv stacks.

All return (real_outputs, fake_outputs, real_fmaps, fake_fmaps) like the
reference. Weight-norm parametrization is folded into plain weights (same
function class; sharding-friendlier).
"""

from __future__ import annotations

import dataclasses
import math
from functools import cached_property

import jax
import jax.numpy as jnp
from jax import lax

from rstnet_tpu.core import Params
from rstnet_tpu.ops.stft import magnitude, spectral_transform


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def conv2d(x, w, b=None, stride=(1, 1), padding=((0, 0), (0, 0)), groups=1):
    y = lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=groups,
    )
    if b is not None:
        y = y + b[None, :, None, None]
    return y


def conv1d(x, w, b=None, stride=1, padding=0, groups=1):
    y = lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((padding, padding),),
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=groups,
    )
    if b is not None:
        y = y + b[None, :, None]
    return y


def _conv_init(key, shape, dtype=jnp.float32):
    fan_in = math.prod(shape[1:])
    bound = 1.0 / math.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    return {
        "weight": jax.random.uniform(wkey, shape, dtype, -bound, bound),
        "bias": jax.random.uniform(bkey, (shape[0],), dtype, -bound, bound),
    }


# -- frequency discriminator ----------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FrequenceDiscriminator:
    """7-stage 3x3 conv2d stack with reflection padding
    (``frequency_discriminator.py:66-127``)."""

    in_channels: int
    hidden: int = 512

    @property
    def channels(self) -> tuple[tuple[int, int, int], ...]:
        h = self.hidden
        # (in, out, stride)
        return (
            (self.in_channels, h // 32, 1),
            (h // 32, h // 16, 2),
            (h // 16, h // 8, 1),
            (h // 8, h // 4, 2),
            (h // 4, h // 2, 1),
            (h // 2, h, 2),
            (h, 1, 1),
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, len(self.channels))
        return {
            "convs": [
                _conv_init(k, (o, i, 3, 3), dtype)
                for k, (i, o, _) in zip(keys, self.channels)
            ]
        }

    def __call__(self, params: Params, x: jax.Array) -> tuple[jax.Array, list]:
        fmaps = []
        for idx, (p, (_, _, s)) in enumerate(zip(params["convs"], self.channels)):
            if idx > 0:
                x = leaky_relu(x, 0.2)
            x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
            x = conv2d(x, p["weight"], p["bias"], stride=(s, s))
            fmaps.append(x)
        return x, fmaps[:-1]


@dataclasses.dataclass(frozen=True)
class MultiFrequencyDiscriminator:
    hop_lengths: tuple[int, ...] = (32, 64, 128, 256, 512, 1024)
    hidden_channels: tuple[int, ...] = (64, 128, 256, 512, 512, 512)
    domain: str = "double"
    mel_scale: bool = True
    sample_rate: int = 24000

    @cached_property
    def discriminators(self) -> tuple[FrequenceDiscriminator, ...]:
        in_ch = 2 if self.domain == "double" else 1
        return tuple(FrequenceDiscriminator(in_ch, c) for c in self.hidden_channels)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, len(self.discriminators))
        return {"discs": [d.init(k, dtype) for d, k in zip(self.discriminators, keys)]}

    def _spec(self, x: jax.Array, hop: int) -> jax.Array:
        spec = spectral_transform(
            x.reshape(-1, x.shape[-1]), fft_size=hop * 4, hop_size=hop,
            win_size=hop * 4, normalized=True, domain=self.domain,
            mel_scale=self.mel_scale, sample_rate=self.sample_rate,
        )
        if self.domain != "double":
            spec = spec[:, None]
        return spec

    def __call__(self, params: Params, y: jax.Array, y_hat: jax.Array):
        real_out, fake_out, real_fm, fake_fm = [], [], [], []
        for p, disc, hop in zip(params["discs"], self.discriminators, self.hop_lengths):
            ro, rf = disc(p, self._spec(y, hop))
            fo, ff = disc(p, self._spec(y_hat, hop))
            real_out.append(ro)
            fake_out.append(fo)
            real_fm.append(rf)
            fake_fm.append(ff)
        return real_out, fake_out, real_fm, fake_fm


# -- period discriminator ---------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PeriodDiscriminator:
    period: int
    kernel_size: int = 5
    stride: int = 3

    @property
    def channels(self) -> tuple[tuple[int, int, int], ...]:
        k = self.kernel_size
        return ((1, 32, self.stride), (32, 128, self.stride), (128, 512, self.stride),
                (512, 1024, self.stride), (1024, 1024, 1))

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, len(self.channels) + 1)
        convs = [
            _conv_init(kk, (o, i, self.kernel_size, 1), dtype)
            for kk, (i, o, _) in zip(keys, self.channels)
        ]
        return {"convs": convs, "final": _conv_init(keys[-1], (1, 1024, 3, 1), dtype)}

    def __call__(self, params: Params, x: jax.Array):
        B, C, T = x.shape
        pad = (-T) % self.period
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)), mode="reflect" if T > pad else "constant")
        x = x.reshape(B, C, -1, self.period)
        fmaps = []
        kpad = (self.kernel_size - 1) // 2
        for p, (_, _, s) in zip(params["convs"], self.channels):
            x = conv2d(x, p["weight"], p["bias"], stride=(s, 1), padding=((kpad, kpad), (0, 0)))
            x = leaky_relu(x, 0.1)
            fmaps.append(x)
        x = conv2d(x, params["final"]["weight"], params["final"]["bias"], padding=((1, 1), (0, 0)))
        fmaps.append(x)
        return x, fmaps[:-1]


@dataclasses.dataclass(frozen=True)
class MultiPeriodDiscriminator:
    period_sizes: tuple[int, ...] = (2, 3, 5, 7, 11)
    period_kernel_size: int = 5

    @cached_property
    def discriminators(self):
        return tuple(
            PeriodDiscriminator(p, self.period_kernel_size) for p in self.period_sizes
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, len(self.discriminators))
        return {"discs": [d.init(k, dtype) for d, k in zip(self.discriminators, keys)]}

    def __call__(self, params: Params, y: jax.Array, y_hat: jax.Array):
        real_out, fake_out, real_fm, fake_fm = [], [], [], []
        for p, disc in zip(params["discs"], self.discriminators):
            ro, rf = disc(p, y)
            fo, ff = disc(p, y_hat)
            real_out.append(ro)
            fake_out.append(fo)
            real_fm.append(rf)
            fake_fm.append(ff)
        return real_out, fake_out, real_fm, fake_fm


# -- scale discriminator -------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ScaleDiscriminator:
    @property
    def layout(self):
        # (in, out, kernel, stride, groups, padding)
        return (
            (1, 128, 15, 1, 1, 7),
            (128, 128, 41, 2, 4, 20),
            (128, 256, 41, 2, 16, 20),
            (256, 512, 41, 4, 16, 20),
            (512, 1024, 41, 4, 16, 20),
            (1024, 1024, 5, 1, 1, 2),
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, len(self.layout) + 1)
        convs = [
            _conv_init(k, (o, i // g, ks), dtype)
            for k, (i, o, ks, s, g, pd) in zip(keys, self.layout)
        ]
        return {"convs": convs, "final": _conv_init(keys[-1], (1, 1024, 3), dtype)}

    def __call__(self, params: Params, x: jax.Array):
        fmaps = []
        for p, (i, o, ks, s, g, pd) in zip(params["convs"], self.layout):
            x = conv1d(x, p["weight"], p["bias"], stride=s, padding=pd, groups=g)
            x = leaky_relu(x, 0.1)
            fmaps.append(x)
        x = conv1d(x, params["final"]["weight"], params["final"]["bias"], padding=1)
        fmaps.append(x)
        return x, fmaps[:-1]


@dataclasses.dataclass(frozen=True)
class MultiScaleDiscriminator:
    num_scales: int = 3
    pool_kernel_size: int = 4
    pool_stride: int = 2

    @cached_property
    def discriminators(self):
        return tuple(ScaleDiscriminator() for _ in range(self.num_scales))

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, self.num_scales)
        return {"discs": [d.init(k, dtype) for d, k in zip(self.discriminators, keys)]}

    def _pool(self, x: jax.Array) -> jax.Array:
        pad = int(self.pool_stride / 2 + 0.5)
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
        return lax.reduce_window(
            x, 0.0, lax.add,
            (1, 1, self.pool_kernel_size), (1, 1, self.pool_stride), "valid",
        ) / self.pool_kernel_size

    def __call__(self, params: Params, y: jax.Array, y_hat: jax.Array):
        real_out, fake_out, real_fm, fake_fm = [], [], [], []
        for i, (p, disc) in enumerate(zip(params["discs"], self.discriminators)):
            if i > 0:
                y = self._pool(y)
                y_hat = self._pool(y_hat)
            ro, rf = disc(p, y)
            fo, ff = disc(p, y_hat)
            real_out.append(ro)
            fake_out.append(fo)
            real_fm.append(rf)
            fake_fm.append(ff)
        return real_out, fake_out, real_fm, fake_fm


# -- resolution discriminator (UnivNet-style MRD) --------------------------------------


@dataclasses.dataclass(frozen=True)
class ResolutionDiscriminator:
    fft_size: int
    hop_size: int
    win_size: int

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, 6)
        shapes = [
            (32, 1, 3, 9), (32, 32, 3, 9), (32, 32, 3, 9), (32, 32, 3, 9), (32, 32, 3, 3),
        ]
        convs = [_conv_init(k, s, dtype) for k, s in zip(keys, shapes)]
        return {"convs": convs, "final": _conv_init(keys[-1], (1, 32, 3, 3), dtype)}

    def __call__(self, params: Params, x: jax.Array):
        spec = magnitude(
            x.reshape(-1, x.shape[-1]), self.fft_size, self.hop_size, self.win_size
        )[:, None]  # [B, 1, F, T]
        fmaps = []
        strides = [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1)]
        for p, s in zip(params["convs"], strides):
            kh, kw = p["weight"].shape[2], p["weight"].shape[3]
            spec = conv2d(
                spec, p["weight"], p["bias"], stride=s,
                padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
            )
            spec = leaky_relu(spec, 0.2)
            fmaps.append(spec)
        spec = conv2d(spec, params["final"]["weight"], params["final"]["bias"],
                      padding=((1, 1), (1, 1)))
        fmaps.append(spec)
        return spec, fmaps[:-1]


@dataclasses.dataclass(frozen=True)
class MultiResolutionDiscriminator:
    resolutions: tuple[tuple[int, int, int], ...] = (
        (1024, 120, 600), (2048, 240, 1200), (512, 50, 240),
    )

    @cached_property
    def discriminators(self):
        return tuple(ResolutionDiscriminator(*r) for r in self.resolutions)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, len(self.discriminators))
        return {"discs": [d.init(k, dtype) for d, k in zip(self.discriminators, keys)]}

    def __call__(self, params: Params, y: jax.Array, y_hat: jax.Array):
        real_out, fake_out, real_fm, fake_fm = [], [], [], []
        for p, disc in zip(params["discs"], self.discriminators):
            ro, rf = disc(p, y)
            fo, ff = disc(p, y_hat)
            real_out.append(ro)
            fake_out.append(fo)
            real_fm.append(rf)
            fake_fm.append(ff)
        return real_out, fake_out, real_fm, fake_fm


# -- collaborative multi-band + sub-band discriminators (Avocodo-style) ----------


@dataclasses.dataclass(frozen=True)
class CoMBDBlock:
    """One collaborative multi-band conv1d stack (``combd_sbd.py:16-44``)."""

    filters: tuple[int, ...] = (16, 64, 256, 1024, 1024, 1024)
    kernels: tuple[int, ...] = (7, 11, 11, 11, 11, 5)
    groups: tuple[int, ...] = (1, 4, 16, 64, 256, 1)
    strides: tuple[int, ...] = (1, 1, 4, 4, 4, 1)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, len(self.filters) + 1)
        convs = []
        in_ch = 1
        for k, (f, ks, g, s) in zip(keys, zip(self.filters, self.kernels, self.groups, self.strides)):
            convs.append(_conv_init(k, (f, in_ch // g, ks), dtype))
            in_ch = f
        return {"convs": convs, "post": _conv_init(keys[-1], (1, self.filters[-1], 3), dtype)}

    def __call__(self, params: Params, x: jax.Array):
        fmaps = []
        for p, (f, ks, g, s) in zip(
            params["convs"], zip(self.filters, self.kernels, self.groups, self.strides)
        ):
            x = conv1d(x, p["weight"], p["bias"], stride=s, padding=(ks - 1) // 2, groups=g)
            x = leaky_relu(x, 0.1)
            fmaps.append(x)
        x = conv1d(x, params["post"]["weight"], params["post"]["bias"], padding=1)
        fmaps.append(x)
        return x, fmaps[:-1]


@dataclasses.dataclass(frozen=True)
class MultiCoMBDiscriminator:
    """Collaborative multi-band discriminator over full-band + PQMF bands
    (``combd_sbd.py:107-195``): three CoMBD stacks on the raw signal and its
    first 2-band / 4-band PQMF projections."""

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, 3)
        return {"discs": [CoMBDBlock().init(k, dtype) for k in keys]}

    def __call__(self, params: Params, y: jax.Array, y_hat: jax.Array):
        from rstnet_tpu.ops.pqmf import pqmf_analysis

        views = [
            (y, y_hat),
            (pqmf_analysis(y, 2, 62)[:, :1], pqmf_analysis(y_hat, 2, 62)[:, :1]),
            (pqmf_analysis(y, 4, 62)[:, :1], pqmf_analysis(y_hat, 4, 62)[:, :1]),
        ]
        block = CoMBDBlock()
        real_out, fake_out, real_fm, fake_fm = [], [], [], []
        for p, (yr, yf) in zip(params["discs"], views):
            ro, rf = block(p, yr)
            fo, ff = block(p, yf)
            real_out.append(ro)
            fake_out.append(fo)
            real_fm.append(rf)
            fake_fm.append(ff)
        return real_out, fake_out, real_fm, fake_fm


@dataclasses.dataclass(frozen=True)
class SubBandDiscriminator:
    """Multi-dilated conv stacks over PQMF sub-bands (``combd_sbd.py:79-105``),
    simplified to a fixed MDC ladder over the 4-band decomposition."""

    channels: tuple[int, ...] = (64, 128, 256)
    kernel: int = 5
    strides: tuple[int, ...] = (1, 2, 2)
    dilations: tuple[int, ...] = (1, 2, 4)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, len(self.channels) * 2 + 1)
        mdcs = []
        in_ch = 4
        ki = 0
        for c, s in zip(self.channels, self.strides):
            branch = [_conv_init(keys[ki], (c, in_ch, self.kernel), dtype)]
            ki += 1
            out = _conv_init(keys[ki], (c, c, 3), dtype)
            ki += 1
            mdcs.append({"branch": branch, "out": out, "stride": None})
            in_ch = c
        return {"mdcs": mdcs, "post": _conv_init(keys[-1], (1, self.channels[-1], 3), dtype)}

    def __call__(self, params: Params, x: jax.Array):
        from rstnet_tpu.ops.pqmf import pqmf_analysis

        h = pqmf_analysis(x, 4, 62)
        fmaps = []
        for mdc, c, s, d in zip(
            params["mdcs"], self.channels, self.strides, self.dilations
        ):
            acc = 0.0
            for b in mdc["branch"]:
                pad = (self.kernel - 1) * d // 2
                y = lax.conv_general_dilated(
                    h, b["weight"], window_strides=(1,), padding=((pad, pad),),
                    rhs_dilation=(d,), dimension_numbers=("NCH", "OIH", "NCH"),
                )
                acc = acc + y + b["bias"][None, :, None]
            h = conv1d(leaky_relu(acc, 0.1), mdc["out"]["weight"], mdc["out"]["bias"],
                       stride=s, padding=1)
            h = leaky_relu(h, 0.1)
            fmaps.append(h)
        h = conv1d(h, params["post"]["weight"], params["post"]["bias"], padding=1)
        fmaps.append(h)
        return h, fmaps[:-1]


@dataclasses.dataclass(frozen=True)
class MultiSubBandDiscriminator:
    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return {"discs": [SubBandDiscriminator().init(key, dtype)]}

    def __call__(self, params: Params, y: jax.Array, y_hat: jax.Array):
        disc = SubBandDiscriminator()
        ro, rf = disc(params["discs"][0], y)
        fo, ff = disc(params["discs"][0], y_hat)
        return [ro], [fo], [rf], [ff]


DISCRIMINATORS = {
    "mfd": MultiFrequencyDiscriminator,
    "mpd": MultiPeriodDiscriminator,
    "msd": MultiScaleDiscriminator,
    "mrd": MultiResolutionDiscriminator,
    "combd": MultiCoMBDiscriminator,
    "sbd": MultiSubBandDiscriminator,
}
