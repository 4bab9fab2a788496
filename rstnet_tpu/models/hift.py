"""HiFT vocoder (mel -> 22.05 kHz waveform), TPU-native.

From-scratch JAX implementation of the CosyVoice HiFTGenerator the
reference vendors for GLM-4-Voice detokenization
(``MLLM_v2/tools/tokenizer/GLM4V/cosyvoice/hifigan/generator.py:223-398``,
HiFTNet: neural-source-filter + ISTFTNet):

* ConvRNNF0Predictor (``hifigan/f0_predictor.py``): 5 conv+ELU stages and a
  linear head -> |f0| per mel frame.
* Harmonic NSF source (``generator.py:106-220``): nearest-upsampled f0,
  per-harmonic phase accumulation (cumsum mod 1), uv gating, tanh-linear
  harmonic merge.
* HiFi-GAN-style upsampling stack with Snake resblocks, the source signal
  fused in via its (tiny, n_fft 16 / hop 4) STFT at each resolution, and an
  ISTFT head (exp-magnitude + sin-phase) — STFT/ISTFT ride the matmul-DFT
  in ``ops/stft.py`` (TPUs have no FFT unit; at n_fft 16 these are a few
  kFLOPs per frame that fuse into the surrounding elementwise ops).

Pure functions over a dict param pytree; weight-norm parametrization is
folded to plain weights by the converter (``models/convert.py``). The
source's random phase/noise draws are explicit inputs (a ``key``; pass
``None`` for the deterministic zero-noise variant used in parity tests).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.ops.stft import istft, stft

from rstnet_tpu.models.glm4v_flow import _conv1d, _conv1d_p, _conv_transpose1d, _linear, _apply_linear


@dataclasses.dataclass(frozen=True)
class HiFTConfig:
    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 22050
    nsf_alpha: float = 0.1          # sine amplitude
    nsf_sigma: float = 0.003        # voiced noise std
    nsf_voiced_threshold: float = 10.0
    upsample_rates: tuple = (8, 8)
    upsample_kernel_sizes: tuple = (16, 16)
    istft_n_fft: int = 16
    istft_hop: int = 4
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilations: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    source_resblock_kernel_sizes: tuple = (7, 11)
    source_resblock_dilations: tuple = ((1, 3, 5), (1, 3, 5))
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99
    f0_cond_channels: int = 512

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.upsample_rates)) * self.istft_hop


def _snake(x, alpha):
    """Snake activation, alpha [C] linear-scale (``activation.py:34-85``)."""
    return x + (1.0 / (alpha + 1e-9)) * jnp.sin(x * alpha) ** 2


def _resblock_p(key, channels, kernel, dilations):
    keys = iter(jax.random.split(key, 2 * len(dilations)))
    return {
        "convs1": [_conv1d_p(next(keys), kernel, channels, channels) for _ in dilations],
        "convs2": [_conv1d_p(next(keys), kernel, channels, channels) for _ in dilations],
        "alpha1": [jnp.ones((channels,)) for _ in dilations],
        "alpha2": [jnp.ones((channels,)) for _ in dilations],
    }


def _apply_resblock(p, x, kernel, dilations):
    """kernel/dilations come from the config (static — the param pytree
    must hold only arrays so the generator jits cleanly)."""
    for c1, c2, a1, a2, d in zip(
        p["convs1"], p["convs2"], p["alpha1"], p["alpha2"], dilations
    ):
        k = kernel
        xt = _snake(x, a1)
        xt = _conv1d(c1, xt, padding=[((k - 1) * d // 2,) * 2], rhs_dilation=d)
        xt = _snake(xt, a2)
        xt = _conv1d(c2, xt, padding=[((k - 1) // 2,) * 2])
        x = xt + x
    return x


class HiFTGenerator:
    """Pure-function HiFT vocoder."""

    def __init__(self, config: HiFTConfig = HiFTConfig()):
        self.config = config

    def init(self, key) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 64))
        base = cfg.base_channels
        n_bins = cfg.istft_n_fft + 2
        params = {
            "f0": {
                "convs": [
                    _conv1d_p(
                        next(keys), 3,
                        cfg.in_channels if i == 0 else cfg.f0_cond_channels,
                        cfg.f0_cond_channels,
                    )
                    for i in range(5)
                ],
                "head": _linear(next(keys), cfg.f0_cond_channels, 1),
            },
            "source_linear": _linear(next(keys), cfg.nb_harmonics + 1, 1),
            "conv_pre": _conv1d_p(next(keys), 7, cfg.in_channels, base),
            "ups": [], "source_downs": [], "source_resblocks": [], "resblocks": [],
        }
        down_cum = np.cumprod([1] + list(cfg.upsample_rates[::-1][:-1]))[::-1]
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch = base // (2 ** (i + 1))
            params["ups"].append(_conv1d_p(next(keys), k, base // (2**i), ch))
            d = int(down_cum[i])
            if d == 1:
                params["source_downs"].append(_conv1d_p(next(keys), 1, n_bins, ch))
            else:
                params["source_downs"].append(_conv1d_p(next(keys), d * 2, n_bins, ch))
            params["source_resblocks"].append(
                _resblock_p(
                    next(keys), ch,
                    cfg.source_resblock_kernel_sizes[i],
                    cfg.source_resblock_dilations[i],
                )
            )
            for kk, dd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations):
                params["resblocks"].append(_resblock_p(next(keys), ch, kk, dd))
        params["conv_post"] = _conv1d_p(next(keys), 7, ch, n_bins)
        return params

    # -- NSF source -----------------------------------------------------------

    def predict_f0(self, params, mel: jax.Array) -> jax.Array:
        """mel [B, T, 80] -> f0 [B, T] (ConvRNNF0Predictor)."""
        x = mel
        for conv in params["f0"]["convs"]:
            x = jax.nn.elu(_conv1d(conv, x, padding="SAME"))
        return jnp.abs(_apply_linear(params["f0"]["head"], x))[..., 0]

    def source(self, params, f0: jax.Array, key: Optional[jax.Array]) -> jax.Array:
        """f0 [B, T] per mel frame -> harmonic source [B, T*upsample, 1]
        (``generator.py:106-220``: SineGen + SourceModuleHnNSF). ``key=None``
        zeroes the random harmonic phases and additive noise (deterministic
        variant for parity tests and cache-consistent streaming)."""
        cfg = self.config
        B, T = f0.shape
        up = cfg.total_upsample
        f0 = jnp.repeat(f0, up, axis=-1)  # nearest upsample [B, T*up]
        h = jnp.arange(1, cfg.nb_harmonics + 2, dtype=jnp.float32)
        rad = f0[:, None, :] * h[None, :, None] / cfg.sampling_rate  # [B, H+1, S]
        theta = 2.0 * jnp.pi * (jnp.cumsum(rad, axis=-1) % 1.0)
        if key is not None:
            k1, k2 = jax.random.split(key)
            phase = jax.random.uniform(
                k1, (B, cfg.nb_harmonics + 1, 1), minval=-jnp.pi, maxval=jnp.pi
            ).at[:, 0].set(0.0)
            noise_u = jax.random.normal(k2, theta.shape)
        else:
            phase = jnp.zeros((B, cfg.nb_harmonics + 1, 1))
            noise_u = jnp.zeros(theta.shape)
        sine = cfg.nsf_alpha * jnp.sin(theta + phase)
        uv = (f0 > cfg.nsf_voiced_threshold).astype(jnp.float32)[:, None, :]
        noise_amp = uv * cfg.nsf_sigma + (1.0 - uv) * cfg.nsf_alpha / 3.0
        sine = sine * uv + noise_amp * noise_u
        merged = jnp.tanh(
            _apply_linear(params["source_linear"], jnp.swapaxes(sine, 1, 2))
        )  # [B, S, 1]
        return merged

    # -- generator ------------------------------------------------------------

    def decode(self, params, mel: jax.Array, source: jax.Array) -> jax.Array:
        """mel [B, T, 80] + source [B, T*upsample, 1] -> wav [B, T*upsample]
        (``generator.py:341-380`` with the f0/source stage factored out so
        streaming can cache/override the source tail)."""
        cfg = self.config
        spec = stft(source[..., 0], cfg.istft_n_fft, cfg.istft_hop, cfg.istft_n_fft)
        s_stft = jnp.concatenate(
            [jnp.real(spec), jnp.imag(spec)], axis=1
        ).swapaxes(1, 2)  # [B, frames, n_fft+2]

        x = _conv1d(params["conv_pre"], mel, padding="SAME")
        n_kernels = len(cfg.resblock_kernel_sizes)
        down_cum = np.cumprod([1] + list(cfg.upsample_rates[::-1][:-1]))[::-1]
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            x = jax.nn.leaky_relu(x, cfg.lrelu_slope)
            x = _conv_transpose1d(params["ups"][i], x, stride=u, torch_padding=(k - u) // 2)
            if i == len(cfg.upsample_rates) - 1:
                x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)), mode="reflect")
            d = int(down_cum[i])
            if d == 1:
                si = _conv1d(params["source_downs"][i], s_stft, padding="VALID")
            else:
                si = _conv1d(
                    params["source_downs"][i], s_stft, stride=d,
                    padding=[(d // 2, d // 2)],
                )
            si = _apply_resblock(
                params["source_resblocks"][i], si,
                cfg.source_resblock_kernel_sizes[i],
                cfg.source_resblock_dilations[i],
            )
            x = x + si[:, : x.shape[1]]
            xs = None
            for j in range(n_kernels):
                r = _apply_resblock(
                    params["resblocks"][i * n_kernels + j], x,
                    cfg.resblock_kernel_sizes[j], cfg.resblock_dilations[j],
                )
                xs = r if xs is None else xs + r
            x = xs / n_kernels
        x = jax.nn.leaky_relu(x)  # default torch slope 0.01 (generator.py:373)
        x = _conv1d(params["conv_post"], x, padding="SAME")
        n_half = cfg.istft_n_fft // 2 + 1
        magnitude = jnp.exp(jnp.clip(x[..., :n_half], None, math.log(1e2)))
        phase = jnp.sin(x[..., n_half:])
        spec = magnitude * jnp.cos(phase) + 1j * magnitude * jnp.sin(phase)
        wav = istft(
            spec.swapaxes(1, 2), cfg.istft_n_fft, cfg.istft_hop, cfg.istft_n_fft
        )
        return jnp.clip(wav, -cfg.audio_limit, cfg.audio_limit)

    def inference(
        self,
        params: dict,
        mel: jax.Array,
        key: Optional[jax.Array] = None,
        cache_source: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        """mel [B, T, 80] -> (wav [B, T*upsample], source [B, T*upsample, 1]).

        ``cache_source`` [B, S_cache, 1] overwrites the head of the freshly
        generated source (the reference's streaming anti-glitch cache,
        ``generator.py:345-347``)."""
        f0 = self.predict_f0(params, mel)
        s = self.source(params, f0, key)
        if cache_source is not None and cache_source.shape[1] > 0:
            s = s.at[:, : cache_source.shape[1]].set(cache_source)
        return self.decode(params, mel, s), s
