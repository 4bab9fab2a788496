"""GAN / spectral losses for codec training.

Capability parity with ``AudioCodec/MimiCodec/losses/``:
``basic_loss.py`` (FeatureMatchLoss:6, MSEDLoss:38, HingeDLoss:50,
LeastDLoss/MSEGLoss, SpectralConvergence, LogSTFTMagnitude, STFTLoss:121,
MultiResolutionSTFTLoss:147), ``generator_loss.py`` (BasicGeneratorLoss:13,
GeneratorSTFTLoss:70 — adversarial + feature-match + mel + full/sub-band
multi-scale STFT with PQMF) and ``discriminator_loss.py``
(MSEDiscriminatorLoss:29).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from rstnet_tpu.ops.pqmf import pqmf_analysis
from rstnet_tpu.ops.stft import magnitude, mel_spectrogram


def feature_match_loss(real_fmaps, fake_fmaps) -> jax.Array:
    """Mean L1 over all feature maps (real detached)."""
    loss = 0.0
    n = 0
    for rf, ff in zip(real_fmaps, fake_fmaps):
        if isinstance(rf, (list, tuple)):
            for r, f in zip(rf, ff):
                loss = loss + jnp.mean(jnp.abs(f.astype(jnp.float32) - jax.lax.stop_gradient(r.astype(jnp.float32))))
                n += 1
        else:
            loss = loss + jnp.mean(jnp.abs(ff.astype(jnp.float32) - jax.lax.stop_gradient(rf.astype(jnp.float32))))
            n += 1
    return loss / max(n, 1)


def mse_g_loss(fake_scores) -> jax.Array:
    """Least-squares generator loss: mean over discriminators of (1-D(G))^2."""
    loss = 0.0
    for s in fake_scores:
        loss = loss + jnp.mean(jnp.square(1.0 - s.astype(jnp.float32)))
    return loss


def hinge_g_loss(fake_scores) -> jax.Array:
    loss = 0.0
    for s in fake_scores:
        loss = loss - jnp.mean(s.astype(jnp.float32))
    return loss


def mse_d_loss(real_scores, fake_scores) -> jax.Array:
    """Least-squares discriminator loss summed over heads
    (``discriminator_loss.py:29`` + MSEDLoss)."""
    loss = 0.0
    for r, f in zip(real_scores, fake_scores):
        r = r.astype(jnp.float32)
        f = f.astype(jnp.float32)
        loss = loss + jnp.mean(jnp.square(r - 1.0)) + jnp.mean(jnp.square(f))
    return loss


def hinge_d_loss(real_scores, fake_scores) -> jax.Array:
    loss = 0.0
    for r, f in zip(real_scores, fake_scores):
        loss = loss + jnp.mean(jax.nn.relu(1.0 - r)) + jnp.mean(jax.nn.relu(1.0 + f))
    return loss


def stft_loss(
    x: jax.Array, y: jax.Array, fft_size: int, hop_size: int, win_size: int
) -> tuple[jax.Array, jax.Array]:
    """(spectral convergence, log-STFT magnitude L1) for one resolution."""
    mx = magnitude(x, fft_size, hop_size, win_size)
    my = magnitude(y, fft_size, hop_size, win_size)
    sc = jnp.linalg.norm(my - mx) / jnp.clip(jnp.linalg.norm(my), 1e-8, None)
    mag = jnp.mean(jnp.abs(jnp.log(my) - jnp.log(mx)))
    return sc, mag


def multi_resolution_stft_loss(
    x: jax.Array, y: jax.Array,
    fft_sizes=(512, 1024, 2048), win_sizes=(480, 960, 1200), hop_sizes=(120, 240, 300),
) -> tuple[jax.Array, jax.Array]:
    sc_total, mag_total = 0.0, 0.0
    for f, w, h in zip(fft_sizes, win_sizes, hop_sizes):
        sc, mag = stft_loss(x, y, f, h, w)
        sc_total = sc_total + sc
        mag_total = mag_total + mag
    n = len(fft_sizes)
    return sc_total / n, mag_total / n


@dataclasses.dataclass(frozen=True)
class GeneratorLossConfig:
    """Mirrors the criterion stanza of ``config/mimi24k.yaml``."""

    adv_criterion: str = "mse"  # {"mse", "hinge"}
    use_feature_match: bool = True
    feat_match_loss_weight: float = 20.0
    use_mel_loss: bool = False
    mel_loss_weight: float = 45.0
    mel_kwargs: tuple = ()  # dict items for mel_spectrogram
    use_full_stft_loss: bool = True
    full_stft_loss_weight: float = 1.0
    full_fft_sizes: tuple = (512, 1024, 2048)
    full_win_sizes: tuple = (480, 960, 1200)
    full_hop_sizes: tuple = (120, 240, 300)
    use_sub_stft_loss: bool = True
    sub_stft_loss_weight: float = 1.0
    sub_num_bands: int = 6
    sub_fft_sizes: tuple = (128, 256, 256)
    sub_win_sizes: tuple = (80, 120, 200)
    sub_hop_sizes: tuple = (20, 40, 50)
    #: Encodec-style time-domain L1 (`loss_t`, Defossez et al. 2022 eq. 1;
    #: the reference's enh_loss.py carries the same wav_mae term for its
    #: enhancement mode). Off by default — Mimi trains spectral+adversarial
    #: only — but needed whenever waveform alignment itself is a target
    #: (enhancement, SI-SNR-tracked convergence runs).
    use_wav_loss: bool = False
    wav_loss_weight: float = 0.0


def generator_loss(
    cfg: GeneratorLossConfig,
    targets: jax.Array,  # [B, 1, T]
    outputs: jax.Array,
    output_fake: dict[str, list],
    fmap_real: Optional[dict[str, list]] = None,
    fmap_fake: Optional[dict[str, list]] = None,
    use_adv_loss: bool = True,
) -> tuple[jax.Array, dict]:
    """GeneratorSTFTLoss semantics (``generator_loss.py:13-113``)."""
    adv_fn = mse_g_loss if cfg.adv_criterion == "mse" else hinge_g_loss
    g_loss = 0.0
    items: dict = {}
    if use_adv_loss:
        for name, fake in output_fake.items():
            adv = adv_fn(fake)
            g_loss = g_loss + adv
            items[f"G_adv_{name}"] = adv
            if cfg.use_feature_match:
                fm = feature_match_loss(fmap_real[name], fmap_fake[name])
                g_loss = g_loss + fm * cfg.feat_match_loss_weight
                items[f"G_fm_{name}"] = fm
    if cfg.use_wav_loss:
        wav = jnp.mean(jnp.abs(outputs - jax.lax.stop_gradient(targets)))
        g_loss = g_loss + wav * cfg.wav_loss_weight
        items["G_wav_loss"] = wav
    if cfg.use_mel_loss:
        mel_kw = dict(cfg.mel_kwargs)
        mel_out = mel_spectrogram(outputs[:, 0], **mel_kw)
        mel_tgt = mel_spectrogram(targets[:, 0], **mel_kw)
        mel = jnp.mean(jnp.abs(mel_out - jax.lax.stop_gradient(mel_tgt)))
        g_loss = g_loss + mel * cfg.mel_loss_weight
        items["G_mel_loss"] = mel
    if cfg.use_full_stft_loss:
        sc, mag = multi_resolution_stft_loss(
            outputs[:, 0], targets[:, 0],
            cfg.full_fft_sizes, cfg.full_win_sizes, cfg.full_hop_sizes,
        )
        g_loss = g_loss + cfg.full_stft_loss_weight * (sc + mag)
        items["G_sc_full"] = sc
        items["G_mg_full"] = mag
    if cfg.use_sub_stft_loss:
        tgt_sub = pqmf_analysis(targets, cfg.sub_num_bands)
        out_sub = pqmf_analysis(outputs, cfg.sub_num_bands)
        B, N, T = out_sub.shape
        sc, mag = multi_resolution_stft_loss(
            out_sub.reshape(B * N, T), tgt_sub.reshape(B * N, T),
            cfg.sub_fft_sizes, cfg.sub_win_sizes, cfg.sub_hop_sizes,
        )
        g_loss = g_loss + cfg.sub_stft_loss_weight * (sc + mag)
        items["G_sc_sub"] = sc
        items["G_mg_sub"] = mag
    return g_loss, items


def discriminator_loss(
    output_real: dict[str, list], output_fake: dict[str, list], kind: str = "mse"
) -> tuple[jax.Array, dict]:
    fn = mse_d_loss if kind == "mse" else hinge_d_loss
    total = 0.0
    items = {}
    for name in output_real:
        d = fn(output_real[name], output_fake[name])
        total = total + d
        items[f"D_{name}"] = d
    return total, items
