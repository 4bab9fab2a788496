"""Enhancement losses (codec/enhancement training extras).

Capability parity with ``AudioCodec/MimiCodec/losses/enh_loss.py``:
frequency-domain complex MAE, waveform MAE, and SI-SNR loss, composed by
``BasicEnhancementLoss`` for the GeneratorSTFTEnhLoss variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rstnet_tpu.ops.stft import stft


def freq_mae(est: jax.Array, target: jax.Array, win: int = 2048, stride: int = 512) -> jax.Array:
    """Complex STFT L1 (real + imaginary parts)."""
    e = stft(est.reshape(-1, est.shape[-1]), win, stride, win)
    t = stft(target.reshape(-1, target.shape[-1]), win, stride, win)
    return jnp.mean(jnp.abs(jnp.real(e) - jnp.real(t))) + jnp.mean(
        jnp.abs(jnp.imag(e) - jnp.imag(t))
    )


def wav_mae(est: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(est - target))


def si_snr_loss(est: jax.Array, target: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Negative SI-SNR in dB (lower = better reconstruction)."""
    x = est.reshape(-1, est.shape[-1])
    s = target.reshape(-1, target.shape[-1])
    x = x - jnp.mean(x, -1, keepdims=True)
    s = s - jnp.mean(s, -1, keepdims=True)
    t = jnp.sum(x * s, -1, keepdims=True) * s / (
        jnp.sum(jnp.square(s), -1, keepdims=True) + eps
    )
    num = jnp.linalg.norm(t, axis=-1)
    den = jnp.linalg.norm(x - t, axis=-1)
    return -jnp.mean(20 * jnp.log10(eps + num / (den + eps)))


def enhancement_loss(
    est: jax.Array, target: jax.Array,
    freq_weight: float = 1.0, wav_weight: float = 1.0, sisnr_weight: float = 1.0,
) -> tuple[jax.Array, dict]:
    """BasicEnhancementLoss composition."""
    f = freq_mae(est, target)
    w = wav_mae(est, target)
    s = si_snr_loss(est, target)
    total = freq_weight * f + wav_weight * w + sisnr_weight * s
    return total, {"enh_freq_mae": f, "enh_wav_mae": w, "enh_sisnr": s}
