"""Pseudo-QMF filterbank for sub-band STFT losses.

Capability parity with ``AudioCodec/MimiCodec/modules/commons/pqmf.py``: an
N-band polyphase quadrature filterbank built from a Kaiser-windowed lowpass
prototype, with analysis (audio -> N sub-bands) and synthesis. Filter design
happens once in numpy (scipy); the runtime analysis is a single strided
convolution on the MXU.

The prototype cutoff is optimized numerically per band count (the reference
hard-codes 0.142, which is only near-optimal for its 4-band default): a
two-stage scan minimizes white-noise reconstruction error of the full
analysis->synthesis chain, giving >30 dB reconstruction SNR for 2-8 bands.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import firwin


def _design(num_bands: int, taps: int, cutoff: float, beta: float):
    proto = firwin(taps + 1, cutoff, window=("kaiser", beta))
    n = np.arange(taps + 1)
    analysis = np.zeros((num_bands, taps + 1))
    synthesis = np.zeros((num_bands, taps + 1))
    for k in range(num_bands):
        phase = (2 * k + 1) * (np.pi / (2 * num_bands)) * (n - taps / 2)
        offset = (-1) ** k * np.pi / 4
        analysis[k] = 2 * proto * np.cos(phase + offset)
        synthesis[k] = 2 * proto * np.cos(phase - offset)
    return analysis, synthesis


def _recon_error(num_bands: int, taps: int, cutoff: float, beta: float) -> float:
    """White-noise reconstruction error of the full chain (numpy)."""
    analysis, synthesis = _design(num_bands, taps, cutoff, beta)
    rng = np.random.default_rng(0)
    # probe length must be a multiple of the band count (decimate+upsample
    # round-trip keeps the length only then — e.g. 6 bands needs 2046)
    x = rng.normal(0.0, 1.0, 2048 - (2048 % num_bands))
    pad = taps // 2
    xp = np.pad(x, (pad, pad))
    y = np.zeros_like(x)
    for k in range(num_bands):
        sub = np.correlate(xp, analysis[k], mode="valid")[::num_bands] * num_bands
        up = np.zeros(sub.size * num_bands)
        up[::num_bands] = sub
        y += np.correlate(np.pad(up, (pad, pad)), synthesis[k], mode="valid")
    m = slice(taps, x.size - taps)
    return float(np.sum((x[m] - y[m]) ** 2) / np.sum(x[m] ** 2))


@lru_cache(maxsize=8)
def _optimal_cutoff(num_bands: int, taps: int, beta: float) -> float:
    """Two-stage scan around the theoretical 1/(2N) cutoff."""
    base = 0.5 / num_bands
    cuts = np.linspace(0.6 * base, 1.6 * base, 41)
    errs = [_recon_error(num_bands, taps, c, beta) for c in cuts]
    best = cuts[int(np.argmin(errs))]
    fine = np.linspace(best - 0.02 * base, best + 0.02 * base, 21)
    fine = fine[(fine > 0) & (fine < 1)]
    errs = [_recon_error(num_bands, taps, c, beta) for c in fine]
    return float(fine[int(np.argmin(errs))])


@lru_cache(maxsize=8)
def pqmf_filters(
    num_bands: int = 4, taps: int = 62, cutoff: float | None = None,
    beta: float = 9.0,
) -> tuple[np.ndarray, np.ndarray]:
    """-> (analysis [N, 1, taps+1], synthesis [N, 1, taps+1]) float32.
    ``cutoff=None`` (default) optimizes the prototype per band count."""
    if cutoff is None:
        cutoff = _optimal_cutoff(num_bands, taps, beta)
    analysis, synthesis = _design(num_bands, taps, cutoff, beta)
    return (
        analysis[:, None, :].astype(np.float32),
        synthesis[:, None, :].astype(np.float32),
    )


def pqmf_analysis(x: jax.Array, num_bands: int = 4, taps: int = 62) -> jax.Array:
    """[B, 1, T] -> [B, num_bands, T // num_bands]."""
    h, _ = pqmf_filters(num_bands, taps)
    pad = taps // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(h), window_strides=(num_bands,), padding=((0, 0),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )


def pqmf_synthesis(x: jax.Array, num_bands: int = 4, taps: int = 62) -> jax.Array:
    """[B, num_bands, T'] -> [B, 1, T' * num_bands].

    ``lax.conv`` is cross-correlation (like the reference's ``F.conv1d``),
    so the synthesis filters are applied as designed — no time reversal.
    """
    _, g = pqmf_filters(num_bands, taps)
    B, N, T = x.shape
    # upsample each band by N then filter and sum over bands
    up = jnp.zeros((B, N, T * N), x.dtype).at[:, :, ::num_bands].set(x) * num_bands
    pad = taps // 2
    up = jnp.pad(up, ((0, 0), (0, 0), (pad, pad)))
    y = jax.lax.conv_general_dilated(
        up, jnp.swapaxes(jnp.asarray(g), 0, 1), window_strides=(1,), padding=((0, 0),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y
