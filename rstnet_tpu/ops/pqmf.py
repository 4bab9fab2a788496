"""Pseudo-QMF filterbank for sub-band STFT losses.

Capability parity with ``AudioCodec/MimiCodec/modules/commons/pqmf.py``: an
N-band polyphase quadrature filterbank built from a Kaiser-windowed lowpass
prototype, with analysis (audio -> N sub-bands) and synthesis. Filter design
happens once in numpy (scipy); the runtime analysis is a single strided
convolution on the MXU.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import firwin


@lru_cache(maxsize=8)
def pqmf_filters(
    num_bands: int = 4, taps: int = 62, cutoff: float = 0.15, beta: float = 9.0
) -> tuple[np.ndarray, np.ndarray]:
    """-> (analysis [N, 1, taps+1], synthesis [N, 1, taps+1]) float32."""
    proto = firwin(taps + 1, cutoff, window=("kaiser", beta))
    analysis = np.zeros((num_bands, taps + 1))
    synthesis = np.zeros((num_bands, taps + 1))
    n = np.arange(taps + 1)
    for k in range(num_bands):
        phase = (2 * k + 1) * (np.pi / (2 * num_bands)) * (n - taps / 2)
        offset = (-1) ** k * np.pi / 4
        analysis[k] = 2 * proto * np.cos(phase + offset)
        synthesis[k] = 2 * proto * np.cos(phase - offset)
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
    """[B, num_bands, T'] -> [B, 1, T' * num_bands]."""
    _, g = pqmf_filters(num_bands, taps)
    B, N, T = x.shape
    # upsample each band by N then filter and sum
    up = jnp.zeros((B, N, T * N), x.dtype).at[:, :, ::num_bands].set(x) * num_bands
    pad = taps // 2
    up = jnp.pad(up, ((0, 0), (0, 0), (pad, pad)))
    g_sum = jnp.asarray(g)[:, :, ::-1]  # time-reversed for synthesis
    y = jax.lax.conv_general_dilated(
        up, jnp.swapaxes(g_sum, 0, 1), window_strides=(1,), padding=((0, 0),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y
