"""Minimal wav IO and resampling with no external audio dependencies.

The reference leans on torchaudio/soundfile; data-prep and serving here only
need 16-bit PCM wav read/write and simple resampling, which the stdlib
``wave`` module plus numpy cover.
"""

from __future__ import annotations

import wave

import numpy as np


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """-> (float32 [channels, T] in [-1, 1], sample_rate).

    Uses the native C++ loader (rstnet_tpu.native) when available; falls back
    to the stdlib wave module."""
    try:
        from rstnet_tpu import native

        out = native.read_wav(path)
        if out is not None:
            return out
    except Exception:  # noqa: BLE001
        pass
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    return data.reshape(-1, ch).T.copy(), sr


def write_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """audio: float [T] or [channels, T] in [-1, 1] -> 16-bit PCM wav."""
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    pcm = np.clip(audio * 32767.0, -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(pcm.shape[0])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.T.tobytes())


def resample_linear(wav: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resampler; wav [channels, T]."""
    if sr_in == sr_out:
        return wav
    try:
        from rstnet_tpu import native

        out = native.resample_linear(wav, sr_in, sr_out)
        if out is not None:
            return out
    except Exception:  # noqa: BLE001
        pass
    n_out = int(round(wav.shape[-1] * sr_out / sr_in))
    x_old = np.linspace(0.0, 1.0, wav.shape[-1], endpoint=False)
    x_new = np.linspace(0.0, 1.0, n_out, endpoint=False)
    return np.stack([np.interp(x_new, x_old, ch) for ch in wav]).astype(np.float32)


def plot_spectrogram(audio: np.ndarray, sr: int = 24000, path: str | None = None):
    """Log-mel spectrogram figure for TB/debug
    (``AudioCodec/MimiCodec/utils/utils.py`` plot_spectrogram)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from rstnet_tpu.ops.stft import mel_spectrogram

    mel = np.asarray(mel_spectrogram(audio[None], sampling_rate=sr))[0]
    fig, ax = plt.subplots(figsize=(10, 3))
    im = ax.imshow(mel, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("frames")
    ax.set_ylabel("mel bins")
    fig.tight_layout()
    if path:
        fig.savefig(path)
        plt.close(fig)
        return None
    return fig


def pcm16_to_float(data: bytes) -> np.ndarray:
    return np.frombuffer(data, np.int16).astype(np.float32) / 32768.0


def float_to_pcm16(audio: np.ndarray) -> bytes:
    return np.clip(np.asarray(audio) * 32767.0, -32768, 32767).astype(np.int16).tobytes()
