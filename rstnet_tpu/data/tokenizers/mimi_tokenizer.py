"""Offline audio tokenizer: waveform -> 8 x 12.5 Hz Mimi codes.

Capability parity with ``MLLM_v2/tools/tokenizer/MimiCodec/mimi_tokenizer.py``:
loads kyutai Mimi weights into this framework's codec, encodes to int16 codes
for compact storage, and decodes back. The encode/decode paths are jitted per
input bucket (inputs are padded up to a bucket length so offline tokenization
of arbitrary files reuses a handful of compiled programs).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.data.tokenizers.abs_tokenizer import AbsTokenizer
from rstnet_tpu.models.mimi import MimiModel, mimi_24k


class MimiTokenizer(AbsTokenizer):
    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        model: Optional[MimiModel] = None,
        params=None,
        dtype=jnp.float32,
    ):
        self.model = model or mimi_24k()
        if params is not None:
            self.params = params
        elif checkpoint_path is not None:
            from rstnet_tpu.models.convert import load_mimi

            self.params = load_mimi(checkpoint_path, self.model)
        else:
            # random weights: only useful for pipeline tests
            self.params = self.model.init(jax.random.PRNGKey(0), dtype)
        self.sr = self.model.sample_rate
        self._encode = jax.jit(self.model.encode)
        self._decode = jax.jit(self.model.decode)

    @property
    def is_discrete(self) -> bool:
        return True

    @property
    def codebook_length(self) -> int:
        return self.model.num_codebooks * self.model.quantizer.cardinality

    def find_length(self, x) -> int:
        return int(np.shape(x)[-1])

    def _bucket_pad(self, wav: np.ndarray) -> tuple[np.ndarray, int]:
        """Pad to a whole number of frames at a power-of-two frame count."""
        fs = self.model.frame_size
        n_frames = max(1, math.ceil(wav.shape[-1] / fs))
        bucket = 1 << (n_frames - 1).bit_length()
        padded = np.zeros(wav.shape[:-1] + (bucket * fs,), np.float32)
        padded[..., : wav.shape[-1]] = wav
        return padded, n_frames

    def tokenize(self, wav, sample_rate: Optional[int] = None) -> np.ndarray:
        """wav [T] or [1, T] float -> codes [K, frames] int16."""
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 1:
            wav = wav[None]
        if sample_rate is not None and sample_rate != self.sr:
            wav = _resample_linear(wav, sample_rate, self.sr)
        padded, n_frames = self._bucket_pad(wav)
        codes = self._encode(self.params, jnp.asarray(padded[None]))
        return np.asarray(codes[0, :, :n_frames]).astype(np.int16)

    def detokenize(self, codes) -> np.ndarray:
        """codes [K, frames] -> wav [1, samples] float32."""
        codes = np.asarray(codes, np.int32)
        assert codes.shape[0] == self.model.num_codebooks
        wav = self._decode(self.params, jnp.asarray(codes[None]))
        return np.asarray(wav[0], np.float32)


def _resample_linear(wav: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Minimal linear resampler for data prep (no torchaudio dependency)."""
    n_out = int(round(wav.shape[-1] * sr_out / sr_in))
    x_old = np.linspace(0.0, 1.0, wav.shape[-1], endpoint=False)
    x_new = np.linspace(0.0, 1.0, n_out, endpoint=False)
    return np.stack([np.interp(x_new, x_old, ch) for ch in wav]).astype(np.float32)
