"""GLM-4-Voice semantic (WhisperVQ) tokenizer.

Capability parity with ``MLLM_v2/tools/tokenizer/GLM4V/semantic.py``
(SSLTokenizer:18, tokenize:92, detokenize:143): a 16 kHz single-codebook
12.5 Hz semantic tokenizer. The model itself — whisper encoder + pooled VQ
token harvest — is the in-repo JAX :class:`WhisperVQEncoder`
(``models/whisper_vq.py``), loaded from the GLM-4-Voice tokenizer
checkpoint layout; audio is processed in 30 s chunks padded to the token
stride, and tokens are harvested under the downsampled attention mask,
matching the reference's framing. Detokenization runs the in-repo JAX
CosyVoice flow + HiFT stack (``models/glm4v_decoder.py``), loaded from the
``glm-4-voice-decoder`` checkpoint directory.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from rstnet_tpu.data.tokenizers.abs_tokenizer import AbsTokenizer

CHUNK_SECONDS = 30
SR = 16000


class SSLTokenizer(AbsTokenizer):
    """audio -> 12.5 Hz semantic token ids (single codebook)."""

    def __init__(
        self, checkpoint: str = "", model=None, params=None,
        decoder_checkpoint: str = "", decoder=None,
    ):
        import jax

        if model is None or params is None:
            if not checkpoint:
                raise RuntimeError(
                    "SSLTokenizer needs the GLM-4-Voice tokenizer checkpoint "
                    "directory (or an explicit model+params)"
                )
            from rstnet_tpu.models.whisper_vq import load_glm4v_encoder

            model, params = load_glm4v_encoder(checkpoint)
        self.model = model
        self.params = params
        self.sr = SR
        cfg = model.config
        # samples per token: conv2 stride (2) x pooling x mel hop (160)
        self.stride = 2 * cfg.pooling_kernel_size * 160
        self._encode = jax.jit(model.encode)
        # detokenize path (in-repo JAX flow + HiFT; models/glm4v_decoder.py)
        self._decoder = decoder
        self._decoder_checkpoint = decoder_checkpoint

    @property
    def is_discrete(self) -> bool:
        return True

    def find_length(self, x) -> int:
        return int(np.shape(x)[-1])

    def tokenize(self, wav: np.ndarray, sample_rate: Optional[int] = None) -> np.ndarray:
        """mono waveform -> [T] int32 tokens (30 s chunks, mask-harvested)."""
        from rstnet_tpu.models.whisper_vq import log_mel_spectrogram

        wav = np.asarray(wav, np.float32).reshape(-1)
        if sample_rate is not None and sample_rate != self.sr:
            from rstnet_tpu.utils.audio import resample_linear

            wav = resample_linear(wav[None], sample_rate, self.sr)[0]
        cfg = self.model.config
        pool = cfg.pooling_kernel_size
        chunk = self.sr * CHUNK_SECONDS
        tokens = []
        for off in range(0, len(wav), chunk):
            seg = wav[off : off + chunk]
            # pad the raw audio to a whole number of tokens (reference pads
            # features with pad_to_multiple_of=stride)
            pad = (-len(seg)) % self.stride
            # ceil: a trailing partial mel frame still yields a token, the
            # reference's ceil(len/sr*12.5) count (GLM4V/semantic.py)
            n_valid_mel = -(-len(seg) // 160)
            seg = np.pad(seg, (0, pad))
            mel = log_mel_spectrogram(seg, cfg.n_mels)  # [n_mels, frames]
            n_mel = mel.shape[1]
            mask = (np.arange(n_mel) < n_valid_mel).astype(np.float32)[None]
            ids, tok_mask = self._encode(self.params, mel[None], mask)
            ids, tok_mask = np.asarray(ids[0]), np.asarray(tok_mask[0]) > 0.5
            tokens.append(ids[tok_mask])
        if not tokens:
            return np.zeros((0,), np.int32)
        return np.concatenate(tokens).astype(np.int32)

    def detokenize(self, tokens: np.ndarray) -> np.ndarray:
        """[T] semantic token ids -> 22.05 kHz waveform (reference
        ``semantic.py:143-151`` -> ``AudioDecoder.offline_inference``),
        through the in-repo JAX CosyVoice flow + HiFT vocoder."""
        if self._decoder is None:
            if not self._decoder_checkpoint:
                raise RuntimeError(
                    "SSL detokenization needs the glm-4-voice-decoder "
                    "checkpoint directory (decoder_checkpoint=...) holding "
                    "config.yaml + flow.pt + hift.pt"
                )
            from rstnet_tpu.models.glm4v_decoder import load_glm4v_decoder

            self._decoder = load_glm4v_decoder(self._decoder_checkpoint)
        tokens = np.asarray(tokens, np.int32).reshape(1, -1)
        import jax.numpy as jnp

        wav = self._decoder.offline_inference(jnp.asarray(tokens))
        return np.asarray(wav)[0]
