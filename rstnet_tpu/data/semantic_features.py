"""Frozen semantic teachers for codec distillation.

Capability parity with ``AudioCodec/MimiCodec/semantic_features/``
(WavLMFeature:9, HuBertFeature:5, whisper/w2v-BERT variants, selected by
``--semantic_feature_type`` in ``train.py:36-48``): 16 kHz SSL feature
extractors whose layer-N hidden states distill into the semantic codebook.

Teachers run host-side (they are frozen torch models at data-prep/teacher
time); ``transformers`` provides WavLM/HuBERT when checkpoints are available,
and a ``precomputed`` teacher reads features extracted offline — the
recommended production path: extract once, train the codec TPU-side without
a torch model in the loop.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np


class SemanticTeacher:
    """Interface: extract([B, 1, T16k] float) -> [B, T50Hz, D] features."""

    feature_dim: int = 1024

    def extract(self, audio_16k: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class WavLMTeacher(SemanticTeacher):
    """WavLM-Large layer features via transformers (frozen, CPU)."""

    def __init__(self, checkpoint: str, layer: int = 6):
        import torch
        from transformers import WavLMModel

        self.torch = torch
        self.model = WavLMModel.from_pretrained(checkpoint).eval()
        self.layer = layer
        self.feature_dim = self.model.config.hidden_size

    def extract(self, audio_16k: np.ndarray) -> np.ndarray:
        torch = self.torch
        with torch.no_grad():
            x = torch.as_tensor(audio_16k[:, 0])
            out = self.model(x, output_hidden_states=True)
            return out.hidden_states[self.layer].numpy()


class HubertTeacher(SemanticTeacher):
    def __init__(self, checkpoint: str, layer: int = 9):
        import torch
        from transformers import HubertModel

        self.torch = torch
        self.model = HubertModel.from_pretrained(checkpoint).eval()
        self.layer = layer
        self.feature_dim = self.model.config.hidden_size

    def extract(self, audio_16k: np.ndarray) -> np.ndarray:
        torch = self.torch
        with torch.no_grad():
            x = torch.as_tensor(audio_16k[:, 0])
            out = self.model(x, output_hidden_states=True)
            return out.hidden_states[self.layer].numpy()


class WhisperTeacher(SemanticTeacher):
    """Whisper encoder hidden states (reference ``whisper_feature.py``).
    Input is padded/trimmed to Whisper's 30 s mel window per chunk."""

    def __init__(self, checkpoint: str, layer: int = -1):
        import torch
        from transformers import WhisperFeatureExtractor, WhisperModel

        self.torch = torch
        self.model = WhisperModel.from_pretrained(checkpoint).eval()
        self.fe = WhisperFeatureExtractor.from_pretrained(checkpoint)
        self.layer = layer
        self.feature_dim = self.model.config.d_model

    def extract(self, audio_16k: np.ndarray) -> np.ndarray:
        torch = self.torch
        with torch.no_grad():
            feats = self.fe(
                [a for a in audio_16k[:, 0]], sampling_rate=16000,
                return_tensors="pt",
            ).input_features
            enc = self.model.encoder(feats, output_hidden_states=True)
            return enc.hidden_states[self.layer].numpy()


class W2vBertTeacher(SemanticTeacher):
    """w2v-BERT 2.0 hidden states (reference ``w2vec2bert_feature.py``)."""

    def __init__(self, checkpoint: str, layer: int = 12):
        import torch
        from transformers import AutoFeatureExtractor, Wav2Vec2BertModel

        self.torch = torch
        self.model = Wav2Vec2BertModel.from_pretrained(checkpoint).eval()
        self.fe = AutoFeatureExtractor.from_pretrained(checkpoint)
        self.layer = layer
        self.feature_dim = self.model.config.hidden_size

    def extract(self, audio_16k: np.ndarray) -> np.ndarray:
        torch = self.torch
        with torch.no_grad():
            feats = self.fe(
                [a for a in audio_16k[:, 0]], sampling_rate=16000,
                return_tensors="pt",
            ).input_features
            out = self.model(feats, output_hidden_states=True)
            return out.hidden_states[self.layer].numpy()


class PrecomputedTeacher(SemanticTeacher):
    """Features extracted offline (npz keyed by utt id) — no torch at train
    time. ``extract`` is not used; the trainer feeds features directly."""

    def __init__(self, feature_dim: int = 1024):
        self.feature_dim = feature_dim

    def extract(self, audio_16k: np.ndarray) -> np.ndarray:
        raise RuntimeError("precomputed teacher: pass features through the batch")


class NullTeacher(SemanticTeacher):
    """Disables distillation (sim_loss = 0) — for smoke tests and ablations."""

    def __init__(self, feature_dim: int = 1024):
        self.feature_dim = feature_dim

    def extract(self, audio_16k: np.ndarray) -> np.ndarray:
        B, _, T = audio_16k.shape
        return np.zeros((B, T // 320, self.feature_dim), np.float32)


def build_teacher(kind: str, checkpoint: Optional[str] = None, **kw) -> SemanticTeacher:
    if kind == "wavlm":
        assert checkpoint, "wavlm teacher needs a checkpoint path"
        return WavLMTeacher(checkpoint, **kw)
    if kind == "hubert":
        assert checkpoint, "hubert teacher needs a checkpoint path"
        return HubertTeacher(checkpoint, **kw)
    if kind == "whisper":
        assert checkpoint, "whisper teacher needs a checkpoint path"
        return WhisperTeacher(checkpoint, **kw)
    if kind in ("w2v-bert", "w2vbert"):
        assert checkpoint, "w2v-bert teacher needs a checkpoint path"
        return W2vBertTeacher(checkpoint, **kw)
    if kind == "precomputed":
        return PrecomputedTeacher(**kw)
    if kind in ("none", "null"):
        return NullTeacher(**kw)
    raise ValueError(f"unknown semantic teacher {kind}")
