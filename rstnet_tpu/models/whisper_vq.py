"""WhisperVQ semantic tokenizer model (GLM-4-Voice), TPU-native.

From-scratch JAX implementation of the reference's WhisperVQ encoder used by
the SSL tokenizer (``MLLM_v2/tools/tokenizer/GLM4V/semantic.py:18-151`` and
``modeling_whisper.py::WhisperVQEncoder`` at :1056-1320): a log-mel frontend
(Whisper's slaney-scale filterbank), two GELU convs (stride 1 and 2),
learned positions, pre-LN transformer layers, temporal pooling after
``pooling_position`` layers, and a vector-quantization token harvest after
``quantize_position`` layers. Only the tokenize path is implemented (the
reference's ``quantize_encoder_only`` mode); detokenization stays an
external CosyVoice adapter.

The encoder is a pure jittable function over a param pytree; batches of
30 s chunks map onto the MXU as dense matmuls. Checkpoint loading converts
the GLM-4-Voice HF layout (``load_glm4v_encoder``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

WHISPER_SR = 16000
N_FFT = 400
HOP = 160


@dataclasses.dataclass(frozen=True)
class WhisperVQConfig:
    n_mels: int = 128               # whisper-large-v3 frontend
    d_model: int = 1280
    num_heads: int = 20
    ffn_dim: int = 5120
    num_layers: int = 16            # layers kept in quantize_encoder_only mode
    pooling_kernel_size: int = 4    # 50 Hz -> 12.5 Hz
    pooling_position: int = 16
    pooling_type: str = "avg"
    quantize_position: int = 16
    quantize_vocab_size: int = 16384
    max_source_positions: int = 1500
    causal_encoder: bool = False    # per-layer causal attention below the VQ
    causal_block_size: Optional[int] = None  # block-causal mask when set


# ---------------------------------------------------------------------------
# log-mel frontend (parity with WhisperFeatureExtractor: hann 400/hop 160,
# slaney-scale mel filterbank, log10 with 8-order dynamic range, (x+4)/4)
# ---------------------------------------------------------------------------


def _hz_to_mel(f):
    # slaney: linear below 1 kHz, log above
    f = np.asarray(f, np.float64)
    min_log_hz, min_log_mel = 1000.0, 15.0
    logstep = 27.0 / np.log(6.4)
    mel = 3.0 * f / 200.0
    safe = np.maximum(f, 1e-10)  # the log branch is unused below 1 kHz
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(safe / min_log_hz) * logstep, mel)


def _mel_to_hz(m):
    m = np.asarray(m, np.float64)
    min_log_hz, min_log_mel = 1000.0, 15.0
    logstep = np.log(6.4) / 27.0
    f = 200.0 * m / 3.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


def mel_filter_bank(n_mels: int, n_fft: int = N_FFT, sr: int = WHISPER_SR) -> np.ndarray:
    """[n_mels, n_fft//2+1] slaney-normalized triangular filterbank."""
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(8000.0), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    return (fb * enorm[:, None]).astype(np.float32)


def log_mel_spectrogram(wav: np.ndarray, n_mels: int = 128) -> np.ndarray:
    """[T] float wav -> [n_mels, frames] whisper-style log-mel (host-side).

    Matches WhisperFeatureExtractor: reflect-padded centered frames, hann
    window, power spectrum, mel, log10 clamped to 1e-10, max-8 dynamic
    floor, (x + 4) / 4. The trailing frame is dropped as in whisper.
    """
    wav = np.asarray(wav, np.float32).reshape(-1)
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    pad = N_FFT // 2
    xp = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (len(xp) - N_FFT) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = xp[idx] * window
    power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2  # [frames, bins]
    mel = mel_filter_bank(n_mels) @ power.T  # [n_mels, frames]
    mel = mel[:, :-1]  # whisper drops the final frame
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _linear(key, d_in, d_out, bias=True):
    k = 1.0 / math.sqrt(d_in)
    p = {"w": jax.random.uniform(key, (d_in, d_out), jnp.float32, -k, k)}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _apply_linear(p, x):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


def _layer_norm(p, x):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + 1e-5) * p["scale"] + p["bias"]


def vector_quantize(h: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """[..., D] -> nearest codebook index [...] by squared L2
    (reference ``modeling_whisper.py:68-84``)."""
    d = (
        jnp.sum(h * h, -1, keepdims=True)
        - 2.0 * h @ codebook.T
        + jnp.sum(codebook * codebook, -1)
    )
    return jnp.argmin(d, axis=-1)


class WhisperVQEncoder:
    """Pure-function WhisperVQ encoder: mel -> semantic token ids."""

    def __init__(self, config: WhisperVQConfig):
        self.config = config

    def init(self, key) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
        params = {
            # conv weights kept in [width, in, out] layout for lax.conv
            "conv1": {
                "w": jax.random.normal(next(keys), (3, cfg.n_mels, cfg.d_model)) * 0.02,
                "b": jnp.zeros((cfg.d_model,)),
            },
            "conv2": {
                "w": jax.random.normal(next(keys), (3, cfg.d_model, cfg.d_model)) * 0.02,
                "b": jnp.zeros((cfg.d_model,)),
            },
            "embed_positions": jax.random.normal(
                next(keys), (cfg.max_source_positions, cfg.d_model)
            ) * 0.02,
            "codebook": jax.random.normal(
                next(keys), (cfg.quantize_vocab_size, cfg.d_model)
            ) * 0.02,
            "layers": [],
        }
        for _ in range(cfg.num_layers):
            params["layers"].append({
                "attn_ln": {"scale": jnp.ones((cfg.d_model,)), "bias": jnp.zeros((cfg.d_model,))},
                "q": _linear(next(keys), cfg.d_model, cfg.d_model),
                "k": _linear(next(keys), cfg.d_model, cfg.d_model, bias=False),
                "v": _linear(next(keys), cfg.d_model, cfg.d_model),
                "o": _linear(next(keys), cfg.d_model, cfg.d_model),
                "final_ln": {"scale": jnp.ones((cfg.d_model,)), "bias": jnp.zeros((cfg.d_model,))},
                "fc1": _linear(next(keys), cfg.d_model, cfg.ffn_dim),
                "fc2": _linear(next(keys), cfg.ffn_dim, cfg.d_model),
            })
        return params

    def _attention(self, p, x, bias):
        cfg = self.config
        B, T, D = x.shape
        H = cfg.num_heads
        hd = D // H
        q = _apply_linear(p["q"], x).reshape(B, T, H, hd) * (hd ** -0.5)
        k = _apply_linear(p["k"], x).reshape(B, T, H, hd)
        v = _apply_linear(p["v"], x).reshape(B, T, H, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if bias is not None:
            scores = scores + bias
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, D)
        return _apply_linear(p["o"], out)

    def _mask_bias(self, mask: jnp.ndarray, causal: bool) -> jnp.ndarray:
        """mask [B, T] (1 = valid) -> additive bias [B, 1, T, T]."""
        cfg = self.config
        T = mask.shape[1]
        allowed = mask[:, None, :].astype(bool)  # keys
        if cfg.causal_block_size is not None:
            pos = jnp.arange(T)
            blk = cfg.causal_block_size
            tri = pos[:, None] >= pos[None, :]
            same_block = (pos[:, None] // blk) == (pos[None, :] // blk)
            allowed = allowed & (tri | same_block)[None]
        elif causal:
            pos = jnp.arange(T)
            allowed = allowed & (pos[:, None] >= pos[None, :])[None]
        return jnp.where(allowed[:, None], 0.0, -1e9)

    def _layer(self, p, x, bias):
        h = x + self._attention(p, _layer_norm(p["attn_ln"], x), bias)
        y = _layer_norm(p["final_ln"], h)
        y = _apply_linear(p["fc2"], jax.nn.gelu(_apply_linear(p["fc1"], y), approximate=False))
        return h + y

    def encode(self, params, mel: jnp.ndarray, mask: jnp.ndarray):
        """mel [B, n_mels, T_mel] (T_mel % (2*pool) == 0), mask [B, T_mel]
        -> (token_ids [B, T_tok], token_mask [B, T_tok])."""
        cfg = self.config
        # conv frontend: stride-1 then stride-2 GELU convs (SAME padding 1)
        x = mel.transpose(0, 2, 1)  # [B, T, n_mels]
        x = jax.lax.conv_general_dilated(
            x, params["conv1"]["w"], (1,), [(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + params["conv1"]["b"]
        x = jax.nn.gelu(x, approximate=False)
        x = jax.lax.conv_general_dilated(
            x, params["conv2"]["w"], (2,), [(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + params["conv2"]["b"]
        x = jax.nn.gelu(x, approximate=False)
        T = x.shape[1]
        x = x + params["embed_positions"][:T]
        mask = mask[:, ::2]  # conv2 stride
        bias = self._mask_bias(mask, cfg.causal_encoder)

        pooled = False
        for idx, layer in enumerate(params["layers"]):
            x = self._layer(layer, x, bias)
            if (
                idx + 1 == cfg.pooling_position
                and cfg.pooling_kernel_size > 1
                and not pooled
            ):
                k = cfg.pooling_kernel_size
                pad = (-x.shape[1]) % k
                if pad:
                    x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
                xr = x.reshape(x.shape[0], x.shape[1] // k, k, x.shape[2])
                x = xr.mean(2) if cfg.pooling_type == "avg" else xr.max(2)
                mask = mask[:, ::k]
                bias = self._mask_bias(mask, cfg.causal_encoder)
                pooled = True
            if idx + 1 == cfg.quantize_position:
                ids = vector_quantize(x, params["codebook"])
                return ids, mask
        # quantize_position beyond kept layers: quantize the final states
        ids = vector_quantize(x, params["codebook"])
        return ids, mask


# ---------------------------------------------------------------------------
# GLM-4-Voice checkpoint conversion (HF layout -> param pytree)
# ---------------------------------------------------------------------------


def convert_whisper_vq(state: dict, config: WhisperVQConfig) -> dict:
    """torch state-dict (WhisperVQEncoder tensors, possibly prefixed
    ``encoder.``) -> param pytree for :class:`WhisperVQEncoder`."""

    def t(name):
        for k in (name, "encoder." + name, "model.encoder." + name):
            if k in state:
                v = state[k]
                return jnp.asarray(np.asarray(v, np.float32))
        raise KeyError(name)

    def lin(name, bias=True):
        p = {"w": t(name + ".weight").T}
        if bias:
            p["b"] = t(name + ".bias")
        return p

    def ln(name):
        return {"scale": t(name + ".weight"), "bias": t(name + ".bias")}

    params = {
        # torch conv1d weight [out, in, width] -> [width, in, out]
        "conv1": {"w": t("conv1.weight").transpose(2, 1, 0), "b": t("conv1.bias")},
        "conv2": {"w": t("conv2.weight").transpose(2, 1, 0), "b": t("conv2.bias")},
        "embed_positions": t("embed_positions.weight"),
        "codebook": t("codebook.weight"),
        "layers": [],
    }
    for i in range(config.num_layers):
        pre = f"layers.{i}."
        params["layers"].append({
            "attn_ln": ln(pre + "self_attn_layer_norm"),
            "q": lin(pre + "self_attn.q_proj"),
            "k": lin(pre + "self_attn.k_proj", bias=False),
            "v": lin(pre + "self_attn.v_proj"),
            "o": lin(pre + "self_attn.out_proj"),
            "final_ln": ln(pre + "final_layer_norm"),
            "fc1": lin(pre + "fc1"),
            "fc2": lin(pre + "fc2"),
        })
    return params


def load_glm4v_encoder(path: str, config: Optional[WhisperVQConfig] = None):
    """Load the GLM-4-Voice tokenizer checkpoint directory (HF safetensors
    or pytorch_model.bin) -> (model, params). Reads config.json for the
    architecture fields when present."""
    import json
    import os

    if config is None:
        cfg_kwargs = {}
        cfg_file = os.path.join(path, "config.json")
        if os.path.exists(cfg_file):
            with open(cfg_file) as f:
                hf = json.load(f)
            cfg_kwargs = dict(
                n_mels=hf.get("num_mel_bins", 128),
                d_model=hf.get("d_model", 1280),
                num_heads=hf.get("encoder_attention_heads", 20),
                ffn_dim=hf.get("encoder_ffn_dim", 5120),
                num_layers=hf.get("quantize_position", 16),
                pooling_kernel_size=hf.get("pooling_kernel_size") or 1,
                pooling_position=hf.get("pooling_position", 16),
                pooling_type=hf.get("pooling_type", "avg"),
                quantize_position=hf.get("quantize_position", 16),
                quantize_vocab_size=hf.get("quantize_vocab_size", 16384),
                max_source_positions=hf.get("max_source_positions", 1500),
                causal_encoder=hf.get("quantize_causal_encoder", False),
                causal_block_size=hf.get("quantize_causal_block_size"),
            )
        config = WhisperVQConfig(**cfg_kwargs)

    from rstnet_tpu.models.convert import load_torch_state_dict

    state = {}
    for fname in sorted(os.listdir(path)):
        if fname.endswith(".safetensors") or fname == "pytorch_model.bin":
            state.update(load_torch_state_dict(os.path.join(path, fname)))
    if not state:
        raise FileNotFoundError(f"no checkpoint tensors under {path}")
    model = WhisperVQEncoder(config)
    return model, convert_whisper_vq(state, config)
