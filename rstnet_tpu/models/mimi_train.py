"""Trainable Mimi codec (the AudioCodec training pillar).

Capability parity with ``AudioCodec/MimiCodec/models/MimiCodec.py:16-118``:
SEANet encoder (24kHz -> 25Hz with ratios reversed([4,5,6,8])) -> encoder
transformer -> learnt downsample to 12.5Hz -> trainable split RVQ with
cosine-similarity semantic distillation -> upsample -> decoder transformer ->
SEANet decoder; the quantizer-bypass trick decodes unquantized latents for
40% of batch items (``forward:86-88``); ``Semantic_linear_pool`` maps teacher
features (e.g. 50Hz WavLM) to the 12.5Hz latent grid via linear + avgpool.

EMA codebook buffers are explicit state threaded through the train step.
"""

from __future__ import annotations

import dataclasses
import math
from functools import cached_property
from typing import Optional

import jax
import jax.numpy as jnp

from rstnet_tpu.core import Params
from rstnet_tpu.modules.resample import ConvDownsample1d, ConvTrUpsample1d
from rstnet_tpu.modules.seanet import SEANetDecoder, SEANetEncoder
from rstnet_tpu.modules.transformer import ProjectedTransformer, StreamingTransformer
from rstnet_tpu.quantization.trainable import TrainableSplitRVQ


@dataclasses.dataclass(frozen=True)
class TrainableMimiCodec:
    sample_rate: int = 24000
    n_filters: int = 64
    encoder_rates: tuple[int, ...] = (4, 5, 6, 8)
    compress: int = 2
    causal: bool = True
    latent_dim: int = 512
    codebook_size: int = 2048
    codebook_dim: int = 64
    rvq_layers: int = 8
    num_heads: int = 8
    num_layers: int = 8
    layer_scale: float = 0.01
    context: int = 250
    dim_feedforward: int = 2048
    semantic_feature_dim: int = 1024
    target_frame_rate: float = 12.5
    bypass_rate: float = 0.4

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.encoder_rates:
            out *= r
        return out

    @property
    def encoder_frame_rate(self) -> float:
        return self.sample_rate / self.hop_length

    @property
    def resample_stride(self) -> int:
        return int(self.encoder_frame_rate / self.target_frame_rate)

    @cached_property
    def _seanet_kwargs(self) -> dict:
        return dict(
            channels=1, dimension=self.latent_dim, n_filters=self.n_filters,
            n_residual_layers=1, ratios=tuple(self.encoder_rates),
            activation="ELU", compress=self.compress, dilation_base=2,
            disable_norm_outer_blocks=0, kernel_size=7, residual_kernel_size=3,
            last_kernel_size=3, norm="none", pad_mode="constant",
            causal=self.causal, true_skip=True,
        )

    @cached_property
    def encoder(self) -> SEANetEncoder:
        return SEANetEncoder(**self._seanet_kwargs)

    @cached_property
    def decoder(self) -> SEANetDecoder:
        return SEANetDecoder(**self._seanet_kwargs)

    @cached_property
    def _transformer(self) -> ProjectedTransformer:
        inner = StreamingTransformer(
            d_model=self.latent_dim, num_heads=self.num_heads,
            num_layers=self.num_layers, dim_feedforward=self.dim_feedforward,
            causal=self.causal, context=self.context, gating="none",
            norm="layer_norm", positional_embedding="rope",
            layer_scale=self.layer_scale, max_period=10000,
        )
        return ProjectedTransformer(
            inner, input_dimension=self.latent_dim,
            output_dimensions=(self.latent_dim,), conv_layout=True,
        )

    @cached_property
    def downsample(self) -> ConvDownsample1d:
        return ConvDownsample1d(
            self.resample_stride, dimension=self.latent_dim, learnt=True,
            causal=self.causal,
        )

    @cached_property
    def upsample(self) -> ConvTrUpsample1d:
        return ConvTrUpsample1d(
            self.resample_stride, dimension=self.latent_dim, learnt=True,
            causal=self.causal, channel_wise=True,
        )

    @cached_property
    def quantizer(self) -> TrainableSplitRVQ:
        return TrainableSplitRVQ(
            input_dimension=self.latent_dim, dimension=self.codebook_dim,
            bins=self.codebook_size, n_q=self.rvq_layers, n_q_semantic=1,
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> tuple[Params, Params]:
        """-> (params, buffers) — buffers are the EMA codebook stats."""
        keys = jax.random.split(key, 9)
        qp, qb = self.quantizer.init(keys[6], dtype)
        bound = 1.0 / math.sqrt(self.semantic_feature_dim)
        params: Params = {
            "encoder": self.encoder.init(keys[0], dtype),
            "decoder": self.decoder.init(keys[1], dtype),
            "encoder_transformer": self._transformer.init(keys[2], dtype),
            "decoder_transformer": self._transformer.init(keys[3], dtype),
            "downsample": self.downsample.init(keys[4], dtype),
            "upsample": self.upsample.init(keys[5], dtype),
            "quantizer": qp,
            "semantic_mapping": {
                "weight": jax.random.uniform(
                    keys[7], (self.latent_dim, self.semantic_feature_dim), dtype,
                    -bound, bound,
                ),
                "bias": jnp.zeros((self.latent_dim,), dtype),
            },
        }
        return params, {"quantizer": qb}

    # -- semantic feature mapping (Semantic_linear_pool, MimiCodec.py:16-24) ---

    def map_semantic(self, params: Params, features: jax.Array) -> jax.Array:
        """[B, T50, feat_dim] teacher features -> [B, T12.5, latent] via
        linear + AvgPool1d(kernel=8, stride=4) (50Hz -> 12.5Hz grid)."""
        sm = params["semantic_mapping"]
        h = features @ sm["weight"].T.astype(features.dtype) + sm["bias"].astype(features.dtype)
        h = jnp.swapaxes(h, 1, 2)  # [B, C, T]
        T = h.shape[-1]
        n = (T - 8) // 4 + 1
        idx = jnp.arange(n)[:, None] * 4 + jnp.arange(8)[None, :]
        pooled = jnp.mean(h[..., idx], axis=-1)
        return jnp.swapaxes(pooled, 1, 2)  # [B, T', C]

    # -- encode/decode -----------------------------------------------------------

    def encode_to_latent(self, params: Params, audio: jax.Array) -> jax.Array:
        """[B, 1, T] -> [B, T', C] latents at target_frame_rate."""
        z = self.encoder(params["encoder"], audio)
        (z,) = self._transformer(params["encoder_transformer"], z)
        z = self.downsample(params["downsample"], z)
        return jnp.swapaxes(z, 1, 2)

    def decode_from_latent(self, params: Params, z: jax.Array) -> jax.Array:
        """[B, T', C] -> [B, 1, T] audio."""
        z = jnp.swapaxes(z, 1, 2)
        z = self.upsample(params["upsample"], z)
        (z,) = self._transformer(params["decoder_transformer"], z)
        return self.decoder(params["decoder"], z)

    def encode(self, params: Params, buffers: Params, audio: jax.Array) -> jax.Array:
        z = self.encode_to_latent(params, audio)
        codes = self.quantizer.encode(params["quantizer"], buffers["quantizer"], z)
        return jnp.swapaxes(codes, 1, 2)  # [B, K, T]

    def decode(self, params: Params, buffers: Params, codes: jax.Array) -> jax.Array:
        z = self.quantizer.decode(
            params["quantizer"], buffers["quantizer"], jnp.swapaxes(codes, 1, 2)
        )
        return self.decode_from_latent(params, z)

    # -- training forward ----------------------------------------------------------

    def __call__(
        self,
        params: Params,
        buffers: Params,
        audio: jax.Array,
        semantic_features: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        update_codebooks: bool = True,
        axis_name: Optional[str] = None,
    ):
        """-> (reconstruction [B,1,T], codes, commit_loss, sim_loss,
        new_buffers). 40% of batch items bypass quantization
        (``MimiCodec.py:86-88``)."""
        length = audio.shape[-1]
        z = self.encode_to_latent(params, audio)
        sem = (
            self.map_semantic(params, semantic_features)
            if semantic_features is not None
            else None
        )
        k_bypass, k_vq = (
            jax.random.split(key) if key is not None else (None, None)
        )
        zq, codes, commit, sim_loss, new_buffers = self.quantizer.forward(
            params["quantizer"], buffers["quantizer"], z, sem, k_vq,
            update=update_codebooks, axis_name=axis_name,
        )
        if k_bypass is not None and self.bypass_rate > 0:
            keep = jax.random.uniform(k_bypass, (audio.shape[0], 1, 1)) >= self.bypass_rate
            zq = jnp.where(keep, zq, z)
        rec = self.decode_from_latent(params, zq)
        codes = jnp.swapaxes(codes, 1, 2)  # [B, K, T'], same layout as encode()
        return rec[..., :length], codes, commit, sim_loss, {"quantizer": new_buffers}
