"""Mimi streaming audio codec: SEANet + transformers + split RVQ.

Capability parity with ``MLLM_v2/moshi/models/compression.py:102-425``
(MimiModel) using the canonical hyperparameters of
``moshi/models/loaders.py:24-66``: 24 kHz mono -> SEANet encoder (hop 960,
ratios [8,6,5,4]) -> 8-layer transformer -> learnt conv downsample x2 ->
split RVQ (1 semantic + N-1 acoustic, 2048 bins) at 12.5 Hz, and the mirror
decode path. Offline and 80 ms-chunk streaming execution share weights; the
streaming step is a single jit-compiled function over explicit state.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Optional

import jax
import jax.numpy as jnp

from rstnet_tpu.core import Params, State
from rstnet_tpu.modules.resample import ConvDownsample1d, ConvTrUpsample1d
from rstnet_tpu.modules.seanet import SEANetDecoder, SEANetEncoder
from rstnet_tpu.modules.transformer import ProjectedTransformer, StreamingTransformer
from rstnet_tpu.quantization.rvq import SplitResidualVectorQuantizer


@dataclasses.dataclass(frozen=True)
class MimiModel:
    encoder: SEANetEncoder
    decoder: SEANetDecoder
    encoder_transformer: ProjectedTransformer
    decoder_transformer: ProjectedTransformer
    quantizer: SplitResidualVectorQuantizer
    frame_rate: float = 12.5
    encoder_frame_rate: float = 25.0
    sample_rate: int = 24000
    channels: int = 1
    causal: bool = True
    num_codebooks: int = 8

    @property
    def resample_stride(self) -> int:
        stride = self.encoder_frame_rate / self.frame_rate
        assert stride == int(stride)
        return int(stride)

    @property
    def needs_resample(self) -> bool:
        return self.encoder_frame_rate != self.frame_rate

    @cached_property
    def downsample(self) -> Optional[ConvDownsample1d]:
        if not self.needs_resample:
            return None
        return ConvDownsample1d(
            self.resample_stride, dimension=self.encoder.dimension,
            learnt=True, causal=self.causal,
        )

    @cached_property
    def upsample(self) -> Optional[ConvTrUpsample1d]:
        if not self.needs_resample:
            return None
        # channel_wise=True reproduces the reference's
        # ``upsample_channel_wise_bug`` (compression.py:118-119,214-220).
        return ConvTrUpsample1d(
            self.resample_stride, dimension=self.encoder.dimension,
            learnt=True, causal=self.causal, channel_wise=True,
        )

    @property
    def frame_size(self) -> int:
        """Samples per token frame (1920 = 80 ms at 24 kHz)."""
        return int(self.sample_rate / self.frame_rate)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, 7)
        p: Params = {
            "encoder": self.encoder.init(keys[0], dtype),
            "decoder": self.decoder.init(keys[1], dtype),
            "encoder_transformer": self.encoder_transformer.init(keys[2], dtype),
            "decoder_transformer": self.decoder_transformer.init(keys[3], dtype),
            "quantizer": self.quantizer.init(keys[4], dtype),
        }
        if self.downsample is not None:
            p["downsample"] = self.downsample.init(keys[5], dtype)
            p["upsample"] = self.upsample.init(keys[6], dtype)
        return p

    # -- offline ------------------------------------------------------------

    def encode_to_latent(self, params: Params, x: jax.Array) -> jax.Array:
        """[B, C, T] audio -> [B, D, T'] unquantized latents at frame_rate."""
        emb = self.encoder(params["encoder"], x)
        (emb,) = self.encoder_transformer(params["encoder_transformer"], emb)
        if self.downsample is not None:
            emb = self.downsample(params["downsample"], emb)
        return emb

    def encode(self, params: Params, x: jax.Array) -> jax.Array:
        """[B, C, T] audio -> [B, K, T'] integer codes."""
        emb = self.encode_to_latent(params, x)
        return self.quantizer.encode(params["quantizer"], emb, self.num_codebooks)

    def decode_latent(self, params: Params, codes: jax.Array) -> jax.Array:
        return self.quantizer.decode(params["quantizer"], codes)

    def decode(self, params: Params, codes: jax.Array) -> jax.Array:
        """[B, K, T'] codes -> [B, C, T] audio."""
        emb = self.decode_latent(params, codes)
        if self.upsample is not None:
            emb = self.upsample(params["upsample"], emb)
        (emb,) = self.decoder_transformer(params["decoder_transformer"], emb)
        return self.decoder(params["decoder"], emb)

    def roundtrip(self, params: Params, x: jax.Array) -> jax.Array:
        out = self.decode(params, self.encode(params, x))
        return out[..., : x.shape[-1]]

    # -- streaming ----------------------------------------------------------

    def init_encode_state(
        self, batch_size: int, dtype=jnp.float32, chunk_frames: int = 1
    ) -> State:
        """``chunk_frames``: max whole codec frames fed per ``encode_step``
        call (>1 for the serving catch-up path that encodes a buffered
        block in one dispatch); sizes the transformer ring accordingly."""
        per_frame = self.resample_stride if self.needs_resample else 1
        s = {
            "encoder": self.encoder.init_state(batch_size, dtype),
            "encoder_transformer": self.encoder_transformer.init_state(
                batch_size, dtype, chunk_size=per_frame * chunk_frames
            ),
        }
        if self.downsample is not None:
            s["downsample"] = self.downsample.init_state(batch_size, dtype)
        return s

    def init_decode_state(
        self, batch_size: int, dtype=jnp.float32, chunk_frames: int = 1
    ) -> State:
        per_frame = self.resample_stride if self.needs_resample else 1
        s = {
            "decoder": self.decoder.init_state(batch_size, dtype),
            "decoder_transformer": self.decoder_transformer.init_state(
                batch_size, dtype, chunk_size=per_frame * chunk_frames
            ),
        }
        if self.upsample is not None:
            s["upsample"] = self.upsample.init_state(batch_size, dtype)
        return s

    @property
    def _transformer_steps_per_frame(self) -> int:
        """Codec-transformer positions consumed per 12.5 Hz frame."""
        return self.resample_stride if self.needs_resample else 1

    def _session_min_pos(self, tr_state: State, session_age) -> Optional[jax.Array]:
        """Global transformer position where each slot's session started.

        ``session_age`` [B]: codec frames each slot has already processed
        (multi-session batched serving). Keys written before a slot joined
        fall below its floor and are masked out of attention."""
        if session_age is None:
            return None
        return tr_state["offset"] - session_age * self._transformer_steps_per_frame

    def encode_step(
        self, params: Params, state: State, x: jax.Array, session_age=None
    ) -> tuple[jax.Array, State]:
        """One streaming chunk: [B, C, frame_size*n] -> [B, K, n] codes.

        ``session_age`` ([B] int32, optional): per-slot frame count for
        multi-session batched serving (see ``reset_encode_slots``)."""
        new_state = dict(state)
        emb, new_state["encoder"] = self.encoder.step(
            params["encoder"], state["encoder"], x
        )
        (emb,), new_state["encoder_transformer"] = self.encoder_transformer.step(
            params["encoder_transformer"], state["encoder_transformer"], emb,
            min_pos=self._session_min_pos(state["encoder_transformer"], session_age),
        )
        if self.downsample is not None:
            emb, new_state["downsample"] = self.downsample.step(
                params["downsample"], state["downsample"], emb
            )
        codes = self.quantizer.encode(params["quantizer"], emb, self.num_codebooks)
        return codes, new_state

    def decode_step(
        self, params: Params, state: State, codes: jax.Array, session_age=None
    ) -> tuple[jax.Array, State]:
        """One streaming chunk: [B, K, n] codes -> [B, C, frame_size*n].

        ``session_age`` ([B] int32, optional): per-slot frame count for
        multi-session batched serving (see ``reset_decode_slots``)."""
        new_state = dict(state)
        emb = self.decode_latent(params, codes)
        if self.upsample is not None:
            emb, new_state["upsample"] = self.upsample.step(
                params["upsample"], state["upsample"], emb
            )
        (emb,), new_state["decoder_transformer"] = self.decoder_transformer.step(
            params["decoder_transformer"], state["decoder_transformer"], emb,
            min_pos=self._session_min_pos(state["decoder_transformer"], session_age),
        )
        out, new_state["decoder"] = self.decoder.step(
            params["decoder"], state["decoder"], emb
        )
        return out, new_state

    # -- multi-session slot management (batched serving) --------------------

    @staticmethod
    def _zero_slot_rows(tree: State, slots: jax.Array) -> State:
        """Reset batch rows of conv/resample carries to their fresh-stream
        values (axis 0 = batch): carries zero (== fresh causal padding for
        constant pad mode) and ``first`` flags True (replicate/reflect pad
        modes re-derive the left pad from the slot's first chunk)."""

        def walk(node, name=""):
            if isinstance(node, dict):
                return {k: walk(v, k) for k, v in node.items()}
            if isinstance(node, (list, tuple)):
                return type(node)(walk(v, name) for v in node)
            if name == "first":
                return node.at[slots].set(True)
            if node.ndim >= 1:
                return node.at[slots].set(0)
            return node

        return walk(tree)

    def reset_encode_slots(self, state: State, slots) -> State:
        """Reset batch slots of a streaming encode state for new sessions.

        Conv/resample carries are zeroed per slot (== fresh causal pad); the
        encoder transformer's ring KV needs no clearing because the per-slot
        ``session_age`` floor passed to ``encode_step`` masks stale keys.
        """
        slots = jnp.asarray(slots, jnp.int32)
        new_state = dict(state)
        new_state["encoder"] = self._zero_slot_rows(state["encoder"], slots)
        if "downsample" in state:
            new_state["downsample"] = self._zero_slot_rows(state["downsample"], slots)
        return new_state

    def reset_decode_slots(self, state: State, slots) -> State:
        """Reset batch slots of a streaming decode state for new sessions."""
        slots = jnp.asarray(slots, jnp.int32)
        new_state = dict(state)
        new_state["decoder"] = self._zero_slot_rows(state["decoder"], slots)
        if "upsample" in state:
            new_state["upsample"] = self._zero_slot_rows(state["upsample"], slots)
        return new_state

    @staticmethod
    def _mask_slot_rows(tree: State, mask: jax.Array) -> State:
        """Boolean-mask variant of ``_zero_slot_rows`` (mask [B], True =
        reset that slot): traceable inside jit with no dynamic indices, so
        a fused serving step can reset slots the moment their first valid
        frame arrives without a separate host-triggered dispatch."""

        def walk(node, name=""):
            if isinstance(node, dict):
                return {k: walk(v, k) for k, v in node.items()}
            if isinstance(node, (list, tuple)):
                return type(node)(walk(v, name) for v in node)
            if name == "first":
                return jnp.where(mask, True, node)
            if node.ndim >= 1:
                m = mask.reshape((-1,) + (1,) * (node.ndim - 1))
                return jnp.where(m, jnp.zeros((), node.dtype), node)
            return node

        return walk(tree)

    def mask_decode_slots(self, state: State, mask: jax.Array) -> State:
        """Reset decode slots where ``mask`` [B] is True (jit-traceable;
        same semantics as ``reset_decode_slots`` on the True indices)."""
        new_state = dict(state)
        new_state["decoder"] = self._mask_slot_rows(state["decoder"], mask)
        if "upsample" in state:
            new_state["upsample"] = self._mask_slot_rows(state["upsample"], mask)
        return new_state


def mimi_24k(
    num_codebooks: int = 8,
    n_q_total: int = 32,
    dimension: int = 512,
    n_filters: int = 64,
    num_layers: int = 8,
    d_model: Optional[int] = None,
    quantizer_dim: int = 256,
    bins: int = 2048,
) -> MimiModel:
    """The canonical Mimi configuration (``moshi/models/loaders.py:24-66``):
    SEANet dim 512 / 64 filters / ratios [8,6,5,4] / causal constant-pad,
    8-layer rope transformer with layer_scale 0.01 and context 250,
    split RVQ with 32 trained codebooks (8 active), 2048 bins each."""
    d_model = d_model or dimension
    seanet = dict(
        channels=1, dimension=dimension, n_filters=n_filters,
        n_residual_layers=1, ratios=(8, 6, 5, 4), activation="ELU",
        kernel_size=7, residual_kernel_size=3, last_kernel_size=3,
        dilation_base=2, compress=2, causal=True, pad_mode="constant",
        true_skip=True, norm="none", disable_norm_outer_blocks=0,
    )
    transformer = StreamingTransformer(
        d_model=d_model, num_heads=8, num_layers=num_layers,
        dim_feedforward=2048 * d_model // 512, causal=True, context=250,
        gating="none", norm="layer_norm", positional_embedding="rope",
        layer_scale=0.01, max_period=10000, activation="gelu",
    )
    proj = lambda: ProjectedTransformer(  # noqa: E731
        transformer, input_dimension=dimension, output_dimensions=(dimension,),
        conv_layout=True,
    )
    quantizer = SplitResidualVectorQuantizer(
        dimension=quantizer_dim, input_dimension=dimension,
        output_dimension=dimension, n_q=n_q_total, n_q_semantic=1, bins=bins,
    )
    return MimiModel(
        encoder=SEANetEncoder(**seanet),
        decoder=SEANetDecoder(**seanet),
        encoder_transformer=proj(),
        decoder_transformer=proj(),
        quantizer=quantizer,
        frame_rate=12.5,
        encoder_frame_rate=24000 / 960,
        sample_rate=24000,
        channels=1,
        causal=True,
        num_codebooks=num_codebooks,
    )
