"""Trainable residual VQ with EMA codebooks (codec training path).

Capability parity with the quantizer the codec trainer uses
(``AudioCodec/MimiCodec/quantization/vq_dc.py:16-197`` — a
vector-quantize-pytorch ResidualVQ with shared input/output projections to a
small codebook space, EMA decay 0.9, commitment weight, dead-code threshold)
plus the from-scratch distributed EuclideanCodebook semantics of
``AudioCodec/MimiCodec/quantization/core_vq.py`` (EMA stats all-reduced
across data-parallel replicas -> ``psum``; expired codes replaced from batch
samples).

Everything is functional: ``forward`` returns (quantized-with-STE, codes,
commit_loss, new_buffers). Buffers (EMA stats) are carried through the train
step like optimizer state — no module mutation.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from rstnet_tpu.core import Params


@dataclasses.dataclass(frozen=True)
class TrainableResidualVQ:
    dim: int  # input/output dimension (shared projections)
    codebook_dim: int
    codebook_size: int
    num_quantizers: int
    decay: float = 0.9
    epsilon: float = 1e-5
    commitment_weight: float = 1.0
    threshold_ema_dead_code: float = 2.0

    def init(self, key: jax.Array, dtype=jnp.float32) -> tuple[Params, Params]:
        """-> (params, buffers). Params hold the projections (trainable);
        buffers hold the EMA codebook stats (non-trainable)."""
        k1, k2, k3 = jax.random.split(key, 3)
        bound_in = 1.0 / math.sqrt(self.dim)
        bound_out = 1.0 / math.sqrt(self.codebook_dim)
        params: Params = {}
        if self.codebook_dim != self.dim:
            params["project_in"] = jax.random.uniform(
                k1, (self.codebook_dim, self.dim), dtype, -bound_in, bound_in
            )
            params["project_out"] = jax.random.uniform(
                k2, (self.dim, self.codebook_dim), dtype, -bound_out, bound_out
            )
        embed = jax.random.normal(
            k3, (self.num_quantizers, self.codebook_size, self.codebook_dim), dtype
        )
        buffers: Params = {
            "embed_avg": embed,
            "cluster_size": jnp.ones((self.num_quantizers, self.codebook_size), dtype),
        }
        return params, buffers

    def _embed(self, buffers: Params) -> jax.Array:
        usage = jnp.clip(buffers["cluster_size"], self.epsilon, None)
        return buffers["embed_avg"] / usage[..., None]

    def _project_in(self, params, x):
        if "project_in" in params:
            return x @ params["project_in"].T
        return x

    def _project_out(self, params, q):
        if "project_out" in params:
            return q @ params["project_out"].T
        return q

    def forward(
        self,
        params: Params,
        buffers: Params,
        x: jax.Array,
        key: Optional[jax.Array] = None,
        update: bool = True,
        axis_name: Optional[str] = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array, Params]:
        """x: [B, T, dim] -> (quantized [B, T, dim] with straight-through
        gradients, codes [B, T, Q], commit_loss scalar, new_buffers)."""
        B, T, _ = x.shape
        h = self._project_in(params, x)
        flat = h.reshape(-1, self.codebook_dim)
        embeds = self._embed(buffers)

        residual = h
        quantized_total = jnp.zeros_like(h)
        codes = []
        commit = 0.0
        new_avg = []
        new_size = []
        keys = (
            jax.random.split(key, self.num_quantizers)
            if key is not None
            else [None] * self.num_quantizers
        )
        for q in range(self.num_quantizers):
            emb = embeds[q].astype(jnp.float32)
            r_flat = residual.reshape(-1, self.codebook_dim).astype(jnp.float32)
            d = jnp.sum(jnp.square(emb), -1)[None] - 2.0 * (r_flat @ emb.T)
            idx = jnp.argmin(d, axis=-1)
            quant = jnp.take(embeds[q], idx, axis=0).reshape(B, T, self.codebook_dim)
            commit = commit + jnp.mean(
                jnp.square(residual - lax.stop_gradient(quant))
            )
            # straight-through per layer (vqp semantics)
            quant_ste = residual + lax.stop_gradient(quant - residual)
            quantized_total = quantized_total + quant_ste
            codes.append(idx.reshape(B, T))

            if update:
                one_hot = jax.nn.one_hot(idx, self.codebook_size, dtype=jnp.float32)
                counts = jnp.sum(one_hot, 0)
                sums = one_hot.T @ r_flat
                if axis_name is not None:
                    counts = lax.psum(counts, axis_name)
                    sums = lax.psum(sums, axis_name)
                size = buffers["cluster_size"][q] * self.decay + counts * (1 - self.decay)
                avg = buffers["embed_avg"][q] * self.decay + sums.astype(
                    buffers["embed_avg"].dtype
                ) * (1 - self.decay)
                if keys[q] is not None:
                    # dead-code replacement: EMA usage below threshold gets a
                    # random vector from THIS layer's residual inputs (vqp
                    # expiry semantics — deeper layers see much smaller-norm
                    # residuals than the layer-0 input, so sampling from
                    # layer 0 would park dead codes far from every residual
                    # and they would never recover); all replicas share the key
                    dead = size < self.threshold_ema_dead_code
                    ridx = jax.random.randint(
                        keys[q], (self.codebook_size,), 0, r_flat.shape[0]
                    )
                    samples = jnp.take(lax.stop_gradient(r_flat), ridx, axis=0)
                    avg = jnp.where(
                        dead[:, None],
                        samples.astype(avg.dtype) * self.threshold_ema_dead_code,
                        avg,
                    )
                    size = jnp.where(
                        dead, jnp.full_like(size, self.threshold_ema_dead_code), size
                    )
                new_size.append(size)
                new_avg.append(avg)
            residual = residual - lax.stop_gradient(quant)

        new_buffers = buffers
        if update:
            new_buffers = {
                "embed_avg": jnp.stack(new_avg),
                "cluster_size": jnp.stack(new_size),
            }
        out = self._project_out(params, quantized_total)
        return out, jnp.stack(codes, -1), commit / self.num_quantizers, new_buffers

    def encode(self, params: Params, buffers: Params, x: jax.Array) -> jax.Array:
        q, codes, _, _ = self.forward(params, buffers, x, update=False)
        return codes

    def decode(self, params: Params, buffers: Params, codes: jax.Array) -> jax.Array:
        """codes [B, T, Q] -> [B, T, dim]."""
        embeds = self._embed(buffers)
        total = 0.0
        for q in range(self.num_quantizers):
            total = total + jnp.take(embeds[q], codes[..., q], axis=0)
        return self._project_out(params, total)


@dataclasses.dataclass(frozen=True)
class TrainableSplitRVQ:
    """1 semantic + (n_q-1) acoustic trainable RVQ with cosine-similarity
    semantic distillation (``vq_dc.py:16-197``)."""

    input_dimension: int = 512
    dimension: int = 64  # codebook space
    bins: int = 2048
    n_q: int = 8
    n_q_semantic: int = 1
    decay: float = 0.9

    @property
    def rvq_first(self) -> TrainableResidualVQ:
        return TrainableResidualVQ(
            self.input_dimension, self.dimension, self.bins, self.n_q_semantic,
            decay=self.decay,
        )

    @property
    def rvq_rest(self) -> TrainableResidualVQ:
        return TrainableResidualVQ(
            self.input_dimension, self.dimension, self.bins,
            self.n_q - self.n_q_semantic, decay=self.decay,
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> tuple[Params, Params]:
        k1, k2 = jax.random.split(key)
        p1, b1 = self.rvq_first.init(k1, dtype)
        p2, b2 = self.rvq_rest.init(k2, dtype)
        return {"rvq_first": p1, "rvq_rest": p2}, {"rvq_first": b1, "rvq_rest": b2}

    @staticmethod
    def cosine_similarity_loss(feature: jax.Array, target: jax.Array) -> jax.Array:
        """-log sigmoid(cos_sim over the *time* axis) (``vq_dc.py:85-92``)."""
        n = min(feature.shape[1], target.shape[1])
        a = feature[:, :n].astype(jnp.float32)
        b = target[:, :n].astype(jnp.float32)
        num = jnp.sum(a * b, axis=1)
        den = jnp.linalg.norm(a, axis=1) * jnp.linalg.norm(b, axis=1) + 1e-8
        cos = num / den  # [B, D]
        return -jnp.mean(jax.nn.log_sigmoid(cos))

    def forward(
        self,
        params: Params,
        buffers: Params,
        x: jax.Array,
        semantic_features: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        update: bool = True,
        axis_name: Optional[str] = None,
    ):
        """x: [B, T, C] -> (quantized, codes [B, T, n_q], commit, sim_loss,
        new_buffers)."""
        k1, k2 = jax.random.split(key) if key is not None else (None, None)
        q_sem, c_sem, commit_sem, nb1 = self.rvq_first.forward(
            params["rvq_first"], buffers["rvq_first"], x, k1, update, axis_name
        )
        sim_loss = (
            self.cosine_similarity_loss(q_sem, semantic_features)
            if semantic_features is not None
            else jnp.zeros(())
        )
        q_ac, c_ac, commit_ac, nb2 = self.rvq_rest.forward(
            params["rvq_rest"], buffers["rvq_rest"], x, k2, update, axis_name
        )
        quantized = q_sem + q_ac
        codes = jnp.concatenate([c_sem, c_ac], axis=-1)
        n_sem, n_ac = self.n_q_semantic, self.n_q - self.n_q_semantic
        commit = (commit_sem * n_sem + commit_ac * n_ac) / self.n_q
        return quantized, codes, commit, sim_loss, {"rvq_first": nb1, "rvq_rest": nb2}

    def encode(self, params: Params, buffers: Params, x: jax.Array) -> jax.Array:
        _, codes, _, _, _ = self.forward(params, buffers, x, update=False)
        return codes

    def decode(self, params: Params, buffers: Params, codes: jax.Array) -> jax.Array:
        q = self.rvq_first.decode(
            params["rvq_first"], buffers["rvq_first"], codes[..., : self.n_q_semantic]
        )
        if codes.shape[-1] > self.n_q_semantic:
            q = q + self.rvq_rest.decode(
                params["rvq_rest"], buffers["rvq_rest"], codes[..., self.n_q_semantic :]
            )
        return q
