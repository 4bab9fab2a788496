"""Euclidean codebook with EMA statistics.

Capability parity with ``MLLM_v2/moshi/quantization/core_vq.py:91-319`` and
the trainable variant ``AudioCodec/MimiCodec/quantization/core_vq.py``:
the codebook is derived from EMA buffers ``embedding_sum / cluster_usage``;
nearest-neighbor search is an argmin over L2 distances (computed as one
matmul on the MXU); training updates are **pure functions** returning new
buffer pytrees, with cross-replica synchronization expressed as a ``psum``
over the data axis instead of NCCL all_reduce (``core_vq.py:45-81``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from rstnet_tpu.core import Params


@dataclasses.dataclass(frozen=True)
class EuclideanCodebook:
    dim: int
    codebook_size: int
    decay: float = 0.99
    epsilon: float = 1e-5
    threshold_usage_ratio: float = 0.1
    replaced_usage_ratio: float = 1.0

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        del key
        return {
            "embedding_sum": jnp.zeros((self.codebook_size, self.dim), dtype),
            "cluster_usage": jnp.ones((self.codebook_size,), dtype),
            "initialized": jnp.zeros((), jnp.float32),
        }

    def embedding(self, params: Params) -> jax.Array:
        usage = jnp.clip(params["cluster_usage"], self.epsilon, None)
        return params["embedding_sum"] / usage[:, None]

    def quantize(self, params: Params, x: jax.Array) -> jax.Array:
        """Nearest-centroid indices for ``x: [..., D]`` (f32 distances)."""
        emb = self.embedding(params).astype(jnp.float32)
        flat = x.reshape(-1, self.dim).astype(jnp.float32)
        # ||x - e||^2 = ||x||^2 - 2 x.e + ||e||^2 ; ||x||^2 constant per row.
        dots = flat @ emb.T
        e_sq = jnp.sum(jnp.square(emb), axis=-1)
        codes = jnp.argmin(e_sq[None, :] - 2.0 * dots, axis=-1)
        return codes.reshape(x.shape[:-1])

    encode = quantize

    def decode(self, params: Params, codes: jax.Array) -> jax.Array:
        return jnp.take(self.embedding(params), codes, axis=0)

    # -- training -----------------------------------------------------------

    def ema_update(
        self,
        params: Params,
        x: jax.Array,
        codes: jax.Array,
        axis_name: str | None = None,
    ) -> tuple[Params, dict]:
        """One EMA step of the codebook buffers from assigned vectors.

        x: [N, D] flat inputs; codes: [N] assignments. When ``axis_name``
        is set, batch statistics are summed across that mesh axis first
        (replaces the reference's dist.all_reduce of EMA stats).
        """
        one_hot = jax.nn.one_hot(codes, self.codebook_size, dtype=jnp.float32)
        usage = jnp.sum(one_hot, axis=0)
        embed_sum = one_hot.T @ x.astype(jnp.float32)
        if axis_name is not None:
            usage = lax.psum(usage, axis_name)
            embed_sum = lax.psum(embed_sum, axis_name)
        d = self.decay
        new = dict(params)
        new["cluster_usage"] = params["cluster_usage"] * d + usage * (1 - d)
        new["embedding_sum"] = params["embedding_sum"] * d + embed_sum * (1 - d)
        entropy = _normalized_entropy(new["cluster_usage"], self.codebook_size)
        return new, {"rvq_entropy": entropy}

    def replace_expired(
        self, params: Params, samples: jax.Array, key: jax.Array
    ) -> tuple[Params, jax.Array]:
        """Replace under-used centroids with random batch samples
        (reference ``core_vq.py:211-242``). Pure; all replicas must pass the
        same key so their decisions agree."""
        usage = params["cluster_usage"]
        threshold = self.threshold_usage_ratio * jnp.sum(usage) / self.codebook_size
        expired = usage < threshold
        new_vectors = _sample_vectors(samples, self.codebook_size, key)
        replace_usage = self.replaced_usage_ratio * jnp.sum(usage) / self.codebook_size
        new = dict(params)
        new["embedding_sum"] = jnp.where(
            expired[:, None], replace_usage * new_vectors, params["embedding_sum"]
        )
        new["cluster_usage"] = jnp.where(expired, replace_usage, usage)
        return new, jnp.mean(expired.astype(jnp.float32))

    def kmeans_init(
        self, params: Params, samples: jax.Array, key: jax.Array, num_iters: int = 50
    ) -> Params:
        """Initialize the codebook with k-means over ``samples: [N, D]``
        if not yet initialized (reference ``core_vq.py:63-83,178-204``)."""

        def do_init(p):
            means, bins = _kmeans(samples, self.codebook_size, key, num_iters)
            return {
                "embedding_sum": means * bins[:, None],
                "cluster_usage": bins,
                "initialized": jnp.ones((), jnp.float32),
            }

        return lax.cond(params["initialized"] > 0, lambda p: p, do_init, params)


def _normalized_entropy(usage: jax.Array, size: int) -> jax.Array:
    proba = usage / jnp.sum(usage)
    p_log_p = jnp.where(proba == 0, 0.0, proba * jnp.log(proba))
    return -jnp.sum(p_log_p) / jnp.log(float(size))


def _sample_vectors(samples: jax.Array, num: int, key: jax.Array) -> jax.Array:
    n = samples.shape[0]
    idx = jax.random.randint(key, (num,), 0, n)
    return jnp.take(samples, idx, axis=0)


def _kmeans(
    samples: jax.Array, num_clusters: int, key: jax.Array, num_iters: int
) -> tuple[jax.Array, jax.Array]:
    k1, k2 = jax.random.split(key)
    means = _sample_vectors(samples, num_clusters, k1)
    resample = _sample_vectors(samples, num_clusters, k2)
    dim = samples.shape[-1]

    def body(_, carry):
        means, _ = carry
        d = (
            jnp.sum(jnp.square(means), -1)[None, :]
            - 2.0 * samples @ means.T
        )
        buckets = jnp.argmin(d, axis=-1)
        one_hot = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype)
        bins = jnp.sum(one_hot, axis=0)
        new_means = (one_hot.T @ samples) / jnp.clip(bins, 1, None)[:, None]
        means = jnp.where((bins == 0)[:, None], resample, new_means)
        return means, jnp.clip(bins, 1, None)

    means, bins = lax.fori_loop(
        0, num_iters, body, (means, jnp.ones((num_clusters,), samples.dtype))
    )
    return means, bins
