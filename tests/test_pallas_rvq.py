"""Pallas RVQ encode kernel: math parity via the interpreter + fallback."""

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.ops import pallas_rvq


def test_fallback_matches_reference_rvq():
    """The jnp fallback agrees with the quantization module's scan encode."""
    from rstnet_tpu.quantization.rvq import ResidualVectorQuantizer

    rvq = ResidualVectorQuantizer(dimension=32, n_q=4, bins=64)
    params = rvq.init(jax.random.PRNGKey(0))
    # randomize the codebooks
    params["layers"]["embedding_sum"] = jax.random.normal(
        jax.random.PRNGKey(1), params["layers"]["embedding_sum"].shape
    )
    params["layers"]["cluster_usage"] = jnp.ones_like(params["layers"]["cluster_usage"])
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 10))  # [B, C, T]
    codes_ref = rvq.encode(params, x)  # [B, K, T]

    codebooks = params["layers"]["embedding_sum"] / jnp.clip(
        params["layers"]["cluster_usage"], 1e-5, None
    )[..., None]
    flat = jnp.swapaxes(x, 1, 2).reshape(-1, 32)
    codes_flat, quant = pallas_rvq.rvq_encode(flat, codebooks, use_pallas=False)
    codes_mine = codes_flat.reshape(2, 10, 4).transpose(0, 2, 1)
    np.testing.assert_array_equal(np.asarray(codes_mine), np.asarray(codes_ref))


def test_kernel_interpret_mode_matches_fallback(monkeypatch):
    """Run the actual Pallas kernel in interpreter mode on CPU."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pallas_rvq.pl, "pallas_call", interp_call)
    Q, K, D = 3, 256, 128
    codebooks = jax.random.normal(jax.random.PRNGKey(0), (Q, K, D))
    x = jax.random.normal(jax.random.PRNGKey(1), (100, D))
    codes_k, quant_k = pallas_rvq.rvq_encode_pallas(x, codebooks, block_n=128)
    codes_f, quant_f = pallas_rvq.rvq_encode(x, codebooks, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(codes_k), np.asarray(codes_f))
    np.testing.assert_allclose(np.asarray(quant_k), np.asarray(quant_f), atol=1e-4)
