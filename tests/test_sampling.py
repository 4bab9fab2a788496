"""Sampling tests (parity with the reference's own statistical self-test,
``utils/sampling.py:157-175``)."""

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.ops.sampling import sample_token, sample_top_k, sample_top_p


def test_multinomial_distribution():
    ps = jnp.asarray([5.0, 2.0, 12.0, 6.0, 8.0, 1.0, 0.0, 4.0])
    logits = jnp.log(jnp.maximum(ps, 1e-9))
    keys = jax.random.split(jax.random.PRNGKey(1234), 2000)
    toks = jax.vmap(lambda k: sample_token(k, logits, True, 1.0))(keys)
    counts = np.bincount(np.asarray(toks), minlength=8)
    emp = counts / counts.sum()
    ref = np.asarray(ps / ps.sum())
    assert np.abs(emp - ref).max() < 1.5e-2
    assert counts[6] == 0  # zero-probability token never sampled


def test_top_k_restricts_support():
    probs = jnp.asarray([[0.4, 0.3, 0.2, 0.05, 0.03, 0.02]])
    keys = jax.random.split(jax.random.PRNGKey(0), 500)
    toks = jax.vmap(lambda k: sample_top_k(k, probs, 2, approx=False))(keys)
    assert set(np.asarray(toks).ravel().tolist()) <= {0, 1}


def test_top_p_restricts_support():
    probs = jnp.asarray([[0.5, 0.3, 0.1, 0.05, 0.05]])
    keys = jax.random.split(jax.random.PRNGKey(0), 500)
    toks = jax.vmap(lambda k: sample_top_p(k, probs, 0.8))(keys)
    # nucleus: cumsum - p_i <= 0.8 keeps {0, 1, 2}
    assert set(np.asarray(toks).ravel().tolist()) <= {0, 1, 2}


def test_greedy_and_max_card():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 9.0]])
    tok = sample_token(jax.random.PRNGKey(0), logits, use_sampling=False)
    assert int(tok[0]) == 3
    tok = sample_token(
        jax.random.PRNGKey(0), logits, use_sampling=False, max_card=3
    )
    assert int(tok[0]) == 1  # id 3 banned -> argmax over first 3


def test_temperature_sharpens():
    logits = jnp.asarray([2.0, 1.0, 0.0])
    keys = jax.random.split(jax.random.PRNGKey(7), 1000)
    cold = jax.vmap(lambda k: sample_token(k, logits, True, 0.1))(keys)
    hot = jax.vmap(lambda k: sample_token(k, logits, True, 5.0))(keys)
    frac_cold = float(np.mean(np.asarray(cold) == 0))
    frac_hot = float(np.mean(np.asarray(hot) == 0))
    assert frac_cold > 0.95
    assert frac_hot < 0.6
