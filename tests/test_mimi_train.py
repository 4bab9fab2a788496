"""TrainableMimiCodec unit semantics (parity:
``AudioCodec/MimiCodec/models/MimiCodec.py:16-118``): reconstruction
shapes, the 40% quantizer-bypass trick, the Semantic_linear_pool 50Hz ->
12.5Hz grid, and encode/decode consistency."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rstnet_tpu.models.mimi_train import TrainableMimiCodec

TINY = dict(
    sample_rate=2400, n_filters=4, encoder_rates=(4, 3), latent_dim=32,
    codebook_size=16, codebook_dim=8, rvq_layers=4, num_heads=2, num_layers=1,
    layer_scale=0.01, context=32, dim_feedforward=64, semantic_feature_dim=16,
    target_frame_rate=100,
)


@pytest.fixture(scope="module")
def codec():
    m = TrainableMimiCodec(**TINY)
    params, buffers = m.init(jax.random.PRNGKey(0), jnp.float32)
    audio = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (2, 1, 1200))
    return m, params, buffers, audio


def test_training_forward_shapes_and_losses(codec):
    m, params, buffers, audio = codec
    # 100Hz latent grid on 0.5s audio -> 50 frames; teacher at 4x (pool 8/4)
    feats = jax.random.normal(jax.random.PRNGKey(2), (2, 200, TINY["semantic_feature_dim"]))
    rec, codes, commit, sim, new_buf = m(
        params, buffers, audio, semantic_features=feats, key=jax.random.PRNGKey(3)
    )
    assert rec.shape == audio.shape
    assert codes.shape[0] == 2 and codes.shape[1] == TINY["rvq_layers"]
    assert np.isfinite(float(commit)) and np.isfinite(float(sim))
    assert float(sim) != 0.0  # distillation active when features are given
    # EMA buffers must move when update_codebooks=True
    before = jax.tree.leaves(buffers)
    after = jax.tree.leaves(new_buf)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(after, before)
    )


def test_no_semantic_features_means_zero_sim_loss(codec):
    m, params, buffers, audio = codec
    _, _, _, sim, _ = m(params, buffers, audio, key=jax.random.PRNGKey(3))
    assert float(sim) == 0.0


def test_bypass_extremes(codec):
    m, params, buffers, audio = codec
    # bypass_rate=1.0 -> every item decodes the unquantized latent
    m_all = dataclasses.replace(m, bypass_rate=1.0)
    rec_all, *_ = m_all(params, buffers, audio, key=jax.random.PRNGKey(3),
                        update_codebooks=False)
    z = m.encode_to_latent(params, audio)
    rec_unq = m.decode_from_latent(params, z)[..., : audio.shape[-1]]
    np.testing.assert_allclose(np.asarray(rec_all), np.asarray(rec_unq), atol=1e-5)
    # bypass_rate=0.0 -> every item decodes the quantized latent
    m_none = dataclasses.replace(m, bypass_rate=0.0)
    rec_none, codes, *_ = m_none(params, buffers, audio, key=jax.random.PRNGKey(3),
                                 update_codebooks=False)
    rec_q = m.decode(params, buffers, codes)[..., : audio.shape[-1]]
    np.testing.assert_allclose(np.asarray(rec_none), np.asarray(rec_q), atol=1e-5)
    # quantization must actually change the latent for the test to mean anything
    assert not np.allclose(np.asarray(rec_all), np.asarray(rec_none))


def test_encode_decode_roundtrip(codec):
    m, params, buffers, audio = codec
    codes = m.encode(params, buffers, audio)
    assert codes.shape[1] == TINY["rvq_layers"]
    assert int(codes.min()) >= 0 and int(codes.max()) < TINY["codebook_size"]
    rec = m.decode(params, buffers, codes)
    assert rec.shape[0] == 2 and rec.shape[1] == 1
    # re-encoding the reconstruction keeps the code grid shape
    codes2 = m.encode(params, buffers, rec[..., : audio.shape[-1]])
    assert codes2.shape == codes.shape


def test_map_semantic_grid(codec):
    m, params, _, _ = codec
    feats = jax.random.normal(jax.random.PRNGKey(4), (2, 16, TINY["semantic_feature_dim"]))
    pooled = m.map_semantic(params, feats)
    # AvgPool1d(kernel=8, stride=4): (16 - 8) // 4 + 1 = 3 frames
    assert pooled.shape == (2, 3, TINY["latent_dim"])
