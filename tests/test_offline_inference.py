"""Offline inference tests: PPL metrics, prefix-forced generation."""

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.inference.offline import OfflineInference
from tests.test_speech_lm import _model, _rand_sequence


def test_teacher_forced_metrics():
    m = _model()
    params = m.init(jax.random.PRNGKey(0))
    seq = _rand_sequence(jax.random.PRNGKey(1), 2, 6, m.config)
    masks = jnp.ones(seq.shape, jnp.float32)
    inf = OfflineInference(m, params, audio_ignore_id=49, text_ignore_id=151)
    metrics = inf.teacher_forced_metrics(seq, masks)
    assert np.isfinite(metrics["ppl_audio"]) and metrics["ppl_audio"] > 1.0
    assert np.isfinite(metrics["ppl_text"])


def test_generate_respects_prefix_and_extends():
    m = _model()
    params = m.init(jax.random.PRNGKey(0))
    prefix = np.asarray(_rand_sequence(jax.random.PRNGKey(2), 1, 4, m.config))
    inf = OfflineInference(m, params)
    out = inf.generate(prefix, max_new=3, key=jax.random.PRNGKey(3))
    assert out.shape == (1, 9, 7)
    np.testing.assert_array_equal(out[:, :, :4], prefix)  # forced region intact
    assert (out[:, 1:, 4:] < m.config.audio_card).all()
    assert (out >= 0).all()


def test_partial_teacher_forcing_tts_style():
    """Force the text row beyond the prefix; audio stays generated."""
    m = _model()
    params = m.init(jax.random.PRNGKey(0))
    prefix = np.asarray(_rand_sequence(jax.random.PRNGKey(4), 1, 2, m.config))
    T = 6
    forced = np.full((1, 9, T), -1, np.int64)
    forced[:, 0, :] = 7  # force text tokens to a constant id
    inf = OfflineInference(m, params)
    out = inf.generate(prefix, max_new=T - 2, key=jax.random.PRNGKey(5), forced=forced)
    assert (out[:, 0, 2:] == 7).all()


def test_generate_duplex_config():
    """Duplex configs (n_q > dep_q): generate() re-feeds the user-stream
    rows from the prefix while it lasts and the initial token afterwards."""
    from rstnet_tpu.models.moshi_lm import MoshiLMModel

    m = MoshiLMModel(
        delays=(0,) * 9, n_q=8, dep_q=4, card=16, text_card=64, dim=32,
        num_heads=4, num_layers=2, hidden_scale=4.0, norm="rms_norm_f32",
        gating="silu", positional_embedding="rope", context=16,
        existing_text_padding_id=3, depformer_dim=16,
        depformer_dim_feedforward=32, depformer_num_heads=2,
        depformer_num_layers=1, depformer_multi_linear=True,
        depformer_weights_per_step=True, depformer_pos_emb="none",
    )
    params = m.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    prefix = rng.integers(0, 16, (1, m.num_codebooks, 4)).astype(np.int64)
    prefix[0, 0] = rng.integers(0, 64, 4)
    inf = OfflineInference(m, params, codec_card=16)
    out = inf.generate(prefix, max_new=3, key=jax.random.PRNGKey(3))
    assert out.shape == (1, 9, 7)
    np.testing.assert_array_equal(out[:, :, :4], prefix)
    # generated audio rows stay in the real codec range
    assert (out[:, 1 : m.dep_q + 1, 4:] < 16).all()
    # user-stream rows beyond the prefix hold the initial token
    assert (out[:, m.dep_q + 1 :, 4:] == m.initial_token_id).all()
