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
