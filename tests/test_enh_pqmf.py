"""Enhancement losses (parity: ``AudioCodec/MimiCodec/losses/enh_loss.py``)
and PQMF analysis/synthesis (near-perfect-reconstruction filterbank used by
the sub-band discriminator and sub-band STFT losses)."""

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.losses.enh import enhancement_loss, freq_mae, si_snr_loss, wav_mae
from rstnet_tpu.ops.pqmf import pqmf_analysis, pqmf_synthesis


def _sig(key, n=4096):
    t = jnp.arange(n) / 24000.0
    tone = jnp.sin(2 * jnp.pi * 440 * t) + 0.3 * jnp.sin(2 * jnp.pi * 1330 * t)
    return (tone + 0.05 * jax.random.normal(key, (n,)))[None, :]


def test_losses_zero_on_identity_and_ordered():
    x = _sig(jax.random.PRNGKey(0))
    assert float(wav_mae(x, x)) == 0.0
    assert float(freq_mae(x, x)) == 0.0
    # SI-SNR of a signal with itself is a large positive ratio -> very
    # negative loss; a corrupted estimate must score strictly worse
    good = float(si_snr_loss(x, x))
    noisy = x + 0.1 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
    bad = float(si_snr_loss(noisy, x))
    assert good < bad
    total, items = enhancement_loss(noisy, x)
    assert np.isfinite(float(total))
    assert set(items) == {"enh_freq_mae", "enh_wav_mae", "enh_sisnr"}
    total2, _ = enhancement_loss(noisy, x, freq_weight=0.0, wav_weight=0.0)
    np.testing.assert_allclose(float(total2), float(items["enh_sisnr"]), rtol=1e-6)


def test_si_snr_scale_invariance():
    x = _sig(jax.random.PRNGKey(0))
    est = x + 0.05 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
    a = float(si_snr_loss(est, x))
    b = float(si_snr_loss(est, 3.7 * x))  # scaling the target must not matter
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_pqmf_near_perfect_reconstruction():
    x = _sig(jax.random.PRNGKey(2))[:, None, :]  # [B, 1, T]
    for bands in (2, 4):
        sub = pqmf_analysis(x, num_bands=bands)
        assert sub.shape == (1, bands, x.shape[-1] // bands)
        y = pqmf_synthesis(sub, num_bands=bands)
        # filterbank delay: align by cross-correlation peak, then compare
        a = np.asarray(x)[0, 0]
        b = np.asarray(y)[0, 0][: a.size]
        corr = np.correlate(b, a, mode="full")
        lag = int(np.argmax(corr)) - (a.size - 1)
        if lag > 0:
            a2, b2 = a[: a.size - lag], b[lag:]
        else:
            a2, b2 = a[-lag:], b[: b.size + lag]
        n = min(a2.size, b2.size) - 256
        a2, b2 = a2[128 : 128 + n], b2[128 : 128 + n]
        snr = 10 * np.log10(np.sum(a2**2) / (np.sum((a2 - b2) ** 2) + 1e-12))
        assert snr > 25.0, f"{bands}-band PQMF reconstruction SNR {snr:.1f} dB"
