"""Pipeline adapter gating: the external-model wrappers (whisperX, UVR,
DNSMOS, DeepFilterNet, AERO — reference: ``local/asr_whisperx_tar.py``,
``emilia/models/*``) must degrade gracefully when their packages are
absent — clear error for hard deps, documented fallback for soft ones.
None of these packages exist in this environment, which is exactly the
case under test."""

import numpy as np
import pytest

from rstnet_tpu.pipeline import adapters


@pytest.fixture()
def wav():
    rng = np.random.default_rng(0)
    return (0.1 * rng.normal(0, 1, 16000)).astype(np.float32)


def test_whisperx_missing_raises_actionable_error(wav, tmp_path):
    pytest.importorskip("pytest")  # no-op guard; whisperx must NOT be present
    try:
        import whisperx  # noqa: F401

        pytest.skip("whisperx unexpectedly installed")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="whisperX is not installed"):
        adapters.whisperx_transcribe(str(tmp_path / "x.wav"))


def test_separate_vocals_passthrough_without_backend(wav):
    try:
        import onnxruntime  # noqa: F401

        pytest.skip("onnxruntime unexpectedly installed")
    except ImportError:
        pass
    out = adapters.separate_vocals(wav, 16000)
    np.testing.assert_array_equal(out, wav)


def test_dnsmos_permissive_without_model(wav):
    assert adapters.dnsmos_filter(wav, 16000) is True


def test_denoise_passthrough(wav):
    try:
        import df  # noqa: F401

        pytest.skip("DeepFilterNet unexpectedly installed")
    except ImportError:
        pass
    out = adapters.denoise(wav, 16000)
    np.testing.assert_array_equal(out, wav)


def test_super_resolve_linear_fallback(wav):
    out = adapters.super_resolve(wav, 16000, 24000)
    assert out.shape[-1] == int(round(wav.shape[-1] * 24000 / 16000))
    assert np.isfinite(out).all()
    # energy is preserved to first order by linear resampling
    assert 0.5 < float(np.std(out) / np.std(wav)) < 2.0
