"""Evaluation metric sanity tests: identity is perfect, noise degrades."""

import numpy as np
import pytest

from rstnet_tpu.evalsuite import metrics as M


@pytest.fixture(scope="module")
def signals():
    rng = np.random.default_rng(0)
    t = np.arange(24000 * 2) / 24000
    clean = (0.5 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 880 * t)).astype(
        np.float32
    )
    noisy = clean + 0.05 * rng.normal(0, 1, clean.shape).astype(np.float32)
    very_noisy = clean + 0.5 * rng.normal(0, 1, clean.shape).astype(np.float32)
    return clean, noisy, very_noisy


def test_si_snr(signals):
    clean, noisy, very_noisy = signals
    assert M.si_snr(clean, clean) > 50
    mid = M.si_snr(clean, noisy)
    low = M.si_snr(clean, very_noisy)
    assert mid > low
    # scale invariance (on a non-degenerate signal; the zero-noise case is
    # eps-dominated)
    assert abs(M.si_snr(clean, noisy * 0.3) - M.si_snr(clean, noisy)) < 0.1


def test_mel_ssim(signals):
    clean, noisy, very_noisy = signals
    assert M.mel_ssim(clean, clean) > 0.999
    assert M.mel_ssim(clean, noisy) > M.mel_ssim(clean, very_noisy)


def test_stoi():
    # broadband speech-like signal: pure tones leave most 1/3-octave bands
    # empty, where correlation is undefined
    rng = np.random.default_rng(1)
    clean = rng.normal(0, 0.3, 48000).astype(np.float32)
    clean = np.convolve(clean, np.ones(8) / 8, mode="same")  # pink-ish
    noisy = clean + 0.1 * rng.normal(0, 1, clean.shape).astype(np.float32)
    very_noisy = clean + 0.8 * rng.normal(0, 1, clean.shape).astype(np.float32)
    assert M.stoi(clean, clean) > 0.99
    assert M.stoi(clean, noisy) > M.stoi(clean, very_noisy)


def test_mcd(signals):
    clean, noisy, very_noisy = signals
    assert M.mcd(clean, clean) < 1e-4
    assert M.mcd(clean, noisy) < M.mcd(clean, very_noisy)


def test_ms_stft(signals):
    clean, noisy, very_noisy = signals
    assert M.ms_stft_distance(clean, clean) < 1e-4
    assert M.ms_stft_distance(clean, noisy) < M.ms_stft_distance(clean, very_noisy)


def test_compute_metrics_cli(tmp_path, signals):
    from rstnet_tpu.evalsuite.compute_metrics import main
    from rstnet_tpu.utils.audio import write_wav

    clean, noisy, _ = signals
    (tmp_path / "ref").mkdir()
    (tmp_path / "deg").mkdir()
    for i in range(2):
        write_wav(str(tmp_path / "ref" / f"u{i}.wav"), clean, 24000)
        write_wav(str(tmp_path / "deg" / f"u{i}.wav"), noisy, 24000)
    report = main([
        "--ref_dir", str(tmp_path / "ref"), "--deg_dir", str(tmp_path / "deg"),
        "--output", str(tmp_path / "report.json"),
    ])
    assert report["n"] == 2
    assert report["mean"]["si_snr"] > 10
    assert (tmp_path / "report.json").exists()
