"""Native C++ audio runtime tests: build, parity with the numpy path, speed."""

import time
import wave

import numpy as np
import pytest

from rstnet_tpu import native


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def _write_wav_py(path, audio, sr):
    pcm = np.clip(audio * 32767.0, -32768, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def test_wav_read_parity(built, tmp_path):
    sr = 24000
    audio = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    _write_wav_py(tmp_path / "a.wav", audio, sr)
    out = native.read_wav(str(tmp_path / "a.wav"))
    assert out is not None
    data, sr2 = out
    assert sr2 == sr and data.shape[0] == 1
    np.testing.assert_allclose(data[0], audio, atol=1e-3)


def test_wav_read_rejects_garbage(built, tmp_path):
    (tmp_path / "junk.wav").write_bytes(b"this is not a wav file at all")
    assert native.read_wav(str(tmp_path / "junk.wav")) is None
    assert native.read_wav(str(tmp_path / "missing.wav")) is None


def test_resample_parity(built):
    rng = np.random.default_rng(0)
    wav = rng.normal(0, 0.3, (1, 24000)).astype(np.float32)
    nat = native.resample_linear(wav, 24000, 16000)
    x_old = np.linspace(0, 1, wav.shape[-1], endpoint=False)
    x_new = np.linspace(0, 1, 16000, endpoint=False)
    ref = np.interp(x_new, x_old, wav[0]).astype(np.float32)
    assert nat.shape == (1, 16000)
    np.testing.assert_allclose(nat[0], ref, atol=1e-4)


def test_pcm_conversion(built):
    audio = np.asarray([0.0, 0.5, -0.5, 1.5, -1.5], np.float32)
    raw = native.float_to_pcm16(audio)
    vals = np.frombuffer(raw, np.int16)
    assert vals[0] == 0
    assert abs(int(vals[1]) - 16383) <= 1
    assert vals[3] == 32767 and vals[4] == -32768  # clipped


def test_native_faster_than_stdlib(built, tmp_path):
    sr = 24000
    audio = np.random.default_rng(0).normal(0, 0.2, sr * 30).astype(np.float32)
    _write_wav_py(tmp_path / "long.wav", audio, sr)
    path = str(tmp_path / "long.wav")

    t0 = time.perf_counter()
    for _ in range(5):
        native.read_wav(path)
    t_native = time.perf_counter() - t0

    from rstnet_tpu.utils import audio as A

    def stdlib_read():
        with wave.open(path, "rb") as f:
            raw = f.readframes(f.getnframes())
        return np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0

    t0 = time.perf_counter()
    for _ in range(5):
        stdlib_read()
    t_py = time.perf_counter() - t0
    # don't be flaky: just require the native path isn't drastically slower
    assert t_native < t_py * 3
