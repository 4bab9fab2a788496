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

    def stdlib_read():
        with wave.open(path, "rb") as f:
            raw = f.readframes(f.getnframes())
        return np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0

    def best_of(fn, n=7):
        # min-of-N measures capability, immune to transient machine load
        # (a mean/total races against whatever else runs on the box)
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_native = best_of(lambda: native.read_wav(path))
    t_py = best_of(stdlib_read)
    # don't be flaky: just require the native path isn't drastically slower
    assert t_native < t_py * 3


class TestCodecBatchLoader:
    """The C++ thread-pool segment loader must reproduce the per-item
    Python path exactly (same RNG stream, same resample formula)."""

    def _make_files(self, tmp_path):
        from rstnet_tpu.utils.audio import write_wav

        rng = np.random.default_rng(7)
        paths = []
        for i, (sr, seconds, ch) in enumerate(
            [(48000, 1.1, 1), (24000, 0.9, 2), (16000, 0.1, 1), (22050, 0.7, 1)]
        ):
            wav = rng.uniform(-0.8, 0.8, (ch, int(sr * seconds))).astype(np.float32)
            p = str(tmp_path / f"b{i}.wav")
            write_wav(p, wav, sr)
            paths.append(p)
        flist = tmp_path / "flist.txt"
        flist.write_text("\n".join(paths))
        return str(flist)

    def test_batch_matches_per_item(self, tmp_path):
        from rstnet_tpu import native
        from rstnet_tpu.data.codec_dataset import WaveDataset

        if not native.available():
            pytest.skip("native toolchain unavailable")
        flist = self._make_files(tmp_path)
        seg = 9600  # 0.4 s at 24 kHz
        ref_ds = WaveDataset(flist, segment_size=seg, split=True, seed=3)
        fast_ds = WaveDataset(flist, segment_size=seg, split=True, seed=3)
        want = [ref_ds[i] for i in range(4)]
        got = fast_ds.load_batch([0, 1, 2, 3])
        assert got is not None, "native fast path unexpectedly unavailable"
        b24, b16 = got
        assert b24.shape == (4, 1, seg) and b16.shape == (4, 1, ref_ds.segment_16k)
        for i, (a24, a16) in enumerate(want):
            np.testing.assert_allclose(b24[i], a24, atol=2e-5, err_msg=f"24k item {i}")
            np.testing.assert_allclose(b16[i], a16, atol=2e-5, err_msg=f"16k item {i}")

    def test_wav_info_matches_read(self, tmp_path):
        from rstnet_tpu import native
        from rstnet_tpu.utils.audio import read_wav, write_wav

        if not native.available():
            pytest.skip("native toolchain unavailable")
        p = str(tmp_path / "info.wav")
        write_wav(p, np.zeros((2, 1234), np.float32), 22050)
        info = native.wav_info(p)
        assert info is not None
        n, sr, ch = info
        wav, sr2 = read_wav(p)
        assert (n, sr, ch) == (wav.shape[1], sr2, wav.shape[0])

    def test_iterator_uses_fast_path(self, tmp_path):
        from rstnet_tpu.data.codec_dataset import WaveDataset, WaveIterator

        flist = self._make_files(tmp_path)
        ds = WaveDataset(flist, segment_size=4800, split=True, seed=1)
        it = WaveIterator(ds, batch_size=2, shuffle=False)
        batches = list(it)
        assert len(batches) == 2
        for b24, b16 in batches:
            assert b24.shape == (2, 1, 4800)
            assert b16.shape == (2, 1, 3200)
            assert np.isfinite(b24).all() and np.isfinite(b16).all()
