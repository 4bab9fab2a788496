"""Data-prep tools + pipeline tests: scp utilities, job fan-out, VAD,
offline tokenization, pipeline orchestration."""

import json
import sys

import numpy as np

from rstnet_tpu.pipeline.vad import energy_vad
from rstnet_tpu.tools.scp_tools import (
    filter_scp,
    merge_then_split,
    read_scp,
    split_scp,
    wav_dir_to_scp,
    write_scp,
)
from rstnet_tpu.utils.audio import read_wav, write_wav


def test_scp_split_filter_merge(tmp_path):
    entries = [(f"u{i}", f"/path/{i}.wav") for i in range(10)]
    scp = tmp_path / "all.scp"
    write_scp(str(scp), entries)
    outs = split_scp(str(scp), 3, str(tmp_path / "x.JOB.scp"))
    assert len(outs) == 3
    total = sum(len(read_scp(o)) for o in outs)
    assert total == 10
    keep = tmp_path / "keep.scp"
    write_scp(str(keep), entries[:4])
    n = filter_scp(str(scp), str(keep), str(tmp_path / "kept.scp"))
    assert n == 4
    merged = merge_then_split(outs, 2, str(tmp_path / "m.JOB.scp"))
    assert sum(len(read_scp(o)) for o in merged) == 10


def test_run_jobs(tmp_path):
    from rstnet_tpu.tools.run_jobs import run_jobs

    rc = run_jobs(
        3, str(tmp_path / "log.JOB.txt"),
        [sys.executable, "-c", "print('job JOB done')"],
    )
    assert rc == 0
    assert "job 2 done" in (tmp_path / "log.2.txt").read_text()
    rc = run_jobs(2, str(tmp_path / "f.JOB.txt"), [sys.executable, "-c", "exit(JOB-1)"])
    assert rc == 1  # job 2 fails


def test_energy_vad():
    sr = 8000
    t = np.arange(sr * 3) / sr
    wav = np.zeros(sr * 3, np.float32)
    wav[sr : 2 * sr] = 0.5 * np.sin(2 * np.pi * 300 * t[sr : 2 * sr])
    segs = energy_vad(wav, sr)
    assert len(segs) == 1
    assert abs(segs[0].start - 1.0) < 0.2
    assert abs(segs[0].end - 2.0) < 0.2


def test_pipeline_and_tokenization_end_to_end(tmp_path):
    """raw wav -> pipeline segments -> Mimi tokenization -> manifest."""
    from rstnet_tpu.pipeline.main import main as pipeline_main
    from rstnet_tpu.tools.create_data_json import main as json_main
    from rstnet_tpu.tools.offline_tokenization import main as tok_main

    sr = 24000
    t = np.arange(sr * 2) / sr
    wav = np.zeros(sr * 2, np.float32)
    wav[sr // 2 : sr + sr // 2] = 0.4 * np.sin(2 * np.pi * 440 * t[: sr])
    write_wav(str(tmp_path / "raw.wav"), wav, sr)
    write_scp(str(tmp_path / "raw.scp"), [("utt0", str(tmp_path / "raw.wav"))])

    out = pipeline_main([
        "--scp", str(tmp_path / "raw.scp"), "--out_dir", str(tmp_path / "seg"),
    ])
    assert out["segments"] >= 1
    segs = json.loads((tmp_path / "seg" / "segments.json").read_text())
    assert all("duration" in s for s in segs)

    tok_main([
        "--scp", str(tmp_path / "seg" / "wav.scp"),
        "--output", str(tmp_path / "audio.npz"), "--mode", "audio",
    ])
    shard = np.load(tmp_path / "audio.npz")
    assert len(shard.files) == out["segments"]
    assert shard[shard.files[0]].shape[0] == 8  # 8 codebooks

    json_main([
        "--task", "audio_only", "--audio_seq", str(tmp_path / "audio.npz"),
        "--output", str(tmp_path / "audio.json"),
    ])
    manifest = json.loads((tmp_path / "audio.json").read_text())
    assert manifest["task"] == "audio_only"


def test_wav_io_roundtrip(tmp_path):
    sr = 16000
    wav = (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    write_wav(str(tmp_path / "a.wav"), wav, sr)
    back, sr2 = read_wav(str(tmp_path / "a.wav"))
    assert sr2 == sr
    np.testing.assert_allclose(back[0], wav, atol=1e-3)


def test_wav_dir_to_scp(tmp_path):
    for i in range(3):
        write_wav(str(tmp_path / f"w{i}.wav"), np.zeros(100, np.float32), 8000)
    n = wav_dir_to_scp(str(tmp_path), str(tmp_path / "wav.scp"))
    assert n == 3


def test_duplex_tokenization_stereo_and_sessions(tmp_path, monkeypatch):
    """Both duplex forms produce pre-stacked [17, T] moshi_ft grids, with
    each conversation side routed to its own codebook block."""
    from rstnet_tpu.data.collate import SpecialTokens
    from rstnet_tpu.tools import offline_tokenization as ot

    sr = 24000

    class FakeTok:
        """Deterministic stand-in: code value = scaled channel energy, so
        channel routing is observable (random-init Mimi collapses codes)."""

        def __init__(self, *a, **k):
            self.sr = sr

        def tokenize(self, wav, sample_rate=None):
            n = max(1, int(np.ceil(len(np.ravel(wav)) / 1920)))
            val = int(np.abs(wav).sum()) % 100
            return np.full((8, n), val, np.int16)

    monkeypatch.setattr(
        "rstnet_tpu.data.tokenizers.mimi_tokenizer.MimiTokenizer", FakeTok
    )

    t = np.arange(sr) / sr
    left = 0.3 * np.sin(2 * np.pi * 300 * t).astype(np.float32)
    right = 0.6 * np.sin(2 * np.pi * 500 * t).astype(np.float32)
    write_wav(str(tmp_path / "stereo.wav"), np.stack([left, right]), sr)
    write_wav(str(tmp_path / "mono.wav"), left, sr)
    write_scp(str(tmp_path / "wav.scp"), [
        ("conv0", str(tmp_path / "stereo.wav")),
        ("conv1", str(tmp_path / "mono.wav")),
    ])

    ot.main([
        "--scp", str(tmp_path / "wav.scp"),
        "--output", str(tmp_path / "duplex.npz"), "--mode", "duplex",
    ])
    shard = np.load(tmp_path / "duplex.npz")
    g0 = shard["conv0"]
    assert g0.shape[0] == 17 and g0.shape[1] == 13  # 1 s -> ceil(12.5) frames
    assert (g0[0] == SpecialTokens.text_pad).all()
    # the louder right channel lands on the assistant block, distinct codes
    assert not np.array_equal(g0[1:9], g0[9:17])
    # mono input: user side matches, assistant side is the silent channel
    g1 = shard["conv1"]
    assert g1.shape[0] == 17
    assert np.array_equal(g0[1:9], g1[1:9])
    assert (g1[9:17] == 0).all()

    # sessions.json form: two speakers land on opposite channels
    seg_a = tmp_path / "a.wav"
    seg_b = tmp_path / "b.wav"
    write_wav(str(seg_a), left[: sr // 2], sr)
    write_wav(str(seg_b), right[: sr // 2], sr)
    sessions = [{
        "start": 10.0, "end": 11.0, "speakers": ["S0", "S1"],
        "segments": [
            {"utt": "a", "path": str(seg_a), "start": 10.0, "speaker": "S0"},
            {"utt": "b", "path": str(seg_b), "start": 10.5, "speaker": "S1"},
        ],
    }]
    (tmp_path / "sessions.json").write_text(json.dumps(sessions))
    ot.main([
        "--sessions", str(tmp_path / "sessions.json"),
        "--output", str(tmp_path / "sess.npz"), "--mode", "duplex",
    ])
    g = np.load(tmp_path / "sess.npz")["session_000000"]
    assert g.shape[0] == 17 and g.shape[1] == 13
    assert (g[0] == SpecialTokens.text_pad).all()
    assert not np.array_equal(g[1:9], g[9:17])
