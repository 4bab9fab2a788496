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


class _FakeMimiTok:
    """Deterministic stand-in: code value = scaled channel energy, so
    channel routing is observable (random-init Mimi collapses codes)."""

    sr = 24000

    def __init__(self, *a, **k):
        pass

    def tokenize(self, wav, sample_rate=None):
        n = max(1, int(np.ceil(len(np.ravel(wav)) / 1920)))
        val = int(np.abs(wav).sum()) % 100
        return np.full((8, n), val, np.int16)


def _write_word_tokenizer(tmp_path):
    """Minimal real HF tokenizer: byte-level word vocab so the word-boundary
    grouping ('Ġ' prefixes) in TextTokenizer is exercised for real."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"[UNK]": 0, "Ġhello": 11, "Ġworld": 13, "Ġhi": 17}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
    d = tmp_path / "texttok"
    d.mkdir(exist_ok=True)
    tok.save(str(d / "tokenizer.json"))
    return str(d)


def test_duplex_tokenization_stereo_and_sessions(tmp_path, monkeypatch):
    """Both duplex forms produce a pre-stacked [17, T] moshi_ft grid per
    conversation side (utt_ch0/utt_ch1), each side's own codes on the Moshi
    block (rows 1-8) — the reference's two-example storage contract
    (MLLM/egs/moshi_ft/data_scripts/offline_tokenization.py:139-155)."""
    from rstnet_tpu.data.collate import SpecialTokens
    from rstnet_tpu.tools import offline_tokenization as ot

    sr = 24000
    monkeypatch.setattr(
        "rstnet_tpu.data.tokenizers.mimi_tokenizer.MimiTokenizer", _FakeMimiTok
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
    g0 = shard["conv0_ch0"]
    assert g0.shape[0] == 17 and g0.shape[1] == 13  # 1 s -> ceil(12.5) frames
    assert (g0[0] == SpecialTokens.text_pad).all()
    # distinct channels land on distinct blocks; _ch1 is the swapped view
    assert not np.array_equal(g0[1:9], g0[9:17])
    g0b = shard["conv0_ch1"]
    assert np.array_equal(g0b[1:9], g0[9:17])
    assert np.array_equal(g0b[9:17], g0[1:9])
    # mono input: only the _ch0 example, silent peer on the user block
    assert "conv1_ch1" not in shard
    g1 = shard["conv1_ch0"]
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
            {"utt": "a", "path": str(seg_a), "start": 10.0, "end": 10.5,
             "speaker": "S0"},
            {"utt": "b", "path": str(seg_b), "start": 10.5, "end": 11.0,
             "speaker": "S1"},
        ],
    }]
    (tmp_path / "sessions.json").write_text(json.dumps(sessions))
    ot.main([
        "--sessions", str(tmp_path / "sessions.json"),
        "--output", str(tmp_path / "sess.npz"), "--mode", "duplex",
    ])
    sess_shard = np.load(tmp_path / "sess.npz")
    g = sess_shard["session_000000_ch0"]
    assert g.shape[0] == 17 and g.shape[1] == 13
    assert (g[0] == SpecialTokens.text_pad).all()
    assert not np.array_equal(g[1:9], g[9:17])
    gb = sess_shard["session_000000_ch1"]
    assert np.array_equal(gb[1:9], g[9:17])


def test_duplex_sessions_text_alignment_golden(tmp_path, monkeypatch):
    """ASR word timestamps from the pipeline land in row 0, shifted to
    session time: known words at known times -> exact text/epad/pad frames
    (VERDICT r2 item 2; reference MLLM/utils/task_definition.py:57-69 +
    Text2ID pad_tokens semantics)."""
    from rstnet_tpu.data.collate import SpecialTokens
    from rstnet_tpu.tools import offline_tokenization as ot

    sr = 24000
    monkeypatch.setattr(
        "rstnet_tpu.data.tokenizers.mimi_tokenizer.MimiTokenizer", _FakeMimiTok
    )
    tok_dir = _write_word_tokenizer(tmp_path)

    wav = 0.3 * np.sin(2 * np.pi * 300 * np.arange(sr // 2) / sr)
    seg_a = tmp_path / "a.wav"
    seg_b = tmp_path / "b.wav"
    write_wav(str(seg_a), wav.astype(np.float32), sr)
    write_wav(str(seg_b), (2 * wav).astype(np.float32), sr)
    sessions = [{
        "start": 10.0, "end": 11.0, "speakers": ["S0", "S1"],
        "segments": [
            {"utt": "a", "path": str(seg_a), "start": 10.0, "end": 10.5,
             "speaker": "S0",
             # whisperX alignment, clip-relative times
             "segments": [{
                 "text": "hello world",
                 "words": [
                     {"word": "hello", "start": 0.08, "end": 0.2},
                     {"word": "world", "start": 0.32, "end": 0.45},
                 ],
             }]},
            {"utt": "b", "path": str(seg_b), "start": 10.5, "end": 11.0,
             "speaker": "S1",
             "segments": [{
                 "text": "hi",
                 "words": [{"word": "hi", "start": 0.04, "end": 0.2}],
             }]},
        ],
    }]
    (tmp_path / "sessions.json").write_text(json.dumps(sessions))
    n = ot.tokenize_duplex_sessions(
        str(tmp_path / "sessions.json"), str(tmp_path / "sess.npz"),
        tokenizer_dir=tok_dir,
    )
    assert n == 2
    shard = np.load(tmp_path / "sess.npz")
    pad, epad = SpecialTokens.text_pad, SpecialTokens.text_empty_pad
    # ch0 (S0 as Moshi): "hello" at session 0.08s -> frame 1, "world" at
    # 0.32s -> frame 4; epad one frame before each word
    row = shard["session_000000_ch0"][0]
    expect = np.full(13, pad, np.int32)
    expect[0], expect[1] = epad, 11   # hello
    expect[3], expect[4] = epad, 13   # world
    np.testing.assert_array_equal(row, expect)
    # ch1 (S1 as Moshi): "hi" at clip 0.04s + 0.5s shift -> frame 7
    row1 = shard["session_000000_ch1"][0]
    expect1 = np.full(13, pad, np.int32)
    expect1[6], expect1[7] = epad, 17  # hi
    np.testing.assert_array_equal(row1, expect1)


def test_duplex_sessions_three_speakers_dropped(tmp_path, monkeypatch, caplog):
    """A 3rd speaker's segments are dropped (2-channel format) with a
    warning; the two most-speaking speakers keep their channels."""
    import logging as _logging

    from rstnet_tpu.tools import offline_tokenization as ot

    sr = 24000
    monkeypatch.setattr(
        "rstnet_tpu.data.tokenizers.mimi_tokenizer.MimiTokenizer", _FakeMimiTok
    )
    wav = 0.3 * np.sin(2 * np.pi * 300 * np.arange(sr // 2) / sr)
    paths = {}
    for name, scale in (("a", 1.0), ("b", 2.0), ("c", 3.0)):
        p = tmp_path / f"{name}.wav"
        write_wav(str(p), (scale * wav).astype(np.float32), sr)
        paths[name] = str(p)
    sessions = [{
        "start": 0.0, "end": 1.5, "speakers": ["S0", "S1", "S2"],
        "segments": [
            {"utt": "a", "path": paths["a"], "start": 0.0, "end": 0.5,
             "speaker": "S0"},
            {"utt": "b", "path": paths["b"], "start": 0.5, "end": 0.95,
             "speaker": "S1"},
            {"utt": "c", "path": paths["c"], "start": 1.0, "end": 1.1,
             "speaker": "S2"},  # least speech -> dropped
        ],
    }]
    (tmp_path / "sessions.json").write_text(json.dumps(sessions))
    with caplog.at_level(_logging.WARNING):
        n = ot.tokenize_duplex_sessions(
            str(tmp_path / "sessions.json"), str(tmp_path / "sess.npz")
        )
    assert n == 2
    assert any("dropping 1 segment(s)" in r.message for r in caplog.records)
    g = np.load(tmp_path / "sess.npz")["session_000000_ch0"]
    # S2's clip was never rendered: each channel's fake code equals the abs
    # sum of just its kept speaker's audio (as written to disk, so the int16
    # roundtrip cancels out)
    va = int(np.abs(read_wav(paths["a"])[0][0]).sum()) % 100
    vb = int(np.abs(read_wav(paths["b"])[0][0]).sum()) % 100
    assert (g[1:9] == va).all()
    assert (g[9:17] == vb).all()
    # direct check: channel map keeps the two most-speaking speakers
    cm = ot._session_channel_map(sessions[0], "t")
    assert cm == {"S0": 0, "S1": 1}
