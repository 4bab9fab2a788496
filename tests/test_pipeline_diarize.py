"""Diarization post-processing, ONNX adapter harnesses, and the
speaker-aware pipeline (reference: ``emilia/main.py:148-250,372-424``,
``emilia/models/{dnsmos,separate_fast}.py``)."""

import json

import numpy as np
import pytest

from rstnet_tpu.pipeline.diarize import (
    cut_by_speaker_label,
    merge_session_segments,
    pyannote_diarize,
    single_speaker_track,
    subdivide_turns,
)
from rstnet_tpu.pipeline.filters import calculate_audio_stats, char_count


def seg(start, end, speaker="A", **kw):
    return {"start": start, "end": end, "speaker": speaker, **kw}


# -- cut_by_speaker_label ---------------------------------------------------


def test_cut_trims_long_segments_to_max_windows():
    out = cut_by_speaker_label([seg(0, 70)], max_segment_s=30.0)
    spans = [(s["start"], s["end"]) for s in out]
    assert spans == [(0, 30), (30, 60), (60, 70)]
    assert all(s["speaker"] == "A" for s in out)


def test_cut_merges_short_same_speaker_across_small_gap():
    out = cut_by_speaker_label(
        [seg(0, 10), seg(10.5, 11.0)], merge_gap_s=2.0, min_segment_s=1.5
    )
    assert len(out) == 1
    assert out[0]["end"] == 11.0


def test_cut_does_not_merge_across_speakers_or_big_gaps():
    out = cut_by_speaker_label(
        [seg(0, 10, "A"), seg(10.5, 11.0, "B")], min_segment_s=0.2
    )
    assert [s["speaker"] for s in out] == ["A", "B"]
    out = cut_by_speaker_label(
        [seg(0, 10), seg(15, 15.5)], merge_gap_s=2.0, min_segment_s=1.5
    )
    assert len(out) == 1  # the distant short segment is dropped, not merged


def test_cut_drops_below_min_length():
    out = cut_by_speaker_label([seg(0, 0.5)], min_segment_s=1.5)
    assert out == []


def test_cut_merge_respects_max_segment_cap():
    # merging would exceed max -> keep separate, then drop the short one
    out = cut_by_speaker_label(
        [seg(0, 29.5), seg(29.6, 30.6)], merge_gap_s=2.0,
        min_segment_s=1.5, max_segment_s=30.0,
    )
    assert [(s["start"], s["end"]) for s in out] == [(0, 29.5)]


# -- subdivide_turns --------------------------------------------------------


def test_subdivide_keeps_short_turns_and_splits_long_ones():
    sr = 8000
    rng = np.random.default_rng(0)
    wav = np.zeros(sr * 40, np.float32)
    # two speech bursts inside the long turn
    wav[sr * 2 : sr * 6] = 0.5 * rng.standard_normal(sr * 4)
    wav[sr * 20 : sr * 25] = 0.5 * rng.standard_normal(sr * 5)
    turns = [seg(0, 40, "S1")]
    fine = subdivide_turns(turns, wav, sr, max_direct_s=30.0)
    assert len(fine) == 2
    assert all(s["speaker"] == "S1" for s in fine)
    assert abs(fine[0]["start"] - 2.0) < 0.5 and abs(fine[1]["end"] - 25.0) < 0.5
    # short turn passes through untouched
    short = subdivide_turns([seg(1, 4, "S2")], wav, sr, max_direct_s=30.0)
    assert short == [seg(1.0, 4.0, "S2")]


def test_subdivide_serializes_overlapping_turns():
    wav = np.zeros(8000 * 10, np.float32)
    fine = subdivide_turns(
        [seg(0, 5, "A"), seg(2, 4, "B"), seg(4, 8, "B")], wav, 8000
    )
    # the fully-contained B turn is skipped; the partially overlapping one is
    # clipped to start after A ends, so no audio region lands in two segments
    assert [(s["start"], s["end"], s["speaker"]) for s in fine] == [
        (0.0, 5.0, "A"), (5.0, 8.0, "B"),
    ]


def test_pyannote_adapter_raises_actionable_error_offline():
    try:
        import pyannote.audio  # noqa: F401

        pytest.skip("pyannote unexpectedly installed")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="pyannote"):
        pyannote_diarize(np.zeros(8000, np.float32), 8000)


# -- merge_session_segments -------------------------------------------------


def test_merge_sessions_packs_and_splits_on_blanks():
    segs = [seg(0, 10, "A"), seg(11, 20, "B"), seg(40, 50, "A"), seg(51, 55, "B")]
    sessions = merge_session_segments(segs, chunk_size_s=60, blank_threshold_s=3)
    assert len(sessions) == 2  # 20 s blank splits the conversation
    assert sessions[0]["speakers"] == ["A", "B"]
    assert len(sessions[0]["segments"]) == 2
    assert sessions[1]["start"] == 40 and sessions[1]["end"] == 55


def test_merge_sessions_respects_chunk_size_and_min_length():
    segs = [seg(i * 10, i * 10 + 9, "A") for i in range(8)]  # 80 s of speech
    sessions = merge_session_segments(segs, chunk_size_s=30, blank_threshold_s=3)
    assert all(s["end"] - s["start"] <= 30 for s in sessions)
    assert sum(len(s["segments"]) for s in sessions) == len(segs)
    # a lone sub-threshold session is discarded
    assert merge_session_segments([seg(0, 2)], length_threshold_s=3.0) == []


# -- stats filter -----------------------------------------------------------


def test_char_count_strips_punctuation():
    assert char_count("Hello, world!") == 10
    assert char_count("  ... ") == 0


def test_calculate_audio_stats_filters_each_criterion():
    base = dict(text="a" * 20, dnsmos=3.5)
    segments = [
        seg(0, 10, **base),                       # passes
        seg(0, 1, **base),                        # too short
        seg(0, 10, text="a" * 20, dnsmos=2.0),    # low MOS
        seg(0, 10, text="x", dnsmos=3.5),         # too few chars... and rate outlier
        seg(0, 10, **base),                       # passes
    ]
    valid, report = calculate_audio_stats(
        segments, min_duration=3, max_duration=30, min_dnsmos=3.0,
        min_char_count=2,
    )
    assert valid == [0, 4]
    assert report["total"] == 5 and report["kept"] == 2
    assert report["dropped_by"]["duration"] == 1
    assert report["dropped_by"]["dnsmos"] == 1
    assert report["dropped_by"]["char_count"] == 1
    assert report["avg_dnsmos"] == pytest.approx(np.mean([3.5, 3.5, 2.0, 3.5, 3.5]))


def test_calculate_audio_stats_language_filter():
    """Off-target ASR-detected languages are dropped when a supported list
    is given; segments without a detection pass (reference
    emilia/main.py:287-306 language gating)."""
    base = dict(text="a" * 20, dnsmos=3.5)
    segments = [
        seg(0, 10, language="en", **base),   # passes
        seg(0, 10, language="ZH", **base),   # passes (case-insensitive)
        seg(0, 10, language="fr", **base),   # off-target -> dropped
        seg(0, 10, **base),                  # no detection -> passes
    ]
    valid, report = calculate_audio_stats(
        segments, min_duration=3, max_duration=30,
        supported_languages=["en", "zh"],
    )
    assert valid == [0, 1, 3]
    assert report["dropped_by"]["language"] == 1
    # no list -> no language filtering at all
    valid2, _ = calculate_audio_stats(segments, min_duration=3, max_duration=30)
    assert valid2 == [0, 1, 2, 3]


def test_calculate_audio_stats_without_asr_or_mos_is_duration_only():
    segments = [seg(0, 10), seg(0, 40)]
    valid, report = calculate_audio_stats(segments, min_duration=3, max_duration=30)
    assert valid == [0]
    assert report["avg_dnsmos"] is None


# -- DNSMOS harness (stub session) ------------------------------------------


class _StubSession:
    """Records inputs; returns a fixed raw (sig, bak, ovr) triple."""

    def __init__(self, triple=(3.0, 3.5, 2.8)):
        self.triple = triple
        self.calls = []

    def run(self, _outputs, feeds):
        (name, arr), = feeds.items()
        self.calls.append((name, np.asarray(arr).shape))
        return [np.asarray([list(self.triple)], np.float32)]


def test_dnsmos_framing_and_poly_mapping():
    from rstnet_tpu.pipeline.onnx_models import DNSMOS, DNSMOS_INPUT_SECONDS

    sess = _StubSession()
    model = DNSMOS(session=sess)
    out = model.score(np.zeros(16000 * 12, np.float32), 16000)
    # 12 s clip -> floor(12) - 9.01 + 1 = 3 hops of 9.01 s windows
    assert out["num_hops"] == 3
    assert all(s == ("input_1", (1, int(16000 * DNSMOS_INPUT_SECONDS)))
               for s in sess.calls)
    assert out["SIG_raw"] == pytest.approx(3.0)
    # published polynomial: OVRL(2.8) = -0.06766283*2.8^2 + 1.11546468*2.8 + 0.04602535
    assert out["OVRL"] == pytest.approx(
        -0.06766283 * 2.8**2 + 1.11546468 * 2.8 + 0.04602535
    )


def test_dnsmos_tiles_short_clips():
    from rstnet_tpu.pipeline.onnx_models import DNSMOS

    model = DNSMOS(session=_StubSession())
    out = model.score(0.1 * np.ones(16000, np.float32), 16000)  # 1 s clip
    assert out["num_hops"] >= 1
    assert out["len_in_sec"] == pytest.approx(1.0)


def test_dnsmos_score_metric_uses_session():
    from rstnet_tpu.evalsuite.metrics import dnsmos_score

    score = dnsmos_score(np.zeros(16000 * 10, np.float32), 16000,
                         session=_StubSession())
    assert score is not None and 2.5 < score < 3.5
    # no model, no session, no onnxruntime -> None (graceful)
    assert dnsmos_score(np.zeros(16000, np.float32), 16000) is None


# -- MDX separator harness (stub session) ------------------------------------


class _IdentityMaskSession:
    """Spectrogram model stub that returns its input unchanged (vocal
    estimate == mix), so separate() must reconstruct the input waveform —
    a round-trip test of the STFT framing/overlap logic."""

    def run(self, _outputs, feeds):
        (_, arr), = feeds.items()
        return [np.asarray(arr)]


def test_mdx_stft_istft_roundtrip():
    from rstnet_tpu.pipeline.onnx_models import istft_np, stft_np

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    spec = stft_np(x, n_fft=512, hop=128)
    back = istft_np(spec, n_fft=512, hop=128, length=4096)
    np.testing.assert_allclose(back, x, atol=1e-6)


def test_mdx_separator_identity_session_reconstructs_mix():
    from rstnet_tpu.pipeline.onnx_models import MDXSeparator

    sep = MDXSeparator(session=_IdentityMaskSession(), dim_f=1024,
                       dim_t_log2=5, n_fft=2048, hop=512, chunk_seconds=2.0,
                       margin=4410)
    sr = 44100
    t = np.arange(sr * 3) / sr
    # band-limit well under dim_f bins so the frequency crop is lossless
    mix = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    vocals, inst = sep.separate(mix, sr)
    assert vocals.shape == mix.shape and inst.shape == mix.shape
    assert np.abs(vocals - mix).mean() < 1e-3
    assert np.abs(inst).mean() < 1e-3


def test_separate_vocals_adapter_with_session():
    from rstnet_tpu.pipeline import adapters

    wav = (0.2 * np.sin(2 * np.pi * 330 * np.arange(44100) / 44100)).astype(
        np.float32
    )
    out = adapters.separate_vocals(wav, 44100, session=_IdentityMaskSession())
    assert out.shape == wav.shape
    assert np.abs(out - wav).mean() < 1e-2


# -- pipeline orchestration with speakers ------------------------------------


def test_pipeline_emits_speakers_sessions_and_filter_report(tmp_path):
    from rstnet_tpu.pipeline.main import main as pipeline_main
    from rstnet_tpu.tools.scp_tools import write_scp
    from rstnet_tpu.utils.audio import write_wav

    sr = 24000
    rng = np.random.default_rng(0)
    wav = np.zeros(sr * 6, np.float32)
    wav[sr : sr * 3] = 0.4 * rng.standard_normal(sr * 2)
    wav[sr * 4 : sr * 5] = 0.4 * rng.standard_normal(sr)
    write_wav(str(tmp_path / "raw.wav"), wav, sr)
    write_scp(str(tmp_path / "raw.scp"), [("utt0", str(tmp_path / "raw.wav"))])
    cfg = {"merge_sessions": True, "session_chunk_s": 30.0,
           "use_diarization": True}  # pyannote absent -> fallback track
    (tmp_path / "cfg.json").write_text(json.dumps(cfg))

    out = pipeline_main([
        "--scp", str(tmp_path / "raw.scp"), "--out_dir", str(tmp_path / "seg"),
        "--config", str(tmp_path / "cfg.json"),
    ])
    assert out["segments"] >= 1 and out["sessions"] >= 1
    segs = json.loads((tmp_path / "seg" / "segments.json").read_text())
    assert all(s["speaker"] == "SPEAKER_00" for s in segs)
    report = json.loads((tmp_path / "seg" / "filter_report.json").read_text())
    assert report["utt0"]["kept"] == len(segs)
    sessions = json.loads((tmp_path / "seg" / "sessions.json").read_text())
    assert sessions[0]["speakers"] == ["SPEAKER_00"]
    # single-speaker fallback labelled the whole recording


def test_single_speaker_track():
    assert single_speaker_track(12.5) == [
        {"start": 0.0, "end": 12.5, "speaker": "SPEAKER_00"}
    ]
