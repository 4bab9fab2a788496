"""Codec data plumbing: WaveDataset segment/pairing semantics (parity:
``AudioCodec/MimiCodec/dataloaders/base_dataloader.py:14``), semantic
teacher variants, and the codec round-trip inference CLI writing paired
ref/deg trees for the metric CLIs."""

import numpy as np
import pytest
import yaml

from rstnet_tpu.utils.audio import write_wav

SR = 2400


@pytest.fixture()
def wav_scp(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i, n in enumerate((SR, SR // 2, 3 * SR)):  # short file exercises padding
        p = tmp_path / f"w{i}.wav"
        write_wav(str(p), (0.2 * rng.normal(0, 1, n)).astype(np.float32), SR)
        paths.append(str(p))
    scp = tmp_path / "train.scp"
    scp.write_text("\n".join(paths))
    return scp


def test_wave_dataset_segments_and_16k_view(wav_scp):
    from rstnet_tpu.data.codec_dataset import WaveDataset

    seg = 1200
    ds = WaveDataset(str(wav_scp), segment_size=seg, sampling_rate=SR)
    assert len(ds) == 3
    for i in range(3):
        a24, a16 = ds[i]
        assert a24.shape == (1, seg)
        assert a16.shape == (1, int(seg / SR * 16000))
        assert np.isfinite(a24).all() and np.isfinite(a16).all()
    # the short file (half a segment) is zero-padded, not skipped
    short24, _ = ds[1]
    assert short24.shape == (1, seg)


def test_semantic_teacher_variants():
    from rstnet_tpu.data.semantic_features import build_teacher

    audio = np.zeros((2, 1, 16000), np.float32)  # [B, 1, T] @ 16 kHz
    null = build_teacher("none")
    f = null.extract(audio)
    assert f.shape == (2, 16000 // 320, null.feature_dim)  # 50 Hz grid
    pre = build_teacher("precomputed", feature_dim=32)
    assert pre.feature_dim == 32
    with pytest.raises(RuntimeError, match="precomputed"):
        pre.extract(audio)  # features must come through the batch
    with pytest.raises(AssertionError, match="checkpoint"):
        build_teacher("wavlm")  # hard dep: needs a checkpoint path
    with pytest.raises(ValueError, match="unknown"):
        build_teacher("nonsense")


def test_codec_infer_roundtrip_cli(tmp_path, wav_scp):
    from rstnet_tpu.inference import codec_infer
    from rstnet_tpu.utils.audio import read_wav

    config = {
        "generator": {"name": "MimiCodec", "config": {
            "sample_rate": SR, "n_filters": 4, "encoder_rates": [4, 3],
            "latent_dim": 32, "codebook_size": 16, "codebook_dim": 8,
            "rvq_layers": 4, "num_heads": 2, "num_layers": 1,
            "layer_scale": 0.01, "context": 32, "dim_feedforward": 64,
            "semantic_feature_dim": 16, "target_frame_rate": 100}},
    }
    cfg = tmp_path / "config.yaml"
    cfg.write_text(yaml.safe_dump(config))
    out = tmp_path / "rt"
    # random-init params: the CLI logs and proceeds when no checkpoint exists
    codec_infer.main([
        "--config", str(cfg), "--checkpoint_dir", str(tmp_path / "no_exp"),
        "--scp", str(wav_scp), "--out_dir", str(out),
    ])
    refs = sorted((out / "ref").glob("*.wav"))
    degs = sorted((out / "deg").glob("*.wav"))
    assert len(refs) == 3 and len(degs) == 3
    for r, d in zip(refs, degs):
        ref, sr_r = read_wav(str(r))
        deg, sr_d = read_wav(str(d))
        assert sr_r == sr_d == SR
        assert deg.shape[-1] == ref.shape[-1]
        assert np.isfinite(deg).all()
