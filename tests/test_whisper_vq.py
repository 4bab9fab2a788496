"""WhisperVQ semantic tokenizer: mel frontend parity with transformers'
WhisperFeatureExtractor, encoder parity with the reference torch
WhisperVQEncoder (random weights through the converter), and the
SSLTokenizer chunk/mask harvest (reference ``GLM4V/semantic.py:92-141``,
``modeling_whisper.py:1056-1320``)."""

import numpy as np
import pytest

from rstnet_tpu.models.whisper_vq import (
    WhisperVQConfig,
    WhisperVQEncoder,
    convert_whisper_vq,
    log_mel_spectrogram,
    vector_quantize,
)

TINY = WhisperVQConfig(
    n_mels=8, d_model=32, num_heads=4, ffn_dim=64, num_layers=2,
    pooling_kernel_size=2, pooling_position=2, quantize_position=2,
    quantize_vocab_size=32, max_source_positions=100,
)


def test_log_mel_matches_whisper_feature_extractor():
    try:
        from transformers import WhisperFeatureExtractor
    except ImportError:
        pytest.skip("transformers unavailable")
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
    fe = WhisperFeatureExtractor(feature_size=128)
    ref = fe(wav, sampling_rate=16000, return_tensors="np", padding="do_not_pad",
             do_normalize=False).input_features[0]
    mine = log_mel_spectrogram(wav, n_mels=128)
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=2e-4)


def test_vector_quantize_nearest_neighbor():
    import jax.numpy as jnp

    codebook = jnp.asarray(np.eye(4, dtype=np.float32) * 2)
    h = jnp.asarray([[0.1, 1.9, 0.0, 0.0], [2.1, 0.0, 0.0, 0.1]], jnp.float32)
    ids = vector_quantize(h, codebook)
    assert list(np.asarray(ids)) == [1, 0]


def test_encoder_shapes_pooling_and_mask():
    import jax

    model = WhisperVQEncoder(TINY)
    params = model.init(jax.random.PRNGKey(0))
    B, T_mel = 2, 40  # -> 20 after conv2, -> 10 tokens after pool 2
    mel = np.random.default_rng(0).standard_normal((B, TINY.n_mels, T_mel)).astype(np.float32)
    mask = np.ones((B, T_mel), np.float32)
    mask[1, 24:] = 0.0  # second item shorter
    ids, tok_mask = jax.jit(model.encode)(params, mel, mask)
    assert ids.shape == (B, 10) and tok_mask.shape == (B, 10)
    assert int(np.asarray(tok_mask)[0].sum()) == 10
    assert int(np.asarray(tok_mask)[1].sum()) == 6  # 24 mel -> 12 conv -> 6 tokens
    assert (np.asarray(ids) >= 0).all() and (np.asarray(ids) < TINY.quantize_vocab_size).all()


@pytest.fixture(scope="module")
def torch_vq_reference():
    import os
    import sys

    ref_root = "/root/reference/MLLM_v2"
    if not os.path.isdir(ref_root):
        pytest.skip("reference tree not available")
    torch = pytest.importorskip("torch")
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    try:
        from tools.tokenizer.GLM4V.configuration_whisper import WhisperVQConfig as RefCfg
        from tools.tokenizer.GLM4V.modeling_whisper import WhisperVQEncoder as RefEnc
    except Exception as e:  # noqa: BLE001 - vendored deps may not import
        pytest.skip(f"reference WhisperVQ not importable: {e}")
    torch.manual_seed(0)
    cfg = RefCfg(
        num_mel_bins=TINY.n_mels, d_model=TINY.d_model,
        encoder_attention_heads=TINY.num_heads, encoder_ffn_dim=TINY.ffn_dim,
        encoder_layers=TINY.num_layers, max_source_positions=TINY.max_source_positions,
        pooling_kernel_size=TINY.pooling_kernel_size, pooling_type="avg",
        pooling_position=TINY.pooling_position,
        quantize_position=TINY.quantize_position,
        quantize_vocab_size=TINY.quantize_vocab_size,
        quantize_encoder_only=True, attn_implementation="eager",
    )
    model = RefEnc(cfg).eval()
    return torch, model


def test_token_parity_vs_reference(torch_vq_reference):
    """Converter + JAX encoder reproduce the reference's quantized token ids
    for random weights (behavioral parity, no weights copied)."""
    import jax

    torch, ref = torch_vq_reference
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_whisper_vq(state, TINY)
    model = WhisperVQEncoder(TINY)

    rng = np.random.default_rng(1)
    B, T_mel = 2, 40
    mel = rng.standard_normal((B, TINY.n_mels, T_mel)).astype(np.float32) * 0.5
    mask = np.ones((B, T_mel), np.float32)
    with torch.no_grad():
        out = ref(
            input_features=torch.from_numpy(mel),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        )
    ref_ids = out.quantized_token_ids.numpy()
    ids, _ = jax.jit(model.encode)(params, mel, mask)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)


def test_token_parity_with_padding_mask(torch_vq_reference):
    import jax

    torch, ref = torch_vq_reference
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_whisper_vq(state, TINY)
    model = WhisperVQEncoder(TINY)
    rng = np.random.default_rng(2)
    B, T_mel = 2, 48
    mel = rng.standard_normal((B, TINY.n_mels, T_mel)).astype(np.float32) * 0.5
    mask = np.ones((B, T_mel), np.float32)
    mask[1, 28:] = 0.0
    with torch.no_grad():
        out = ref(
            input_features=torch.from_numpy(mel),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        )
    ids, tok_mask = jax.jit(model.encode)(params, mel, mask)
    ref_ids = out.quantized_token_ids.numpy()
    tok_mask = np.asarray(tok_mask) > 0.5
    # compare under the valid-token mask (padding tokens are garbage both sides)
    np.testing.assert_array_equal(np.asarray(ids)[tok_mask], ref_ids[tok_mask])


def test_ssl_tokenizer_chunking_and_harvest():
    """SSLTokenizer over the in-repo model: 12.5 Hz rate, chunk continuity."""
    import jax

    from rstnet_tpu.data.tokenizers.ssl_tokenizer import SSLTokenizer

    model = WhisperVQEncoder(TINY)
    params = model.init(jax.random.PRNGKey(0))
    tok = SSLTokenizer(model=model, params=params)
    # stride = 2 * pool(2) * 160 = 640 samples/token -> 25 Hz for the tiny cfg
    wav = (0.1 * np.random.default_rng(0).standard_normal(16000)).astype(np.float32)
    ids = tok.tokenize(wav)
    assert ids.dtype == np.int32
    assert len(ids) == 16000 // tok.stride
    # resampling path: 8 kHz in, same token count per second
    ids8k = tok.tokenize(
        (0.1 * np.random.default_rng(1).standard_normal(8000)).astype(np.float32),
        sample_rate=8000,
    )
    assert len(ids8k) == len(ids)
    assert tok.is_discrete and tok.find_length(wav) == 16000


def test_load_glm4v_checkpoint_dir_and_cli(tmp_path):
    """End-to-end: GLM-4-Voice checkpoint layout (config.json + safetensors)
    -> load_glm4v_encoder -> offline_tokenization --mode ssl."""
    import json

    import jax
    from safetensors.numpy import save_file

    from rstnet_tpu.models.whisper_vq import load_glm4v_encoder

    rng = np.random.default_rng(0)
    d, ffn, mels, vocab = TINY.d_model, TINY.ffn_dim, TINY.n_mels, TINY.quantize_vocab_size
    state = {
        "conv1.weight": rng.standard_normal((d, mels, 3)).astype(np.float32) * 0.05,
        "conv1.bias": np.zeros(d, np.float32),
        "conv2.weight": rng.standard_normal((d, d, 3)).astype(np.float32) * 0.05,
        "conv2.bias": np.zeros(d, np.float32),
        "embed_positions.weight": rng.standard_normal((100, d)).astype(np.float32) * 0.02,
        "codebook.weight": rng.standard_normal((vocab, d)).astype(np.float32),
    }
    for i in range(TINY.num_layers):
        p = f"layers.{i}."
        state.update({
            p + "self_attn_layer_norm.weight": np.ones(d, np.float32),
            p + "self_attn_layer_norm.bias": np.zeros(d, np.float32),
            p + "self_attn.q_proj.weight": rng.standard_normal((d, d)).astype(np.float32) * 0.05,
            p + "self_attn.q_proj.bias": np.zeros(d, np.float32),
            p + "self_attn.k_proj.weight": rng.standard_normal((d, d)).astype(np.float32) * 0.05,
            p + "self_attn.v_proj.weight": rng.standard_normal((d, d)).astype(np.float32) * 0.05,
            p + "self_attn.v_proj.bias": np.zeros(d, np.float32),
            p + "self_attn.out_proj.weight": rng.standard_normal((d, d)).astype(np.float32) * 0.05,
            p + "self_attn.out_proj.bias": np.zeros(d, np.float32),
            p + "final_layer_norm.weight": np.ones(d, np.float32),
            p + "final_layer_norm.bias": np.zeros(d, np.float32),
            p + "fc1.weight": rng.standard_normal((ffn, d)).astype(np.float32) * 0.05,
            p + "fc1.bias": np.zeros(ffn, np.float32),
            p + "fc2.weight": rng.standard_normal((d, ffn)).astype(np.float32) * 0.05,
            p + "fc2.bias": np.zeros(d, np.float32),
        })
    ckpt = tmp_path / "glm4v"
    ckpt.mkdir()
    save_file(state, str(ckpt / "model.safetensors"))
    (ckpt / "config.json").write_text(json.dumps({
        "num_mel_bins": mels, "d_model": d, "encoder_attention_heads": TINY.num_heads,
        "encoder_ffn_dim": ffn, "quantize_position": TINY.quantize_position,
        "pooling_kernel_size": TINY.pooling_kernel_size, "pooling_position": TINY.pooling_position,
        "pooling_type": "avg", "quantize_vocab_size": vocab, "max_source_positions": 100,
    }))
    model, params = load_glm4v_encoder(str(ckpt))
    assert model.config.d_model == d
    ids, _ = jax.jit(model.encode)(
        params, np.zeros((1, mels, 16), np.float32), np.ones((1, 16), np.float32)
    )
    assert ids.shape == (1, 4)

    # CLI: wav.scp -> ssl token shard
    from rstnet_tpu.tools.offline_tokenization import main as tok_main
    from rstnet_tpu.tools.scp_tools import write_scp
    from rstnet_tpu.utils.audio import write_wav

    wav = (0.1 * np.random.default_rng(1).standard_normal(16000)).astype(np.float32)
    write_wav(str(tmp_path / "a.wav"), wav, 16000)
    write_scp(str(tmp_path / "wav.scp"), [("utt0", str(tmp_path / "a.wav"))])
    tok_main([
        "--scp", str(tmp_path / "wav.scp"), "--output", str(tmp_path / "ssl.npz"),
        "--mode", "ssl", "--ssl-checkpoint", str(ckpt),
    ])
    shard = np.load(tmp_path / "ssl.npz")
    assert shard["utt0"].shape[0] == 1  # single semantic codebook
    assert shard["utt0"].shape[1] == 16000 // (2 * TINY.pooling_kernel_size * 160)
