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
