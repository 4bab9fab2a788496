"""Mimi codec tests: encode/decode parity vs torch reference; stream == offline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rstnet_tpu.models.mimi import MimiModel, mimi_24k
from rstnet_tpu.modules.seanet import SEANetDecoder, SEANetEncoder
from rstnet_tpu.modules.transformer import ProjectedTransformer, StreamingTransformer
from rstnet_tpu.quantization.rvq import SplitResidualVectorQuantizer

# Small config: hop 12, sample_rate 48 -> encoder rate 4 Hz, frame rate 2 Hz,
# stride-2 resample; same topology as the real Mimi (loaders.py:24-66).
SEANET = dict(
    channels=1, dimension=64, n_filters=4, n_residual_layers=1,
    ratios=(4, 3), activation="ELU", kernel_size=7, residual_kernel_size=3,
    last_kernel_size=3, dilation_base=2, compress=2, causal=True,
    pad_mode="constant", true_skip=True, norm="none", disable_norm_outer_blocks=0,
)
FRAME_SIZE = 24  # samples per token frame


def _my_model() -> MimiModel:
    transformer = StreamingTransformer(
        d_model=64, num_heads=4, num_layers=2, dim_feedforward=128,
        causal=True, context=8, gating="none", norm="layer_norm",
        positional_embedding="rope", layer_scale=0.01,
    )
    proj = lambda: ProjectedTransformer(  # noqa: E731
        transformer, input_dimension=64, output_dimensions=(64,), conv_layout=True
    )
    return MimiModel(
        encoder=SEANetEncoder(**SEANET),
        decoder=SEANetDecoder(**SEANET),
        encoder_transformer=proj(),
        decoder_transformer=proj(),
        quantizer=SplitResidualVectorQuantizer(
            dimension=32, input_dimension=64, output_dimension=64, n_q=4,
            n_q_semantic=1, bins=16,
        ),
        frame_rate=2.0, encoder_frame_rate=4.0, sample_rate=48, channels=1,
        causal=True, num_codebooks=4,
    )


@pytest.fixture(scope="module")
def torch_mimi(torch_reference):
    torch = torch_reference
    from moshi.models.compression import MimiModel as TorchMimi
    from moshi.modules import SEANetDecoder as TD, SEANetEncoder as TE
    from moshi.modules import transformer as ttr
    from moshi.quantization import SplitResidualVectorQuantizer as TQ

    kwargs = dict(SEANET)
    kwargs["ratios"] = list(kwargs["ratios"])
    tkw = dict(
        d_model=64, num_heads=4, num_layers=2, dim_feedforward=128,
        causal=True, context=8, gating="none", norm="layer_norm",
        positional_embedding="rope", layer_scale=0.01, conv_layout=True,
        input_dimension=64, output_dimensions=[64], max_period=10000,
    )
    model = TorchMimi(
        TE(**kwargs), TD(**kwargs),
        TQ(dimension=32, input_dimension=64, output_dimension=64, n_q=4,
           n_q_semantic=1, bins=16),
        channels=1, sample_rate=48, frame_rate=2, encoder_frame_rate=4,
        causal=True, resample_method="conv",
        encoder_transformer=ttr.ProjectedTransformer(**tkw),
        decoder_transformer=ttr.ProjectedTransformer(**tkw),
    ).eval()
    model.set_num_codebooks(4)
    # Give the EMA codebooks meaningful content.
    with torch.no_grad():
        for rvq in (model.quantizer.rvq_first, model.quantizer.rvq_rest):
            for layer in rvq.vq.layers:
                cb = layer._codebook
                cb.embedding_sum.normal_()
                cb.cluster_usage.uniform_(0.5, 2.0)
                cb._initialized.fill_(1)
    return model


@pytest.fixture(scope="module")
def converted(torch_mimi):
    from rstnet_tpu.models.convert import convert_mimi

    sd = {k: v.detach().numpy() for k, v in torch_mimi.state_dict().items()}
    model = _my_model()
    return model, convert_mimi(sd, model)


class TestTorchParity:
    def test_encode_bit_exact(self, torch_reference, torch_mimi, converted):
        torch = torch_reference
        model, params = converted
        wav = torch.randn(2, 1, FRAME_SIZE * 10)
        with torch.no_grad():
            codes_t = torch_mimi.encode(wav).numpy()
        codes_j = np.asarray(model.encode(params, jnp.asarray(wav.numpy())))
        assert codes_t.shape == codes_j.shape
        np.testing.assert_array_equal(codes_j, codes_t)

    def test_decode_close(self, torch_reference, torch_mimi, converted):
        torch = torch_reference
        model, params = converted
        codes = torch.randint(0, 16, (2, 4, 10))
        with torch.no_grad():
            audio_t = torch_mimi.decode(codes).numpy()
        audio_j = np.asarray(model.decode(params, jnp.asarray(codes.numpy())))
        assert audio_t.shape == audio_j.shape
        np.testing.assert_allclose(audio_j, audio_t, atol=1e-4)


def test_streaming_encode_equals_offline(converted):
    model, params = converted
    wav = jax.random.normal(jax.random.PRNGKey(0), (1, 1, FRAME_SIZE * 8))
    codes_ref = model.encode(params, wav)
    state = model.init_encode_state(1)
    out = []
    for f in range(8):
        codes, state = model.encode_step(
            params, state, wav[..., f * FRAME_SIZE : (f + 1) * FRAME_SIZE]
        )
        out.append(codes)
    codes_stream = jnp.concatenate(out, axis=-1)
    np.testing.assert_array_equal(np.asarray(codes_stream), np.asarray(codes_ref))


def test_streaming_decode_equals_offline(converted):
    model, params = converted
    codes = jax.random.randint(jax.random.PRNGKey(1), (1, 4, 8), 0, 16)
    audio_ref = model.decode(params, codes)
    state = model.init_decode_state(1)
    out = []
    for f in range(8):
        audio, state = model.decode_step(params, state, codes[..., f : f + 1])
        out.append(audio)
    audio_stream = jnp.concatenate(out, axis=-1)
    assert audio_stream.shape == audio_ref.shape
    np.testing.assert_allclose(
        np.asarray(audio_stream), np.asarray(audio_ref), atol=1e-5
    )


def test_roundtrip_shapes(converted):
    model, params = converted
    wav = jax.random.normal(jax.random.PRNGKey(2), (1, 1, FRAME_SIZE * 5))
    out = model.roundtrip(params, wav)
    assert out.shape == wav.shape


def test_mimi24k_constructs():
    """The full-size canonical config builds and has the advertised geometry."""
    m = mimi_24k()
    assert m.frame_size == 1920
    assert m.encoder.hop_length == 960
    assert m.resample_stride == 2
    assert m.quantizer.total_codebooks == 32
    assert m.num_codebooks == 8


def test_multi_session_codec_slot_reset_matches_solo():
    """Batched codec serving: after reset_encode/decode_slots + session_age
    masking, a rejoined slot streams exactly like a fresh solo session."""
    m = _my_model()
    params = m.init(jax.random.PRNGKey(0))
    enc_step = jax.jit(m.encode_step)
    dec_step = jax.jit(m.decode_step)
    rng = np.random.default_rng(5)
    frames = [
        jnp.asarray(rng.standard_normal((2, 1, FRAME_SIZE)), jnp.float32) * 0.3
        for _ in range(7)
    ]

    # batched: both slots run 3 frames; slot 1 then resets and runs 4 more
    enc_state = m.init_encode_state(2)
    dec_state = m.init_decode_state(2)
    age = jnp.zeros((2,), jnp.int32)
    got_codes, got_audio = [], []
    for t, x in enumerate(frames):
        if t == 3:
            enc_state = m.reset_encode_slots(enc_state, [1])
            dec_state = m.reset_decode_slots(dec_state, [1])
            age = age.at[1].set(0)
        codes, enc_state = enc_step(params, enc_state, x, age)
        audio, dec_state = dec_step(params, dec_state, codes, age)
        age = age + 1
        if t >= 3:
            got_codes.append(np.asarray(codes[1]))
            got_audio.append(np.asarray(audio[1]))

    # solo: a fresh session streams the same last 4 frames
    enc_state = m.init_encode_state(1)
    dec_state = m.init_decode_state(1)
    age = jnp.zeros((1,), jnp.int32)
    for t in range(3, 7):
        codes, enc_state = enc_step(params, enc_state, frames[t][1:], age)
        audio, dec_state = dec_step(params, dec_state, codes, age)
        age = age + 1
        np.testing.assert_array_equal(got_codes[t - 3], np.asarray(codes[0]))
        np.testing.assert_allclose(
            got_audio[t - 3], np.asarray(audio[0]), rtol=1e-4, atol=1e-5
        )
