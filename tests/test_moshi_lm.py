"""Moshi LMModel tests: parity vs the reference inference model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rstnet_tpu.inference.generate import LMGen
from rstnet_tpu.models.moshi_lm import MoshiLMModel, moshi_7b

SMALL = dict(
    delays=(0, 0) + (1,) * 3 + (0,) + (1,) * 3,  # 1 text + 8 audio streams
    n_q=8, dep_q=4, card=32, text_card=64, dim=32, num_heads=4, num_layers=2,
    hidden_scale=4.0, norm="rms_norm_f32", gating="silu",
    positional_embedding="rope", context=16, existing_text_padding_id=3,
    depformer_dim=16, depformer_dim_feedforward=32, depformer_num_heads=2,
    depformer_num_layers=2, depformer_multi_linear=True,
    depformer_weights_per_step=True, depformer_pos_emb="none",
)


def test_moshi_7b_config():
    m = moshi_7b()
    assert m.dim == 4096 and m.num_layers == 32
    assert m.depformer_dim == 1024 and m.depformer_num_layers == 6
    assert m.num_codebooks == 17
    assert m.text_padding_token_id == 3


def test_training_forward_shapes():
    m = MoshiLMModel(**SMALL)
    params = m.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    text = jax.random.randint(key, (2, 1, 5), 0, 64)
    audio = jax.random.randint(key, (2, 8, 5), 0, 32)
    seq = jnp.concatenate([text, audio], 1)
    audio_logits, text_logits = m(params, seq)
    assert audio_logits.shape == (2, 5, 4, 32)
    assert text_logits.shape == (2, 5, 64)


def test_lmgen_runs_with_user_streams():
    """Duplex setup: the user supplies n_q - dep_q streams per frame."""
    m = MoshiLMModel(**SMALL)
    gen = LMGen(m, delays=m.delays)
    assert gen.num_user_streams == 4
    params = m.init(jax.random.PRNGKey(0))
    state = gen.init_state(1, dtype=jnp.float32)
    key = jax.random.PRNGKey(2)
    step = jax.jit(gen.step, donate_argnums=(1,))
    for t in range(4):
        key, k1, k2 = jax.random.split(key, 3)
        user = jax.random.randint(k2, (1, 4, 1), 0, 32)
        out, valid, state = step(params, state, k1, user)
    assert bool(valid)
    assert out.shape == (1, 5, 1)  # text + dep_q audio
    assert (np.asarray(out) >= 0).all()


class TestTorchParity:
    def test_forward_text_and_depformer(self, torch_reference):
        torch = torch_reference
        from moshi.models.lm import LMModel as TorchLM

        tmodel = TorchLM(
            delays=list(SMALL["delays"]), n_q=8, dep_q=4, card=32, text_card=64,
            dim=32, num_heads=4, num_layers=2, hidden_scale=4,
            norm="rms_norm_f32", gating="silu", positional_embedding="rope",
            context=16, existing_text_padding_id=3, depformer_dim=16,
            depformer_dim_feedforward=32, depformer_num_heads=2,
            depformer_num_layers=2, depformer_multi_linear=True,
            depformer_weights_per_step=True, depformer_pos_emb="none",
            causal=True, max_period=10000,
        ).eval()
        m = MoshiLMModel(**SMALL)
        from rstnet_tpu.models.convert import convert_moshi_lm

        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        params = convert_moshi_lm(sd, m)

        key = jax.random.PRNGKey(0)
        text = jax.random.randint(key, (2, 1, 6), 0, 64)
        audio = jax.random.randint(key, (2, 8, 6), 0, 32)
        seq = np.asarray(jnp.concatenate([text, audio], 1))
        with torch.no_grad():
            hidden_t, text_logits_t = tmodel.forward_text(torch.as_tensor(seq))
        hidden_j, text_logits_j = m.forward_text(params, jnp.asarray(seq))
        np.testing.assert_allclose(
            np.asarray(hidden_j), hidden_t.numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(text_logits_j), text_logits_t[:, 0].numpy(), atol=1e-4
        )
        # single depformer step parity, teacher-forced
        with torch.no_grad(), tmodel.depformer.streaming(2):
            prev = torch.as_tensor(seq[:, 0:1, 0:1])
            logits_t = tmodel.forward_depformer(0, prev, hidden_t[:, 0:1])
        cf_state = m.init_codecformer_state(2, dtype=jnp.float32)
        logits_j, _ = m.step_codecformer(
            params, cf_state, 0, jnp.asarray(seq[:, 0, 0:1]), hidden_j[:, 0:1]
        )
        np.testing.assert_allclose(
            np.asarray(logits_j), logits_t.reshape(2, 1, -1).numpy(), atol=1e-4
        )


def test_moshi_lmgen_kv_int8():
    """int8 ring-KV works on the StreamingTransformer family too: the
    Moshi LMGen runs with quantized caches and stays close to exact."""
    from rstnet_tpu.inference.generate import LMGen

    m = MoshiLMModel(**SMALL)
    params = m.init(jax.random.PRNGKey(0))
    gen = LMGen(m, delays=m.delays, use_sampling=False)
    gen8 = LMGen(m, delays=m.delays, use_sampling=False, kv_int8=True)
    step = jax.jit(gen.step)
    step8 = jax.jit(gen8.step)
    key = jax.random.PRNGKey(2)
    user = jnp.zeros((1, gen.num_user_streams, 1), jnp.int32)
    s, s8 = gen.init_state(1, jnp.float32), gen8.init_state(1, jnp.float32)
    assert s8["lm"]["kv"]["k"].dtype == jnp.int8
    n_match = 0
    for _ in range(8):
        out, _, s = step(params, s, key, user)
        out8, _, s8 = step8(params, s8, key, user)
        n_match += int((np.asarray(out) == np.asarray(out8)).all())
    assert n_match >= 6, f"only {n_match}/8 greedy frames matched exact KV"


def test_moshi_text_linear_int8_head():
    """--int8-head server path: text_linear consumes the quantized dict and
    stays close to the bf16 logits."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rstnet_tpu.models.moshi_lm import MoshiLMModel
    from rstnet_tpu.modules.transformer import quantize_weight_int8

    lm = MoshiLMModel(
        delays=(0,) * 9, n_q=8, dep_q=4, card=16, text_card=64, dim=32,
        num_heads=4, num_layers=1, hidden_scale=4.0, context=16,
        existing_text_padding_id=3, depformer_dim=16,
        depformer_dim_feedforward=32, depformer_num_heads=2,
        depformer_num_layers=1,
    )
    params = lm.init(jax.random.PRNGKey(0))
    hidden = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32))
    ref = lm._text_logits(params, hidden)
    q = dict(params)
    q["text_linear"] = dict(params["text_linear"])
    q["text_linear"]["weight"] = quantize_weight_int8(params["text_linear"]["weight"])
    got = lm._text_logits(q, hidden)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.05, rtol=0.1)
