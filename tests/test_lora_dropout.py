"""LoRA-branch dropout (reference: torch ``nn.Dropout`` before the A matrix
in ``MLLM_v2/models/llama_streaming.py:35-98`` and
``modules/transformer_lora.py``). Freshly-initialized LoRA has B = 0, so the
tests perturb the B factors to make the branch (and its dropout) observable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rstnet_tpu.models.config import Config
from rstnet_tpu.models.lm import SpeechTextLM
from rstnet_tpu.models.lora import attach_lora, init_lora

CFG = dict(
    name="tiny", block_size=64, vocab_size=256, padded_vocab_size=256,
    n_layer=2, n_head=4, n_embd=32, n_query_groups=4, intermediate_size=64,
    norm_class_name="RMSNorm", mlp_class_name="LLaMAMLP", context=64,
    audio_card=2050, n_q=8, dep_q=8, codecformer_dim=16, codecformer_heads=2,
    codecformer_layers=1, codecformer_dim_feedforward=32,
    lora_r=4, lora_alpha=8, lora_dropout=0.5,
    lora_query=True, lora_key=True, lora_value=True, lora_projection=True,
    lora_mlp=True, lora_head=True,
)


def _randomize_b(params, key):
    """Give every LoRA B factor a nonzero value so the branch contributes."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for i, (path, leaf) in enumerate(leaves):
        if any(getattr(p, "key", None) == "B" for p in path):
            leaf = jax.random.normal(jax.random.fold_in(key, i), leaf.shape, leaf.dtype)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.fixture(scope="module")
def flagship():
    cfg = Config(**CFG)
    model = SpeechTextLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.float32)
    params["backbone"] = attach_lora(
        params["backbone"], init_lora(cfg, jax.random.PRNGKey(1), jnp.float32)
    )
    params = _randomize_b(params, jax.random.PRNGKey(2))
    seq = jax.random.randint(jax.random.PRNGKey(3), (2, 9, 6), 0, 200)
    return model, params, seq


def test_no_rng_is_deterministic_baseline(flagship):
    model, params, seq = flagship
    a1, t1 = model(params, seq)
    a2, t2 = model(params, seq, dropout_rng=None)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_dropout_changes_output_and_varies_with_rng(flagship):
    model, params, seq = flagship
    base, text_base = model(params, seq)
    d1, t1 = model(params, seq, dropout_rng=jax.random.PRNGKey(10))
    d2, t2 = model(params, seq, dropout_rng=jax.random.PRNGKey(11))
    assert not np.allclose(np.asarray(base), np.asarray(d1))
    assert not np.allclose(np.asarray(d1), np.asarray(d2))
    # lora_head dropout must reach the text logits too
    assert not np.allclose(np.asarray(text_base), np.asarray(t1))
    assert np.isfinite(np.asarray(d1)).all() and np.isfinite(np.asarray(t1)).all()


def test_rate_zero_ignores_rng():
    cfg = Config(**{**CFG, "lora_dropout": 0.0})
    model = SpeechTextLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.float32)
    params["backbone"] = attach_lora(
        params["backbone"], init_lora(cfg, jax.random.PRNGKey(1), jnp.float32)
    )
    params = _randomize_b(params, jax.random.PRNGKey(2))
    seq = jax.random.randint(jax.random.PRNGKey(3), (1, 9, 4), 0, 200)
    a1, _ = model(params, seq)
    a2, _ = model(params, seq, dropout_rng=jax.random.PRNGKey(10))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_moshi_lora_dropout():
    from rstnet_tpu.models.lora import init_lora_streaming_transformer
    from rstnet_tpu.models.moshi_lm import MoshiLMModel

    m = MoshiLMModel(
        delays=(0,) * 5, n_q=4, dep_q=2, card=64, text_card=50, dim=32,
        num_heads=4, num_layers=2, context=32, depformer_dim=16,
        depformer_num_heads=2, depformer_num_layers=1, lora_dropout=0.5,
    )
    params = m.init(jax.random.PRNGKey(0), jnp.float32)
    overlay = init_lora_streaming_transformer(
        m.transformer, jax.random.PRNGKey(1), r=4, alpha=8, dtype=jnp.float32
    )
    params["transformer"] = attach_lora(params["transformer"], overlay)
    params = _randomize_b(params, jax.random.PRNGKey(2))
    seq = jax.random.randint(jax.random.PRNGKey(3), (1, 5, 6), 0, 40)
    base, _ = m(params, seq)
    d1, _ = m(params, seq, dropout_rng=jax.random.PRNGKey(10))
    d2, _ = m(params, seq, dropout_rng=jax.random.PRNGKey(11))
    assert not np.allclose(np.asarray(base), np.asarray(d1))
    assert not np.allclose(np.asarray(d1), np.asarray(d2))
    assert np.isfinite(np.asarray(d1)).all()


def test_train_step_with_dropout_seed():
    import optax

    from rstnet_tpu.training.train_step import (
        init_train_state,
        make_loss_fn,
        make_train_step,
    )

    cfg = Config(**CFG)
    model = SpeechTextLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.float32)
    params["backbone"] = attach_lora(
        params["backbone"], init_lora(cfg, jax.random.PRNGKey(1), jnp.float32)
    )
    loss_fn = make_loss_fn(model)
    tx = optax.adam(1e-3)
    step = make_train_step(loss_fn, tx, donate=False, dropout_seed=7)
    batch = {
        "tokens": jax.random.randint(jax.random.PRNGKey(2), (2, 9, 6), 0, 200),
        "masks": jnp.ones((2, 9, 6), jnp.float32),
    }
    state = init_train_state(params, tx)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # regression: the overlay must sit where the forward reads it, so the
    # LoRA factors actually receive gradients (B starts at 0, A is random)
    b_before = params["backbone"]["blocks"]["attn"]["lora_q"]["B"]
    b_after = state["params"]["backbone"]["blocks"]["attn"]["lora_q"]["B"]
    assert not np.allclose(np.asarray(b_before), np.asarray(b_after))
    # grad-accum variant threads a per-microbatch key
    step2 = make_train_step(loss_fn, tx, grad_accum=2, donate=False, dropout_seed=7)
    micro = {k: jnp.stack([v, v]) for k, v in batch.items()}
    state2 = init_train_state(params, tx)
    state2, metrics2 = step2(state2, micro)
    assert np.isfinite(float(metrics2["loss"]))
