"""Tests: prefix-LM mask, streaming-transformer LoRA, compile/dtype helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.models.lora import attach_lora, init_lora_streaming_transformer
from rstnet_tpu.modules.transformer import StreamingTransformer
from rstnet_tpu.ops.attention import prefix_lm_mask
from rstnet_tpu.utils.compile import DtypePolicy, simple_checkpoint


def test_prefix_lm_mask_semantics():
    # prefix = 2 steps, target = 3 steps, padding = 2 steps
    loss_mask = jnp.asarray([[False, False, True, True, True, False, False]])
    m = np.asarray(prefix_lm_mask(loss_mask))
    assert m.shape == (1, 7, 7)
    # prefix sees itself bidirectionally
    assert m[0, 0, 1] and m[0, 1, 0]
    # target causal: step 3 sees 2, not 4
    assert m[0, 3, 2] and not m[0, 3, 4]
    # padding columns masked everywhere
    assert not m[0, :, 5].any() and not m[0, :, 6].any()
    # causal-only mode
    m2 = np.asarray(prefix_lm_mask(loss_mask, prefix_lm=False))
    assert not m2[0, 0, 1]


def test_streaming_transformer_lora():
    tr = StreamingTransformer(
        d_model=32, num_heads=4, num_layers=2, dim_feedforward=64, causal=True,
        context=16, gating="silu", norm="rms_norm_f32", positional_embedding="rope",
    )
    params = tr.init(jax.random.PRNGKey(0))
    overlay = init_lora_streaming_transformer(tr, jax.random.PRNGKey(1), r=4, alpha=8)
    lora_params = attach_lora(params, overlay)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 32))
    # zero-init B -> identical output
    np.testing.assert_allclose(
        np.asarray(tr(lora_params, x)), np.asarray(tr(params, x)), atol=1e-6
    )
    # nonzero B changes the output
    lora_params["layers"]["lora_in_proj"]["B"] = (
        jnp.ones_like(lora_params["layers"]["lora_in_proj"]["B"]) * 0.1
    )
    assert not np.allclose(np.asarray(tr(lora_params, x)), np.asarray(tr(params, x)))


def test_dtype_policy_and_checkpoint():
    policy = DtypePolicy(jnp.bfloat16)
    params = {"w": jnp.ones((4, 4), jnp.float32), "i": jnp.ones((2,), jnp.int32)}
    cast = policy.cast_params(params)
    assert cast["w"].dtype == jnp.bfloat16
    assert cast["i"].dtype == jnp.int32

    def f(w, x):
        return jnp.sum(jnp.tanh(x @ w) @ w)

    g = simple_checkpoint(f, "dots")
    w = jnp.ones((4, 4))
    x = jnp.ones((2, 4))
    np.testing.assert_allclose(float(g(w, x)), float(f(w, x)), rtol=1e-6)
    # gradients still flow through the remat boundary
    gr = jax.grad(g)(w, x)
    assert bool(jnp.isfinite(gr).all())


def test_decode_layer_unroll_memory_bound(monkeypatch):
    """Full unroll for single-session decode; rolled down when the
    per-layer KV-slab temp cost at large batch would blow HBM (the 8B
    B=24 buffer-assignment failure)."""
    import jax
    import jax.numpy as jnp

    from rstnet_tpu.utils.compile import decode_layer_unroll

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    kv_small = {"k": jnp.zeros((32, 1, 8, 3000, 128), jnp.int8)}
    assert decode_layer_unroll(32, kv_small, 1) == 32
    # 8B B=16 (~3 GB of slab copies) still fully unrolls under 4 GiB...
    kv_16 = {"k": jnp.zeros((32, 16, 8, 3000, 128), jnp.int8)}
    assert decode_layer_unroll(32, kv_16, 1) == 32
    # ...but B=24 (~4.5 GB) rolls FULLY (partial unroll crashes the
    # compiler; see decode_layer_unroll docstring)
    kv_big = {"k": jnp.zeros((32, 24, 8, 3000, 128), jnp.int8)}
    assert decode_layer_unroll(32, kv_big, 1) == 1
    # long chunks and CPU never unroll
    assert decode_layer_unroll(32, kv_small, 16) == 1
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert decode_layer_unroll(32, kv_small, 1) == 1
