"""LoRA param-transform tests: zero-init identity, merge equivalence,
trainable mask."""

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.models.backbone import Backbone
from rstnet_tpu.models.config import Config
from rstnet_tpu.models.lora import (
    attach_lora,
    init_lora,
    lora_trainable_mask,
    merge_lora,
    strip_lora,
)

CFG = dict(
    name="test-tiny", block_size=64, vocab_size=96, padded_vocab_size=96,
    n_layer=2, n_head=4, n_embd=32, n_query_groups=2, rotary_percentage=1.0,
    parallel_residual=False, bias=False, norm_class_name="RMSNorm",
    mlp_class_name="LLaMAMLP", intermediate_size=64, context=None,
    lora_r=4, lora_alpha=8, lora_query=True, lora_key=True, lora_value=True,
    lora_projection=True, lora_mlp=True, lora_head=True,
)


def _setup():
    cfg = Config(**CFG)
    bb = Backbone(cfg)
    base = bb.init(jax.random.PRNGKey(0))
    overlay = init_lora(cfg, jax.random.PRNGKey(1))
    params = attach_lora(base, overlay)
    return cfg, bb, base, params


def test_zero_init_is_identity():
    """B=0 at init -> LoRA model == base model."""
    cfg, bb, base, params = _setup()
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 96)
    y_base = bb.forward_tokens(base, tokens)
    y_lora = bb.forward_tokens(params, tokens)
    np.testing.assert_allclose(np.asarray(y_lora), np.asarray(y_base), atol=1e-6)


def test_merge_matches_unmerged_forward():
    """After random B, merged weights == runtime LoRA branch."""
    cfg, bb, base, params = _setup()
    # randomize B factors so LoRA actually does something
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: (
            jax.random.normal(jax.random.PRNGKey(hash(str(path)) % 2**31), x.shape) * 0.1
            if any(getattr(p, "key", None) == "B" for p in path)
            else x
        ),
        params,
    )
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, 8), 0, 96)
    y_runtime = bb.forward_tokens(params, tokens)
    merged = merge_lora(cfg, params)
    assert not any("lora" in str(p) for p, _ in jax.tree_util.tree_flatten_with_path(merged)[0])
    y_merged = bb.forward_tokens(merged, tokens)
    np.testing.assert_allclose(np.asarray(y_merged), np.asarray(y_runtime), atol=2e-5)


def test_trainable_mask_and_strip():
    cfg, bb, base, params = _setup()
    mask = lora_trainable_mask(params)
    leaves = jax.tree.leaves(mask)
    assert any(leaves) and not all(leaves)
    # count: lora leaves = A+B per adapted linear
    n_lora = sum(bool(v) for v in leaves)
    assert n_lora == 2 * (3 + 1 + 3) * 1 + 2  # (qkv + proj + mlp3) stacked + head(A,B)
    stripped = strip_lora(params)
    assert jax.tree.structure(stripped) == jax.tree.structure(base)


def test_lora_filter_round_trip():
    """lora_filter keeps exactly the adapter factors; attach_lora onto a
    fresh base reconstructs the full tree (PEFT checkpoint semantics)."""
    from rstnet_tpu.models.lora import lora_filter

    cfg, bb, base, full = _setup()
    overlay = init_lora(cfg, jax.random.PRNGKey(1))
    adapters = lora_filter(full)
    assert len(jax.tree.leaves(adapters)) == len(jax.tree.leaves(overlay))
    rebuilt = attach_lora(bb.init(jax.random.PRNGKey(0)), adapters)
    for a, b in zip(jax.tree.leaves(rebuilt), jax.tree.leaves(full)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
