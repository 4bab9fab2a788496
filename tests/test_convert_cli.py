"""convert_checkpoint CLI smoke: a handcrafted tiny litgpt-layout torch
checkpoint round-trips through the converter into both output formats, and
the converted params drive the Backbone forward. (The per-weight conversion
math is covered by the torch parity tests; this locks the CLI surface:
load_torch_state_dict -> convert -> save_model/export_numpy.)"""

import numpy as np
import pytest
import torch

from rstnet_tpu.tools import convert_checkpoint

CFG_YAML = """
name: convert-smoke
block_size: 64
vocab_size: 96
padded_vocab_size: 96
n_layer: 2
n_head: 2
n_embd: 16
n_query_groups: 1
rotary_percentage: 1.0
parallel_residual: false
bias: false
norm_class_name: RMSNorm
mlp_class_name: LLaMAMLP
intermediate_size: 32
context: 32
"""


def _lit_state_dict(g):
    """litgpt naming (reference ``models/lit_model.py``) for the tiny config."""
    d, inter, vocab = 16, 32, 96
    qkv = (2 + 2 * 1) * (d // 2)  # (n_head + 2*groups) * head_size
    sd = {
        "transformer.wte.weight": torch.randn(vocab, d, generator=g),
        "transformer.ln_f.weight": torch.ones(d),
        "lm_head.weight": torch.randn(vocab, d, generator=g) * 0.02,
    }
    for i in range(2):
        b = f"transformer.h.{i}"
        sd[f"{b}.norm_1.weight"] = torch.ones(d)
        sd[f"{b}.norm_2.weight"] = torch.ones(d)
        sd[f"{b}.attn.attn.weight"] = torch.randn(qkv, d, generator=g) * 0.1
        sd[f"{b}.attn.proj.weight"] = torch.randn(d, d, generator=g) * 0.1
        sd[f"{b}.mlp.fc_1.weight"] = torch.randn(inter, d, generator=g) * 0.1
        sd[f"{b}.mlp.fc_2.weight"] = torch.randn(inter, d, generator=g) * 0.1
        sd[f"{b}.mlp.proj.weight"] = torch.randn(d, inter, generator=g) * 0.1
    return sd


@pytest.mark.parametrize("fmt", ["npz", "orbax"])
def test_backbone_convert_roundtrip(tmp_path, fmt):
    import jax
    import jax.numpy as jnp

    from rstnet_tpu.models.backbone import Backbone
    from rstnet_tpu.models.config import Config

    g = torch.Generator().manual_seed(0)
    sd = _lit_state_dict(g)
    ckpt = tmp_path / "lit_model.pth"
    torch.save(sd, str(ckpt))
    cfg_path = tmp_path / "model.yaml"
    cfg_path.write_text(CFG_YAML)

    out = tmp_path / f"converted_{fmt}"
    convert_checkpoint.main([
        "--kind", "backbone", "--input", str(ckpt), "--output", str(out),
        "--model_config", str(cfg_path), "--format", fmt,
    ])

    cfg = Config.from_file(str(cfg_path))
    bb = Backbone(cfg)
    if fmt == "npz":
        flat = np.load(str(out) + ".npz" if not out.exists() else str(out))
        # wte survives byte-exact through the npz export
        key = [k for k in flat.files if k.endswith("wte")][0]
        np.testing.assert_allclose(
            flat[key], sd["transformer.wte.weight"].numpy(), atol=0
        )
        return
    from rstnet_tpu.training.checkpoint import load_model

    template = bb.init(jax.random.PRNGKey(0), jnp.float32)
    params = load_model(str(out), template)
    np.testing.assert_allclose(
        np.asarray(params["wte"]), sd["transformer.wte.weight"].numpy(), atol=0
    )
    # converted params must run the forward
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, 96)
    logits = bb.forward_tokens(params, tokens)
    assert logits.shape == (1, 8, 96)
    assert np.isfinite(np.asarray(logits)).all()
