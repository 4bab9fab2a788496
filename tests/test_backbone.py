"""Backbone (litgpt-capability decoder) tests: parity vs torch; streaming."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rstnet_tpu.models.backbone import Backbone
from rstnet_tpu.models.config import Config

TINY = dict(
    name="test-tiny", block_size=128, vocab_size=96, padded_vocab_size=96,
    n_layer=2, n_head=4, n_embd=32, n_query_groups=2, rotary_percentage=1.0,
    parallel_residual=False, bias=False, norm_class_name="RMSNorm",
    mlp_class_name="LLaMAMLP", intermediate_size=64, context=None,
)


def _tiny_config(**over) -> Config:
    d = dict(TINY)
    d.update(over)
    return Config(**d)


def test_forward_shapes():
    cfg = _tiny_config()
    bb = Backbone(cfg)
    params = bb.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 96)
    logits = bb.forward_tokens(params, tokens)
    assert logits.shape == (2, 10, 96)


def test_streaming_equals_offline():
    cfg = _tiny_config(context=16)
    bb = Backbone(cfg)
    params = bb.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 24), 0, 96)
    x = bb.embed(params, tokens)
    y_ref = bb(params, x)
    state = bb.init_state(1, dtype=jnp.float32)
    ys = []
    for t in range(24):
        y, state = bb.step(params, state, x[:, t : t + 1])
        ys.append(y)
    y_stream = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_ref), atol=3e-5)


def test_moe_forward():
    cfg = _tiny_config(mlp_class_name="LLaMAMoE", n_expert=4, n_expert_per_token=2)
    bb = Backbone(cfg)
    params = bb.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 96)
    logits = bb.forward_tokens(params, tokens)
    assert logits.shape == (2, 6, 96)
    assert bool(jnp.isfinite(logits).all())


class TestTorchParity:
    def _torch_lit(self, torch, **over):
        import models.config as ref_config
        import models.lit_model as lit

        # the reference resolves mlp_class via a `litgpt` install; route it
        # to the local lit_model definitions instead
        ref_config.Config.mlp_class = property(
            lambda self: getattr(lit, self.mlp_class_name)
        )
        d = dict(TINY)
        d.pop("context")
        d.pop("name")
        d.update(over)
        tcfg = ref_config.Config(name="test-tiny", **d)
        return lit.GPT(tcfg).eval()

    @pytest.mark.parametrize(
        "over",
        [
            {},  # llama-style GQA
            dict(n_query_groups=1),  # MQA
            dict(n_query_groups=4),  # MHA
            dict(norm_class_name="LayerNorm", mlp_class_name="GptNeoxMLP",
                 intermediate_size=None, bias=True, parallel_residual=True),
            dict(rotary_percentage=0.5),
            dict(attention_logit_softcapping=30.0, final_logit_softcapping=10.0),
        ],
    )
    def test_logits_match(self, torch_reference, over):
        torch = torch_reference
        from rstnet_tpu.models.convert import convert_backbone

        tmodel = self._torch_lit(torch, **over)
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        cfg = _tiny_config(**over)
        bb = Backbone(cfg)
        params = convert_backbone(sd, cfg)
        tokens = torch.randint(0, 96, (2, 12))
        with torch.no_grad():
            ref = tmodel(tokens).numpy()
        mine = np.asarray(bb.forward_tokens(params, jnp.asarray(tokens.numpy())))
        np.testing.assert_allclose(mine, ref, atol=5e-5)

    def test_llama31_rope_adjustments(self, torch_reference):
        torch = torch_reference
        from rstnet_tpu.models.convert import convert_backbone

        adj = {"factor": 8.0, "low_freq_factor": 1.0, "high_freq_factor": 4.0,
               "original_max_seq_len": 32}
        import models.config as ref_config
        import models.lit_model as lit

        ref_config.Config.mlp_class = property(
            lambda self: getattr(lit, self.mlp_class_name)
        )
        d = dict(TINY)
        d.pop("context")
        d.pop("name")
        tcfg = ref_config.Config(name="test-tiny", rope_adjustments=adj, **d)
        tmodel = lit.GPT(tcfg).eval()
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        cfg = _tiny_config(rope_adjustments=(8.0, 1.0, 4.0, 32))
        params = convert_backbone(sd, cfg)
        tokens = torch.randint(0, 96, (1, 16))
        with torch.no_grad():
            ref = tmodel(tokens).numpy()
        mine = np.asarray(Backbone(cfg).forward_tokens(params, jnp.asarray(tokens.numpy())))
        np.testing.assert_allclose(mine, ref, atol=5e-5)
