"""Sequence/context parallelism and expert parallelism correctness.

The mesh must not change the math: context-parallel windowed attention
(ops/context_parallel.py, `seq` axis) and expert-sharded MoE (`expert`
axis) produce the same numbers as the single-device dense path. The
reference never shards a sequence or experts across devices (SURVEY §2.7 —
TP/EP "not implemented", §5 long-context via windowed attention only);
these are TPU-native extensions riding the same mesh.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rstnet_tpu.models.config import Config
from rstnet_tpu.models.lm import SpeechTextLM
from rstnet_tpu.ops.attention import masked_attention
from rstnet_tpu.ops.context_parallel import (
    context_parallel_attention,
    seq_axis_size,
)
from rstnet_tpu.parallel.mesh import make_mesh
from rstnet_tpu.parallel.sharding import batch_sharding, infer_param_shardings
from rstnet_tpu.training.schedulers import warmup_lr
from rstnet_tpu.training.train_step import (
    init_train_state,
    make_loss_fn,
    make_optimizer,
    make_train_step,
)


class TestContextParallelOp:
    B, H, T, D = 2, 4, 64, 16

    def _qkv(self):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        return [jax.random.normal(k, (self.B, self.H, self.T, self.D)) for k in ks]

    @pytest.mark.parametrize("context", [8, 24, 64, None])
    @pytest.mark.parametrize("n_seq", [2, 4, 8])
    def test_forward_matches_dense(self, context, n_seq):
        q, k, v = self._qkv()
        pos = jnp.arange(self.T)
        ref = masked_attention(q, k, v, pos, pos, context=context)
        mesh = make_mesh({"seq": n_seq, "fsdp": 8 // n_seq})
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda q, k, v: context_parallel_attention(
                    q, k, v, context=context, scale=1.0 / math.sqrt(self.D)
                )
            )(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_grad_matches_dense(self):
        q, k, v = self._qkv()
        pos = jnp.arange(self.T)
        mesh = make_mesh({"seq": 4, "fsdp": 2})
        with jax.set_mesh(mesh):
            g_cp = jax.jit(
                jax.grad(
                    lambda q, k, v: jnp.sum(
                        context_parallel_attention(
                            q, k, v, context=24, scale=1.0 / math.sqrt(self.D)
                        )
                        ** 2
                    ),
                    argnums=(0, 1, 2),
                )
            )(q, k, v)
        g_ref = jax.grad(
            lambda q, k, v: jnp.sum(masked_attention(q, k, v, pos, pos, context=24) ** 2),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g_cp, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_sliding_window_and_softcap(self):
        q, k, v = self._qkv()
        pos = jnp.arange(self.T)
        mesh = make_mesh({"seq": 4, "fsdp": 2})
        # window=10 on top of unbounded context == dense context=10 (same
        # delta < w semantics); softcap exercised through the tanh branch
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda q, k, v: context_parallel_attention(
                    q, k, v, context=None, window=10,
                    scale=1.0 / math.sqrt(self.D), softcap=30.0,
                )
            )(q, k, v)
        logits_ref = (
            jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
            / math.sqrt(self.D)
        )
        logits_ref = jnp.tanh(logits_ref / 30.0) * 30.0
        delta = pos[:, None] - pos[None, :]
        mask = (delta >= 0) & (delta < 10)
        logits_ref = jnp.where(mask[None, None], logits_ref, float("-inf"))
        ref = jnp.einsum(
            "bhts,bhsd->bhtd", jax.nn.softmax(logits_ref, -1).astype(v.dtype), v
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_seq_axis_size_no_mesh(self):
        assert seq_axis_size() == 1


SP_CFG = dict(
    name="sp-tiny", block_size=64, vocab_size=128, padded_vocab_size=128,
    n_layer=2, n_head=4, n_embd=32, n_query_groups=2, rotary_percentage=1.0,
    parallel_residual=False, bias=False, norm_class_name="RMSNorm",
    mlp_class_name="LLaMAMLP", intermediate_size=64, context=32,
    audio_card=32, codecformer_dim=16, n_q=8, dep_q=8, codecformer_heads=2,
    codecformer_layers=1, codecformer_dim_feedforward=32,
    sequence_parallel=True,
)


def _run_step(model, params, batch, mesh_shape):
    tx = make_optimizer(warmup_lr(1e-3, 10))
    loss_fn = make_loss_fn(model, audio_ignore_id=33, text_ignore_id=127)
    n = math.prod(mesh_shape.values())
    mesh = make_mesh(mesh_shape, devices=jax.devices()[:n])
    with jax.set_mesh(mesh):
        p = jax.device_put(params, infer_param_shardings(mesh, params))
        state = init_train_state(p, tx)
        db = {
            k: jax.device_put(jnp.asarray(v), batch_sharding(mesh, 3))
            for k, v in batch.items()
        }
        step = make_train_step(loss_fn, tx, donate=False)
        state, metrics = step(state, db)
        return float(metrics["loss"]), jax.tree.map(np.asarray, state["params"])


def test_train_step_invariant_to_seq_mesh():
    """A sequence-parallel train step == the single-device step."""
    model = SpeechTextLM(Config(**SP_CFG))
    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    B, S = 4, 16
    batch = {
        "tokens": np.asarray(
            jnp.concatenate(
                [
                    jax.random.randint(key, (B, 1, S), 0, 128),
                    jax.random.randint(key, (B, 8, S), 0, 32),
                ],
                axis=1,
            )
        ),
        "masks": np.ones((B, 9, S), np.float32),
    }
    loss_ref, params_ref = _run_step(model, params, batch, {"data": 1})
    loss_sp, params_sp = _run_step(model, params, batch, {"seq": 4, "fsdp": 2})
    assert abs(loss_ref - loss_sp) < 1e-3, (loss_ref, loss_sp)
    worst = max(
        float(np.max(np.abs(a - b)))
        for a, b in zip(jax.tree.leaves(params_ref), jax.tree.leaves(params_sp))
    )
    assert worst < 5e-3, worst


MOE_CFG = dict(
    name="ep-tiny", block_size=32, vocab_size=64, padded_vocab_size=64,
    n_layer=2, n_head=4, n_embd=32, n_query_groups=2, rotary_percentage=1.0,
    parallel_residual=False, bias=False, norm_class_name="RMSNorm",
    mlp_class_name="LLaMAMoE", intermediate_size=48, context=16,
    n_expert=4, n_expert_per_token=2,
    audio_card=32, codecformer_dim=16, n_q=8, dep_q=8, codecformer_heads=2,
    codecformer_layers=1, codecformer_dim_feedforward=32,
)


class TestExpertParallel:
    def test_expert_sharding_rule(self):
        model = SpeechTextLM(Config(**MOE_CFG))
        params = model.init(jax.random.PRNGKey(0))
        mesh = make_mesh({"expert": 4, "fsdp": 2})
        shardings = infer_param_shardings(mesh, params)
        spec = shardings["backbone"]["blocks"]["mlp"]["experts"]["fc_1"]["weight"].spec
        assert "expert" in str(spec), spec
        # placement must succeed for the whole tree
        placed = jax.device_put(params, shardings)
        assert jax.tree.structure(placed) == jax.tree.structure(params)

    def test_moe_forward_invariant_to_expert_mesh(self):
        model = SpeechTextLM(Config(**MOE_CFG))
        params = model.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        B, S = 4, 8
        seq = jnp.concatenate(
            [
                jax.random.randint(key, (B, 1, S), 0, 64),
                jax.random.randint(key, (B, 8, S), 0, 32),
            ],
            axis=1,
        )
        audio_ref, text_ref = jax.jit(model)(params, seq)
        mesh = make_mesh({"expert": 4, "fsdp": 2})
        with jax.set_mesh(mesh):
            p = jax.device_put(params, infer_param_shardings(mesh, params))
            audio_ep, text_ep = jax.jit(model)(p, seq)
        np.testing.assert_allclose(
            np.asarray(text_ep), np.asarray(text_ref), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(audio_ep), np.asarray(audio_ref), atol=2e-4
        )
