"""Pipeline parallelism correctness: the GPipe SPMD schedule over the
`pipe` mesh axis (parallel/pipeline.py) must reproduce the plain
scan-over-layers math exactly — forward, gradients, and a full train step.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.models.config import Config
from rstnet_tpu.models.lm import SpeechTextLM
from rstnet_tpu.parallel.mesh import make_mesh
from rstnet_tpu.parallel.pipeline import pipe_axis_size, spmd_pipeline
from rstnet_tpu.parallel.sharding import batch_sharding, infer_param_shardings
from rstnet_tpu.training.schedulers import warmup_lr
from rstnet_tpu.training.train_step import (
    init_train_state,
    make_loss_fn,
    make_optimizer,
    make_train_step,
)


def _toy():
    L, B, T, D = 4, 8, 6, 5
    ws = jax.random.normal(jax.random.PRNGKey(0), (L, D))
    bs = jax.random.normal(jax.random.PRNGKey(1), (L, D))
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, D))

    def body(h, inp):
        w, b = inp
        return jnp.tanh(h * w + b), None

    return body, x, (ws, bs)


class TestSpmdPipelineOp:
    def test_forward_matches_scan(self):
        body, x, xs = _toy()
        ref, _ = jax.lax.scan(body, x, xs)
        mesh = make_mesh({"pipe": 4, "data": 2})
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda x, xs: spmd_pipeline(body, x, xs, n_stages=4, n_micro=4)
            )(x, xs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_more_microbatches_than_stages(self):
        body, x, xs = _toy()
        ref, _ = jax.lax.scan(body, x, xs)
        mesh = make_mesh({"pipe": 2, "data": 4})
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda x, xs: spmd_pipeline(body, x, xs, n_stages=2, n_micro=8)
            )(x, xs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_grad_matches_scan(self):
        body, x, xs = _toy()
        mesh = make_mesh({"pipe": 4, "data": 2})

        def loss_pp(x, xs):
            return jnp.sum(spmd_pipeline(body, x, xs, n_stages=4, n_micro=4) ** 2)

        def loss_ref(x, xs):
            return jnp.sum(jax.lax.scan(body, x, xs)[0] ** 2)

        with jax.set_mesh(mesh):
            g_pp = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(x, xs)
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, xs)
        for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_pipe_axis_size_no_mesh(self):
        assert pipe_axis_size() == 1


PP_CFG = dict(
    name="pp-tiny", block_size=64, vocab_size=128, padded_vocab_size=128,
    n_layer=2, n_head=4, n_embd=32, n_query_groups=2, rotary_percentage=1.0,
    parallel_residual=False, bias=False, norm_class_name="RMSNorm",
    mlp_class_name="LLaMAMLP", intermediate_size=64, context=32,
    audio_card=32, codecformer_dim=16, n_q=8, dep_q=8, codecformer_heads=2,
    codecformer_layers=1, codecformer_dim_feedforward=32,
    pipeline_parallel=True,
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


def test_train_step_invariant_to_pipe_mesh():
    """Pipelined flagship train step == the single-device step; block params
    actually shard their layer axis over `pipe`."""
    model = SpeechTextLM(Config(**PP_CFG))
    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    B, S = 8, 12
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
    mesh = make_mesh({"pipe": 2, "data": 2, "fsdp": 2})
    spec = infer_param_shardings(mesh, params)["backbone"]["blocks"]["attn"]["weight"].spec
    assert "pipe" in str(spec), spec

    loss_ref, params_ref = _run_step(model, params, batch, {"data": 1})
    loss_pp, params_pp = _run_step(model, params, batch, {"pipe": 2, "data": 2, "fsdp": 2})
    assert abs(loss_ref - loss_pp) < 1e-3, (loss_ref, loss_pp)
    worst = max(
        float(np.max(np.abs(a - b)))
        for a, b in zip(jax.tree.leaves(params_ref), jax.tree.leaves(params_pp))
    )
    assert worst < 5e-3, worst
