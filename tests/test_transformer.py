"""Streaming transformer tests: stream == offline; parity vs torch reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rstnet_tpu.modules.transformer import ProjectedTransformer, StreamingTransformer


def _mk(positional="rope", context=16, gating="none", wps=0, layer_scale=None, ff=64):
    return StreamingTransformer(
        d_model=32,
        num_heads=4,
        num_layers=3,
        dim_feedforward=ff,
        causal=True,
        context=context,
        gating=gating,
        norm="rms_norm_f32" if gating != "none" else "layer_norm",
        positional_embedding=positional,
        layer_scale=layer_scale,
        weights_per_step=wps,
    )


@pytest.mark.parametrize("positional", ["rope", "sin", "none"])
def test_stream_equals_offline(positional):
    tr = _mk(positional=positional)
    params = tr.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 32))
    y_ref = tr(params, x)
    state = tr.init_state(2, dtype=jnp.float32, chunk_size=4)
    ys = []
    for off in range(0, 24, 4):
        y, state = tr.step(params, state, x[:, off : off + 4])
        ys.append(y)
    y_stream = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_ref), atol=2e-5)


def test_stream_equals_offline_context_window():
    """Window smaller than sequence: ring cache evicts exactly like the mask."""
    tr = _mk(positional="rope", context=8)
    params = tr.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32))
    y_ref = tr(params, x)
    state = tr.init_state(1, dtype=jnp.float32)
    ys = []
    for off in range(0, 32, 1):
        y, state = tr.step(params, state, x[:, off : off + 1])
        ys.append(y)
    y_stream = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_ref), atol=2e-5)


def test_weights_per_step_stream_equals_offline():
    """Depformer-style: 8 steps, each with its own weights."""
    tr = _mk(positional="none", context=None, gating="silu", wps=8)
    params = tr.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32))
    y_ref = tr(params, x)
    state = tr.init_state(2, dtype=jnp.float32)
    ys = []
    for t in range(8):
        y, state = tr.step(params, state, x[:, t : t + 1])
        ys.append(y)
    y_stream = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_ref), atol=2e-5)


def _torch_to_params(torch, ttr, module: StreamingTransformer):
    """Map a reference StreamingTransformer state to stacked params."""
    from rstnet_tpu.models.convert import convert_streaming_transformer

    sd = {f"t.{k}": v.detach().numpy() for k, v in ttr.state_dict().items()}
    return convert_streaming_transformer(sd, "t", module)


class TestTorchParity:
    @pytest.mark.parametrize(
        "kwargs,atol",
        [
            (dict(positional_embedding="rope", gating="none", norm="layer_norm", layer_scale=0.01), 3e-5),
            # sin/cos transcendentals differ slightly between torch and XLA CPU
            (dict(positional_embedding="sin", gating="none", norm="layer_norm"), 5e-4),
            (dict(positional_embedding="rope", gating="silu", norm="rms_norm_f32"), 3e-5),
        ],
    )
    def test_transformer(self, torch_reference, kwargs, atol):
        torch = torch_reference
        from modules.transformer import StreamingTransformer as TorchTransformer

        ttr = TorchTransformer(
            d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
            causal=True, context=16, **kwargs,
        ).eval()
        mine = StreamingTransformer(
            d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
            causal=True, context=16, **kwargs,
        )
        params = _torch_to_params(torch, ttr, mine)
        x = torch.randn(2, 12, 32)
        with torch.no_grad():
            y_t = ttr(x).numpy()
        y_j = np.asarray(mine(params, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(y_j, y_t, atol=atol)

    def test_weights_per_step(self, torch_reference):
        torch = torch_reference
        from modules.transformer import StreamingTransformer as TorchTransformer

        ttr = TorchTransformer(
            d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
            causal=True, context=8, gating="silu", norm="rms_norm_f32",
            positional_embedding="none", weights_per_step=8,
        ).eval()
        mine = StreamingTransformer(
            d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
            causal=True, context=8, gating="silu", norm="rms_norm_f32",
            positional_embedding="none", weights_per_step=8,
        )
        params = _torch_to_params(torch, ttr, mine)
        x = torch.randn(2, 8, 32)
        with torch.no_grad():
            y_t = ttr(x).numpy()
        y_j = np.asarray(mine(params, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(y_j, y_t, atol=3e-5)

    def test_projected_transformer_mimi_config(self, torch_reference):
        """The exact Mimi codec transformer config (loaders.py:51-66), small dims."""
        torch = torch_reference
        from modules.transformer import StreamingTransformer as TorchTransformer

        # ProjectedTransformer only exists in the moshi copy; emulate projs.
        inner = StreamingTransformer(
            d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
            causal=True, context=16, layer_scale=0.01, gating="none",
            norm="layer_norm", positional_embedding="rope",
        )
        proj = ProjectedTransformer(inner, input_dimension=24, output_dimensions=(24,), conv_layout=True)
        params = proj.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 20))
        (y,) = proj(params, x)
        assert y.shape == (2, 24, 20)
        # stream == offline through the projections
        state = proj.init_state(2, dtype=jnp.float32, chunk_size=4)
        ys = []
        for off in range(0, 20, 4):
            (yc,), state = proj.step(params, state, x[..., off : off + 4])
            ys.append(yc)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate(ys, axis=-1)), np.asarray(y), atol=2e-5
        )


def test_offline_offset_preserves_causality():
    """Offline __call__ with offset != 0: outputs must not depend on
    future inputs (regression: pos_k lacked the offset, letting queries
    attend up to `offset` steps into the future)."""
    tr = StreamingTransformer(
        d_model=16, num_heads=2, num_layers=2, dim_feedforward=32,
        causal=True, context=8, positional_embedding="rope", norm="rms_norm_f32",
        gating="silu",
    )
    params = tr.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16))
    y = tr(params, x, offset=7)
    x2 = x.at[:, 4:].set(0.0)  # perturb the future
    y2 = tr(params, x2, offset=7)
    np.testing.assert_allclose(
        np.asarray(y[:, :4]), np.asarray(y2[:, :4]), rtol=1e-5, atol=1e-6
    )
