"""Streaming conv substrate tests.

Invariants mirrored from the reference's own test strategy
(``MLLM_v2/modules/streaming.py:306-363`` self-test and
``moshi/modules/conv_test.py``): chunked streaming execution must equal
offline execution; offline output must match the PyTorch reference bit-for-
bit (same weights) to a tight float32 tolerance.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rstnet_tpu.ops.conv import StreamingConv1d, StreamingConvTranspose1d


def _chunks(total, size):
    off = 0
    while off < total:
        yield off, min(size, total - off)
        off += size


@pytest.mark.parametrize("kernel,stride", [(1, 1), (3, 1), (4, 2), (8, 4), (7, 1), (16, 8)])
@pytest.mark.parametrize("dilation", [1, 2])
def test_streaming_conv_equals_offline(kernel, stride, dilation):
    if stride > 1 and dilation > 1:
        pytest.skip("unusual combination, reference warns against it")
    conv = StreamingConv1d(6, 12, kernel, stride=stride, dilation=dilation, causal=True)
    key = jax.random.PRNGKey(0)
    params = conv.init(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 6, 240))

    y_ref = conv(params, x)

    for chunk in [stride, 4 * stride, 60]:
        if 240 % chunk or chunk % stride:
            continue
        state = conv.init_state(3)
        ys = []
        for off, size in _chunks(240, chunk):
            y, state = conv.step(params, state, x[..., off : off + size])
            ys.append(y)
        y_stream = jnp.concatenate(ys, axis=-1)
        assert y_stream.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_ref), atol=1e-5)


@pytest.mark.parametrize("kernel,stride", [(1, 1), (3, 1), (4, 2), (8, 4), (16, 8), (10, 5)])
def test_streaming_convtr_equals_offline(kernel, stride):
    convtr = StreamingConvTranspose1d(6, 4, kernel, stride=stride, causal=True)
    params = convtr.init(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 48))

    y_ref = convtr(params, x)
    assert y_ref.shape[-1] == 48 * stride

    for chunk in [1, 3, 8, 16]:
        if 48 % chunk:
            continue
        state = convtr.init_state(2)
        ys = []
        for off, size in _chunks(48, chunk):
            y, state = convtr.step(params, state, x[..., off : off + size])
            ys.append(y)
        y_stream = jnp.concatenate(ys, axis=-1)
        assert y_stream.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_ref), atol=1e-5)


@pytest.mark.parametrize("pad_mode", ["constant", "reflect", "replicate"])
def test_streaming_conv_pad_modes(pad_mode):
    conv = StreamingConv1d(2, 3, 7, stride=1, causal=True, pad_mode=pad_mode)
    params = conv.init(jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 64))
    y_ref = conv(params, x)
    state = conv.init_state(1)
    ys = []
    for off, size in _chunks(64, 16):
        y, state = conv.step(params, state, x[..., off : off + size])
        ys.append(y)
    y_stream = jnp.concatenate(ys, axis=-1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_ref), atol=1e-5)


def test_step_is_jittable_fixed_shape():
    conv = StreamingConv1d(4, 8, 8, stride=4, causal=True)
    params = conv.init(jax.random.PRNGKey(0))
    state = conv.init_state(2)
    step = jax.jit(conv.step)
    x = jnp.ones((2, 4, 16))
    y, new_state = step(params, state, x)
    assert y.shape == (2, 8, 4)
    assert new_state["buf"].shape == state["buf"].shape
    # state shapes stable across steps -> single compilation
    y2, _ = step(params, new_state, x)
    assert y2.shape == y.shape


class TestTorchParity:
    """Offline outputs match the PyTorch reference with identical weights."""

    @pytest.mark.parametrize(
        "kernel,stride,dilation,causal",
        [(7, 1, 1, True), (8, 4, 1, True), (3, 1, 2, True), (7, 1, 1, False), (4, 2, 1, False)],
    )
    def test_conv1d(self, torch_reference, kernel, stride, dilation, causal):
        torch = torch_reference
        from modules.conv import StreamingConv1d as TorchConv

        tconv = TorchConv(
            5, 7, kernel, stride=stride, dilation=dilation, causal=causal,
            pad_mode="constant",
        )
        jconv = StreamingConv1d(
            5, 7, kernel, stride=stride, dilation=dilation, causal=causal,
            pad_mode="constant",
        )
        raw = tconv.conv.conv
        params = {
            "weight": jnp.asarray(raw.weight.detach().numpy()),
            "bias": jnp.asarray(raw.bias.detach().numpy()),
        }
        x = torch.randn(2, 5, 97)
        with torch.no_grad():
            y_t = tconv(x).numpy()
        y_j = np.asarray(jconv(params, jnp.asarray(x.numpy())))
        assert y_t.shape == y_j.shape
        np.testing.assert_allclose(y_j, y_t, atol=2e-5)

    @pytest.mark.parametrize("kernel,stride", [(4, 2), (16, 8), (10, 5), (3, 1)])
    def test_convtr1d(self, torch_reference, kernel, stride):
        torch = torch_reference
        from modules.conv import StreamingConvTranspose1d as TorchConvTr

        tconv = TorchConvTr(6, 3, kernel, stride=stride, causal=True)
        jconv = StreamingConvTranspose1d(6, 3, kernel, stride=stride, causal=True)
        raw = tconv.convtr.convtr
        params = {
            "weight": jnp.asarray(raw.weight.detach().numpy()),
            "bias": jnp.asarray(raw.bias.detach().numpy()),
        }
        x = torch.randn(2, 6, 31)
        with torch.no_grad():
            y_t = tconv(x).numpy()
        y_j = np.asarray(jconv(params, jnp.asarray(x.numpy())))
        assert y_t.shape == y_j.shape
        np.testing.assert_allclose(y_j, y_t, atol=2e-5)

    def test_streaming_matches_torch_streaming(self, torch_reference):
        """Chunked streaming in JAX == chunked streaming in torch, same weights."""
        torch = torch_reference
        from modules.conv import StreamingConv1d as TorchConv

        kernel, stride = 8, 4
        tconv = TorchConv(3, 5, kernel, stride=stride, causal=True, pad_mode="constant")
        jconv = StreamingConv1d(3, 5, kernel, stride=stride, causal=True)
        raw = tconv.conv.conv
        params = {
            "weight": jnp.asarray(raw.weight.detach().numpy()),
            "bias": jnp.asarray(raw.bias.detach().numpy()),
        }
        x = torch.randn(1, 3, 64)
        xj = jnp.asarray(x.numpy())
        state = jconv.init_state(1)
        with torch.no_grad(), tconv.streaming(1):
            for off in range(0, 64, 16):
                y_t = tconv(x[..., off : off + 16]).numpy()
                y_j, state = jconv.step(params, state, xj[..., off : off + 16])
                np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-5)


def test_replicate_pad_first_flag_is_per_slot():
    """Multi-session serving: resetting one slot of a replicate-pad
    streaming conv (zero carry + first=True) reproduces a fresh stream
    exactly, while other slots keep their state."""
    from rstnet_tpu.modules.resample import ConvDownsample1d

    ds = ConvDownsample1d(2, dimension=4, causal=True, learnt=True)
    p = ds.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((2, 4, 2)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((2, 4, 2)), jnp.float32)

    s = ds.init_state(2)
    assert s["first"].shape == (2,)
    y, s = ds.step(p, s, x1)
    # reset slot 1 the way MimiModel.reset_encode_slots does
    s_reset = {"buf": s["buf"].at[1].set(0), "first": s["first"].at[1].set(True)}
    y2, s_after = ds.step(p, s_reset, x2)

    s0 = ds.init_state(1)
    y0, _ = ds.step(p, s0, x2[1:])
    np.testing.assert_allclose(np.asarray(y2[1]), np.asarray(y0[0]), rtol=1e-5, atol=1e-6)
    # slot 0 unaffected by the reset
    y_cont, _ = ds.step(p, {"buf": s["buf"], "first": s["first"]}, x2)
    np.testing.assert_allclose(np.asarray(y2[0]), np.asarray(y_cont[0]), rtol=1e-5, atol=1e-6)
