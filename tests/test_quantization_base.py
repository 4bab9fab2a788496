"""DummyQuantizer / QuantizedResult parity (reference quantization/base.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.quantization import DummyQuantizer, QuantizedResult


def test_dummy_quantizer_round_trip():
    q = DummyQuantizer(dimension=8, frame_rate=12.5)
    params = q.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 5))
    res = q(params, x)
    assert isinstance(res, QuantizedResult)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(x))
    codes = q.encode(params, x)
    assert codes.shape == (2, 1, 8, 5)
    np.testing.assert_array_equal(np.asarray(q.decode(params, codes)), np.asarray(x))
    assert q.total_codebooks == q.num_codebooks == 1
    assert abs(float(res.bandwidth) - 8 * 32 * 12.5 / 1000.0) < 1e-5
    assert float(res.penalty) == 0.0
