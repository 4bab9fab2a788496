"""Quantization quality-bound machinery (evalsuite/quant_quality.py):
streaming teacher-forced CE parity with the offline forward, key-determinism
of the agreement measure, and the int8 / kv-int8 variants producing sane
numbers on a tiny model."""

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.evalsuite.quant_quality import (
    agreement,
    compare_quant_variants,
    teacher_forced_stream,
)
from rstnet_tpu.losses.ce import cross_entropy_and_accuracy
from rstnet_tpu.models.config import Config
from rstnet_tpu.models.lm import SpeechTextLM, quantize_for_serving

CFG = dict(
    name="qq-tiny", block_size=64, vocab_size=96, padded_vocab_size=96,
    n_layer=2, n_head=4, n_embd=32, n_query_groups=2, rotary_percentage=1.0,
    parallel_residual=False, bias=False, norm_class_name="RMSNorm",
    mlp_class_name="LLaMAMLP", intermediate_size=64, context=32,
    audio_card=66, n_q=4, dep_q=4, codecformer_dim=16, codecformer_heads=2,
    codecformer_layers=2, codecformer_dim_feedforward=32,
)


def _setup(dtype=jnp.float32):
    cfg = Config(**CFG)
    model = SpeechTextLM(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype)
    rng = np.random.default_rng(1)
    B, T = 2, 12
    grid = np.concatenate(
        [
            rng.integers(0, cfg.padded_vocab_size, (B, 1, T)),
            rng.integers(0, cfg.audio_card - 2, (B, cfg.n_q, T)),
        ],
        axis=1,
    ).astype(np.int32)
    return cfg, model, params, grid


def test_streaming_tf_ce_matches_offline_forward():
    """The streaming teacher-forced CE must equal the training forward's CE
    on the same grid (positions 1..T-1) — the streaming path is scored on
    exactly the same conditional distributions."""
    cfg, model, params, grid = _setup(jnp.float32)
    r = teacher_forced_stream(
        model, params, grid, jax.random.PRNGKey(3), state_dtype=jnp.float32
    )
    audio_logits, text_logits = jax.jit(lambda p, s: model(p, s))(params, jnp.asarray(grid))
    # offline logits at position t predict grid[..., t]; the streaming pass
    # replays exactly that conditioning (initial frame first), so ALL T
    # positions are comparable
    tgt = jnp.asarray(grid)
    ones = jnp.ones((grid.shape[0], 1, grid.shape[2]), jnp.float32)
    loss_a, _ = cross_entropy_and_accuracy(
        audio_logits, tgt[:, 1 : cfg.dep_q + 1],
        jnp.broadcast_to(ones, (grid.shape[0], cfg.dep_q, grid.shape[2])),
        (1.0,) * cfg.dep_q, (-1,) * cfg.dep_q,
    )
    loss_t, _ = cross_entropy_and_accuracy(
        text_logits[:, :, None, :], tgt[:, 0:1], ones, (1.0,), (-1,),
    )
    # cross_entropy sums weighted per-stream means; normalize to per-token
    np.testing.assert_allclose(r.ce_audio, float(loss_a) / cfg.dep_q, rtol=2e-4)
    np.testing.assert_allclose(r.ce_text, float(loss_t), rtol=2e-4)


def test_same_key_same_samples():
    cfg, model, params, grid = _setup()
    r1 = teacher_forced_stream(model, params, grid, jax.random.PRNGKey(5))
    r2 = teacher_forced_stream(model, params, grid, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(r1.sampled, r2.sampled)
    assert agreement(r1.sampled, r2.sampled) == 1.0
    r3 = teacher_forced_stream(model, params, grid, jax.random.PRNGKey(6))
    assert agreement(r1.sampled, r3.sampled) < 1.0


def test_compare_quant_variants():
    cfg, model, params, grid = _setup(jnp.bfloat16)
    params_q = quantize_for_serving(model, params)
    out = compare_quant_variants(
        model, params,
        {
            "int8": (params_q, False),
            "int8+kv8": (params_q, True),
        },
        grid, jax.random.PRNGKey(7),
    )
    rows = out["rows"]
    assert rows["bf16"]["agree_sampled"] == 1.0
    for name in ("int8", "int8+kv8"):
        row = rows[name]
        assert np.isfinite(row["ppl_audio"]) and np.isfinite(row["ppl_text"])
        assert 0.0 < row["agree_sampled"] <= 1.0
        assert 0.0 < row["agree_greedy"] <= 1.0
        # per-channel int8 on a tiny random model stays in the same
        # distribution family: CE shift bounded, not exploding
        assert abs(row["d_ce_audio"]) < 1.0
        assert abs(row["d_ce_text"]) < 1.0
    # shapes: [B, 1+dep_q, T]
    ref = out["results"]["bf16"]
    assert ref.sampled.shape == (grid.shape[0], cfg.dep_q + 1, grid.shape[2])


def test_bench_int8_quality_glue_tiny():
    """The bench's full int8-quality pipeline (variant loop, one-at-a-time
    builds, Mimi decode + SI-SNR) at tiny scale: every row present and
    finite, headline keys wired."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from bench import bench_int8_quality

    out = bench_int8_quality(B=2, T=8, tiny=True)
    assert out["int8_quality_frames"] == 16
    rows = out["int8_quality"]
    # tiny mode covers the three distinct code paths (identity, composed
    # partial quant, full quant + int8 KV); the full 5-variant matrix runs
    # at scale only (bench.py::bench_int8_quality)
    assert set(rows) == {"bf16", "mixed_int8", "int8_kv_int8"}
    for name, row in rows.items():
        assert np.isfinite(row["ppl_audio"]), (name, row)
        if name != "bf16":
            assert 0.0 < row["agree_sampled"] <= 1.0
            assert np.isfinite(row["decoded_sisnr_db"])
    assert out["int8_ppl_delta"] == rows["int8_kv_int8"]["d_ce_audio"]
    assert out["int8_agree_sampled"] == rows["int8_kv_int8"]["agree_sampled"]


def test_decode_leg_is_code_sensitive():
    """Regression for a vacuous-measure bug: RVQ codebooks init to zero
    (kmeans-on-first-batch), so random-init Mimi decode ignored the codes
    and every variant scored an identical ~94 dB SI-SNR. The bench's
    codebook randomization must make decode depend on the codes."""
    import sys
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from bench import _randomize_codebooks
    from rstnet_tpu.models.mimi import mimi_24k

    mimi = mimi_24k(dimension=32, n_filters=4, num_layers=1, quantizer_dim=16)
    params = mimi.init(jax.random.PRNGKey(3))
    c1 = jax.random.randint(jax.random.PRNGKey(0), (1, 8, 4), 0, 2048)
    c2 = jax.random.randint(jax.random.PRNGKey(1), (1, 8, 4), 0, 2048)
    # zero-init: decode is code-blind (the bug this guards against)
    a1, a2 = mimi.decode(params, c1), mimi.decode(params, c2)
    assert jnp.allclose(a1, a2)
    # randomized codebooks: decode must distinguish the two streams
    rp = _randomize_codebooks(params, jax.random.PRNGKey(5))
    b1, b2 = mimi.decode(rp, c1), mimi.decode(rp, c2)
    assert not jnp.allclose(b1, b2)


def test_bench_int8_quality_trained_tiny():
    """Glue test for the trained-agreement bench (tiny sizes, few steps):
    it must run end-to-end, report the random-vs-trained agreement pair,
    and actually reduce the memorization loss."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from bench import bench_int8_quality_trained

    out = bench_int8_quality_trained(tiny=True)
    assert out["int8_trained_steps"] >= 2
    loss0, loss_end = out["int8_trained_loss"]
    assert np.isfinite(loss_end) and loss_end < loss0
    pair = out["int8_agree_sampled_random_vs_trained"]
    assert len(pair) == 2 and all(0.0 <= p <= 1.0 for p in pair)
    for leg in ("int8_quality_random_init", "int8_quality_trained"):
        rows = out[leg]
        assert "mixed_int8" in rows and "int8_kv_int8" in rows
        for v in ("mixed_int8", "int8_kv_int8"):
            assert 0.0 <= rows[v]["agree_greedy"] <= 1.0
