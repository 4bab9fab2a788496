"""Pallas TPU megakernel: one fused depformer micro-step (all layers + head).

Why: the depformer slice of the decode frame (8 sequential micro-steps
through a 6-layer depth transformer; reference ``MLLM_v2/models/model.py:564``
depformer_step) is latency-bound, not bandwidth-bound — each micro-step is
~40-60 tiny XLA kernels (GEMVs, norms, ring writes, softmax) whose per-kernel
launch/DMA latency dominates: measured ~0.4 ms/step at 2B-flagship shapes
(~270 GB/s effective) vs ~0.13 ms of pure weight traffic. This kernel runs
one ENTIRE micro-step as a single ``pallas_call``:

* grid = (num_layers + 1,) — TPU grid programs run sequentially on the core,
  so the carried activation lives in a VMEM scratch across layer programs;
  the final program applies the per-step audio head.
* the micro-step index ``cb`` is a scalar-prefetch operand: each (layer, cb)
  weight slice is DMA'd straight out of the stacked ``weights_per_step``
  parameter tensors by BlockSpec index maps, and Pallas double-buffers the
  next layer's slice behind the current layer's compute — no HBM gathers,
  no per-op launch gaps.
* attention over the ≤8-slot per-frame KV cache is computed reshape-free via
  a block-diagonal head-selector matmul (``[C, H]`` 0/1 matrix built from
  iotas), so Mosaic never has to relayout ``[B, C] -> [B, heads, 64]``.
* the KV cache is private to the frame (the depformer resets every frame),
  stored pos-major ``[L, S, C]`` — each layer program reads its block,
  dynamic-update-slices row ``cb``, and writes it back.

Semantics match ``StreamingTransformer.step`` with ``weights_per_step`` +
``positional_embedding='none'`` + rms-norm + gated-silu FFN (the depformer
configuration of both the flagship ``SpeechTextLM`` and ``MoshiLMModel``),
followed by the per-codebook audio head of ``step_codecformer``
(``models/lm.py:333``). Matmuls run bf16 on the MXU with f32 accumulation;
norms/softmax in f32 (same policy as the XLA path).

Constraints: B == 1 (the latency-bound case; batched decode is already
MXU-efficient under XLA), d_model % 128 == 0, audio card % 128 == 0, gating
hidden padded to a multiple of 128 (``pad_codecformer_gating``). Opt-in on
TPU via RSTNET_PALLAS_DEP=1 (remote Mosaic compiles are slow here);
correctness is covered in interpret mode on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _rms(x: jax.Array, alpha: jax.Array, eps: float) -> jax.Array:
    var = eps + jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * (alpha * jax.lax.rsqrt(var))


def _dot_t(a: jax.Array, w: jax.Array) -> jax.Array:
    """a [B, in] @ w[out, in]^T -> [B, out], f32 accumulation on the MXU."""
    return jax.lax.dot_general(
        a, w, (((1,), (1,)), ((), ())), preferred_element_type=_F32
    )


def _dep_step_kernel(
    # scalar prefetch
    s_ref,
    *refs,
    L: int,
    heads: int,
    eps: float,
    quant: bool,
):
    if quant:
        # int8 weights with per-output-row scales interleaved after each
        # weight ref (half the per-step HBM DMA — the kernel's bound)
        (x_ref, n1_ref, inw_ref, inws_ref, outw_ref, outws_ref, n2_ref,
         gin_ref, gins_ref, gout_ref, gouts_ref, hw_ref, hws_ref, hb_ref,
         kc_ref, vc_ref, logits_ref, kco_ref, vco_ref, xs) = refs
    else:
        (x_ref, n1_ref, inw_ref, outw_ref, n2_ref, gin_ref, gout_ref,
         hw_ref, hb_ref, kc_ref, vc_ref,
         logits_ref, kco_ref, vco_ref, xs) = refs
        inws_ref = outws_ref = gins_ref = gouts_ref = hws_ref = None

    def wload(ref, sref, idx):
        """Weight block as bf16, dequantizing int8 rows in VMEM."""
        if sref is None:
            return ref[idx].astype(jnp.bfloat16)
        return (ref[idx].astype(_F32) * sref[idx].astype(_F32)).astype(
            jnp.bfloat16
        )

    l = pl.program_id(0)
    cb = s_ref[0]
    lm = jnp.minimum(l, L - 1)
    B, C = x_ref.shape
    S = kc_ref.shape[1]
    dh = C // heads
    scale = 1.0 / (dh ** 0.5)

    @pl.when(l == 0)
    def _():
        xs[:] = x_ref[:].astype(_F32)

    @pl.when(l < L)
    def _():
        x = xs[:]  # [B, C] f32 residual stream
        # --- attention block -------------------------------------------------
        # norms/bias are whole tiny arrays in VMEM (a (1, C) block would
        # violate Mosaic's (8, 128)-divisible block rule); row-select here
        a1 = n1_ref[pl.ds(lm, 1), :].astype(_F32)
        h = _rms(x, a1, eps).astype(jnp.bfloat16)
        qkv = _dot_t(h, wload(inw_ref, inws_ref, 0))  # [B, 3C] f32
        q, k_new, v_new = qkv[:, :C], qkv[:, C : 2 * C], qkv[:, 2 * C :]

        kc = kc_ref[0].astype(_F32)  # [S, C] pos-major packed heads
        vc = vc_ref[0].astype(_F32)
        # row-select write of position cb (Mosaic has no dynamic_update_slice
        # on values; a broadcast where is a pure VPU select)
        row = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        kc = jnp.where(row == cb, k_new, kc)
        vc = jnp.where(row == cb, v_new, vc)
        kco_ref[0] = kc.astype(kco_ref.dtype)
        vco_ref[0] = vc.astype(vco_ref.dtype)

        # head selector: sel[j, h] = 1 iff lane j belongs to head h. Lets the
        # per-head score/broadcast ops stay 2D matmuls (no [B,H,dh] relayout).
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, heads), 0)
        hidx = jax.lax.broadcasted_iota(jnp.int32, (C, heads), 1)
        sel = (lane // dh == hidx).astype(_F32)  # [C, H]

        # B == 1: q[0] broadcasts over the S cache rows.
        t = kc * q[0][None, :]  # [S, C]
        scores = jax.lax.dot_general(
            t, sel, (((1,), (0,)), ((), ())), preferred_element_type=_F32
        ) * scale  # [S, H]
        pos = jax.lax.broadcasted_iota(jnp.int32, (S, heads), 0)
        scores = jnp.where(pos <= cb, scores, -jnp.inf)
        m = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=0, keepdims=True)  # [S, H] softmax over pos
        p_lane = jax.lax.dot_general(
            p, sel, (((1,), (1,)), ((), ())), preferred_element_type=_F32
        )  # [S, C]
        attn = jnp.sum(p_lane * vc, axis=0, keepdims=True)  # [1, C] == [B, C]
        x = x + _dot_t(attn.astype(jnp.bfloat16), wload(outw_ref, outws_ref, 0))

        # --- gated FFN --------------------------------------------------------
        a2 = n2_ref[pl.ds(lm, 1), :].astype(_F32)
        h2 = _rms(x, a2, eps).astype(jnp.bfloat16)
        g = _dot_t(h2, wload(gin_ref, gins_ref, (0, 0)))  # [B, 2H]
        H2 = g.shape[1] // 2
        gate, val = g[:, :H2], g[:, H2:]
        hid = (gate * jax.nn.sigmoid(gate)) * val  # silu gating, f32
        x = x + _dot_t(hid.astype(jnp.bfloat16), wload(gout_ref, gouts_ref, (0, 0)))
        xs[:] = x

    @pl.when(l == L)
    def _():
        xb = xs[:].astype(jnp.bfloat16)
        logits = _dot_t(xb, wload(hw_ref, hws_ref, 0))  # [B, card]
        hb = hb_ref[pl.ds(cb, 1), :].astype(_F32)
        logits_ref[:] = (logits + hb).astype(logits_ref.dtype)


@partial(jax.jit, static_argnames=("heads", "eps", "interpret"))
def depformer_step_pallas(
    x: jax.Array,
    cb: jax.Array,
    norm1: jax.Array,
    in_proj: jax.Array,
    out_proj: jax.Array,
    norm2: jax.Array,
    gin: jax.Array,
    gout: jax.Array,
    head_w: jax.Array,
    head_b: jax.Array,
    kc: jax.Array,
    vc: jax.Array,
    heads: int,
    eps: float = 1e-8,
    scales: dict | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One fused depformer micro-step.

    x: [1, C] (dep_in + prev-token embedding); cb: int32 micro-step index;
    norm1/norm2: [L, C] rms scales; in_proj: [L, S*3C, C]; out_proj:
    [L, S*C, C]; gin: [L, S, 2H, C]; gout: [L, S, C, H] (H % 128 == 0, see
    ``pad_codecformer_gating``); head_w: [S, card, C]; head_b: [S, card];
    kc/vc: [L, S, C] pos-major per-frame KV cache.

    ``scales`` (int8 serving): the five weight arrays are int8 and
    ``scales`` holds per-output-row f32 scales shaped like the weights with
    the contraction dim collapsed to 1 (in_proj [L, S*3C, 1], out_proj
    [L, S*C, 1], gin [L, S, 2H, 1], gout [L, S, C, 1], head_w [S, card, 1]);
    the kernel dequantizes rows in VMEM — half the per-step weight DMA.

    Returns (logits [1, card] f32, new_kc, new_vc).
    """
    B, C = x.shape
    assert B == 1, "fused depformer micro-step is the B=1 latency path"
    L, S3C, C2 = in_proj.shape
    S = gin.shape[1]
    card = head_w.shape[1]
    H = gout.shape[3]
    assert S3C == S * 3 * C and C2 == C, (in_proj.shape, S, C)
    assert out_proj.shape == (L, S * C, C)
    assert gin.shape == (L, S, 2 * H, C), (gin.shape, H)
    assert head_w.shape[0] == S and head_w.shape[2] == C
    assert kc.shape == (L, S, C) and vc.shape == (L, S, C)
    assert C % 128 == 0 and H % 128 == 0 and card % 128 == 0
    assert C % heads == 0 and (C // heads) % 8 == 0

    cb = jnp.clip(jnp.asarray(cb, jnp.int32), 0, S - 1).reshape(1)
    li = lambda l: jnp.minimum(l, L - 1)  # head program re-uses (no re-DMA)

    quant = scales is not None
    in_specs = [
        pl.BlockSpec((B, C), lambda l, s: (0, 0)),
        pl.BlockSpec((L, C), lambda l, s: (0, 0)),
        pl.BlockSpec((1, 3 * C, C), lambda l, s: (li(l), s[0], 0)),
        pl.BlockSpec((1, 3 * C, 1), lambda l, s: (li(l), s[0], 0)),
        pl.BlockSpec((1, C, C), lambda l, s: (li(l), s[0], 0)),
        pl.BlockSpec((1, C, 1), lambda l, s: (li(l), s[0], 0)),
        pl.BlockSpec((L, C), lambda l, s: (0, 0)),
        pl.BlockSpec((1, 1, 2 * H, C), lambda l, s: (li(l), s[0], 0, 0)),
        pl.BlockSpec((1, 1, 2 * H, 1), lambda l, s: (li(l), s[0], 0, 0)),
        pl.BlockSpec((1, 1, C, H), lambda l, s: (li(l), s[0], 0, 0)),
        pl.BlockSpec((1, 1, C, 1), lambda l, s: (li(l), s[0], 0, 0)),
        pl.BlockSpec((1, card, C), lambda l, s: (s[0], 0, 0)),
        pl.BlockSpec((1, card, 1), lambda l, s: (s[0], 0, 0)),
        pl.BlockSpec((S, card), lambda l, s: (0, 0)),
        pl.BlockSpec((1, S, C), lambda l, s: (li(l), 0, 0)),
        pl.BlockSpec((1, S, C), lambda l, s: (li(l), 0, 0)),
    ]
    operands = [
        x, norm1,
        in_proj, scales["in_proj"] if quant else None,
        out_proj, scales["out_proj"] if quant else None,
        norm2,
        gin, scales["gin"] if quant else None,
        gout, scales["gout"] if quant else None,
        head_w, scales["head_w"] if quant else None,
        head_b, kc, vc,
    ]
    if quant:
        assert scales["in_proj"].shape == (L, S3C, 1)
        assert scales["head_w"].shape == (S, card, 1)
    else:
        keep = [op is not None for op in operands]
        in_specs = [sp for sp, k in zip(in_specs, keep) if k]
        operands = [op for op in operands if op is not None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L + 1,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((B, card), lambda l, s: (0, 0)),
            pl.BlockSpec((1, S, C), lambda l, s: (li(l), 0, 0)),
            pl.BlockSpec((1, S, C), lambda l, s: (li(l), 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((B, C), _F32)],
    )
    return pl.pallas_call(
        partial(_dep_step_kernel, L=L, heads=heads, eps=eps, quant=quant),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, card), _F32),
            jax.ShapeDtypeStruct(kc.shape, kc.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # per-(layer, step) weight blocks are ~13 MB live + double-buffer:
            # above the 16 MB default scoped-vmem limit, well under the chip's
            # 128 MB VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(cb, *operands)


def pallas_depformer_mode() -> str | None:
    """Kernel gate. Default ON for TPU (measured: 8.22 -> 6.37 ms/frame on
    the 2B flagship, a 22% decode win; the Mosaic compile is cached after the
    first run). RSTNET_PALLAS_DEP=0 opts out; RSTNET_PALLAS_DEP=interpret
    runs it in interpret mode on any backend (CPU integration tests).
    Returns "compile" | "interpret" | None."""
    import os

    v = os.environ.get("RSTNET_PALLAS_DEP", "1")
    if v == "1" and jax.default_backend() == "tpu":
        return "compile"
    if v == "interpret":
        return "interpret"
    return None


def use_pallas_depformer() -> bool:
    return pallas_depformer_mode() is not None


def depformer_kernel_operands(model, params) -> dict | None:
    """Extract the kernel's stacked weight views from a model's param tree.

    Works for both codecformer layouts: the flagship ``SpeechTextLM``
    (``params['codecformer']`` + ``params['audio_linears']``) and
    ``MoshiLMModel`` (``params['depformer']`` + ``params['linears']``).
    Returns None when the configuration is outside the kernel's envelope
    (no weights_per_step, int8 weights, non-rms norm, unpadded gating,
    misaligned dims) — callers then keep the XLA path. Run
    ``pad_codecformer_gating`` on the depth-transformer params first.
    """
    if hasattr(model, "codecformer"):
        tf, tparams, head = model.codecformer, params["codecformer"], params["audio_linears"]
    else:
        tf, tparams, head = model.depformer, params["depformer"], params["linears"]
    if not tf.weights_per_step or tf.positional_embedding != "none":
        return None
    if not tf.norm.startswith("rms_norm") or tf.gating != "silu":
        return None
    layers = tparams["layers"]
    weights = {
        "in_proj": layers["in_proj"],
        "out_proj": layers["out_proj"],
        "gin": layers["gating"]["linear_in"],
        "gout": layers["gating"]["linear_out"],
        "head_w": head["weight"],
    }
    n_quant = sum(isinstance(w, dict) for w in weights.values())
    scales = None
    if n_quant == len(weights):
        # int8 serving weights ({w_int8, scale}): the kernel dequantizes
        # per-output-row in VMEM — half the per-step weight DMA
        scales = {
            k: w["scale"][..., None].astype(jnp.float32)
            for k, w in weights.items()
        }
        weights = {k: w["w_int8"] for k, w in weights.items()}
    elif n_quant:  # mixed quantization: keep the XLA path
        return None
    C = tf.d_model
    S = tf.weights_per_step
    H = weights["gin"].shape[-2] // 2
    card = weights["head_w"].shape[-2]
    if C % 128 or H % 128 or card % 128 or (C // tf.num_heads) % 8:
        return None
    head_b = head.get("bias")
    if head_b is None:
        head_b = jnp.zeros((S, card), jnp.float32)
    return {
        "norm1": layers["norm1"]["alpha"],
        "norm2": layers["norm2"]["alpha"],
        "head_b": head_b,
        "scales": scales,
        "heads": tf.num_heads,
        "eps": tf._norm.eps,
        "L": tf.num_layers,
        "S": S,
        "C": C,
        **weights,
    }


def depformer_frame_reference(ops: dict, x_steps, kc, vc):
    """jnp reference with the kernel's exact math (f32 norms/softmax, bf16
    matmuls with f32 accumulation) for interpret-mode parity tests.

    x_steps: [S, 1, C] per-step inputs (teacher-forced); returns
    [S, 1, card] logits.
    """
    L, S, C = kc.shape[0], kc.shape[1], kc.shape[2]
    heads, eps = ops["heads"], ops["eps"]
    dh = C // heads
    outs = []
    for cb in range(x_steps.shape[0]):
        x = x_steps[cb].astype(_F32)
        for l in range(L):
            h = _rms(x, ops["norm1"][l].astype(_F32), eps).astype(jnp.bfloat16)
            w_in = ops["in_proj"][l].reshape(S, 3 * C, C)[cb]
            qkv = _dot_t(h, w_in.astype(jnp.bfloat16))
            q, k_new, v_new = qkv[:, :C], qkv[:, C : 2 * C], qkv[:, 2 * C :]
            kc = kc.at[l, cb].set(k_new[0].astype(kc.dtype))
            vc = vc.at[l, cb].set(v_new[0].astype(vc.dtype))
            kh = kc[l].astype(_F32).reshape(S, heads, dh)
            vh = vc[l].astype(_F32).reshape(S, heads, dh)
            qh = q[0].reshape(heads, dh)
            scores = jnp.einsum("hd,shd->sh", qh, kh) / (dh ** 0.5)
            pos = jnp.arange(S)[:, None]
            scores = jnp.where(pos <= cb, scores, -jnp.inf)
            p = jax.nn.softmax(scores, axis=0)
            attn = jnp.einsum("sh,shd->hd", p, vh).reshape(1, C)
            w_out = ops["out_proj"][l].reshape(S, C, C)[cb]
            x = x + _dot_t(attn.astype(jnp.bfloat16), w_out.astype(jnp.bfloat16))
            h2 = _rms(x, ops["norm2"][l].astype(_F32), eps).astype(jnp.bfloat16)
            g = _dot_t(h2, ops["gin"][l, cb].astype(jnp.bfloat16))
            H = g.shape[1] // 2
            gate, val = g[:, :H], g[:, H:]
            hid = (gate * jax.nn.sigmoid(gate)) * val
            x = x + _dot_t(hid.astype(jnp.bfloat16), ops["gout"][l, cb].astype(jnp.bfloat16))
        logits = _dot_t(x.astype(jnp.bfloat16), ops["head_w"][cb].astype(jnp.bfloat16))
        outs.append(logits + ops["head_b"][cb].astype(_F32)[None, :])
    return jnp.stack(outs), kc, vc
