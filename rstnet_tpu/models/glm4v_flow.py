"""GLM-4-Voice flow decoder (semantic tokens -> mel), TPU-native.

From-scratch JAX implementation of the CosyVoice conditional-flow-matching
token-to-mel stack the reference vendors for SSL detokenization
(``MLLM_v2/tools/tokenizer/GLM4V/flow_inference.py`` + ``cosyvoice/``):

* Block-causal conformer text encoder
  (``cosyvoice/transformer/encoder.py:477`` BlockConformerEncoder; grid mask
  ``cosyvoice/utils/block_mask_util.py``; rel-pos attention
  ``cosyvoice/transformer/attention.py:472``).
* Nearest-interpolation length regulator
  (``cosyvoice/flow/length_regulator.py:20``).
* Conditional flow matching with classifier-free guidance, Euler solver on a
  cosine t-schedule (``cosyvoice/flow/flow_matching.py:20``), whose velocity
  estimator is a 1D U-Net with transformer blocks
  (``cosyvoice/flow/decoder.py:21`` + Matcha-TTS building blocks).
* Top-level token->mel wiring ``MaskedDiffWithXvec.inference``
  (``cosyvoice/flow/flow.py:102-144``).

TPU-first: every module is a pure function over a dict param pytree with
static shapes; the two CFG estimator passes per Euler step run as ONE
batched call (batch-stacked conditional/unconditional rows) instead of two
sequential launches, and the Euler loop is a ``lax.scan`` so the U-Net
compiles once. The companion HiFT vocoder (mel -> waveform) lives in
``models/hift.py``; checkpoint conversion in ``models/convert.py``.

Faithfulness notes
* The reference's transformer blocks receive the {0,1} pad-mask outer
  product as an *additive* attention bias (diffusers semantics) — valid
  pairs get +1, invalid +0, nothing is masked to -inf. Reproduced verbatim
  (it is a no-op at full-length inference, where the mask is all ones).
* ``rel_shift`` is applied only for the espnet rel-pos variant, matching
  the reference's shape-triggered branch (``attention.py:605-607``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# small pure helpers (layouts follow models/whisper_vq.py: linear [in, out],
# conv [width, in, out])
# ---------------------------------------------------------------------------


def _linear(key, d_in, d_out, bias=True):
    k = 1.0 / math.sqrt(d_in)
    p = {"w": jax.random.uniform(key, (d_in, d_out), jnp.float32, -k, k)}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _apply_linear(p, x):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


def _conv1d_p(key, width, d_in, d_out, bias=True, groups=1):
    k = 1.0 / math.sqrt(d_in // groups * width)
    p = {"w": jax.random.uniform(key, (width, d_in // groups, d_out), jnp.float32, -k, k)}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _conv1d(p, x, stride=1, padding="SAME", groups=1, lhs_dilation=1, rhs_dilation=1):
    """x [B, T, C] -> [B, T', C']; weight [width, in/groups, out]."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride,), padding,
        lhs_dilation=(lhs_dilation,), rhs_dilation=(rhs_dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=groups,
    )
    return y + p["b"] if "b" in p else y


def _conv_transpose1d(p, x, stride, torch_padding):
    """torch.nn.ConvTranspose1d semantics: out = (T-1)*stride - 2*pad + width.

    Implemented as an input-dilated convolution with the spatially-flipped
    kernel (weight stored pre-flipped/transposed by the converter into the
    usual [width, in, out] layout)."""
    width = p["w"].shape[0]
    pad = width - 1 - torch_padding
    return _conv1d(p, x, stride=1, padding=[(pad, pad)], lhs_dilation=stride)


def _layer_norm(p, x, eps=1e-5):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]


def _ln_p(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _group_norm(p, x, groups, eps=1e-5):
    """x [B, T, C] grouped over the channel axis (torch GroupNorm parity:
    statistics over (T, C/groups) per group)."""
    B, T, C = x.shape
    g = x.reshape(B, T, groups, C // groups)
    m = g.mean((1, 3), keepdims=True)
    v = ((g - m) ** 2).mean((1, 3), keepdims=True)
    g = (g - m) * jax.lax.rsqrt(v + eps)
    return g.reshape(B, T, C) * p["scale"] + p["bias"]


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _sinusoid_table(max_len: int, d: int) -> np.ndarray:
    """Standard sin/cos interleave table [max_len, d] (wenet layout)."""
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64) * -(math.log(10000.0) / d))
    pe = np.zeros((max_len, d), np.float64)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


# ---------------------------------------------------------------------------
# block-causal conformer encoder
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    input_size: int = 512
    output_size: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    block_size: int = 10            # grid width of the block-causal mask
    pos_enc: str = "rel_pos_espnet"  # or "rel_pos" (wenet legacy, no shift)
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_kernel: int = 15
    cnn_causal: bool = False
    cnn_norm: str = "batch_norm"    # or "layer_norm"
    key_bias: bool = True

    @property
    def head_dim(self) -> int:
        return self.output_size // self.attention_heads


def _ffn_p(key, d, hidden):
    k1, k2 = jax.random.split(key)
    return {"w1": _linear(k1, d, hidden), "w2": _linear(k2, hidden, d)}


def _apply_ffn(p, x):
    return _apply_linear(p["w2"], jax.nn.silu(_apply_linear(p["w1"], x)))


def init_conformer(key, cfg: ConformerConfig) -> dict:
    d = cfg.output_size
    keys = iter(jax.random.split(key, 2 + 16 * cfg.num_blocks))
    params = {
        "embed": {"lin": _linear(next(keys), cfg.input_size, d), "ln": _ln_p(d)},
        "after_norm": _ln_p(d),
        "layers": [],
    }
    for _ in range(cfg.num_blocks):
        layer = {
            "norm_mha": _ln_p(d),
            "q": _linear(next(keys), d, d),
            "k": _linear(next(keys), d, d, bias=cfg.key_bias),
            "v": _linear(next(keys), d, d),
            "o": _linear(next(keys), d, d),
            "pos": _linear(next(keys), d, d, bias=False),
            "pos_bias_u": jax.random.normal(next(keys), (cfg.attention_heads, cfg.head_dim)) * 0.02,
            "pos_bias_v": jax.random.normal(next(keys), (cfg.attention_heads, cfg.head_dim)) * 0.02,
            "norm_ff": _ln_p(d),
            "ffn": _ffn_p(next(keys), d, cfg.linear_units),
        }
        if cfg.macaron_style:
            layer["norm_ff_macaron"] = _ln_p(d)
            layer["ffn_macaron"] = _ffn_p(next(keys), d, cfg.linear_units)
        if cfg.use_cnn_module:
            layer["norm_conv"] = _ln_p(d)
            layer["norm_final"] = _ln_p(d)
            layer["pw1"] = _conv1d_p(next(keys), 1, d, 2 * d)
            layer["dw"] = _conv1d_p(next(keys), cfg.cnn_kernel, d, d, groups=d)
            layer["pw2"] = _conv1d_p(next(keys), 1, d, d)
            if cfg.cnn_norm == "batch_norm":
                layer["bn"] = {
                    "scale": jnp.ones((d,)), "bias": jnp.zeros((d,)),
                    "mean": jnp.zeros((d,)), "var": jnp.ones((d,)),
                }
            else:
                layer["cn_ln"] = _ln_p(d)
        params["layers"].append(layer)
    return params


def block_grid_mask(T: int, block: int) -> np.ndarray:
    """[T, T] bool: causal OR same-block (reference create_grid_mask with
    fill_triangle=True — each position sees all previous blocks plus its
    WHOLE own block, including in-block future)."""
    pos = np.arange(T)
    tri = pos[:, None] >= pos[None, :]
    same = (pos[:, None] // block) == (pos[None, :] // block)
    return tri | same


def _rel_shift(x):
    """Espnet rel-shift: [B, H, T, 2T-1] -> [B, H, T, T]
    (reference ``attention.py:499-520``)."""
    B, H, T, P = x.shape
    zero = jnp.zeros((B, H, T, 1), x.dtype)
    xp = jnp.concatenate([zero, x], axis=-1).reshape(B, H, P + 1, T)
    return xp[:, :, 1:].reshape(B, H, T, P)[..., : P // 2 + 1]


def _conformer_attention(cfg: ConformerConfig, p, x, pos_emb, mask):
    """Block-rel-pos MHA (``attention.py:472-612``): score =
    ((q+u)k^T + shift((q+v)p^T)) / sqrt(dk), masked by pad AND grid mask,
    with the reference's post-softmax zero-fill."""
    B, T, D = x.shape
    H, hd = cfg.attention_heads, cfg.head_dim
    q = _apply_linear(p["q"], x).reshape(B, T, H, hd)
    k = _apply_linear(p["k"], x).reshape(B, T, H, hd)
    v = _apply_linear(p["v"], x).reshape(B, T, H, hd)
    pe = _apply_linear(p["pos"], pos_emb).reshape(1, -1, H, hd)
    qu = q + p["pos_bias_u"]
    qv = q + p["pos_bias_v"]
    ac = jnp.einsum("bthd,bshd->bhts", qu, k)
    bd = jnp.einsum("bthd,bshd->bhts", qv, jnp.broadcast_to(pe, (B,) + pe.shape[1:]))
    if bd.shape != ac.shape:  # espnet 2T-1 rel-pos table
        bd = _rel_shift(bd)
    scores = (ac + bd) / math.sqrt(hd)
    scores = jnp.where(mask[:, None], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(mask[:, None], attn, 0.0)
    out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, D)
    return _apply_linear(p["o"], out)


def _conformer_conv(cfg: ConformerConfig, p, x, pad_mask):
    """Conformer convolution module (``convolution.py:24-145``)."""
    x = x * pad_mask[..., None]
    x = _conv1d(p["pw1"], x, padding="VALID")
    a, b = jnp.split(x, 2, axis=-1)
    x = a * jax.nn.sigmoid(b)  # GLU over the channel axis
    if cfg.cnn_causal:
        x = _conv1d(p["dw"], x, padding=[(cfg.cnn_kernel - 1, 0)], groups=cfg.output_size)
    else:
        x = _conv1d(p["dw"], x, padding="SAME", groups=cfg.output_size)
    if cfg.cnn_norm == "batch_norm":
        bn = p["bn"]
        x = (x - bn["mean"]) * jax.lax.rsqrt(bn["var"] + 1e-5) * bn["scale"] + bn["bias"]
    else:
        x = _layer_norm(p["cn_ln"], x)
    x = jax.nn.silu(x)
    x = _conv1d(p["pw2"], x, padding="VALID")
    return x * pad_mask[..., None]


def apply_conformer(cfg: ConformerConfig, params, x, pad_mask) -> jax.Array:
    """x [B, T, input_size], pad_mask [B, T] bool -> [B, T, output_size]."""
    B, T, _ = x.shape
    d = cfg.output_size
    x = _layer_norm(params["embed"]["ln"], _apply_linear(params["embed"]["lin"], x))
    x = x * math.sqrt(d)
    table = _sinusoid_table(T, d)
    if cfg.pos_enc == "rel_pos_espnet":
        # positions T-1 .. -(T-1): flipped positive table ++ negative tail
        neg = _sinusoid_table(T, d).copy()
        neg[:, 0::2] *= -1.0  # sin(-x) = -sin(x); cos is even
        pos_emb = jnp.asarray(np.concatenate([table[::-1], neg[1:]], 0))[None]
    else:  # wenet legacy rel_pos: absolute table [0, T)
        pos_emb = jnp.asarray(table)[None]
    grid = jnp.asarray(block_grid_mask(T, cfg.block_size))
    mask = pad_mask[:, None, :] & grid[None]  # [B, T, T]
    for layer in params["layers"]:
        if cfg.macaron_style:
            x = x + 0.5 * _apply_ffn(
                layer["ffn_macaron"], _layer_norm(layer["norm_ff_macaron"], x)
            )
        x = x + _conformer_attention(
            cfg, layer, _layer_norm(layer["norm_mha"], x), pos_emb, mask
        )
        if cfg.use_cnn_module:
            x = x + _conformer_conv(cfg, layer, _layer_norm(layer["norm_conv"], x), pad_mask)
        ff_scale = 0.5 if cfg.macaron_style else 1.0
        x = x + ff_scale * _apply_ffn(layer["ffn"], _layer_norm(layer["norm_ff"], x))
        if cfg.use_cnn_module:
            x = _layer_norm(layer["norm_final"], x)
    return _layer_norm(params["after_norm"], x)


# ---------------------------------------------------------------------------
# nearest-interpolation length regulator (length_regulator.py:20-49)
# ---------------------------------------------------------------------------


def init_regulator(key, channels: int, n_stages: int, out_channels: int) -> dict:
    keys = iter(jax.random.split(key, n_stages + 1))
    return {
        "convs": [_conv1d_p(next(keys), 3, channels, channels) for _ in range(n_stages)],
        "norms": [{"scale": jnp.ones((channels,)), "bias": jnp.zeros((channels,))}
                  for _ in range(n_stages)],
        "out": _conv1d_p(next(keys), 1, channels, out_channels),
    }


def _interp_nearest(x: jax.Array, out_len: int) -> jax.Array:
    """torch F.interpolate(mode='nearest') along T: x [B, T, C] -> [B, out, C]."""
    T = x.shape[1]
    idx = (jnp.arange(out_len) * T) // out_len  # floor(i * T / out)
    return x[:, idx]


def apply_regulator(params, x: jax.Array, out_len: int) -> jax.Array:
    """x [B, T, C] -> [B, out_len, C'] (conv-GN-mish stages, groups=1)."""
    x = _interp_nearest(x, out_len)
    for conv, norm in zip(params["convs"], params["norms"]):
        x = _mish(_group_norm(norm, _conv1d(conv, x, padding="SAME"), groups=1))
    return _conv1d(params["out"], x, padding="VALID")


# ---------------------------------------------------------------------------
# U-Net velocity estimator (flow/decoder.py:21 + Matcha blocks)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 320          # x(80) + mu(80) + spks(80) + cond(80)
    out_channels: int = 80
    channels: tuple = (256, 256)
    attention_head_dim: int = 64
    n_blocks: int = 4
    num_mid_blocks: int = 12
    num_heads: int = 8
    act_fn: str = "gelu"

    @property
    def time_embed_dim(self) -> int:
        return self.channels[0] * 4


def _resnet1d_p(key, d_in, d_out, t_dim):
    k = iter(jax.random.split(key, 4))
    return {
        "mlp": _linear(next(k), t_dim, d_out),
        "b1_conv": _conv1d_p(next(k), 3, d_in, d_out),
        "b1_gn": {"scale": jnp.ones((d_out,)), "bias": jnp.zeros((d_out,))},
        "b2_conv": _conv1d_p(next(k), 3, d_out, d_out),
        "b2_gn": {"scale": jnp.ones((d_out,)), "bias": jnp.zeros((d_out,))},
        "res": _conv1d_p(next(k), 1, d_in, d_out),
    }


def _apply_block1d(conv, gn, x, mask):
    x = _conv1d(conv, x * mask[..., None], padding="SAME")
    return _mish(_group_norm(gn, x, groups=8)) * mask[..., None]


def _apply_resnet1d(p, x, mask, t_emb):
    h = _apply_block1d(p["b1_conv"], p["b1_gn"], x, mask)
    h = h + _apply_linear(p["mlp"], _mish(t_emb))[:, None, :]
    h = _apply_block1d(p["b2_conv"], p["b2_gn"], h, mask)
    return h + _conv1d(p["res"], x * mask[..., None], padding="VALID")


def _txblock_p(key, cfg: UNetConfig, dim):
    inner = cfg.num_heads * cfg.attention_head_dim
    ff_inner = dim * 4
    k = iter(jax.random.split(key, 6))
    return {
        "ln1": _ln_p(dim),
        "to_q": _linear(next(k), dim, inner, bias=False),
        "to_k": _linear(next(k), dim, inner, bias=False),
        "to_v": _linear(next(k), dim, inner, bias=False),
        "to_out": _linear(next(k), inner, dim),
        "ln3": _ln_p(dim),
        "ff_in": _linear(next(k), dim, ff_inner),
        "ff_out": _linear(next(k), ff_inner, dim),
    }


def _apply_txblock(cfg: UNetConfig, p, x, attn_bias):
    """Matcha BasicTransformerBlock (self-attn only, layer_norm, gelu FF).

    ``attn_bias`` reproduces the reference's diffusers-semantics additive
    {0,1} mask bias (see module docstring)."""
    B, T, _ = x.shape
    H, hd = cfg.num_heads, cfg.attention_head_dim
    h = _layer_norm(p["ln1"], x)
    q = _apply_linear(p["to_q"], h).reshape(B, T, H, hd)
    k = _apply_linear(p["to_k"], h).reshape(B, T, H, hd)
    v = _apply_linear(p["to_v"], h).reshape(B, T, H, hd)
    scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(hd)
    if attn_bias is not None:
        scores = scores + attn_bias[:, None]
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, H * hd)
    x = x + _apply_linear(p["to_out"], out)
    h = _layer_norm(p["ln3"], x)
    h = _apply_linear(p["ff_in"], h)
    h = jax.nn.gelu(h, approximate=(cfg.act_fn == "gelu-approximate"))
    return x + _apply_linear(p["ff_out"], h)


def init_unet(key, cfg: UNetConfig) -> dict:
    t_dim = cfg.time_embed_dim
    ch0 = cfg.channels[0]
    n_down = len(cfg.channels)
    total = 4 + 3 * n_down * (1 + cfg.n_blocks) + cfg.num_mid_blocks * (1 + cfg.n_blocks) + 8
    keys = iter(jax.random.split(key, total + 8))
    params = {
        "time_mlp": {
            "lin1": _linear(next(keys), cfg.in_channels, t_dim),
            "lin2": _linear(next(keys), t_dim, t_dim),
        },
        "down": [], "mid": [], "up": [],
    }
    out_ch = cfg.in_channels
    for i, ch in enumerate(cfg.channels):
        is_last = i == n_down - 1
        blk = {
            "resnet": _resnet1d_p(next(keys), out_ch, ch, t_dim),
            "tx": [_txblock_p(next(keys), cfg, ch) for _ in range(cfg.n_blocks)],
            "down": _conv1d_p(next(keys), 3, ch, ch),
        }
        params["down"].append(blk)
        out_ch = ch
    for _ in range(cfg.num_mid_blocks):
        params["mid"].append({
            "resnet": _resnet1d_p(next(keys), cfg.channels[-1], cfg.channels[-1], t_dim),
            "tx": [_txblock_p(next(keys), cfg, cfg.channels[-1]) for _ in range(cfg.n_blocks)],
        })
    up_chs = cfg.channels[::-1] + (cfg.channels[0],)
    for i in range(len(up_chs) - 1):
        is_last = i == len(up_chs) - 2
        blk = {
            "resnet": _resnet1d_p(next(keys), up_chs[i] * 2, up_chs[i + 1], t_dim),
            "tx": [_txblock_p(next(keys), cfg, up_chs[i + 1]) for _ in range(cfg.n_blocks)],
            # transpose conv stored pre-flipped in [width, in, out]
            "up": _conv1d_p(next(keys), 4 if not is_last else 3, up_chs[i + 1], up_chs[i + 1]),
        }
        params["up"].append(blk)
    params["final_block"] = {
        "conv": _conv1d_p(next(keys), 3, up_chs[-1], up_chs[-1]),
        "gn": {"scale": jnp.ones((up_chs[-1],)), "bias": jnp.zeros((up_chs[-1],))},
    }
    params["final_proj"] = _conv1d_p(next(keys), 1, up_chs[-1], cfg.out_channels)
    return params


def _time_embedding(cfg: UNetConfig, p, t):
    """SinusoidalPosEmb(scale=1000) -> linear/silu/linear
    (Matcha decoder.py:14-29, TimestepEmbedding)."""
    t = jnp.atleast_1d(t)
    half = cfg.in_channels // 2
    freqs = jnp.exp(jnp.arange(half) * -(math.log(10000.0) / (half - 1)))
    ang = 1000.0 * t[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return _apply_linear(p["lin2"], jax.nn.silu(_apply_linear(p["lin1"], emb)))


def apply_unet(cfg: UNetConfig, params, x, mask, mu, t, spks=None, cond=None):
    """Velocity estimate. x/mu/cond [B, T, 80] channel-last; mask [B, T]
    float; t scalar or [B]; spks [B, 80]. Returns [B, T, 80]."""
    B, T, _ = x.shape
    t_emb = _time_embedding(cfg, params["time_mlp"], t)
    if t_emb.shape[0] == 1 and B > 1:
        t_emb = jnp.broadcast_to(t_emb, (B, t_emb.shape[1]))
    feats = [x, mu]
    if spks is not None:
        feats.append(jnp.broadcast_to(spks[:, None, :], (B, T, spks.shape[-1])))
    if cond is not None:
        feats.append(cond)
    h = jnp.concatenate(feats, axis=-1)

    hiddens, masks = [], [mask]
    for i, blk in enumerate(params["down"]):
        m = masks[-1]
        bias = m[:, :, None] * m[:, None, :]
        h = _apply_resnet1d(blk["resnet"], h, m, t_emb)
        for tx in blk["tx"]:
            h = _apply_txblock(cfg, tx, h, bias)
        hiddens.append(h)
        if i == len(params["down"]) - 1:
            h = _conv1d(blk["down"], h * m[..., None], padding="SAME")
        else:
            h = _conv1d(blk["down"], h * m[..., None], stride=2, padding=[(1, 1)])
            m = m[:, ::2]
        masks.append(m)
    masks = masks[:-1]
    m = masks[-1]
    bias = m[:, :, None] * m[:, None, :]
    for blk in params["mid"]:
        h = _apply_resnet1d(blk["resnet"], h, m, t_emb)
        for tx in blk["tx"]:
            h = _apply_txblock(cfg, tx, h, bias)
    for i, blk in enumerate(params["up"]):
        m = masks.pop()
        bias = m[:, :, None] * m[:, None, :]
        skip = hiddens.pop()
        h = jnp.concatenate([h[:, : skip.shape[1]], skip], axis=-1)
        h = _apply_resnet1d(blk["resnet"], h, m, t_emb)
        for tx in blk["tx"]:
            h = _apply_txblock(cfg, tx, h, bias)
        if i == len(params["up"]) - 1:
            h = _conv1d(blk["up"], h * m[..., None], padding="SAME")
        else:
            h = _conv_transpose1d(blk["up"], h * m[..., None], stride=2, torch_padding=1)
    fb = params["final_block"]
    h = _apply_block1d(fb["conv"], fb["gn"], h, m)
    out = _conv1d(params["final_proj"], h * m[..., None], padding="VALID")
    return out * mask[..., None]


# ---------------------------------------------------------------------------
# conditional flow matching (flow_matching.py:20-103)
# ---------------------------------------------------------------------------


def cfm_solve(
    unet_cfg: UNetConfig,
    unet_params,
    z: jax.Array,
    mu: jax.Array,
    mask: jax.Array,
    spks: jax.Array,
    cond: jax.Array,
    n_timesteps: int = 10,
    inference_cfg_rate: float = 0.7,
    t_scheduler: str = "cosine",
) -> jax.Array:
    """Euler ODE solve with classifier-free guidance; one lax.scan step per
    timestep, the cond/uncond estimator passes batch-stacked into ONE call.
    z/mu/cond [B, T, 80]; mask [B, T]; spks [B, 80]."""
    t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1)
    if t_scheduler == "cosine":
        t_span = 1.0 - jnp.cos(t_span * 0.5 * jnp.pi)
    ts = t_span[:-1]
    dts = t_span[1:] - t_span[:-1]

    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], 0)
    spk2 = jnp.concatenate([spks, jnp.zeros_like(spks)], 0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], 0)
    mask2 = jnp.concatenate([mask, mask], 0)

    def step(x, t_dt):
        t, dt = t_dt
        x2 = jnp.concatenate([x, x], 0)
        v2 = apply_unet(unet_cfg, unet_params, x2, mask2, mu2, t, spk2, cond2)
        v, v_u = jnp.split(v2, 2, axis=0)
        if inference_cfg_rate > 0:
            v = (1.0 + inference_cfg_rate) * v - inference_cfg_rate * v_u
        return x + dt * v, None

    x, _ = jax.lax.scan(step, z, (ts, dts))
    return x


# ---------------------------------------------------------------------------
# top-level token -> mel flow (flow.py:102-144)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GLM4VFlowConfig:
    vocab_size: int = 16384
    input_size: int = 512
    output_size: int = 80           # mel bins
    spk_embed_dim: int = 192
    input_frame_rate: float = 12.5  # GLM-4-Voice semantic token rate
    mel_sample_rate: int = 22050
    mel_hop: int = 256
    regulator_stages: int = 4
    encoder: ConformerConfig = dataclasses.field(default_factory=ConformerConfig)
    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    n_timesteps: int = 10
    inference_cfg_rate: float = 0.7
    sigma_min: float = 1e-6

    def mel_len(self, token_len: int) -> int:
        return int(token_len / self.input_frame_rate * self.mel_sample_rate / self.mel_hop)


class GLM4VFlow:
    """Pure-function CosyVoice flow: semantic tokens -> 22.05 kHz mel."""

    def __init__(self, config: GLM4VFlowConfig = GLM4VFlowConfig()):
        self.config = config

    def init(self, key) -> dict:
        cfg = self.config
        k = iter(jax.random.split(key, 6))
        return {
            "input_embedding": jax.random.normal(
                next(k), (cfg.vocab_size, cfg.input_size)) * 0.02,
            "spk_affine": _linear(next(k), cfg.spk_embed_dim, cfg.output_size),
            "encoder": init_conformer(next(k), cfg.encoder),
            "encoder_proj": _linear(next(k), cfg.encoder.output_size, cfg.output_size),
            "regulator": init_regulator(
                next(k), cfg.output_size, cfg.regulator_stages, cfg.output_size),
            "unet": init_unet(next(k), cfg.unet),
        }

    def inference(
        self,
        params: dict,
        token: jax.Array,
        z: jax.Array,
        embedding: Optional[jax.Array] = None,
        prompt_feat: Optional[jax.Array] = None,
        n_timesteps: Optional[int] = None,
    ) -> jax.Array:
        """token [B, T_tok] int32, z [B, T_mel, 80] the flow's source noise
        (the reference draws it with a fixed torch seed,
        ``flow_matching.py:54-56``; pass ``jax.random.normal`` output),
        embedding [B, spk_embed_dim] or None (zeros — GLM-4-Voice passes a
        zero x-vector), prompt_feat [B, T_prompt, 80] streaming mel prompt.
        Returns mel [B, T_mel, 80]; T_mel = cfg.mel_len(T_tok) and any
        prompt region is NOT trimmed here (the streaming wrapper slices)."""
        cfg = self.config
        B, T_tok = token.shape
        if embedding is None:
            embedding = jnp.zeros((B, cfg.spk_embed_dim), jnp.float32)
        norm = jnp.linalg.norm(embedding, axis=-1, keepdims=True)
        embedding = embedding / jnp.maximum(norm, 1e-12)
        spks = _apply_linear(params["spk_affine"], embedding)

        x = params["input_embedding"][jnp.clip(token, 0)]
        pad_mask = jnp.ones((B, T_tok), bool)
        h = apply_conformer(cfg.encoder, params["encoder"], x, pad_mask)
        h = _apply_linear(params["encoder_proj"], h)

        T_mel = z.shape[1]
        h = apply_regulator(params["regulator"], h, T_mel)

        conds = jnp.zeros((B, T_mel, cfg.output_size), jnp.float32)
        if prompt_feat is not None and prompt_feat.shape[1] > 0:
            conds = conds.at[:, : prompt_feat.shape[1]].set(prompt_feat)

        mask = jnp.ones((B, T_mel), jnp.float32)
        return cfm_solve(
            cfg.unet, params["unet"], z, h, mask, spks, conds,
            n_timesteps=n_timesteps or cfg.n_timesteps,
            inference_cfg_rate=cfg.inference_cfg_rate,
        )
