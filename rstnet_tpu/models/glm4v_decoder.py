"""GLM-4-Voice audio decoder: semantic tokens -> waveform, plus converters.

Ties the JAX flow (``models/glm4v_flow.py``) and HiFT vocoder
(``models/hift.py``) into the reference's ``AudioDecoder`` semantics
(``MLLM_v2/tools/tokenizer/GLM4V/flow_inference.py:19-141``): offline
token->wav, and block-streaming synthesis with hamming-window mel-overlap
fades and the HiFT source cache. Also converts the GLM-4-Voice decoder
checkpoint (CosyVoice ``flow.pt`` + ``hift.pt`` torch state dicts and the
hyperpyyaml ``config.yaml``) into this framework's param pytrees.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.models.glm4v_flow import (
    ConformerConfig,
    GLM4VFlow,
    GLM4VFlowConfig,
    UNetConfig,
)
from rstnet_tpu.models.hift import HiFTConfig, HiFTGenerator

Array = np.ndarray
SD = Mapping[str, Array]


# ---------------------------------------------------------------------------
# torch layout helpers
# ---------------------------------------------------------------------------


def _g(sd: SD, name: str) -> jnp.ndarray:
    return jnp.asarray(np.asarray(sd[name]), jnp.float32)


def _lin(sd: SD, prefix: str) -> dict:
    p = {"w": _g(sd, f"{prefix}.weight").T}
    if f"{prefix}.bias" in sd:
        p["b"] = _g(sd, f"{prefix}.bias")
    return p


def _ln(sd: SD, prefix: str) -> dict:
    return {"scale": _g(sd, f"{prefix}.weight"), "bias": _g(sd, f"{prefix}.bias")}


def _conv_weight(sd: SD, prefix: str) -> jnp.ndarray:
    """torch Conv1d weight (plain or weight-normed) -> [k, in, out]."""
    if f"{prefix}.weight" in sd:
        w = np.asarray(sd[f"{prefix}.weight"], np.float64)
    else:  # weight_norm: w = g * v / ||v|| over all dims but 0
        g = np.asarray(sd[f"{prefix}.weight_g"], np.float64)
        v = np.asarray(sd[f"{prefix}.weight_v"], np.float64)
        norm = np.sqrt((v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
        w = g * v / norm
    return jnp.asarray(w.transpose(2, 1, 0), jnp.float32)


def _conv(sd: SD, prefix: str) -> dict:
    p = {"w": _conv_weight(sd, prefix)}
    if f"{prefix}.bias" in sd:
        p["b"] = _g(sd, f"{prefix}.bias")
    return p


def _conv_transpose(sd: SD, prefix: str) -> dict:
    """torch ConvTranspose1d weight [in, out, k] (plain or weight-normed) ->
    pre-flipped [k, in, out] for ``glm4v_flow._conv_transpose1d``."""
    if f"{prefix}.weight" in sd:
        w = np.asarray(sd[f"{prefix}.weight"], np.float64)
    else:
        g = np.asarray(sd[f"{prefix}.weight_g"], np.float64)
        v = np.asarray(sd[f"{prefix}.weight_v"], np.float64)
        norm = np.sqrt((v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
        w = g * v / norm
    w = np.flip(w, -1).transpose(2, 0, 1)  # [k, in, out]
    p = {"w": jnp.asarray(np.ascontiguousarray(w), jnp.float32)}
    if f"{prefix}.bias" in sd:
        p["b"] = _g(sd, f"{prefix}.bias")
    return p


# ---------------------------------------------------------------------------
# flow converter
# ---------------------------------------------------------------------------


def convert_glm4v_flow(sd: SD, model: GLM4VFlow) -> dict:
    """CosyVoice ``MaskedDiffWithXvec`` state dict -> GLM4VFlow params."""
    cfg = model.config
    enc_layers = []
    for i in range(cfg.encoder.num_blocks):
        pre = f"encoder.encoders.{i}"
        layer = {
            "norm_mha": _ln(sd, f"{pre}.norm_mha"),
            "q": _lin(sd, f"{pre}.self_attn.linear_q"),
            "k": _lin(sd, f"{pre}.self_attn.linear_k"),
            "v": _lin(sd, f"{pre}.self_attn.linear_v"),
            "o": _lin(sd, f"{pre}.self_attn.linear_out"),
            "pos": _lin(sd, f"{pre}.self_attn.linear_pos"),
            "pos_bias_u": _g(sd, f"{pre}.self_attn.pos_bias_u"),
            "pos_bias_v": _g(sd, f"{pre}.self_attn.pos_bias_v"),
            "norm_ff": _ln(sd, f"{pre}.norm_ff"),
            "ffn": {"w1": _lin(sd, f"{pre}.feed_forward.w_1"),
                    "w2": _lin(sd, f"{pre}.feed_forward.w_2")},
        }
        if cfg.encoder.macaron_style:
            layer["norm_ff_macaron"] = _ln(sd, f"{pre}.norm_ff_macaron")
            layer["ffn_macaron"] = {
                "w1": _lin(sd, f"{pre}.feed_forward_macaron.w_1"),
                "w2": _lin(sd, f"{pre}.feed_forward_macaron.w_2"),
            }
        if cfg.encoder.use_cnn_module:
            layer["norm_conv"] = _ln(sd, f"{pre}.norm_conv")
            layer["norm_final"] = _ln(sd, f"{pre}.norm_final")
            layer["pw1"] = _conv(sd, f"{pre}.conv_module.pointwise_conv1")
            layer["dw"] = _conv(sd, f"{pre}.conv_module.depthwise_conv")
            layer["pw2"] = _conv(sd, f"{pre}.conv_module.pointwise_conv2")
            if cfg.encoder.cnn_norm == "batch_norm":
                layer["bn"] = {
                    "scale": _g(sd, f"{pre}.conv_module.norm.weight"),
                    "bias": _g(sd, f"{pre}.conv_module.norm.bias"),
                    "mean": _g(sd, f"{pre}.conv_module.norm.running_mean"),
                    "var": _g(sd, f"{pre}.conv_module.norm.running_var"),
                }
            else:
                layer["cn_ln"] = _ln(sd, f"{pre}.conv_module.norm")
        enc_layers.append(layer)

    n_stages = cfg.regulator_stages
    regulator = {
        "convs": [_conv(sd, f"length_regulator.model.{3 * i}") for i in range(n_stages)],
        "norms": [_ln(sd, f"length_regulator.model.{3 * i + 1}") for i in range(n_stages)],
        "out": _conv(sd, f"length_regulator.model.{3 * n_stages}"),
    }

    def resnet(pre: str) -> dict:
        return {
            "mlp": _lin(sd, f"{pre}.mlp.1"),
            "b1_conv": _conv(sd, f"{pre}.block1.block.0"),
            "b1_gn": _ln(sd, f"{pre}.block1.block.1"),
            "b2_conv": _conv(sd, f"{pre}.block2.block.0"),
            "b2_gn": _ln(sd, f"{pre}.block2.block.1"),
            "res": _conv(sd, f"{pre}.res_conv"),
        }

    def txblock(pre: str) -> dict:
        return {
            "ln1": _ln(sd, f"{pre}.norm1"),
            "to_q": _lin(sd, f"{pre}.attn1.to_q"),
            "to_k": _lin(sd, f"{pre}.attn1.to_k"),
            "to_v": _lin(sd, f"{pre}.attn1.to_v"),
            "to_out": _lin(sd, f"{pre}.attn1.to_out.0"),
            "ln3": _ln(sd, f"{pre}.norm3"),
            "ff_in": _lin(sd, f"{pre}.ff.net.0.proj"),
            "ff_out": _lin(sd, f"{pre}.ff.net.2"),
        }

    u = cfg.unet
    est = "decoder.estimator"
    unet = {
        "time_mlp": {
            "lin1": _lin(sd, f"{est}.time_mlp.linear_1"),
            "lin2": _lin(sd, f"{est}.time_mlp.linear_2"),
        },
        "down": [], "mid": [], "up": [],
        "final_block": {
            "conv": _conv(sd, f"{est}.final_block.block.0"),
            "gn": _ln(sd, f"{est}.final_block.block.1"),
        },
        "final_proj": _conv(sd, f"{est}.final_proj"),
    }
    for i in range(len(u.channels)):
        is_last = i == len(u.channels) - 1
        unet["down"].append({
            "resnet": resnet(f"{est}.down_blocks.{i}.0"),
            "tx": [txblock(f"{est}.down_blocks.{i}.1.{j}") for j in range(u.n_blocks)],
            # Downsample1D wraps its conv as `.conv`; the last block is a
            # bare stride-1 Conv1d (flow/decoder.py:72-74)
            "down": _conv(
                sd,
                f"{est}.down_blocks.{i}.2" if is_last else f"{est}.down_blocks.{i}.2.conv",
            ),
        })
    for i in range(u.num_mid_blocks):
        unet["mid"].append({
            "resnet": resnet(f"{est}.mid_blocks.{i}.0"),
            "tx": [txblock(f"{est}.mid_blocks.{i}.1.{j}") for j in range(u.n_blocks)],
        })
    n_up = len(u.channels)
    for i in range(n_up):
        is_last = i == n_up - 1
        unet["up"].append({
            "resnet": resnet(f"{est}.up_blocks.{i}.0"),
            "tx": [txblock(f"{est}.up_blocks.{i}.1.{j}") for j in range(u.n_blocks)],
            "up": (
                _conv(sd, f"{est}.up_blocks.{i}.2")
                if is_last
                else _conv_transpose(sd, f"{est}.up_blocks.{i}.2.conv")
            ),
        })

    return {
        "input_embedding": _g(sd, "input_embedding.weight"),
        "spk_affine": _lin(sd, "spk_embed_affine_layer"),
        "encoder": {
            "embed": {"lin": _lin(sd, "encoder.embed.out.0"),
                      "ln": _ln(sd, "encoder.embed.out.1")},
            "after_norm": _ln(sd, "encoder.after_norm"),
            "layers": enc_layers,
        },
        "encoder_proj": _lin(sd, "encoder_proj"),
        "regulator": regulator,
        "unet": unet,
    }


# ---------------------------------------------------------------------------
# HiFT converter
# ---------------------------------------------------------------------------


def convert_hift(sd: SD, model: HiFTGenerator) -> dict:
    """CosyVoice ``HiFTGenerator`` state dict -> HiFTGenerator params."""
    cfg = model.config

    def resblock(pre: str, kernel: int, dilations: tuple) -> dict:
        n = len(dilations)
        return {
            "convs1": [_conv(sd, f"{pre}.convs1.{j}") for j in range(n)],
            "convs2": [_conv(sd, f"{pre}.convs2.{j}") for j in range(n)],
            "alpha1": [_g(sd, f"{pre}.activations1.{j}.alpha") for j in range(n)],
            "alpha2": [_g(sd, f"{pre}.activations2.{j}.alpha") for j in range(n)],
        }

    params = {
        "f0": {
            "convs": [_conv(sd, f"f0_predictor.condnet.{2 * i}") for i in range(5)],
            "head": _lin(sd, "f0_predictor.classifier"),
        },
        "source_linear": _lin(sd, "m_source.l_linear"),
        "conv_pre": _conv(sd, "conv_pre"),
        "ups": [_conv_transpose(sd, f"ups.{i}") for i in range(len(cfg.upsample_rates))],
        "source_downs": [
            _conv(sd, f"source_downs.{i}") for i in range(len(cfg.upsample_rates))
        ],
        "source_resblocks": [
            resblock(
                f"source_resblocks.{i}",
                cfg.source_resblock_kernel_sizes[i],
                cfg.source_resblock_dilations[i],
            )
            for i in range(len(cfg.upsample_rates))
        ],
        "resblocks": [],
        "conv_post": _conv(sd, "conv_post"),
    }
    n_kernels = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        for j in range(n_kernels):
            params["resblocks"].append(
                resblock(
                    f"resblocks.{i * n_kernels + j}",
                    cfg.resblock_kernel_sizes[j],
                    cfg.resblock_dilations[j],
                )
            )
    return params


# ---------------------------------------------------------------------------
# config.yaml (hyperpyyaml) parsing
# ---------------------------------------------------------------------------


def parse_hyperpyyaml(text: str) -> dict:
    """Parse a CosyVoice ``config.yaml`` WITHOUT executing it: every
    ``!new:pkg.Class`` node becomes ``{"_class": "pkg.Class", **kwargs}``
    (hyperpyyaml itself instantiates arbitrary classes — not something to
    run on an untrusted checkpoint)."""
    import yaml

    class _Loader(yaml.SafeLoader):
        pass

    def _new(loader, tag_suffix, node):
        if isinstance(node, yaml.MappingNode):
            val = loader.construct_mapping(node, deep=True)
        else:
            val = {}
        val["_class"] = tag_suffix
        return val

    _Loader.add_multi_constructor("!new:", _new)
    _Loader.add_multi_constructor("!name:", lambda l, s, n: s)
    _Loader.add_multi_constructor("!ref", lambda l, s, n: l.construct_scalar(n))
    return yaml.load(text, Loader=_Loader)


def configs_from_yaml(text: str) -> tuple[GLM4VFlowConfig, HiFTConfig]:
    """Map the checkpoint's flow/hift hyperparameters onto our configs."""
    y = parse_hyperpyyaml(text)
    f = y["flow"]
    enc = f.get("encoder", {})
    dec = f.get("decoder", {})
    est = dec.get("estimator", {})
    cfm = dec.get("cfm_params", {})
    reg = f.get("length_regulator", {})
    enc_cfg = ConformerConfig(
        input_size=enc.get("input_size", 512),
        output_size=enc.get("output_size", 512),
        attention_heads=enc.get("attention_heads", 8),
        linear_units=enc.get("linear_units", 2048),
        num_blocks=enc.get("num_blocks", 6),
        block_size=enc.get("block_size", 25),
        pos_enc="rel_pos_espnet" if enc.get("pos_enc_layer_type", "rel_pos")
        in ("rel_pos_espnet",) else "rel_pos",
        macaron_style=enc.get("macaron_style", True),
        use_cnn_module=enc.get("use_cnn_module", True),
        cnn_kernel=enc.get("cnn_module_kernel", 15),
        cnn_causal=enc.get("causal", False),
        cnn_norm=enc.get("cnn_module_norm", "batch_norm"),
        key_bias=enc.get("key_bias", True),
    )
    unet_cfg = UNetConfig(
        in_channels=est.get("in_channels", 320),
        out_channels=est.get("out_channels", 80),
        channels=tuple(est.get("channels", (256, 256))),
        attention_head_dim=est.get("attention_head_dim", 64),
        n_blocks=est.get("n_blocks", 4),
        num_mid_blocks=est.get("num_mid_blocks", 12),
        num_heads=est.get("num_heads", 8),
        act_fn=est.get("act_fn", "gelu"),
    )
    flow_cfg = GLM4VFlowConfig(
        vocab_size=f.get("vocab_size", 16384),
        input_size=f.get("input_size", 512),
        output_size=f.get("output_size", 80),
        spk_embed_dim=f.get("spk_embed_dim", 192),
        input_frame_rate=float(f.get("input_frame_rate", 12.5)),
        regulator_stages=len(reg.get("sampling_ratios", (1, 1, 1, 1))),
        encoder=enc_cfg,
        unet=unet_cfg,
        inference_cfg_rate=float(cfm.get("inference_cfg_rate", 0.7)),
        sigma_min=float(cfm.get("sigma_min", 1e-6)),
    )
    h = y["hift"]
    istft = h.get("istft_params", {"n_fft": 16, "hop_len": 4})
    hift_cfg = HiFTConfig(
        in_channels=h.get("in_channels", 80),
        base_channels=h.get("base_channels", 512),
        nb_harmonics=h.get("nb_harmonics", 8),
        sampling_rate=h.get("sampling_rate", 22050),
        nsf_alpha=h.get("nsf_alpha", 0.1),
        nsf_sigma=h.get("nsf_sigma", 0.003),
        nsf_voiced_threshold=h.get("nsf_voiced_threshold", 10),
        upsample_rates=tuple(h.get("upsample_rates", (8, 8))),
        upsample_kernel_sizes=tuple(h.get("upsample_kernel_sizes", (16, 16))),
        istft_n_fft=istft.get("n_fft", 16),
        istft_hop=istft.get("hop_len", 4),
        resblock_kernel_sizes=tuple(h.get("resblock_kernel_sizes", (3, 7, 11))),
        resblock_dilations=tuple(
            tuple(d) for d in h.get("resblock_dilation_sizes",
                                    ((1, 3, 5), (1, 3, 5), (1, 3, 5)))
        ),
        source_resblock_kernel_sizes=tuple(
            h.get("source_resblock_kernel_sizes", (7, 11))
        ),
        source_resblock_dilations=tuple(
            tuple(d) for d in h.get("source_resblock_dilation_sizes",
                                    ((1, 3, 5), (1, 3, 5)))
        ),
        lrelu_slope=h.get("lrelu_slope", 0.1),
        audio_limit=h.get("audio_limit", 0.99),
    )
    return flow_cfg, hift_cfg


def load_glm4v_decoder(ckpt_dir: str) -> "GLM4VAudioDecoder":
    """Load a GLM-4-Voice decoder checkpoint directory (``config.yaml`` +
    ``flow.pt`` + ``hift.pt``, the layout of ``glm-4-voice-decoder``)."""
    import os

    from rstnet_tpu.models.convert import load_torch_state_dict

    with open(os.path.join(ckpt_dir, "config.yaml")) as fh:
        flow_cfg, hift_cfg = configs_from_yaml(fh.read())
    flow = GLM4VFlow(flow_cfg)
    hift = HiFTGenerator(hift_cfg)
    flow_params = convert_glm4v_flow(
        load_torch_state_dict(os.path.join(ckpt_dir, "flow.pt")), flow
    )
    hift_params = convert_hift(
        load_torch_state_dict(os.path.join(ckpt_dir, "hift.pt")), hift
    )
    return GLM4VAudioDecoder(flow, flow_params, hift, hift_params)


# ---------------------------------------------------------------------------
# AudioDecoder: offline + block-streaming token2wav (flow_inference.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class GLM4VAudioDecoder:
    """Reference ``AudioDecoder`` semantics over the JAX flow + HiFT."""

    flow: GLM4VFlow
    flow_params: dict
    hift: HiFTGenerator
    hift_params: dict
    token_overlap_len: int = 5
    mel_cache_len: int = 1

    def __post_init__(self):
        # jit per (shape, static) combination — eager on a remotely-attached
        # TPU dispatches each op over the tunnel. Offline synthesis is one
        # shape per token length; streaming compiles once per block index
        # (the prompt grows each block, as in the reference).
        self._flow_infer = jax.jit(
            self.flow.inference, static_argnames=("n_timesteps",)
        )
        self._hift_infer = jax.jit(self.hift.inference)

    @property
    def mel_overlap_len(self) -> int:
        cfg = self.flow.config
        return int(self.token_overlap_len / cfg.input_frame_rate
                   * cfg.mel_sample_rate / cfg.mel_hop)

    @property
    def source_cache_len(self) -> int:
        return self.mel_cache_len * self.hift.config.istft_hop * int(
            np.prod(self.hift.config.upsample_rates)
        )

    def _mel(self, token: jnp.ndarray, key, prompt_token=None, prompt_feat=None):
        cfg = self.flow.config
        if prompt_token is not None and prompt_token.shape[1] > 0:
            token = jnp.concatenate([prompt_token, token], axis=1)
        T_mel = cfg.mel_len(token.shape[1])
        z = jax.random.normal(key, (token.shape[0], T_mel, cfg.output_size))
        mel = self._flow_infer(self.flow_params, token, z, prompt_feat=prompt_feat)
        if prompt_feat is not None and prompt_feat.shape[1] > 0:
            mel = mel[:, prompt_feat.shape[1]:]
        return mel

    def offline_inference(
        self, token: jnp.ndarray, key: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        """token [B, T_tok] -> wav [B, T_samples] at 22.05 kHz."""
        key = key if key is not None else jax.random.PRNGKey(42)
        kz, kh = jax.random.split(key)
        mel = self._mel(token, kz)
        wav, _ = self._hift_infer(self.hift_params, mel, key=kh)
        return wav

    def stream_inference(
        self, token: jnp.ndarray, block_size: Optional[int] = None,
        key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Block-streaming synthesis (``flow_inference.py:97-141``): each
        token block is decoded with the full history as the flow prompt, mel
        blocks are cross-faded over ``mel_overlap_len`` frames with a
        hamming window, and the HiFT source tail is carried across blocks to
        avoid phase glitches at the seams.

        ``block_size`` defaults to the checkpoint's conformer grid width
        (``flow.encoder.block_size``) so streaming block hops stay aligned
        with the block-causal attention grid the model was trained with —
        the reference couples them the same way (``flow_inference.py:112``).
        """
        cfg = self.flow.config
        if block_size is None:
            block_size = cfg.encoder.block_size
        key = key if key is not None else jax.random.PRNGKey(42)
        T = token.shape[1]
        windows: dict = {}  # crossfade windows keyed by overlap length
        mel_overlap = None
        hift_mel_cache = None
        hift_source_cache = None
        mels, wavs = [], []
        for start in range(0, T, block_size):
            key, kz, kh = jax.random.split(key, 3)
            block = token[:, start : start + block_size]
            finalize = start + block_size >= T
            if mels:
                prompt_feat = jnp.concatenate(mels, axis=1)
                prompt_token = token[:, :start]
            else:
                prompt_feat = prompt_token = None
            mel = self._mel(block, kz, prompt_token, prompt_feat)
            if mel_overlap is not None and mel_overlap.shape[1] > 0:
                # the regenerated region at the head of `mel` is exactly as
                # long as what was trimmed from the previous block (the flow
                # prompt excluded those frames), so the seam length is the
                # carried overlap's own length — which may be shorter than
                # mel_overlap_len when a tiny block under-filled it
                n = mel_overlap.shape[1]
                if n not in windows:
                    windows[n] = np.hamming(2 * n)
                window = windows[n]
                head = mel[:, :n] * jnp.asarray(window[:n, None], jnp.float32) \
                    + mel_overlap * jnp.asarray(window[n:, None], jnp.float32)
                mel = jnp.concatenate([head, mel[:, n:]], axis=1)
            if hift_mel_cache is not None:
                full_mel = jnp.concatenate([hift_mel_cache, mel], axis=1)
                cache_source = hift_source_cache
            else:
                full_mel = mel
                cache_source = None
            if not finalize:
                # trim at most full_mel-1 frames so every block emits audio
                # and the HiFT mel cache stays non-empty even for blocks
                # shorter than the nominal overlap
                trim = min(self.mel_overlap_len, max(full_mel.shape[1] - 1, 0))
                mel_overlap = full_mel[:, full_mel.shape[1] - trim:]
                full_mel = full_mel[:, : full_mel.shape[1] - trim]
                wav, src = self._hift_infer(
                    self.hift_params, full_mel, key=kh, cache_source=cache_source
                )
                hift_mel_cache = full_mel[:, -self.mel_cache_len:]
                hift_source_cache = src[:, -self.source_cache_len:]
                wav = wav[:, : wav.shape[1] - self.source_cache_len]
            else:
                wav, _ = self._hift_infer(
                    self.hift_params, full_mel, key=kh, cache_source=cache_source
                )
            mels.append(mel if finalize else full_mel)
            wavs.append(wav)
        return jnp.concatenate(wavs, axis=1)
