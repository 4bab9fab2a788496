"""Codec GAN trainer CLI.

Capability parity with ``AudioCodec/MimiCodec/train.py``: yaml-configured
(same stanza layout as ``config/mimi24k.yaml``), alternating generator /
discriminator updates with dual AdamW optimizers and per-epoch exponential
LR decay, semantic-teacher distillation, ``discriminator_iter_start`` gating,
rotating checkpoints, periodic validation, and TensorBoard-style logging via
the Reporter.

TPU-first notes: the G and D updates are two jitted steps over explicit
state; EMA codebook buffers ride the G step as state; the D step reuses the
stop-gradient reconstruction instead of re-running the generator forward
(``train.py:267`` re-forwards — pure waste).

Distributed training (``--dp N``, replacing the reference's DDP +
dist.all_reduce of VQ stats, ``AudioCodec/MimiCodec/train.py:96-151`` +
``quantization/core_vq.py:20-81``): params/optimizer state are replicated
over a ``data``-axis mesh and each batch is sharded on its leading axis.
Because the jitted steps are written over the GLOBAL batch, GSPMD inserts
the gradient all-reduce AND makes the EMA codebook statistics
(``one_hot.T @ x`` / usage sums in ``quantization/codebook.py:61-84``)
global sums automatically — no explicit collective in the trainer at all.
Mesh-invariance is asserted by ``tests/test_codec_training.py`` (G/D params
and EMA buffers match the single-device run bit-for-tolerance) and the
driver's ``dryrun_multichip`` codec phase.
"""

from __future__ import annotations

import argparse
import logging
import os
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

from rstnet_tpu.data.codec_dataset import WaveDataset, WaveIterator
from rstnet_tpu.data.semantic_features import build_teacher
from rstnet_tpu.losses.gan import (
    GeneratorLossConfig,
    discriminator_loss,
    generator_loss,
)
from rstnet_tpu.models.discriminators import DISCRIMINATORS
from rstnet_tpu.models.mimi_train import TrainableMimiCodec
from rstnet_tpu.training.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from rstnet_tpu.utils.reporter import Reporter


def build_from_config(cfg: dict):
    gen_cfg = dict(cfg["generator"]["config"])
    model = TrainableMimiCodec(
        sample_rate=gen_cfg.get("sample_rate", 24000),
        n_filters=gen_cfg.get("n_filters", 64),
        encoder_rates=tuple(gen_cfg.get("encoder_rates", (4, 5, 6, 8))),
        compress=gen_cfg.get("compress", 2),
        latent_dim=gen_cfg.get("latent_dim", 512),
        codebook_size=gen_cfg.get("codebook_size", 2048),
        codebook_dim=gen_cfg.get("codebook_dim", 64),
        rvq_layers=gen_cfg.get("rvq_layers", 8),
        num_heads=gen_cfg.get("num_heads", 8),
        num_layers=gen_cfg.get("num_layers", 8),
        layer_scale=gen_cfg.get("layer_scale", 0.01),
        context=gen_cfg.get("context", 250),
        dim_feedforward=gen_cfg.get("dim_feedforward", 2048),
        semantic_feature_dim=gen_cfg.get("semantic_feature_dim", 1024),
        target_frame_rate=gen_cfg.get("target_frame_rate", 12.5),
    )
    discs = {}
    for name in cfg.get("d_list", ["mfd"]):
        dconf = dict(cfg.get(name, {}).get("config", {}))
        cls = DISCRIMINATORS[name]
        kwargs = {}
        for k, v in dconf.items():
            if k in ("hop_lengths", "hidden_channels", "period_sizes"):
                kwargs[k] = tuple(v)
            elif k in ("domain",):
                kwargs[k] = v
            elif k in ("mel_scale",):
                kwargs[k] = bool(v)
            elif k in ("sample_rate", "period_kernel_size", "num_scales",
                       "pool_kernel_size", "pool_stride"):
                kwargs[k] = int(v)
        discs[name] = cls(**kwargs)
    crit = cfg.get("criterion", {}).get("g_criterion", {}).get("config", {})
    g_loss_cfg = GeneratorLossConfig(
        adv_criterion="mse" if crit.get("adv_criterion", "MSEGLoss") == "MSEGLoss" else "hinge",
        use_feature_match=crit.get("use_feature_match", True),
        feat_match_loss_weight=crit.get("feat_match_loss_weight", 20),
        use_mel_loss=crit.get("use_mel_loss", False),
        mel_loss_weight=crit.get("mel_loss_weight", 45),
        mel_kwargs=tuple(crit.get("mel_scale_loss", {}).items()),
        use_full_stft_loss=crit.get("use_full_stft_loss", True),
        full_stft_loss_weight=crit.get("full_stft_loss_weight", 1),
        full_fft_sizes=tuple(crit.get("full_multi_scale_stft_loss", {}).get("fft_sizes", (512, 1024, 2048))),
        full_win_sizes=tuple(crit.get("full_multi_scale_stft_loss", {}).get("win_sizes", (480, 960, 1200))),
        full_hop_sizes=tuple(crit.get("full_multi_scale_stft_loss", {}).get("hop_sizes", (120, 240, 300))),
        use_sub_stft_loss=crit.get("use_sub_stft_loss", True),
        sub_stft_loss_weight=crit.get("sub_stft_loss_weight", 1),
        sub_num_bands=crit.get("sub_multi_scale_stft_loss", {}).get("num_bands", 6),
        sub_fft_sizes=tuple(crit.get("sub_multi_scale_stft_loss", {}).get("fft_sizes", (128, 256, 256))),
        sub_win_sizes=tuple(crit.get("sub_multi_scale_stft_loss", {}).get("win_sizes", (80, 120, 200))),
        sub_hop_sizes=tuple(crit.get("sub_multi_scale_stft_loss", {}).get("hop_sizes", (20, 40, 50))),
        use_wav_loss=crit.get("use_wav_loss", False),
        wav_loss_weight=crit.get("wav_loss_weight", 0.0),
    )
    return model, discs, g_loss_cfg


def make_steps(model, discs, g_loss_cfg, g_tx, d_tx, sim_loss_weight=1.0,
               commit_loss_weight=0.0):
    """Build jitted (g_step, d_step, eval_step)."""

    def g_loss_fn(g_params, buffers, d_params, audio, features, key, use_adv):
        rec, codes, commit, sim_loss, new_buffers = model(
            g_params, buffers, audio, features, key
        )
        output_real, output_fake, fmap_real, fmap_fake = {}, {}, {}, {}
        for name, disc in discs.items():
            ro, fo, rf, ff = disc(d_params[name], audio, rec)
            output_real[name], output_fake[name] = ro, fo
            fmap_real[name], fmap_fake[name] = rf, ff
        loss, items = generator_loss(
            g_loss_cfg, audio, rec, output_fake, fmap_real, fmap_fake,
            use_adv_loss=use_adv,
        )
        loss = loss + sim_loss_weight * sim_loss + commit_loss_weight * commit
        items["codec_loss"] = sim_loss
        items["commit_loss"] = commit
        items["g_loss"] = loss
        return loss, (rec, new_buffers, items)

    @partial(jax.jit, static_argnames=("use_adv",), donate_argnums=(0,))
    def g_step(g_state, d_params, audio, features, key, use_adv: bool):
        (loss, (rec, new_buffers, items)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_state["params"], g_state["buffers"], d_params, audio, features, key, use_adv)
        updates, opt_state = g_tx.update(grads, g_state["opt_state"], g_state["params"])
        params = optax.apply_updates(g_state["params"], updates)
        return (
            {"params": params, "buffers": new_buffers, "opt_state": opt_state,
             "step": g_state["step"] + 1},
            jax.lax.stop_gradient(rec),
            items,
        )

    def d_loss_fn(d_params, audio, rec):
        output_real, output_fake = {}, {}
        for name, disc in discs.items():
            ro, fo, _, _ = disc(d_params[name], audio, rec)
            output_real[name], output_fake[name] = ro, fo
        return discriminator_loss(output_real, output_fake)

    @partial(jax.jit, donate_argnums=(0,))
    def d_step(d_state, audio, rec):
        (loss, items), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            d_state["params"], audio, rec
        )
        updates, opt_state = d_tx.update(grads, d_state["opt_state"], d_state["params"])
        params = optax.apply_updates(d_state["params"], updates)
        items["d_loss"] = loss
        return {"params": params, "opt_state": opt_state}, items

    @jax.jit
    def eval_step(g_params, buffers, audio):
        z = model.encode_to_latent(g_params, audio)
        zq, *_ = model.quantizer.forward(
            g_params["quantizer"], buffers["quantizer"], z, update=False
        )
        rec = model.decode_from_latent(g_params, zq)[..., : audio.shape[-1]]
        from rstnet_tpu.losses.gan import multi_resolution_stft_loss

        sc, mag = multi_resolution_stft_loss(rec[:, 0], audio[:, 0])
        return {"valid_sc": sc, "valid_mag": mag,
                "valid_l1": jnp.mean(jnp.abs(rec - audio))}

    return g_step, d_step, eval_step


def main(argv=None):
    parser = argparse.ArgumentParser(description="rstnet_tpu codec GAN trainer")
    parser.add_argument("--config", required=True, help="mimi24k.yaml-style config")
    parser.add_argument("--exp_dir", default="exp/codec")
    parser.add_argument("--train_scp", default="")
    parser.add_argument("--valid_scp", default="")
    parser.add_argument("--semantic_teacher", default="none",
                        choices=["wavlm", "hubert", "whisper", "w2v-bert", "none"])
    parser.add_argument("--semantic_checkpoint", default="")
    parser.add_argument("--max_steps", type=int, default=-1)
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel devices (-1 = all); batches are "
                             "sharded over a 'data' mesh axis, VQ EMA stats "
                             "become global sums under GSPMD")
    args = parser.parse_args(argv)
    # 'precomputed' is a library-level teacher (features flow through
    # g_step's features arg after offline extraction); this CLI's audio
    # iterator carries no utterance ids to match features against, so
    # offering it here would only crash on the first batch.

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    os.makedirs(args.exp_dir, exist_ok=True)
    logging.basicConfig(level=logging.INFO, force=True)

    model, discs, g_loss_cfg = build_from_config(cfg)
    key = jax.random.PRNGKey(cfg.get("seed", 2333))
    k1, k2, key = jax.random.split(key, 3)
    g_params, buffers = model.init(k1)
    d_params = {
        name: disc.init(k) for (name, disc), k in zip(
            discs.items(), jax.random.split(k2, len(discs))
        )
    }

    opt_cfg = cfg.get("optimizer", {})
    g_opt = opt_cfg.get("g", {}).get("config", {})
    d_opt = opt_cfg.get("d", {}).get("config", {})
    sched = cfg.get("lr_scheduler", {})
    gamma_g = sched.get("g", {}).get("config", {}).get("gamma", 0.999)
    gamma_d = sched.get("d", {}).get("config", {}).get("gamma", 0.999)

    def make_tx(conf, gamma):
        base_lr = float(conf.get("lr", 2e-4))
        betas = conf.get("betas", (0.8, 0.99))
        schedule = lambda step: base_lr * gamma ** (step / max(1, steps_per_epoch))  # noqa: E731
        return optax.adamw(schedule, b1=betas[0], b2=betas[1],
                           eps=float(conf.get("eps", 1e-6)))

    train_iter = None
    steps_per_epoch = 1
    if args.train_scp:
        dataset = WaveDataset(
            args.train_scp, segment_size=cfg.get("segment_size", 72000),
            sampling_rate=model.sample_rate, split=True,
            audio_norm_scale=cfg.get("audio_norm_scale", 1.0),
        )
        train_iter = WaveIterator(dataset, cfg.get("batch_size", 4), shuffle=True)
        steps_per_epoch = max(1, len(train_iter))
    g_tx = make_tx(g_opt, gamma_g)
    d_tx = make_tx(d_opt, gamma_d)
    # The reference computes the commitment penalty but only adds the
    # semantic distillation loss to the objective (train.py:246-247); keep
    # commit_loss_weight=0 by default for parity, configurable for ablations.
    g_step, d_step, eval_step = make_steps(
        model, discs, g_loss_cfg, g_tx, d_tx,
        commit_loss_weight=float(cfg.get("use_commit_loss_weight", 0.0)),
    )

    g_state = {"params": g_params, "buffers": buffers, "opt_state": g_tx.init(g_params),
               "step": jnp.zeros((), jnp.int32)}
    d_state = {"params": d_params, "opt_state": d_tx.init(d_params)}

    # data-parallel mesh: states replicated, batches sharded on axis 0; the
    # jitted steps stay global-batch semantics, so XLA inserts the gradient
    # all-reduce and globalizes the VQ EMA sums (see module docstring)
    mesh = None
    if args.dp == -1:
        args.dp = len(jax.devices())
    if args.dp > 1:
        from rstnet_tpu.parallel.mesh import make_mesh
        from rstnet_tpu.parallel.sharding import batch_sharding, replicated

        if cfg.get("batch_size", 4) % args.dp:
            raise ValueError(
                f"batch_size {cfg.get('batch_size', 4)} not divisible by "
                f"--dp {args.dp}"
            )
        mesh = make_mesh({"data": args.dp}, devices=jax.devices()[: args.dp])
        logging.info(f"codec trainer mesh: {dict(mesh.shape)}")
        g_state = jax.device_put(g_state, replicated(mesh))
        d_state = jax.device_put(d_state, replicated(mesh))

    def put_batch(x):
        x = jnp.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim)) if mesh is not None else x

    # auto-resume
    ckpt = latest_checkpoint(args.exp_dir)
    global_steps = 0
    if ckpt is not None:
        state, extras = restore_checkpoint(ckpt, {"g": g_state, "d": d_state})
        g_state, d_state = state["g"], state["d"]
        global_steps = extras.get("global_steps", int(g_state["step"]))
        logging.info(f"resumed from {ckpt} at step {global_steps}")

    teacher = build_teacher(
        args.semantic_teacher,
        args.semantic_checkpoint or None,
        feature_dim=model.semantic_feature_dim,
    )
    reporter = Reporter()
    disc_start = cfg.get("discriminator_iter_start", 0)

    valid_iter = None
    if args.valid_scp:
        vset = WaveDataset(
            args.valid_scp, segment_size=cfg.get("segment_size", 72000),
            sampling_rate=model.sample_rate, split=True,
        )
        valid_iter = WaveIterator(vset, cfg.get("batch_size", 4), shuffle=False)

    if train_iter is None:
        logging.warning("no --train_scp given; initialized model only")
        return g_state, d_state

    num_epochs = cfg.get("num_epoches", 500)
    for epoch in range(num_epochs):
        reporter.set_epoch(epoch)
        train_iter.set_epoch(epoch)
        with reporter.observe("train") as sub:
            for audio_24k, audio_16k in train_iter:
                features = (
                    None if args.semantic_teacher == "none"
                    else put_batch(teacher.extract(audio_16k))
                )
                key, sub_key = jax.random.split(key)
                audio_24k = put_batch(audio_24k)
                g_state, rec, g_items = g_step(
                    g_state, d_state["params"], audio_24k, features,
                    sub_key, use_adv=global_steps > disc_start,
                )
                d_state, d_items = d_step(d_state, audio_24k, rec)
                global_steps += 1
                sub.register({k: float(v) for k, v in {**g_items, **d_items}.items()})
                sub.next()
                if global_steps % cfg.get("print_freq", 10) == 0:
                    logging.info(sub.log_message(-cfg.get("print_freq", 10)))
                if global_steps % cfg.get("checkpoint_interval", 5000) == 0:
                    save_checkpoint(
                        f"{args.exp_dir}/ep{epoch}-iter{global_steps}.checkpoint",
                        {"g": g_state, "d": d_state},
                        {"global_steps": global_steps},
                        keep_last=cfg.get("num_ckpt_keep", 10),
                    )
                if valid_iter is not None and global_steps % cfg.get("validation_interval", 5000) == 0:
                    with reporter.observe("valid") as vsub:
                        for v24, _ in valid_iter:
                            m = eval_step(g_state["params"], g_state["buffers"], put_batch(v24))
                            vsub.register({k: float(v) for k, v in m.items()})
                            vsub.next()
                    logging.info(reporter.log_message())
                if args.max_steps > 0 and global_steps >= args.max_steps:
                    logging.info("max_steps reached")
                    save_checkpoint(
                        f"{args.exp_dir}/ep{epoch}-iter{global_steps}.checkpoint",
                        {"g": g_state, "d": d_state},
                        {"global_steps": global_steps},
                        keep_last=cfg.get("num_ckpt_keep", 10),
                    )
                    return g_state, d_state
        logging.info(reporter.log_message())
    return g_state, d_state


if __name__ == "__main__":
    main()
