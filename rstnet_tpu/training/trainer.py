"""Speech-text LM trainer CLI.

One entry point replaces the reference's trainer zoo
(``MLLM_v2/trainer/pre_training_full.py`` / ``pre_training_lora.py`` /
``pre_training_lora_ds.py`` and the v1 ``finetuning_*`` variants): the
parallelism strategy is the mesh shape (``--dp/--fsdp/--tensor``), the
full-vs-LoRA switch is ``--lora_r``, and ZeRO-style optimizer sharding falls
out of the param shardings. Per-epoch flow mirrors the reference: train with
metric reporting -> sampler refresh -> validation -> epoch checkpoint, plus
intra-epoch checkpoints every ``--save_interval`` steps.

Launch one process per host (``jax.distributed.initialize`` replaces
torchrun); each host reads its own manifest shard.
"""

from __future__ import annotations

import logging
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from rstnet_tpu.data.dataloader import (
    build_data_iterator,
    find_data_jsons,
)
from rstnet_tpu.data.task_definition import load_data_for_all_tasks
from rstnet_tpu.models.config import Config
from rstnet_tpu.models.lm import SpeechTextLM
from rstnet_tpu.models.lora import attach_lora, init_lora, lora_trainable_mask
from rstnet_tpu.parallel.mesh import initialize_distributed, make_mesh
from rstnet_tpu.parallel.sharding import batch_sharding, infer_param_shardings
from rstnet_tpu.training.checkpoint import (
    maybe_resume,
    save_checkpoint,
)
from rstnet_tpu.training.schedulers import warmup_lr
from rstnet_tpu.training.train_step import (
    init_train_state,
    make_eval_step,
    make_loss_fn,
    make_optimizer,
    make_train_step,
)
from rstnet_tpu.utils.arguments import get_args
from rstnet_tpu.utils.reporter import Reporter


def setup_logging(rank: int, exp_dir: str) -> None:
    os.makedirs(f"{exp_dir}/logs", exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s [%(filename)s:%(lineno)d] %(message)s",
        handlers=[
            logging.FileHandler(f"{exp_dir}/logs/rank{rank}.log"),
            logging.StreamHandler(sys.stdout),
        ],
        force=True,
    )


def _ckpt_state(state: dict) -> dict:
    """Checkpointable view: drop the transient grad-accumulation buffers
    (params-sized; like the reference, a resume restarts the accumulation
    window) so checkpoints stay mode-independent."""
    return {k: v for k, v in state.items() if k not in ("acc_grads", "micro")}


def build_model(args):
    if args.model_family == "moshi":
        # pure Moshi RQ-Transformer (v1 finetuning_full_* trainer parity);
        # kyutai weights load via convert.convert_moshi_lm
        from rstnet_tpu.models.moshi_lm import MoshiLMModel

        return MoshiLMModel(
            delays=(0,) * (args.n_q + 1), n_q=args.n_q, dep_q=args.dep_q,
            card=args.audio_card, text_card=args.moshi_text_card,
            dim=args.moshi_dim, num_heads=args.moshi_num_heads,
            num_layers=args.moshi_num_layers,
            depformer_dim=args.codecformer_dim,
            depformer_num_heads=args.codecformer_heads,
            depformer_num_layers=args.codecformer_layers,
            depformer_dim_feedforward=args.codecformer_dim_feedforward,
            lora_dropout=args.lora_dropout if args.lora_r > 0 else 0.0,
        )
    overrides = dict(
        audio_card=args.audio_card, n_q=args.n_q, dep_q=args.dep_q,
        codecformer_dim=args.codecformer_dim, codecformer_heads=args.codecformer_heads,
        codecformer_layers=args.codecformer_layers,
        codecformer_dim_feedforward=args.codecformer_dim_feedforward,
        lora_r=args.lora_r, lora_alpha=args.lora_alpha, lora_dropout=args.lora_dropout,
        lora_query=args.lora_query, lora_key=args.lora_key, lora_value=args.lora_value,
        lora_projection=args.lora_projection, lora_mlp=args.lora_mlp,
        lora_head=args.lora_head,
        use_flash_attention=args.flash_attention and jax.default_backend() == "tpu",
        remat=args.remat,
    )
    if args.model_config:
        cfg = Config.from_file(args.model_config, **overrides)
    elif args.model_name:
        cfg = Config.from_name(args.model_name, **overrides)
    else:
        raise ValueError("need --model_config or --model_name")
    return SpeechTextLM(cfg)


def build_tokenizers(args) -> dict:
    tokenizers: dict = {}
    if args.audio_tokenizer and args.audio_tokenizer != "none":
        # offline-tokenized data only needs tokenize2/find_length
        from rstnet_tpu.data.tokenizers.abs_tokenizer import AbsTokenizer

        class StoredTokens(AbsTokenizer):
            def find_length(self, x):
                return int(np.shape(x)[-1])

        tokenizers["audio"] = StoredTokens()
        tokenizers["text"] = StoredTokens()
    return tokenizers


def main(argv=None) -> None:
    initialize_distributed()
    args = get_args(argv)
    if not 0.0 <= args.lora_dropout < 1.0:
        raise SystemExit(
            f"--lora_dropout must be in [0, 1), got {args.lora_dropout}"
        )
    rank = jax.process_index()
    if rank == 0:
        os.makedirs(args.exp_dir, exist_ok=True)
    setup_logging(rank, args.exp_dir)
    np.random.seed(args.seed)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_model(args)
    if rank == 0:
        # dump the RESOLVED model config (incl. CLI overrides) for inference
        # reuse (reference: pre_training_full.py:121-124 -> infer reads it)
        import dataclasses as _dc

        import yaml

        if args.model_family != "moshi":
            with open(f"{args.exp_dir}/config.yaml", "w") as f:
                yaml.safe_dump(_dc.asdict(model.config), f, sort_keys=False)
        with open(f"{args.exp_dir}/train_args.yaml", "w") as f:
            yaml.safe_dump(vars(args), f, sort_keys=False)
    params = model.init(jax.random.PRNGKey(1337 + args.seed), dtype)
    if args.checkpoint_path:
        from rstnet_tpu.models.convert import (
            convert_backbone,
            convert_moshi_lm,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(args.checkpoint_path)
        if args.model_family == "moshi":
            params = jax.tree.map(
                lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
                convert_moshi_lm(sd, model),
            )
        else:
            params["backbone"] = jax.tree.map(
                lambda x: x.astype(dtype), convert_backbone(sd, model.config)
            )
        logging.info(f"loaded pretrained weights from {args.checkpoint_path}")
    trainable_mask = None
    if args.lora_r > 0 and args.model_family == "moshi":
        from rstnet_tpu.models.lora import init_lora_streaming_transformer

        overlay = init_lora_streaming_transformer(
            model.transformer, jax.random.PRNGKey(7), args.lora_r, args.lora_alpha, dtype
        )
        params["transformer"] = attach_lora(params["transformer"], overlay)
        trainable_mask = lora_trainable_mask(params)
        # the depformer side stays fully trainable (reference finetuning_lora)
        for k in ("depformer", "depformer_in", "depformer_emb",
                  "depformer_text_emb", "linears", "emb", "text_emb",
                  "text_linear", "out_norm"):
            trainable_mask[k] = jax.tree.map(lambda _: True, params[k])
    elif args.lora_r > 0:
        overlay = init_lora(model.config, jax.random.PRNGKey(7), dtype)
        # the overlay mirrors the *Backbone* param tree (blocks/lm_head at the
        # top level) — attach it under the LM's "backbone" subtree, where the
        # forward actually reads the factors
        params["backbone"] = attach_lora(params["backbone"], overlay)
        if args.base_int8:
            # frozen-base int8: halve the backbone's HBM footprint so an 8B
            # LoRA fine-tune fits one 16 GB chip (reference 8B LoRA recipe:
            # egs/pretraining/run.sh:141). The LoRA factors survive the
            # quantization walk (it only swaps each linear's "weight").
            from rstnet_tpu.models.backbone import quantize_backbone_int8

            params["backbone"] = quantize_backbone_int8(params["backbone"])
        trainable_mask = lora_trainable_mask(params)
        # codecformer & embeddings always train in LoRA mode (the reference
        # marks only the backbone lora + keeps local transformer trainable)
        for k in ("codecformer", "input_emb", "codecformer_text_emb",
                  "codecformer_emb", "codecformer_in", "audio_linears"):
            trainable_mask[k] = jax.tree.map(lambda _: True, params[k])
    if args.base_int8 and args.lora_r <= 0:
        raise SystemExit("--base_int8 requires --lora_r > 0 (it freezes the "
                         "backbone; something must remain trainable)")
    if args.base_int8 and args.model_family == "moshi":
        raise SystemExit("--base_int8 is wired for the backbone model family")
    if args.base_int8 and args.grad_accum > 1:
        raise SystemExit("--base_int8 does not support --grad_accum yet "
                         "(the cross-batch accumulator is unpartitioned)")

    # mesh + sharding
    n_dev = len(jax.devices())
    denom = args.fsdp * args.tensor * args.seq * args.expert * args.pipe
    dp = args.dp if args.dp > 0 else max(1, n_dev // denom)
    mesh = make_mesh({
        "data": dp, "pipe": args.pipe, "seq": args.seq, "fsdp": args.fsdp,
        "expert": args.expert, "tensor": args.tensor,
    })
    if args.seq > 1 or args.pipe > 1:
        if args.model_family == "moshi":
            raise SystemExit("--seq/--pipe > 1 require a backbone model "
                             "family (context/pipeline parallelism is wired "
                             "into the litgpt backbone)")
        import dataclasses as _dc

        # behavior flags only — the param tree is unchanged, so the already-
        # initialized/loaded params stay valid
        model = type(model)(_dc.replace(
            model.config,
            sequence_parallel=model.config.sequence_parallel or args.seq > 1,
            pipeline_parallel=model.config.pipeline_parallel or args.pipe > 1,
            pipeline_microbatches=args.pipeline_microbatches
            or model.config.pipeline_microbatches,
        ))
    logging.info(f"mesh: {dict(mesh.shape)} over {n_dev} devices")

    from rstnet_tpu.data.collate import SpecialTokens

    special = SpecialTokens(
        text_empty=args.text_empty_token,
        text_pad=args.text_pad_token,
        text_empty_pad=args.text_pad_token + 1,
        text_eos=args.text_pad_token + 2,
        semantic_empty=args.semantic_empty_token,
        acoustic_empty=args.acoustic_empty_token,
        semantic_pad=args.semantic_pad_token,
        acoustic_pad=args.acoustic_pad_token,
    )
    tokenizers = build_tokenizers(args)
    train_iter, valid_iter = None, None
    if args.train_data_jsons:
        train_data, train_text = load_data_for_all_tasks(
            find_data_jsons(args.train_data_jsons)
        )
        train_iter = build_data_iterator(
            train_data, train_text, tokenizers, batch_scale=args.batch_scale,
            max_length=args.max_length, min_length=args.min_length,
            parallel_number=args.parallel_number, seed=args.seed,
            minibatch_debug=args.minibatch_debug, is_train=True, rank=rank,
            special=special, rebalance_alpha=args.rebalance_alpha,
        )
    if args.valid_data_jsons:
        valid_data, valid_text = load_data_for_all_tasks(
            find_data_jsons(args.valid_data_jsons)
        )
        valid_iter = build_data_iterator(
            valid_data, valid_text, tokenizers, batch_scale=args.batch_scale,
            max_length=args.max_length, min_length=args.min_length,
            parallel_number=args.parallel_number, seed=args.seed,
            minibatch_debug=args.minibatch_debug, is_train=False, rank=rank,
            special=special,
        )

    schedule = warmup_lr(args.global_learning_rate, args.warmup_steps)
    tx = make_optimizer(
        schedule, weight_decay=args.weight_decay,
        grad_clip=args.grad_clip if args.grad_clip > 0 else None,
        # the partitioned PEFT step masks by tree structure, not by optax
        trainable_mask=None if args.base_int8 else trainable_mask,
        skip_nonfinite=args.skip_nan_updates,
    )
    loss_fn = make_loss_fn(model, audio_ignore_id=args.acoustic_pad_token, text_ignore_id=args.text_pad_token)
    reporter = Reporter()

    with jax.set_mesh(mesh):
        params = jax.device_put(params, infer_param_shardings(mesh, params))
        frozen = None
        if args.base_int8:
            from rstnet_tpu.training.train_step import (
                combine_params,
                partition_params,
            )

            trainable, frozen = partition_params(params, trainable_mask)
            params = trainable  # state (and checkpoints) hold ONLY the
            # trainable tree — the reference's lora_filter checkpoint shape
        state = init_train_state(params, tx)
        state, extras, resumed = maybe_resume(args.exp_dir, state)
        if resumed is not None and "reporter" in extras:
            reporter.load_state_dict(extras["reporter"])
            logging.info(f"resumed from {resumed} at epoch {reporter.get_epoch()}")
        use_lora_dropout = args.lora_r > 0 and args.lora_dropout > 0.0
        dropout_seed = args.seed if use_lora_dropout else None
        accum_step = apply_step = None
        if args.grad_accum > 1:
            # deferred updates over the bucketed loader (reference
            # b_idx % grad_accum, pre_training_full.py:226-236)
            from rstnet_tpu.training.train_step import make_grad_accum_steps

            accum_step, apply_step = make_grad_accum_steps(
                loss_fn, tx, trainable_mask=trainable_mask,
                dropout_seed=dropout_seed,
            )
            state["acc_grads"] = jax.tree.map(jnp.zeros_like, state["params"])
            state["micro"] = jnp.zeros((), jnp.int32)
        if args.base_int8:
            from rstnet_tpu.training.train_step import make_peft_train_step

            peft_step = make_peft_train_step(loss_fn, tx, dropout_seed=dropout_seed)
            _eval = make_eval_step(loss_fn)

            def train_step(s, b):
                return peft_step(s, frozen, b)

            def eval_step(p, b):
                return _eval(combine_params(p, frozen), b)
        else:
            train_step = make_train_step(
                loss_fn, tx, trainable_mask=trainable_mask, dropout_seed=dropout_seed,
            )
            eval_step = make_eval_step(loss_fn)
        b_shard = batch_sharding(mesh, 3)
        dp_total = mesh.shape["data"] * mesh.shape["fsdp"]

        def device_batch(b):
            tokens, masks = b["tokens"], b["masks"]
            # pad batch rows (zero loss mask) to the next power-of-two
            # multiple of the data axes, bounding jit recompiles to
            # O(log B) x O(buckets) programs
            B = tokens.shape[0]
            target = dp_total
            while target < B:
                target *= 2
            rem = target - B
            if rem:
                tokens = np.concatenate([tokens, np.repeat(tokens[-1:], rem, 0)], 0)
                masks = np.concatenate(
                    [masks, np.zeros((rem,) + masks.shape[1:], masks.dtype)], 0
                )
            return {
                "tokens": jax.device_put(jnp.asarray(tokens), b_shard),
                "masks": jax.device_put(jnp.asarray(masks), b_shard),
            }

        start_epoch = reporter.get_epoch() + 1
        for ep in range(start_epoch, args.n_epoch + 1):
            reporter.set_epoch(ep)
            with reporter.observe("train") as sub:
                if train_iter is not None:
                    for b_idx, batch in enumerate(
                        sub.measure_iter_time(train_iter, "iter_time"), 1
                    ):
                        sub.register(
                            {"batch_size": batch["tokens"].shape[0],
                             "seq_len": batch["tokens"].shape[2]}
                        )
                        with sub.measure_time("step_time"):
                            if accum_step is not None:
                                state, metrics = accum_step(state, device_batch(batch))
                                if b_idx % args.grad_accum == 0:
                                    state = apply_step(state)
                            else:
                                state, metrics = train_step(state, device_batch(batch))
                        sub.register({k: float(v) for k, v in metrics.items()})
                        sub.register({"lr": float(schedule(int(state["step"]) - 1))})
                        sub.next()
                        if b_idx % args.print_freq == 0:
                            logging.info(sub.log_message(-args.print_freq))
                        if args.save_interval > 0 and b_idx % args.save_interval == 0:
                            save_checkpoint(
                                f"{args.exp_dir}/ep{ep}-iter{b_idx}.checkpoint",
                                _ckpt_state(state),
                                {"reporter": reporter.state_dict()},
                                keep_last=args.keep_last_ckpt,
                            )
            if train_iter is not None:
                train_iter.sampler.refresh()
            with reporter.observe("valid") as sub:
                if valid_iter is not None:
                    for batch in sub.measure_iter_time(valid_iter, "iter_time"):
                        metrics = eval_step(state["params"], device_batch(batch))
                        sub.register({k: float(v) for k, v in metrics.items()})
                        sub.next()
            logging.info(reporter.log_message())
            save_checkpoint(
                f"{args.exp_dir}/ep{ep}.checkpoint", _ckpt_state(state),
                {"reporter": reporter.state_dict()}, keep_last=args.keep_last_ckpt,
            )


if __name__ == "__main__":
    main()
