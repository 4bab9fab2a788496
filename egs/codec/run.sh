#!/usr/bin/env bash
# Codec (Mimi reproduction) training recipe
# (parity: AudioCodec/MimiCodec/{train.py,inference.py} + Evaluation/codec).
set -euo pipefail

stage=${stage:-1}
stop_stage=${stop_stage:-3}
data_root=${data_root:-data/codec}
exp_dir=${exp_dir:-exp/codec}
config=${config:-egs/codec/mimi24k.yaml}
train_scp=${train_scp:-$data_root/train.scp}
valid_scp=${valid_scp:-$data_root/val.scp}
teacher=${teacher:-none}        # none | wavlm | hubert | precomputed
teacher_ckpt=${teacher_ckpt:-}

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "== stage 1: GAN training =="
  python -m rstnet_tpu.training.codec_trainer \
      --config "$config" --exp_dir "$exp_dir" \
      --train_scp "$train_scp" --valid_scp "$valid_scp" \
      --semantic_teacher "$teacher" \
      ${teacher_ckpt:+--semantic_checkpoint "$teacher_ckpt"} "$@"
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "== stage 2: round-trip reconstruction of the validation set =="
  python -m rstnet_tpu.inference.codec_infer \
      --config "$config" --checkpoint_dir "$exp_dir" \
      --scp "$valid_scp" --out_dir "$exp_dir/recon"
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "== stage 3: codec metric suite =="
  python -m rstnet_tpu.evalsuite.compute_metrics \
      --ref_dir "$exp_dir/recon/ref" --deg_dir "$exp_dir/recon/deg" \
      --output "$exp_dir/metrics.json"
fi
