#!/usr/bin/env bash
# Batch generation / evaluation after pretraining
# (parity: MLLM_v2/egs/pretraining/infer.sh).
set -euo pipefail

exp_dir=${exp_dir:-exp/pretraining}
data_root=${data_root:-data/pretraining}
task=${task:-continuation}      # continuation | tts | asr
mimi_ckpt=${mimi_ckpt:-}

python -m rstnet_tpu.inference.infer_cli \
    --exp_dir "$exp_dir" \
    --data_jsons "$data_root/jsons/audio_1.json" \
    --output_dir "$exp_dir/generations" \
    --task "$task" \
    ${mimi_ckpt:+--mimi_checkpoint "$mimi_ckpt"} "$@"
