#!/usr/bin/env bash
# Pretraining recipe (parity: MLLM_v2/egs/pretraining/run.sh:40-161).
# Stages: 1) raw audio -> segments (pipeline)  2) split + parallel tokenization
#         3) data manifests  4) training  5) teacher-forced evaluation
set -euo pipefail

stage=${stage:-1}
stop_stage=${stop_stage:-5}
nj=${nj:-8}                      # parallel tokenization jobs (48 at scale)
data_root=${data_root:-data/pretraining}
exp_dir=${exp_dir:-exp/pretraining}
raw_scp=${raw_scp:-$data_root/raw_wav.scp}
tokenizer_dir=${tokenizer_dir:-}          # HF tokenizer dir (llama3 etc.)
mimi_ckpt=${mimi_ckpt:-}                  # Mimi safetensors (optional)
model_config=${model_config:-configs/llama_1b_speech.yaml}
batch_scale=${batch_scale:-2500}
n_epoch=${n_epoch:-10}

mkdir -p "$data_root" "$exp_dir"

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "== stage 1: segment + standardize raw audio =="
  python -m rstnet_tpu.pipeline.main --scp "$raw_scp" --out_dir "$data_root/segments"
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "== stage 2: split scp + parallel Mimi tokenization =="
  python -m rstnet_tpu.tools.scp_tools split "$data_root/segments/wav.scp" "$nj" \
      "$data_root/split/wav.JOB.scp"
  python -m rstnet_tpu.tools.run_jobs --jobs "$nj" --log "$data_root/log/tok.JOB.log" -- \
      python -m rstnet_tpu.tools.offline_tokenization \
        --scp "$data_root/split/wav.JOB.scp" \
        --output "$data_root/tokens/audio.JOB.npz" \
        --mode audio ${mimi_ckpt:+--mimi-checkpoint "$mimi_ckpt"}
  if [ -n "$tokenizer_dir" ] && [ -f "$data_root/segments/text.scp" ]; then
    python -m rstnet_tpu.tools.offline_tokenization \
        --scp "$data_root/segments/text.scp" \
        --output "$data_root/tokens/text.npz" \
        --mode text --tokenizer-dir "$tokenizer_dir"
  fi
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "== stage 3: data manifests =="
  mkdir -p "$data_root/jsons"
  for f in "$data_root"/tokens/audio.*.npz; do
    job=$(basename "$f" .npz | cut -d. -f2)
    python -m rstnet_tpu.tools.create_data_json --task audio_only \
        --audio_seq "$f" --output "$data_root/jsons/audio_$job.json"
  done
  if [ -f "$data_root/tokens/text.npz" ]; then
    python -m rstnet_tpu.tools.create_data_json --task text_only \
        --text_seq "$data_root/tokens/text.npz" \
        --output "$data_root/jsons/text.json"
  fi
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "== stage 4: training (one process per host; mesh via --dp/--fsdp/--tensor) =="
  python -m rstnet_tpu.training.trainer \
      --train_data_jsons "$data_root/jsons/*.json" \
      --valid_data_jsons "$data_root/jsons/audio_1.json" \
      --model_config "$model_config" \
      --exp_dir "$exp_dir" \
      --batch_scale "$batch_scale" \
      --n_epoch "$n_epoch" "$@"
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ]; then
  echo "== stage 5: teacher-forced perplexity =="
  python -m rstnet_tpu.evalsuite.lm_eval \
      --checkpoint_dir "$exp_dir" \
      --data_jsons "$data_root/jsons/audio_1.json" \
      --output "$exp_dir/ppl.json"
fi
