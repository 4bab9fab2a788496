#!/usr/bin/env bash
# In-the-wild broadcast/podcast data preparation
# (parity: MLLM_v2/egs/pretraining/prepare_broadcast_data.sh).
# Long-form recordings -> standardized 24 kHz segments with aligned text:
#   1) collect recordings into a wav.scp
#   2) standardize + source-separate + VAD segment + ASR + DNSMOS filter
#      (config-driven pipeline; external adapters skip gracefully)
#   3) split N ways and tokenize in parallel (audio codes + text)
#   4) word-level interleaved data manifests
set -euo pipefail

stage=${stage:-1}
stop_stage=${stop_stage:-4}
nj=${nj:-8}
data_root=${data_root:-data/broadcast}
raw_dir=${raw_dir:-}                 # directory of recordings
tokenizer_dir=${tokenizer_dir:-}     # HF tokenizer dir for the text stream
mimi_ckpt=${mimi_ckpt:-}
dnsmos_threshold=${dnsmos_threshold:-3.0}

mkdir -p "$data_root"

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "== stage 1: collect recordings into wav.scp =="
  test -n "$raw_dir" || { echo "set raw_dir="; exit 1; }
  python -m rstnet_tpu.tools.scp_tools from-dir "$raw_dir" "$data_root/raw_wav.scp"
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "== stage 2: standardize + separate + VAD + ASR + quality filter =="
  cat > "$data_root/pipeline.json" <<EOF
{
  "use_separation": true,
  "use_asr": true,
  "use_dnsmos_filter": true,
  "dnsmos_threshold": $dnsmos_threshold,
  "vad": {"engine": "silero", "min_speech_s": 1.0, "min_gap_s": 0.4}
}
EOF
  python -m rstnet_tpu.pipeline.main \
      --scp "$data_root/raw_wav.scp" --out_dir "$data_root/segments" \
      --config "$data_root/pipeline.json"
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "== stage 3: split + parallel tokenization (codes + text) =="
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

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "== stage 4: word-level interleaved manifests =="
  mkdir -p "$data_root/jsons"
  for f in "$data_root"/tokens/audio.*.npz; do
    job=$(basename "$f" .npz | cut -d. -f2)
    task=audio_only
    text_arg=""
    if [ -f "$data_root/tokens/text.npz" ]; then
      task=word_level_audio_text_interleaved
      text_arg="--text_seq $data_root/tokens/text.npz"
    fi
    python -m rstnet_tpu.tools.create_data_json \
        --task "$task" --audio_seq "$f" $text_arg \
        --output "$data_root/jsons/broadcast_$job.json"
  done
fi

echo "broadcast data ready under $data_root/jsons/"
