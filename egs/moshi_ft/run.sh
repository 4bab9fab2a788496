#!/usr/bin/env bash
# Moshi fine-tuning recipe (parity: MLLM/egs/moshi_ft/run.sh:52-280):
# conversational corpus -> VAD -> ASR -> enhance -> Mimi tokens -> 17-stream
# grids -> fine-tune the Moshi LM.
set -euo pipefail

stage=${stage:-1}
stop_stage=${stop_stage:-3}
data_root=${data_root:-data/moshi_ft}
exp_dir=${exp_dir:-exp/moshi_ft}
raw_scp=${raw_scp:-$data_root/raw_wav.scp}
mimi_ckpt=${mimi_ckpt:-}
# text tokenizer checkpoint dir (HF tokenizer.json or sentencepiece); when
# set, stage 1 runs whisperX ASR and stage 2 renders word-aligned text into
# row 0 of the duplex grids (reference run.sh:138-147 ASR + utt2json stage)
text_tokenizer=${text_tokenizer:-}
# utt2json scp '<utt>_chN <whisperx.json>' for Fisher-style stereo corpora
# with precomputed alignments
text_scp=${text_scp:-}
nj=${nj:-8}

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "== stage 1: diarization + VAD + enhancement + segmentation =="
  mkdir -p "$data_root"
  # conversational prep: speaker turns (pyannote when installed), denoise
  # (DeepFilterNet when installed), super-resolution to 24 kHz, and duplex
  # session packing for the 17-stream format
  cat > "$data_root/pipeline.json" <<EOF
{
  "use_diarization": true,
  "use_denoise": true,
  "use_super_resolution": true,
  "use_asr": $([ -n "$text_tokenizer" ] && echo true || echo false),
  "merge_sessions": true,
  "session_chunk_s": 60.0
}
EOF
  python -m rstnet_tpu.pipeline.main --scp "$raw_scp" \
      --out_dir "$data_root/segments" --config "$data_root/pipeline.json"
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "== stage 2: duplex Mimi tokenization (17-stream grids) =="
  if [ -f "$data_root/segments/sessions.json" ]; then
    # speaker-labeled sessions from the pipeline: render user/assistant
    # channels by speaker and stack both codebook sets + the text row
    python -m rstnet_tpu.tools.offline_tokenization \
        --sessions "$data_root/segments/sessions.json" \
        --output "$data_root/tokens/audio.1.npz" \
        --mode duplex ${mimi_ckpt:+--mimi-checkpoint "$mimi_ckpt"} \
        ${text_tokenizer:+--tokenizer-dir "$text_tokenizer"}
  else
    # Fisher-style stereo recordings: one conversation side per channel
    python -m rstnet_tpu.tools.scp_tools split "$data_root/segments/wav.scp" "$nj" \
        "$data_root/split/wav.JOB.scp"
    python -m rstnet_tpu.tools.run_jobs --jobs "$nj" --log "$data_root/log/tok.JOB.log" -- \
        python -m rstnet_tpu.tools.offline_tokenization \
          --scp "$data_root/split/wav.JOB.scp" \
          --output "$data_root/tokens/audio.JOB.npz" \
          --mode duplex ${mimi_ckpt:+--mimi-checkpoint "$mimi_ckpt"} \
          ${text_tokenizer:+--tokenizer-dir "$text_tokenizer"} \
          ${text_scp:+--text-scp "$text_scp"}
  fi
  for f in "$data_root"/tokens/audio.*.npz; do
    job=$(basename "$f" .npz | cut -d. -f2)
    python -m rstnet_tpu.tools.create_data_json --task moshi_ft \
        --audio_seq "$f" --output "$data_root/jsons/moshi_$job.json"
  done
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "== stage 3: fine-tune (17 parallel streams) =="
  python -m rstnet_tpu.training.trainer \
      --train_data_jsons "$data_root/jsons/*.json" \
      --valid_data_jsons "$data_root/jsons/moshi_1.json" \
      --model_config configs/llama_1b_speech.yaml \
      --parallel_number 17 --n_q 16 \
      --exp_dir "$exp_dir" "$@"
fi
