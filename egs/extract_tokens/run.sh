#!/usr/bin/env bash
# Generic token extraction recipe (parity: MLLM_v2/egs/extract_tokens):
# wav.scp (or a directory) -> split -> parallel tokenization -> shards,
# plus the official SSL resynthesis stage (tokens -> 22.05 kHz wavs through
# the in-repo flow+HiFT decoder; reference GLM4V/semantic.py:143-151).
set -euo pipefail

nj=${nj:-8}
wav_dir=${wav_dir:-}
wav_scp=${wav_scp:-data/extract/wav.scp}
out_dir=${out_dir:-data/extract}
mimi_ckpt=${mimi_ckpt:-}
mode=${mode:-audio}                 # audio | ssl | text | aligned_text
tokenizer_dir=${tokenizer_dir:-}
ssl_ckpt=${ssl_ckpt:-}              # GLM-4-Voice tokenizer dir (mode=ssl)
decoder_ckpt=${decoder_ckpt:-}      # glm-4-voice-decoder dir: enables the
                                    # resynthesis stage (mode=ssl only)
resynth_stream=${resynth_stream:-true}   # block-streaming synthesis

mkdir -p "$out_dir"

if [ -n "$wav_dir" ]; then
  python -m rstnet_tpu.tools.scp_tools from-dir "$wav_dir" "$wav_scp"
fi

python -m rstnet_tpu.tools.scp_tools split "$wav_scp" "$nj" "$out_dir/split/scp.JOB"
python -m rstnet_tpu.tools.run_jobs --jobs "$nj" --log "$out_dir/log/tok.JOB.log" -- \
    python -m rstnet_tpu.tools.offline_tokenization \
      --scp "$out_dir/split/scp.JOB" \
      --output "$out_dir/tokens/tok.JOB.npz" \
      --mode "$mode" \
      ${mimi_ckpt:+--mimi-checkpoint "$mimi_ckpt"} \
      ${ssl_ckpt:+--ssl-checkpoint "$ssl_ckpt"} \
      ${tokenizer_dir:+--tokenizer-dir "$tokenizer_dir"}
echo "tokens written to $out_dir/tokens/"

# Stage 2 (mode=ssl): resynthesize each token shard back to audio — the
# recipe-level round trip that validates the extracted semantic tokens
# against the decoder checkpoint they will be consumed with.
if [ "$mode" = "ssl" ] && [ -n "$decoder_ckpt" ]; then
  stream_flag=""
  [ "$resynth_stream" = "true" ] && stream_flag="--stream"
  python -m rstnet_tpu.tools.run_jobs --jobs "$nj" --log "$out_dir/log/resynth.JOB.log" -- \
      python -m rstnet_tpu.tools.ssl_resynth \
        --tokens "$out_dir/tokens/tok.JOB.npz" \
        --decoder-checkpoint "$decoder_ckpt" \
        --out_dir "$out_dir/resynth" \
        $stream_flag
  echo "resynthesized wavs written to $out_dir/resynth/"
fi
