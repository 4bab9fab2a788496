#!/usr/bin/env bash
# Generic token extraction recipe (parity: MLLM_v2/egs/extract_tokens):
# wav.scp (or a directory) -> split -> parallel Mimi tokenization -> shards.
set -euo pipefail

nj=${nj:-8}
wav_dir=${wav_dir:-}
wav_scp=${wav_scp:-data/extract/wav.scp}
out_dir=${out_dir:-data/extract}
mimi_ckpt=${mimi_ckpt:-}
mode=${mode:-audio}                 # audio | text | aligned_text
tokenizer_dir=${tokenizer_dir:-}

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
      ${tokenizer_dir:+--tokenizer-dir "$tokenizer_dir"}
echo "tokens written to $out_dir/tokens/"
