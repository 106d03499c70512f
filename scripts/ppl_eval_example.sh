#!/usr/bin/env bash
# Wikitext-2 sliding-window perplexity of a compressed model
# (reference scripts/ppl_eval_example.bash, README.md:89-98;
# ctx 1024 + window 512, stride = window).
set -euo pipefail
BASE=${1:-/models/Llama-2-7b-hf}
DIFF=${2:-out/vicuna-7b/diff.safetensors}

python -m bitdelta_tpu.cli.eval_ppl \
  --base_model "$BASE" \
  --model_diff "$DIFF" \
  --dataset_name wikitext --subset wikitext-2-raw-v1 --split test \
  --num_eval_samples 100 --context_size 1024 --window_size 512
