#!/usr/bin/env bash
# 7B-class compression + scale distillation on one TPU chip.
# TPU-native counterpart of reference scripts/train_example.bash
# (200 steps x batch 4 x len 128, lr 1e-4; reference README.md:70-78).
set -euo pipefail
BASE=${1:-/models/Llama-2-7b-hf}
FINE=${2:-/models/vicuna-7b-v1.5}
OUT=${3:-out/vicuna-7b}

python -m bitdelta_tpu.cli.train \
  --base_model "$BASE" \
  --finetuned_model "$FINE" \
  --save_dir "$OUT" \
  --num_steps 200 --batch_size 4 --max_length 128 --lr 1e-4
