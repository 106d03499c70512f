#!/usr/bin/env bash
# 70B-class compression with tensor-parallel sharding over a pod slice.
# Replaces the reference's CPU-base + 8-GPU accelerate layer-sharding
# recipe (reference scripts/multigpu_train_example.bash: 800 steps,
# batch 1) with a (data=1, model=8) GSPMD mesh: teacher, student, and
# packed deltas all shard over the model axis in one jit — no host-side
# activation hops.
set -euo pipefail
BASE=${1:-/models/Llama-2-70b-hf}
FINE=${2:-/models/Llama-2-70b-chat-hf}
OUT=${3:-out/llama70b-chat}

python -m bitdelta_tpu.cli.train \
  --base_model "$BASE" \
  --finetuned_model "$FINE" \
  --save_dir "$OUT" \
  --mesh 1,8 \
  --num_steps 800 --batch_size 1 --max_length 128 --lr 1e-4
