#!/usr/bin/env bash
# Multi-tenant serving: one base + N 1-bit deltas, streaming HTTP API
# (reference demo/demo_backend.py; ours adds continuous batching and
# per-slot sampling). Browser UI at http://localhost:8000/ .
set -euo pipefail
BASE=${1:-/models/Mistral-7B-v0.1}
shift || true

python -m bitdelta_tpu.cli.serve \
  --base_model "$BASE" \
  --delta zephyr=out/zephyr/diff.safetensors \
  --delta instruct=out/instruct/diff.safetensors \
  --max_slots 8 --port 8000 "$@"
