"""Shared CLI flags.

Counterpart of the reference's single argparse namespace
(reference bitdelta/utils.py:7-78) minus the per-GPU device-placement
flags (``--*_device``, ``--*_memory_map``) — placement is a mesh shape
here (``--mesh dp,tp``), not a device map.
"""

from __future__ import annotations

import argparse


def add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--base_model", type=str, required=True,
                   help="local HF checkpoint dir of the base model")
    p.add_argument("--finetuned_model", type=str, default=None,
                   help="local HF checkpoint dir of the fine-tune")


def add_train_args(p: argparse.ArgumentParser):
    # Defaults follow the reference (utils.py:17-24).
    p.add_argument("--dataset_name", type=str, default="c4")
    p.add_argument("--subset", type=str, default="en")
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--text_file", type=str, default=None,
                   help="offline calibration text file")
    p.add_argument("--lr", type=float, default=1e-4,
                   help="scale-distillation AdamW lr (reference recipe "
                        "1e-4). If the imported checkpoint's scales are "
                        "suspected miscalibrated, 3e-4 recovers ~2x "
                        "faster; past 3e-4 batch noise dominates — add "
                        "steps/batch instead (BENCHNOTES lr sweep)")
    p.add_argument("--num_steps", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_length", type=int, default=128)
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--save_full_model", action="store_true")
    p.add_argument("--compress_embeddings", action="store_true",
                   help="also 1-bit-compress embeddings and lm_head "
                        "against the base (requires matching vocab; "
                        "beyond-reference — its stated future work)")
    p.add_argument("--zero_sign", type=str, default="positive",
                   choices=("positive", "balance"),
                   help="sign bit for exact-zero deltas: 'positive' = "
                        "reference parity (all +1); 'balance' = "
                        "checkerboard +-1, removes the coherent "
                        "+scale*n_zeros column bias on bf16 fine-tunes "
                        "that barely moved from the base")
    p.add_argument("--quantize_base", type=str, default=None,
                   choices=("int8", "int4"),
                   help="W8+W1 / W4+W1: quantize the base projections "
                        "(int8 per-column RTN, or int4 grouped RTN — the "
                        "reference's GPTQ+delta ablation row); deltas are "
                        "taken against the dequantized base and serving "
                        "streams the quantized base (int8: half traffic; "
                        "int4: quarter footprint, the density mode)")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax profiler trace of the distillation "
                        "loop into this dir (view with xprof/TensorBoard)")
    p.add_argument("--checkpoint_every", type=int, default=0,
                   help="save distillation state (scales + optimizer) to "
                        "save_dir/distill_ckpt.npz every N steps and "
                        "auto-resume from it (0 = off)")


def add_ppl_args(p: argparse.ArgumentParser):
    # Reference eval protocol (utils.py:41-44, README.md:89-98).
    p.add_argument("--dataset_name", type=str, default="wikitext")
    p.add_argument("--subset", type=str, default="wikitext-2-raw-v1")
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--num_eval_samples", type=int, default=100)
    p.add_argument("--context_size", type=int, default=1024)
    p.add_argument("--window_size", type=int, default=512)
    p.add_argument("--model_diff", type=str, default=None,
                   help="delta artifact (.safetensors); omit = eval base")
    p.add_argument("--text_file", type=str, default=None,
                   help="offline corpus file instead of an HF dataset")
    p.add_argument("--save_dir", type=str, default=".")


def add_mesh_args(p: argparse.ArgumentParser):
    p.add_argument("--mesh", type=str, default=None,
                   help="'dp,tp' mesh shape (default: 1 x all devices)")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--kernel", type=str, default="auto",
                   choices=("auto", "pallas", "xla"),
                   help="delta matmul lowering (auto: pallas on TPU)")


def parse_mesh(spec):
    if spec is None:
        return None
    dp, tp = (int(x) for x in spec.split(","))
    return (dp, tp)
