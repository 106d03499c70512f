"""Perplexity evaluation CLI.

Counterpart of ``python bitdelta/eval_ppl.py`` (reference
bitdelta/eval_ppl.py): load the base model, fuse a delta artifact
densely (so PPL isolates quantization error from kernel numerics,
reference eval_ppl.py:49-51), run the strided-window evaluator on
wikitext-2 (default) and write ``ppl.txt``.

Usage:
  python -m bitdelta_tpu.cli.eval_ppl --base_model <dir> \
      --model_diff out/diff.safetensors [--num_eval_samples 100]
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp

from . import args as A
from ..core.artifact import load_delta
from ..core.compress import fuse_compressed
from ..eval.ppl import eval_ppl, tokenize_corpus
from ..models.hf_import import load_hf_params
from ..utils.tokenizer import get_tokenizer


def main(argv=None):
    p = argparse.ArgumentParser("bitdelta_tpu.eval_ppl")
    A.add_model_args(p)
    A.add_ppl_args(p)
    A.add_mesh_args(p)
    args = p.parse_args(argv)

    cfg, params = load_hf_params(args.base_model,
                                 dtype=jnp.dtype(args.dtype))
    from ..models import resolve_model_module
    model_mod = resolve_model_module(cfg)
    if args.model_diff is not None:
        comp, _, meta = load_delta(args.model_diff, return_meta=True)
        if meta.get("base_quant") is not None:
            # W{8,4}+W1 artifact: fuse against the quantized
            # round-tripped base (what the deltas were taken against).
            from ..research.quantized_base import roundtrip_base

            params = roundtrip_base(params, meta["base_quant"],
                                    jnp.dtype(args.dtype))
        params = fuse_compressed(params, comp)

    tokenizer = get_tokenizer(args.base_model)
    if getattr(args, "text_file", None):
        with open(args.text_file) as f:
            texts = [f.read()]
    else:
        from datasets import load_dataset
        ds = load_dataset(args.dataset_name, args.subset, split=args.split,
                          streaming=True).take(args.num_eval_samples)
        texts = [s["text"] for s in ds]
    token_ids = tokenize_corpus(tokenizer, texts)

    ppl = eval_ppl(cfg, params, token_ids,
                   context_size=args.context_size,
                   window_size=args.window_size, model=model_mod)
    print(f"ppl: {ppl}")
    os.makedirs(args.save_dir, exist_ok=True)
    with open(os.path.join(args.save_dir, "ppl.txt"), "w") as f:
        f.write(str(ppl))


if __name__ == "__main__":
    main()
