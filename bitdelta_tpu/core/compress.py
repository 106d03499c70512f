"""Whole-model compression: fine-tune -> (1-bit deltas + uncompressed extras).

TPU-native counterpart of the reference's ``compress_diff``
(reference bitdelta/diff.py:41-64): every {q,k,v,o,gate,up,down}_proj is
replaced by a 1-bit delta against the base model; embeddings, lm_head and
norms stay uncompressed and carry the *fine-tuned* values (the reference
stores every ``requires_grad`` tensor of the student in the artifact,
diff.py:75-77 — i.e. exactly these).

Because our layers are stacked ``(L, K, N)``, the whole model compresses
in a handful of vectorized quantize calls instead of a per-module Python
walk with GC hygiene (diff.py:53-56) — there is no module tree to walk.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from .delta import BinaryDelta, apply_delta, quantize_delta
from ..models.llama import PROJ_NAMES, Params

# Small per-layer tensors carried uncompressed with fine-tuned values
# (whichever exist in the checkpoint): norms always; q/k/v biases for
# Qwen2-style models.
LAYER_EXTRA_NAMES = ("attn_norm", "mlp_norm", "q_bias", "k_bias", "v_bias")


class CompressedModel(NamedTuple):
    """A fine-tune expressed against a base model.

    deltas: proj name -> BinaryDelta with leaves ``(L, K//32, N)`` packed
      and ``(L,)`` scales. With ``compress_embeddings=True`` the dict
      additionally holds ``"embed"`` (packed along the hidden axis,
      ``(D//32, V)``) and, for untied models, ``"lm_head"``
      (``(D//32, V)``) — 1-bit compression of the token embeddings and
      output head, the reference's stated future work
      (docs/index.html:352-354). Their scales distill like proj scales.
    extras: uncompressed fine-tuned tensors overriding the base params:
      ``final_norm``, per-layer ``attn_norm``/``mlp_norm``, and — unless
      embedding compression is on — ``embed`` / ``lm_head``.
    """

    deltas: Dict[str, BinaryDelta]
    extras: Dict[str, Any]


def compress_model(base_params: Params, finetuned_params: Params, *,
                   compress_embeddings: bool = False,
                   zero_sign: str = "positive") -> CompressedModel:
    """For the W8+W1 recipe (the reference's quantized-base ablation,
    docs/index.html:419-457), round-trip the base through
    ``research.quantized_base.quantize_base_projections`` /
    ``dequantize_base_projections`` BEFORE calling this (cli/train.py
    does) — then deltas, distillation and int8-base serving all see the
    same base weights.

    ``zero_sign="balance"`` decorrelates exact-zero deltas (see
    ``quantize_delta``) — recommended for bf16 fine-tunes that barely
    moved from the base; default keeps reference sign parity."""
    deltas = {
        name: quantize_delta(base_params["layers"][name],
                             finetuned_params["layers"][name],
                             zero_sign=zero_sign)
        for name in PROJ_NAMES
    }
    extras: Dict[str, Any] = {
        "final_norm": finetuned_params["final_norm"],
    }
    for name in LAYER_EXTRA_NAMES:
        if name in finetuned_params["layers"]:
            extras[name] = finetuned_params["layers"][name]
    if compress_embeddings:
        if finetuned_params["embed"].shape != base_params["embed"].shape:
            raise ValueError(
                "compress_embeddings requires the fine-tune to share the "
                f"base vocab/hidden: {finetuned_params['embed'].shape} != "
                f"{base_params['embed'].shape}")
        if ("lm_head" in finetuned_params) != ("lm_head" in base_params):
            raise ValueError("base and fine-tune disagree on tied lm_head")
        # Packed along D (the matmul/unpack axis for both uses): the
        # embed delta is quantized transposed, (V, D) -> (D, V).
        deltas["embed"] = quantize_delta(
            jnp.swapaxes(base_params["embed"], -1, -2),
            jnp.swapaxes(finetuned_params["embed"], -1, -2),
            zero_sign=zero_sign)
        if "lm_head" in finetuned_params:
            deltas["lm_head"] = quantize_delta(base_params["lm_head"],
                                               finetuned_params["lm_head"],
                                               zero_sign=zero_sign)
    else:
        extras["embed"] = finetuned_params["embed"]
        if "lm_head" in finetuned_params:
            extras["lm_head"] = finetuned_params["lm_head"]
    return CompressedModel(deltas=deltas, extras=extras)


def student_params(base_params: Params, compressed: CompressedModel) -> Params:
    """Params for the compressed model's forward: base proj weights (the
    delta rides on top via ``forward(deltas=...)``) with fine-tuned extras
    overlaid."""
    params = dict(base_params)
    params["layers"] = dict(base_params["layers"])
    ex = compressed.extras
    params["final_norm"] = ex["final_norm"]
    for name in LAYER_EXTRA_NAMES:
        if name in ex:
            params["layers"][name] = ex[name]
    if "embed" in ex:
        params["embed"] = ex["embed"]
        if "lm_head" in ex:
            params["lm_head"] = ex["lm_head"]
        elif "lm_head" in params:
            del params["lm_head"]
    # else: embedding compression — base embed/lm_head stay; the deltas
    # dict's "embed"/"lm_head" entries ride on top in the forward.
    return params


def fuse_compressed(base_params: Params, compressed: CompressedModel) -> Params:
    """Dense fusion for evaluation/export: materialize
    ``W_base + scale*sign`` into ordinary params (the reference's
    ``load_diff`` dense path, diff.py:82-106, used by eval_ppl so PPL
    isolates quantization error)."""
    params = student_params(base_params, compressed)
    params["layers"] = dict(params["layers"])
    for name, delta in compressed.deltas.items():
        if name == "embed":
            # Stored packed along D, i.e. against embed.T: fuse transposed.
            fused_t = apply_delta(
                jnp.swapaxes(base_params["embed"], -1, -2), delta)
            params["embed"] = jnp.swapaxes(fused_t, -1, -2)
        elif name == "lm_head":
            params["lm_head"] = apply_delta(base_params["lm_head"], delta)
        else:
            params["layers"][name] = apply_delta(
                base_params["layers"][name], delta)
    return params


def with_scales(compressed: CompressedModel,
                scales: Dict[str, jax.Array]) -> CompressedModel:
    """Rebuild with distilled scales (proj name -> (L,) fp32)."""
    deltas = {name: BinaryDelta(packed=compressed.deltas[name].packed,
                                scale=scales[name])
              for name in compressed.deltas}
    return CompressedModel(deltas=deltas, extras=compressed.extras)


def get_scales(compressed: CompressedModel) -> Dict[str, jax.Array]:
    return {name: d.scale for name, d in compressed.deltas.items()}


def compressed_nbytes(compressed: CompressedModel) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree.leaves(compressed))


def delta_compression_stats(base_params: Params,
                            compressed: CompressedModel) -> Dict[str, float]:
    """Reproduce the reference's headline compression accounting
    (docs/index.html:356-359): dense fine-tune bytes vs delta artifact
    bytes (packed signs + scales + uncompressed extras)."""
    dense = sum(x.size * 2 for x in jax.tree.leaves(base_params))  # bf16
    packed = sum(d.packed.size * 4 + d.scale.size * 4
                 for d in compressed.deltas.values())
    extras = sum(x.size * x.dtype.itemsize
                 for x in jax.tree.leaves(compressed.extras))
    return {
        "dense_bytes": float(dense),
        "delta_bytes": float(packed + extras),
        "packed_bytes": float(packed),
        "extras_bytes": float(extras),
        "ratio": dense / (packed + extras),
    }
