"""Delta-fidelity research variants.

JAX counterparts of the reference's experimental compressors:

  * :class:`LoRADelta` — low-rank SVD delta baseline (reference
    bitdelta/misc.py:128-138 ``LoRADiff`` with rank-16
    ``torch.svd_lowrank``; fusion path diff.py:99-104, full experiment in
    notebooks/compression_lora.ipynb).
  * :class:`TernaryDelta` — quantile-thresholded {-1, 0, +1} delta with a
    trainable scale, and the ``binary_median`` variant using the median
    rather than the mean (reference notebooks/compression_ternary.ipynb;
    docs/index.html:459-476 "varying the fidelity of the delta").

  * :class:`ColumnScaleDelta` — 1-bit signs with per-output-column
    scales (scale-resolution ablation; beyond-reference, see class doc).

Each variant provides quantize / dequantize / apply so it can slot into
the same evaluation harness as the 1-bit delta, and
:func:`fuse_variant_model` runs the whole-model ablation in one call.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LoRADelta(NamedTuple):
    """Rank-r factorization of the delta: ``delta ~ A @ B``.
    A: ``(K, r)``, B: ``(r, N)``."""

    a: jax.Array
    b: jax.Array


def quantize_lora(base: jax.Array, finetune: jax.Array,
                  rank: int = 16) -> LoRADelta:
    diff = (finetune.astype(jnp.float32) - base.astype(jnp.float32))
    # Full SVD truncated to rank (jnp has no randomized svd_lowrank; the
    # exact truncation is a strictly better baseline).
    u, s, vt = jnp.linalg.svd(diff, full_matrices=False)
    r = min(rank, s.shape[0])
    a = u[:, :r] * s[:r][None, :]
    return LoRADelta(a=a, b=vt[:r, :])


def dequantize_lora(delta: LoRADelta, dtype=jnp.float32) -> jax.Array:
    return jnp.matmul(delta.a, delta.b,
                      preferred_element_type=jnp.float32).astype(dtype)


def apply_lora(base: jax.Array, delta: LoRADelta) -> jax.Array:
    return (base.astype(jnp.float32)
            + dequantize_lora(delta)).astype(base.dtype)


def lora_nbytes(delta: LoRADelta) -> int:
    return (delta.a.size + delta.b.size) * delta.a.dtype.itemsize


class TernaryDelta(NamedTuple):
    """{-1, 0, +1} delta: two packed sign planes + fp32 scale.

    plus / minus are int32-packed boolean masks (ops/packing layout):
    value = scale * (plus - minus).
    """

    plus: jax.Array
    minus: jax.Array
    scale: jax.Array


def quantize_ternary(base: jax.Array, finetune: jax.Array,
                     fraction: float = 0.5,
                     binary_median: bool = False) -> TernaryDelta:
    """Keep the largest-|delta| ``fraction`` of entries as +/-1, zero the
    rest; scale = mean |delta| over kept entries.

    ``binary_median=True`` reproduces the notebook's binary-with-median
    variant: threshold at |delta|'s median (fraction=0.5) but assign
    sign to every entry (no zeros).
    """
    from ..ops.packing import pack_signs

    diff = finetune.astype(jnp.float32) - base.astype(jnp.float32)
    mag = jnp.abs(diff)
    if binary_median:
        scale = jnp.median(mag)
        plus = diff >= 0
        minus = diff < 0
    else:
        thresh = jnp.quantile(mag, 1.0 - fraction)
        keep = mag >= thresh
        scale = jnp.sum(mag * keep) / jnp.maximum(jnp.sum(keep), 1)
        plus = keep & (diff >= 0)
        minus = keep & (diff < 0)
    return TernaryDelta(plus=pack_signs(plus), minus=pack_signs(minus),
                        scale=scale.astype(jnp.float32))


def dequantize_ternary(delta: TernaryDelta, dtype=jnp.float32) -> jax.Array:
    from ..ops.packing import unpack_signs

    plus = unpack_signs(delta.plus).astype(jnp.float32)
    minus = unpack_signs(delta.minus).astype(jnp.float32)
    return (delta.scale * (plus - minus)).astype(dtype)


def apply_ternary(base: jax.Array, delta: TernaryDelta) -> jax.Array:
    return (base.astype(jnp.float32)
            + dequantize_ternary(delta)).astype(base.dtype)


class ColumnScaleDelta(NamedTuple):
    """1-bit signs + per-OUTPUT-COLUMN fp32 scales.

    packed: int32 ``(*, K//32, N)`` sign bits (ops/packing layout, same
    as :class:`~bitdelta_tpu.core.delta.BinaryDelta`).
    scale:  fp32 ``(*, N)`` — one scale per output column.

    The reference quantizes each matrix with ONE trainable coeff
    (diff.py:11-18) and its fidelity ablations vary the *sign* plane
    (ternary/median, docs/index.html:459-476); this variant varies the
    *scale* resolution instead. Per column, ``mean_k |diff[:, n]|`` is
    the exact L2-optimal 1-bit scale, so reconstruction error is
    column-wise minimal and never worse than the global coeff. Cost:
    ``N`` floats per matrix (~0.1% of the packed plane at K=4096) and
    ZERO extra decode work on TPU — the binary kernels run scale-free
    and the ``(N,)`` multiply fuses into the matmul epilogue (XLA fuses
    elementwise-on-output into the surrounding op; no new kernel).
    """

    packed: jax.Array
    scale: jax.Array


def quantize_column(base: jax.Array, finetune: jax.Array, *,
                    zero_sign: str = "positive") -> ColumnScaleDelta:
    """Per-column L2-optimal 1-bit quantization of ``finetune - base``.

    The fp32 diff is materialized ONCE and feeds both the column scales
    and the sign packing (going through quantize_delta would stage a
    second full-size diff plus a thrown-away global scale)."""
    from ..core.delta import delta_signs
    from ..ops.packing import pack_signs

    diff = finetune.astype(jnp.float32) - base.astype(jnp.float32)
    scale = jnp.mean(jnp.abs(diff), axis=-2)  # (*, N)
    return ColumnScaleDelta(packed=pack_signs(delta_signs(diff, zero_sign)),
                            scale=scale)


def dequantize_column(delta: ColumnScaleDelta,
                      dtype=jnp.float32) -> jax.Array:
    from ..ops.packing import unpack_to_pm1

    pm1 = unpack_to_pm1(delta.packed, jnp.float32)
    return (delta.scale[..., None, :] * pm1).astype(dtype)


def apply_column(base: jax.Array, delta: ColumnScaleDelta) -> jax.Array:
    return (base.astype(jnp.float32)
            + dequantize_column(delta)).astype(base.dtype)


def column_delta_linear(x: jax.Array, base_w: jax.Array,
                        delta: ColumnScaleDelta, *,
                        compute_dtype=jnp.bfloat16) -> jax.Array:
    """``x @ W_base + (x @ sign) * scale[None, :]`` — the per-column
    scale rides on the matmul output, so the sign matmul itself is the
    same op the plain 1-bit path uses (kernel-compatible)."""
    from ..ops.binary_matmul import binary_matmul

    y_base = jnp.matmul(x.astype(compute_dtype),
                        base_w.astype(compute_dtype),
                        preferred_element_type=jnp.float32)
    y_sign = binary_matmul(x, delta.packed, 1.0,
                           compute_dtype=compute_dtype).astype(jnp.float32)
    y = y_base + y_sign * delta.scale[..., None, :]
    return y.astype(x.dtype)


def fuse_variant_model(base_params, finetuned_params, kind: str, **kw):
    """Whole-model delta-fidelity ablation: compress every projection
    with the chosen variant and return DENSE fused params for the PPL
    evaluator — the reference's ablation workflow (its ternary/median/
    LoRA comparisons all evaluate through ``load_diff``-style dense
    fusion in notebooks/compression_{ternary,lora}.ipynb) as one call.

    kind: ``"binary"`` (the production 1-bit path, via core.compress),
    ``"binary_median"`` (takes no extra kwargs), ``"ternary"``
    (``fraction=``), ``"lora"`` (``rank=``), or ``"column"``
    (per-output-column scales). Embeddings/norms/head carry fine-tuned
    values, matching ``compress_model`` extras semantics.

    Works on both param layouts: llama-family (PROJ_NAMES, stacked
    ``(L, K, N)``) and Mixtral (attention projections + expert stacks
    ``(L, E, K, N)`` + router — detected by the ``w1`` layer key);
    variants quantize per matrix over all leading stack axes.
    """
    from ..core.compress import compress_model, fuse_compressed
    from ..models.llama import PROJ_NAMES

    moe = "w1" in base_params["layers"]
    if kind == "binary":
        if moe:
            from ..models.mixtral import compress_mixtral

            comp = compress_mixtral(base_params, finetuned_params, **kw)
            params = dict(finetuned_params)
            params["layers"] = dict(finetuned_params["layers"])
            from ..core.delta import apply_delta

            for name, d in comp.deltas.items():
                if name == "embed":  # packed along D (compress_embeddings)
                    emb = apply_delta(
                        jnp.swapaxes(base_params["embed"], -1, -2), d)
                    params["embed"] = jnp.swapaxes(emb, -1, -2)
                elif name == "lm_head":
                    params["lm_head"] = apply_delta(
                        base_params["lm_head"], d)
                else:
                    params["layers"][name] = apply_delta(
                        base_params["layers"][name], d)
            return params
        return fuse_compressed(
            base_params, compress_model(base_params, finetuned_params, **kw))

    quantize_apply = {
        "binary_median": (lambda b, f: quantize_ternary(
            b, f, binary_median=True), apply_ternary),
        "ternary": (lambda b, f: quantize_ternary(b, f, **kw),
                    apply_ternary),
        "lora": (lambda b, f: quantize_lora(b, f, **kw), apply_lora),
        "column": (lambda b, f: quantize_column(b, f, **kw), apply_column),
    }
    if kind not in quantize_apply:
        raise ValueError(f"unknown variant kind: {kind!r}")
    if kind == "binary_median" and kw:
        # A silently-dropped kwarg in an ablation tool produces wrong
        # comparisons; binary_median is parameterless by construction.
        raise TypeError(f"binary_median takes no extra kwargs, got "
                        f"{sorted(kw)}")
    quantize, apply_ = quantize_apply[kind]

    def per_matrix(b, f):
        """Quantize+apply per 2-D matrix over any leading stack axes
        (llama (L, K, N); Mixtral experts (L, E, K, N); router (L, D, E))."""
        lead = b.shape[:-2]
        if not lead:
            return apply_(b, quantize(b, f))
        bf = b.reshape((-1,) + b.shape[-2:])
        ff = f.reshape((-1,) + f.shape[-2:])
        fused = jnp.stack([apply_(bf[i], quantize(bf[i], ff[i]))
                           for i in range(bf.shape[0])])
        return fused.reshape(b.shape)

    if moe:
        from ..models.mixtral import MOE_PARTS as names
    else:
        names = PROJ_NAMES
    params = dict(finetuned_params)
    params["layers"] = dict(finetuned_params["layers"])
    for name in names:
        params["layers"][name] = per_matrix(base_params["layers"][name],
                                            finetuned_params["layers"][name])
    return params
