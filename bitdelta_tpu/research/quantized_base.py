"""1-bit delta on top of a quantized base model (W8 base + W1 delta).

Counterpart of the reference's quantized-base support (reference
bitdelta/misc.py:70-126 ``dequantize_model`` — it dequantizes
bitsandbytes-int8 / GPTQ-int4 bases back to fp16 so BitDelta can ride on
top; docs/index.html:419-457 reports the "GPTQ + delta" ablation).

TPU-native version: instead of depending on CUDA quant libraries, we
provide symmetric per-channel int8 quantization of the base weights
(RTN, the reference table's "INT8 RTN" row) and a fused
dequantize-matmul forward. The 1-bit delta then applies to the
*quantized-dequantized* base, exactly as the ablation prescribes:
``W ~ deq(q(W_base)) + alpha * sign(W_fine - deq(q(W_base)))``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Int8Weight(NamedTuple):
    """Symmetric per-output-channel int8: ``W ~ q * scale[None, :]``."""

    q: jax.Array       # (K, N) int8
    scale: jax.Array   # (N,) fp32


def quantize_int8(w: jax.Array) -> Int8Weight:
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2)          # per output column
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / scale[..., None, :]), -127, 127)
    return Int8Weight(q=q.astype(jnp.int8), scale=scale)


def dequantize_int8(w: Int8Weight, dtype=jnp.float32) -> jax.Array:
    return (w.q.astype(jnp.float32) * w.scale[..., None, :]).astype(dtype)


def int8_matmul(x: jax.Array, w: Int8Weight,
                compute_dtype=jnp.bfloat16) -> jax.Array:
    """``x @ deq(w)`` with the dequant fused into the matmul epilogue:
    contract against int8 (cast to compute dtype lane-wise) then apply
    the per-column scale to the f32 accumulator."""
    y = jnp.matmul(x.astype(compute_dtype),
                   w.q.astype(compute_dtype),
                   preferred_element_type=jnp.float32)
    return (y * w.scale[..., None, :]).astype(x.dtype)


def quantize_base_projections(params):
    """W8 serving mode: convert every compressed projection of a params
    pytree to :class:`Int8Weight` (per-output-channel symmetric RTN;
    works on the layer-stacked ``(L, K, N)`` matrices). Embeddings,
    lm_head and norms stay in their original dtype. The model's
    ``_base_matmul`` dispatches on the leaf type, so the result drops
    into forward/decode/serving unchanged — at half the base HBM
    footprint and traffic."""
    from ..models.llama import PROJ_NAMES

    out = dict(params)
    out["layers"] = dict(params["layers"])
    for name in PROJ_NAMES:
        out["layers"][name] = quantize_int8(params["layers"][name])
    return out


def quantize_mixtral_base_projections(params, include_router=False):
    """W8 serving mode for Mixtral: attention projections AND the
    expert stacks ``w1/w3/w2 (L, E, K, N)`` become :class:`Int8Weight`
    (quantize_int8 is rank-agnostic: per-output-column scales come out
    ``(L, E, N)``). The router stays dense by default — it is tiny
    (D x E) and its logits gate the whole MoE block. Halves the expert
    HBM footprint/traffic, which dominates Mixtral decode once deltas
    are routed (BENCHNOTES)."""
    from ..models.mixtral import ATTN_PROJS, EXPERT_MATS

    names = ATTN_PROJS + EXPERT_MATS + (("router",) if include_router
                                        else ())
    out = dict(params)
    out["layers"] = dict(params["layers"])
    for name in names:
        out["layers"][name] = quantize_int8(params["layers"][name])
    return out


def dequantize_base_projections(params, dtype=None):
    """Inverse of the ``quantize_base_projections*`` functions
    (materializes the rounded dense weights — what deltas must be taken
    against)."""
    out = dict(params)
    out["layers"] = dict(params["layers"])
    for name, w in params["layers"].items():
        if isinstance(w, Int8Weight):
            out["layers"][name] = dequantize_int8(w, dtype or jnp.bfloat16)
        elif isinstance(w, Int4Weight):
            out["layers"][name] = dequantize_int4(w, dtype or jnp.bfloat16)
    return out


# ---------------------------------------------------------------------------
# W4 base (grouped int4 RTN) — the reference's GPTQ+delta ablation row
# (reference bitdelta/misc.py:70-105 dequantizes an exllama int4 base;
# docs/index.html:419-457 reports "GPTQ 58.67 -> GPTQ+delta 59.22").
# TPU-native counterpart: symmetric per-(K-group, column) int4 RTN, 8
# nibbles packed per int32 word along K (same K-major LSB-first
# convention as the sign packing, so K-sharding stays contiguous).
# This is also the density lever: a 7B base in ~3.5 GB leaves room for
# ~10 1-bit tenants on one 16 GB v5e.
# ---------------------------------------------------------------------------

INT4_GROUP = 128  # K rows per quantization group


class Int4Weight(NamedTuple):
    """Grouped symmetric int4: ``W ~ nib * scale[k // GROUP, :]``.

    packed: ``(*, K//8, N)`` int32 — 8 two's-complement nibbles along K,
      LSB-first (nibble ``s`` of word ``k8`` is row ``8*k8 + s``).
    scale: ``(*, K//INT4_GROUP, N)`` fp32 per-group per-column.
    """

    packed: jax.Array
    scale: jax.Array


def _pack_nibbles(q: jax.Array) -> jax.Array:
    """(*, K, N) int32 in [-7, 7] -> (*, K//8, N) int32, LSB-first."""
    *lead, k, n = q.shape
    u = (q & 0xF).astype(jnp.uint32).reshape(*lead, k // 8, 8, n)
    shifts = jnp.arange(8, dtype=jnp.uint32) * 4
    words = jnp.sum(u << shifts[:, None], axis=-2, dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(words, jnp.int32)


def _unpack_nibbles(packed: jax.Array) -> jax.Array:
    """(*, K//8, N) int32 -> (*, K, N) int32 in [-8, 7] (sign-extended)."""
    *lead, k8, n = packed.shape
    u = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    shifts = jnp.arange(8, dtype=jnp.uint32) * 4
    nib = ((u[..., :, None, :] >> shifts[:, None]) & jnp.uint32(0xF)
           ).astype(jnp.int32)
    return ((nib ^ 8) - 8).reshape(*lead, k8 * 8, n)


def quantize_int4(w: jax.Array, group: int = INT4_GROUP) -> Int4Weight:
    *lead, k, n = w.shape
    if k % group or group % 8:
        raise ValueError(f"K={k} must divide into {group}-row groups "
                         f"of whole words")
    w32 = w.astype(jnp.float32).reshape(*lead, k // group, group, n)
    absmax = jnp.max(jnp.abs(w32), axis=-2)               # (*, K//g, N)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(w32 / scale[..., None, :]), -7, 7)
    q = q.astype(jnp.int32).reshape(*lead, k, n)
    return Int4Weight(packed=_pack_nibbles(q), scale=scale)


def dequantize_int4(w: Int4Weight, dtype=jnp.float32) -> jax.Array:
    *lead, k8, n = w.packed.shape
    k = k8 * 8
    nib = _unpack_nibbles(w.packed).astype(jnp.float32)
    g = k // w.scale.shape[-2]
    deq = (nib.reshape(*lead, k // g, g, n)
           * w.scale[..., :, None, :]).reshape(*lead, k, n)
    return deq.astype(dtype)


def int4_matmul(x: jax.Array, w: Int4Weight,
                compute_dtype=jnp.bfloat16, out_dtype=None) -> jax.Array:
    """``x @ deq(w)`` — grouped scales can't ride a single matmul
    epilogue (they vary along K), so the contraction runs per K-group
    and the scale lands on the ``(..., G, N)`` partials. The nibble
    unpack materializes the dequantized operand transiently (bounded by
    XLA's fusion of unpack+reshape into the dot input); W4 is the
    *density* configuration — per-matmul traffic sits between W8 and
    bf16, while at-rest footprint halves again vs W8."""
    k8, n = w.packed.shape
    k = k8 * 8
    G = w.scale.shape[0]
    g = k // G
    nib = _unpack_nibbles(w.packed).astype(compute_dtype).reshape(G, g, n)
    xr = x.astype(compute_dtype).reshape(*x.shape[:-1], G, g)
    partial = jnp.einsum("...Gg,Ggn->...Gn", xr, nib,
                         preferred_element_type=jnp.float32)
    y = jnp.sum(partial * w.scale, axis=-2)
    return y.astype(out_dtype or x.dtype)


def quantize_base_projections_int4(params):
    """W4 serving mode: every compressed projection becomes an
    :class:`Int4Weight` (the ``_base_matmul`` leaf dispatch handles the
    rest). ~4x base footprint reduction vs bf16."""
    from ..models.llama import PROJ_NAMES

    out = dict(params)
    out["layers"] = dict(params["layers"])
    for name in PROJ_NAMES:
        out["layers"][name] = quantize_int4(params["layers"][name])
    return out


def quantize_int4_base_with_delta(base: jax.Array, finetune: jax.Array):
    """W4+W1 recipe: int4 the base, 1-bit the residual against the
    dequantized base (exactly the reference ablation's structure)."""
    from ..core.delta import quantize_delta

    qbase = quantize_int4(base)
    deq = dequantize_int4(qbase, base.dtype)
    delta = quantize_delta(deq, finetune)
    return qbase, delta


def quantize_base_with_delta(base: jax.Array, finetune: jax.Array):
    """The ablation's compression recipe: int8 the base, then 1-bit the
    residual fine-tune delta against the *dequantized* base."""
    from ..core.delta import quantize_delta

    qbase = quantize_int8(base)
    deq = dequantize_int8(qbase, base.dtype)
    delta = quantize_delta(deq, finetune)
    return qbase, delta


# ---------------------------------------------------------------------------
# Mode dispatch ("int8" | "int4") used by the CLIs and the engine
# ---------------------------------------------------------------------------

BASE_QUANT_MODES = ("int8", "int4")


def quantize_base(params, mode: str):
    """Quantize every compressed projection per ``mode`` (serving form)."""
    if mode == "int8":
        return quantize_base_projections(params)
    if mode == "int4":
        return quantize_base_projections_int4(params)
    raise ValueError(f"unknown base_quant mode {mode!r}; "
                     f"expected one of {BASE_QUANT_MODES}")


def roundtrip_base(params, mode: str, dtype=None):
    """``deq(q(params))`` — the dense base the deltas must be taken
    against (and fused against at eval) so W{8,4}+W1 serving is exact."""
    return dequantize_base_projections(quantize_base(params, mode), dtype)


def int8_delta_linear(x: jax.Array, qbase: Int8Weight, delta,
                      compute_dtype=jnp.bfloat16) -> jax.Array:
    """Forward: int8 base matmul + 1-bit delta matmul (W8 + W1)."""
    from ..ops.binary_matmul import binary_matmul

    y = int8_matmul(x, qbase, compute_dtype).astype(jnp.float32)
    yd = binary_matmul(x, delta.packed, delta.scale,
                       compute_dtype=compute_dtype).astype(jnp.float32)
    return (y + yd).astype(x.dtype)
