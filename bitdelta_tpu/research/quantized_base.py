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


def dequantize_base_projections(params, dtype=None):
    """Inverse of :func:`quantize_base_projections` (materializes the
    rounded dense weights — what deltas must be taken against)."""
    out = dict(params)
    out["layers"] = dict(params["layers"])
    for name, w in params["layers"].items():
        if isinstance(w, Int8Weight):
            out["layers"][name] = dequantize_int8(
                w, dtype or jnp.bfloat16)
    return out


def quantize_base_with_delta(base: jax.Array, finetune: jax.Array):
    """The ablation's compression recipe: int8 the base, then 1-bit the
    residual fine-tune delta against the *dequantized* base."""
    from ..core.delta import quantize_delta

    qbase = quantize_int8(base)
    deq = dequantize_int8(qbase, base.dtype)
    delta = quantize_delta(deq, finetune)
    return qbase, delta


def int8_delta_linear(x: jax.Array, qbase: Int8Weight, delta,
                      compute_dtype=jnp.bfloat16) -> jax.Array:
    """Forward: int8 base matmul + 1-bit delta matmul (W8 + W1)."""
    from ..ops.binary_matmul import binary_matmul

    y = int8_matmul(x, qbase, compute_dtype).astype(jnp.float32)
    yd = binary_matmul(x, delta.packed, delta.scale,
                       compute_dtype=compute_dtype).astype(jnp.float32)
    return (y + yd).astype(x.dtype)
