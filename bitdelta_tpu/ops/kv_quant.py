"""Int8 KV-cache quantization.

At long contexts the decode bottleneck is streaming the KV cache
(BENCHNOTES.md: 4k-context full-slot cache ≈ 4.3 GB ≈ 6 ms/step at the
0.72 TB/s roofline); int8 storage halves that traffic AND doubles the
cache capacity per chip. Quantization is symmetric absmax per
``(batch, position, kv_head)`` — one fp scale per stored vector, so a
token's K (or V) row dequantizes with a single broadcast multiply
inside the attention kernel (ops/flash_decode.py) and accuracy holds
across positions with very different magnitudes (RoPE'd K rows vary
per position; V rows vary per token).

The reference has no KV story at all (HF cache, bf16); this is
TPU-native new ground for serving density.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_kv(x: jax.Array):
    """``(..., KV, hd)`` float -> (int8 ``(..., KV, hd)``,
    fp32 scale ``(..., KV)``) with ``x ~ q * scale[..., None]``."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def dequantize_kv(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16):
    """Inverse of :func:`quantize_kv` (XLA fallback paths; the Pallas
    flash kernels dequantize in-kernel instead)."""
    return (q.astype(jnp.float32) * scale[..., None].astype(jnp.float32)
            ).astype(dtype)
