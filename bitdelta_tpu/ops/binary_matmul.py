"""Binary (1-bit) delta matmuls — XLA lowering.

TPU-native replacement for the reference's Triton binary GEMM kernels
(reference bitdelta/binary_gemm_kernel.py:48-335). The contract is the
same: ``C = A @ (2*bits(B_packed) - 1)`` where ``B_packed`` is the
int32-packed sign matrix ``(K//32, N)`` from :mod:`.packing`, optionally
scaled by a per-matrix fp32 ``scale`` (the reference left the scale
unfused — demo/demo_backend.py:96 "TODO: Fuse coeff" — we fuse it).

This module is the *XLA* lowering: unpack to a dense +/-1 bf16 matrix and
let XLA tile the dot onto the MXU. It is numerically the source of truth;
the Pallas kernels in :mod:`.pallas_binary_gemm` must match it. XLA fuses
the unpack into the matmul's operand pipeline reasonably well, and —
importantly for distillation — this formulation is transparently
differentiable (gradients flow to ``x`` and ``scale``; the packed bits
are constants).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .packing import unpack_to_pm1


def binary_matmul(x: jax.Array, packed: jax.Array,
                  scale: jax.Array | float = 1.0,
                  *, compute_dtype=jnp.bfloat16) -> jax.Array:
    """``x @ (scale * sign)`` with ``sign`` unpacked from int32 words.

    Args:
      x: activations ``(..., K)``.
      packed: packed sign matrix ``(K//32, N)`` int32.
      scale: scalar fp32 per-matrix scale (trainable in distillation).

    Returns ``(..., N)`` in ``x.dtype``'s result type, accumulated f32.
    """
    signs = unpack_to_pm1(packed, compute_dtype)
    y = jnp.matmul(x.astype(compute_dtype), signs,
                   preferred_element_type=jnp.float32)
    return (jnp.asarray(scale, jnp.float32) * y).astype(x.dtype)


def binary_bmm(x: jax.Array, packed: jax.Array,
               scale: jax.Array | float = 1.0,
               *, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Batched variant: ``x[b] @ (scale[b] * sign[b])``.

    Mirrors the reference's multi-tenant kernel
    (bitdelta/binary_gemm_kernel.py:186-335): batch row ``b`` of the
    activations multiplies sign matrix ``b``.

    Args:
      x: ``(B, M, K)``.
      packed: ``(B, K//32, N)`` int32.
      scale: ``()`` or ``(B,)`` fp32.
    """
    signs = unpack_to_pm1(packed, compute_dtype)
    y = jnp.einsum("bmk,bkn->bmn", x.astype(compute_dtype), signs,
                   preferred_element_type=jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    if scale.ndim == 1:
        scale = scale[:, None, None]
    return (scale * y).astype(x.dtype)


def tenant_binary_matmul(x: jax.Array, packed_stack: jax.Array,
                         scales: jax.Array, tenant_ids: jax.Array,
                         *, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Per-row tenant-routed delta matmul (XLA path).

    Generalizes the reference demo's "batch row i IS tenant i" scheme
    (demo/demo_backend.py:127-150) to arbitrary routing: row ``b`` of the
    batch uses delta ``tenant_ids[b]`` from a stacked pytree.

    The gather here only moves *packed* (1-bit) words, so its HBM cost is
    1/16 of gathering dense bf16 weights; the Pallas kernel avoids even
    that by indexing blocks via scalar prefetch.

    Args:
      x: ``(B, M, K)`` activations.
      packed_stack: ``(T, K//32, N)`` int32 — all tenants' signs.
      scales: ``(T,)`` fp32.
      tenant_ids: ``(B,)`` int32 in ``[0, T)``.
    """
    packed = jnp.take(packed_stack, tenant_ids, axis=0)
    scale = jnp.take(scales, tenant_ids, axis=0)
    return binary_bmm(x, packed, scale, compute_dtype=compute_dtype)
