"""Sign-bit packing for 1-bit weight deltas.

TPU-native reimplementation of the reference's bit pack/unpack
(see reference bitdelta/binary_gemm_kernel.py:6-46 for the semantics we
preserve): sign bits are packed along the K (input-feature) axis,
LSB-first, 32 bits per int32 word. Word ``w[k32, n]`` holds the sign bits
for rows ``K = k32*32 + s`` at bit position ``s``.

Bit convention (reference bitdelta/diff.py:14-15): bit 1 <=> delta >= 0
(maps to +1), bit 0 <=> delta < 0 (maps to -1); the matmul consumes
``2*b - 1``.

We keep the contiguous LSB-first layout (rather than a strided one)
because it makes K-axis tensor-parallel sharding trivial: a shard of
``K`` rows that is a multiple of 32 corresponds to a contiguous slice of
packed words along the ``K//32`` axis.

Everything here is pure jax.numpy and runs on any backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_BITS = 32
PACK_DTYPE = jnp.int32


def packed_rows(k: int, n_bits: int = N_BITS) -> int:
    """Number of packed words along K for ``k`` unpacked rows."""
    if k % n_bits != 0:
        raise ValueError(f"K={k} must be divisible by n_bits={n_bits}")
    return k // n_bits


def pack_signs(signs: jax.Array, n_bits: int = N_BITS) -> jax.Array:
    """Pack a boolean sign tensor ``(*, K, N)`` into ``(*, K//32, N)`` int32.

    ``signs[k, n] == True`` means the delta at ``[k, n]`` is >= 0 (+1).
    LSB-first along K: output word ``[k32, n]`` bit ``s`` is
    ``signs[k32*32 + s, n]``.
    """
    if n_bits != 32:
        raise NotImplementedError("only 32-bit packing is supported on TPU")
    *lead, k, n = signs.shape
    k32 = packed_rows(k, n_bits)
    bits = signs.astype(jnp.uint32).reshape(*lead, k32, n_bits, n)
    shifts = jnp.arange(n_bits, dtype=jnp.uint32)
    # Each bit position is distinct so the sum is an exact bitwise OR.
    words = jnp.sum(bits << shifts[:, None], axis=-2, dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(words, PACK_DTYPE)


def unpack_signs(packed: jax.Array, n_bits: int = N_BITS) -> jax.Array:
    """Unpack ``(*, K//32, N)`` int32 back to boolean ``(*, K, N)``."""
    if n_bits != 32:
        raise NotImplementedError("only 32-bit packing is supported on TPU")
    *lead, k32, n = packed.shape
    words = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    shifts = jnp.arange(n_bits, dtype=jnp.uint32)
    bits = (words[..., :, None, :] >> shifts[:, None]) & jnp.uint32(1)
    return bits.reshape(*lead, k32 * n_bits, n).astype(jnp.bool_)


def unpack_to_pm1(packed: jax.Array, dtype=jnp.bfloat16,
                  n_bits: int = N_BITS) -> jax.Array:
    """Unpack to a dense +/-1 tensor ``(*, K, N)`` of ``dtype``.

    bit 1 -> +1, bit 0 -> -1 (the reference kernel's ``2*b - 1``,
    reference bitdelta/binary_gemm_kernel.py:272).
    """
    bits = unpack_signs(packed, n_bits)
    return jnp.where(bits, jnp.asarray(1, dtype), jnp.asarray(-1, dtype))


PAIR_BLOCK = 256  # output columns per pair block (= 2 x 128 VPU lanes)


def repack_pairs(packed: jax.Array) -> jax.Array:
    """Repack canonical ``(*, K//32, N)`` words into the pair layout
    ``(*, K//16, N//2)`` consumed by the pair-packed VPU decode kernel
    (ops/pallas_binary_gemm.py::tenant_delta_matmul_pair_pallas).

    Pair word ``[k16, ni*128 + r]`` holds, LSB-first, the 16 sign bits of
    K rows ``[16*k16, 16*k16 + 16)`` for output column ``ni*256 + r`` in
    its low half and for column ``ni*256 + 128 + r`` in its high half —
    so one shift+and+multiply accumulates two output columns at once
    (measured 1.43x over the 32-bit one-column formulation; see
    BENCHNOTES.md). Word-level shuffle only: never unpacks to (K, N).
    """
    *lead, k32, n = packed.shape
    if n % PAIR_BLOCK != 0:
        raise ValueError(f"N={n} must be divisible by {PAIR_BLOCK}")
    u = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    # (*, K//32, N) -> 16-bit halves interleaved along K: (*, K//16, N)
    h = jnp.stack([u & jnp.uint32(0xFFFF), u >> jnp.uint32(16)], axis=-2)
    h = h.reshape(*lead, 2 * k32, n)
    hl = h.reshape(*lead, 2 * k32, n // PAIR_BLOCK, 2, PAIR_BLOCK // 2)
    pair = hl[..., 0, :] | (hl[..., 1, :] << jnp.uint32(16))
    pair = pair.reshape(*lead, 2 * k32, n // 2)
    return jax.lax.bitcast_convert_type(pair, PACK_DTYPE)


def unpair_packed(pair: jax.Array) -> jax.Array:
    """Inverse of :func:`repack_pairs`: ``(*, K//16, N//2)`` ->
    ``(*, K//32, N)``. Word-level shuffle; used by non-decode paths
    (prefill, XLA fallback) so serving can hold only the pair layout."""
    *lead, k16, n2 = pair.shape
    n = n2 * 2
    u = jax.lax.bitcast_convert_type(pair, jnp.uint32)
    hl = jnp.stack([u & jnp.uint32(0xFFFF), u >> jnp.uint32(16)], axis=-2)
    # (*, K//16, 2, N//2) -> halves back into column blocks of 256
    hl = hl.reshape(*lead, k16, 2, n // PAIR_BLOCK, PAIR_BLOCK // 2)
    h = hl.transpose(*range(len(lead)), -4, -2, -3, -1).reshape(
        *lead, k16, n)
    # de-interleave the K halves: rows (2a, 2a+1) -> word a
    h = h.reshape(*lead, k16 // 2, 2, n)
    words = h[..., 0, :] | (h[..., 1, :] << jnp.uint32(16))
    return jax.lax.bitcast_convert_type(words, PACK_DTYPE)


def column_popcount(packed: jax.Array) -> jax.Array:
    """Per-output-column count of set sign bits: ``(*, K//32, N)`` ->
    ``(*, N)`` int32 (static per mask; used by the pair kernel's affine
    dequantization correction)."""
    u = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    return jnp.sum(jax.lax.population_count(u), axis=-2).astype(jnp.int32)


def pack_signs_np(signs, n_bits: int = N_BITS):
    """NumPy variant of :func:`pack_signs` for host-side artifact IO.

    Used when packing very large checkpoints where staging through the
    accelerator would be wasteful.
    """
    import numpy as np

    *lead, k, n = signs.shape
    k32 = packed_rows(k, n_bits)
    bits = np.asarray(signs, dtype=np.uint32).reshape(*lead, k32, n_bits, n)
    shifts = np.arange(n_bits, dtype=np.uint32)
    words = np.zeros((*lead, k32, n), dtype=np.uint32)
    for s in range(n_bits):  # bounded small loop; avoids a (K, N) temp blowup
        words |= bits[..., s, :] << shifts[s]
    return words.view(np.int32)
