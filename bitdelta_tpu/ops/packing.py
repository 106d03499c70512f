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
