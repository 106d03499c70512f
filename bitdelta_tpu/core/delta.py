"""1-bit delta quantization core.

TPU-native equivalent of the reference's ``BinaryDiff`` construction
(reference bitdelta/diff.py:8-39): a fine-tuned weight is decomposed as
``W_fine = W_base + delta``, the delta is quantized to
``delta_hat = scale * sign(delta)`` with ``scale0 = mean(|delta|)`` in
fp32, and the signs are bit-packed along K.

Unlike the reference (torch ``nn.Module`` holding buffers), the delta
here is a plain pytree (`BinaryDelta`) of packed signs + scale, so it
jits, shards and stacks (over layers or tenants) like any other JAX
array data.

Weight convention: all matrices in this framework are stored as
``(K_in, N_out)`` ("kernel" layout, ``y = x @ W``) — the transpose of
HF/torch ``nn.Linear``. The reference transposes at pack time
(diff.py:16 ``pack(mask.bool().T)``); we never store the torch layout at
all.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.packing import pack_signs, unpack_to_pm1


class BinaryDelta(NamedTuple):
    """Packed 1-bit delta for one weight matrix (or a stack of them).

    packed: int32 ``(*, K//32, N)`` sign bits: bit 1 <=> delta > 0,
            bit 0 <=> delta < 0; EXACT-zero deltas carry whatever bit
            the encoder's ``zero_sign`` policy chose (all-ones under the
            default reference parity — see ``quantize_delta``). Decoders
            never need to know: a bit is always decoded as ±1·scale.
    scale:  fp32 ``(*,)``-shaped per-matrix scale (trainable leaf during
            scale distillation; the reference's ``coeff``, diff.py:18-30).
    """

    packed: jax.Array
    scale: jax.Array

    @property
    def k(self) -> int:
        return self.packed.shape[-2] * 32

    @property
    def n(self) -> int:
        return self.packed.shape[-1]


class PairedBinaryDelta(NamedTuple):
    """Serving-layout variant of :class:`BinaryDelta` for the pair-packed
    VPU decode kernel (ops/pallas_binary_gemm.py, BENCHNOTES.md: 1.43x
    over the one-column formulation).

    packed_pairs: int32 ``(*, K//16, N//2)`` — two output columns per
      word (16 sign bits each half; ops/packing.py::repack_pairs).
    colsum: fp32 ``(*, N)`` — ``2*popcount - K`` per column, the static
      part of the kernel's affine dequantization correction.
    scale: fp32 ``(*,)`` per-matrix scale (same as BinaryDelta.scale).
    """

    packed_pairs: jax.Array
    colsum: jax.Array
    scale: jax.Array


def pair_delta(delta: BinaryDelta) -> PairedBinaryDelta:
    """Convert a canonical delta (any leading stack dims) to the pair
    layout. One-time word-level shuffle at serving setup; the canonical
    artifact format stays (K//32, N)."""
    from ..ops.packing import column_popcount, repack_pairs

    k = delta.packed.shape[-2] * 32
    colsum = (2.0 * column_popcount(delta.packed) - k).astype(jnp.float32)
    return PairedBinaryDelta(packed_pairs=repack_pairs(delta.packed),
                             colsum=colsum,
                             scale=jnp.asarray(delta.scale, jnp.float32))


def quantize_delta(base: jax.Array, finetune: jax.Array, *,
                   zero_sign: str = "positive") -> BinaryDelta:
    """Quantize ``finetune - base`` to 1 bit + fp32 scale.

    Under the default ``zero_sign="positive"`` this matches reference
    semantics exactly (diff.py:11-16): scale is ``mean(|diff|)`` computed
    in fp32; sign bit is 1 exactly when ``diff >= 0`` (zero maps to +1).
    ``zero_sign="balance"`` changes ONLY the bits at exact-zero diffs.

    Args:
      base, finetune: ``(K, N)`` (or stacked ``(L, K, N)``) matrices in
        kernel layout.
      zero_sign: sign bit assigned to EXACT-zero diffs.
        ``"positive"`` (default) — reference parity, ``diff >= 0`` → +1.
        ``"balance"`` — checkerboard ±1 by (k+n) parity. bf16 fine-tunes
        leave a large fraction of deltas exactly 0 (optimizer updates
        below the local ULP round away — ~9% on a 0.02-sigma synthetic
        perturbation); mapping them all to +1 adds a coherent
        ``+scale * n_zeros`` bias to every output column, which the
        checkerboard decorrelates to O(sqrt(n_zeros)) noise. Same 1-bit
        artifact format — this is an encoder-side choice; every decoder
        (XLA, Pallas, dense fusion, reference ``load_diff``) works
        unchanged.
    """
    diff = finetune.astype(jnp.float32) - base.astype(jnp.float32)
    scale = jnp.mean(jnp.abs(diff), axis=(-2, -1))
    return BinaryDelta(packed=pack_signs(delta_signs(diff, zero_sign)),
                       scale=scale)


def delta_signs(diff: jax.Array, zero_sign: str = "positive") -> jax.Array:
    """Boolean sign plane of a dense fp32 diff under a ``zero_sign``
    policy (see :func:`quantize_delta`). Shared by every encoder variant
    so the diff is materialized exactly once per call site."""
    if zero_sign == "balance":
        k, n = diff.shape[-2], diff.shape[-1]
        checker = ((jnp.arange(k)[:, None] + jnp.arange(n)[None, :])
                   % 2) == 0
        return jnp.where(diff == 0, checker, diff > 0)
    if zero_sign == "positive":
        return diff >= 0
    raise ValueError(f"unknown zero_sign: {zero_sign!r}")


def dequantize_delta(delta: BinaryDelta, dtype=jnp.float32) -> jax.Array:
    """Materialize the dense ``scale * sign`` matrix ``(*, K, N)``."""
    pm1 = unpack_to_pm1(delta.packed, jnp.float32)
    scale = delta.scale[..., None, None] if jnp.ndim(delta.scale) else delta.scale
    return (scale * pm1).astype(dtype)


def apply_delta(base: jax.Array, delta: BinaryDelta) -> jax.Array:
    """Dense fusion: ``W_base + scale * sign`` in the base dtype.

    The reference uses this path for evaluation (diff.py:87-95 fuses the
    delta back into dense weights so perplexity isolates quantization
    error from kernel numerics); we keep the same property.
    """
    fused = base.astype(jnp.float32) + dequantize_delta(delta, jnp.float32)
    return fused.astype(base.dtype)


def delta_linear(x: jax.Array, base_w: jax.Array, delta: BinaryDelta,
                 *, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Compressed linear layer: ``x @ W_base + scale * (x @ sign)``.

    Semantics of ``BinaryDiff.forward`` (reference diff.py:33-39), with
    the scale fused into the delta matmul. The sign matmul is expressed
    via dense unpack so XLA fuses it and autodiff works (gradient flows
    to ``x`` and, through ``scale``, to the distillation objective).
    """
    from ..ops.binary_matmul import binary_matmul

    y_base = jnp.matmul(x.astype(compute_dtype), base_w.astype(compute_dtype),
                        preferred_element_type=jnp.float32)
    y_delta = binary_matmul(x, delta.packed, delta.scale,
                            compute_dtype=compute_dtype).astype(jnp.float32)
    return (y_base + y_delta).astype(x.dtype)


def delta_nbytes(delta: BinaryDelta) -> int:
    """Size of the compressed delta in bytes (packed words + scale)."""
    return delta.packed.size * 4 + delta.scale.size * 4


def compression_ratio(base: jax.Array, delta: BinaryDelta,
                      dense_bytes_per_el: int = 2) -> float:
    """Dense-delta bytes / packed-delta bytes (reference reports ~10-16x,
    docs/index.html:356-359)."""
    dense = base.size * dense_bytes_per_el
    return dense / delta_nbytes(delta)
