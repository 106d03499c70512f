"""Pallas TPU kernels for 1-bit delta GEMMs.

TPU-native replacement for the reference's Triton kernels
(reference bitdelta/binary_gemm_kernel.py:48-335). Two kernels:

  * :func:`binary_matmul_pallas` — ``C[M,N] = scale * (A[M,K] @ sign(P))``
    with ``P`` the int32-packed sign matrix ``(K//32, N)`` (reference C2).

  * :func:`fused_tenant_matmul_pallas` — the multi-tenant serving kernel
    (reference C3 + C15, with the base GEMM and the per-matrix scale
    fused, fixing the reference's unfused coeff, demo_backend.py:96):
    ``Y[b] = X[b] @ W_base + scale[t_b] * (X[b] @ sign(P[t_b]))`` where
    ``t_b = tenant_ids[b]``. Tenant routing uses scalar-prefetched ids in
    the BlockSpec index_map, so each grid step DMAs exactly the packed
    block it needs — no gather materialization, no per-batch mask
    restacking (the reference restacks masks per registration,
    demo_backend.py:127-150).

Design notes (see /opt/skills/guides/pallas_guide.md):
  * grid order puts the tenant/batch loop innermost so the shared
    ``W_base`` tile is fetched once per (n, k) and reused for all rows —
    this is what makes multi-tenant serving cheaper than per-tenant
    dense serving (HBM traffic 2 + B/8 bytes/element instead of 2B);
  * sign unpack runs on the VPU: sublane-interleaved ``jnp.repeat`` of
    the packed word tile, mask-compare, select to ±1 bf16 feeding the
    MXU. ~4 VPU ops per unpacked element — the kernel is VPU-bound above
    ~4 tenants, HBM-bound below (measured; see bench.py);
  * fp32 accumulation in VMEM scratch across the K grid dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    raise ValueError(f"dim {dim} not divisible by any of {candidates}")


def _unpack_pm1(packed_tile: jax.Array, dtype) -> jax.Array:
    """(K//32, N) int32 -> (K, N) ±1 ``dtype``; LSB-first along K.

    bit 1 -> +1, bit 0 -> -1 (reference binary_gemm_kernel.py:272).
    """
    rep = jnp.repeat(packed_tile, 32, axis=0)
    k = jax.lax.broadcasted_iota(jnp.int32, rep.shape, 0)
    # Arithmetic-only (Mosaic mishandles i1-mask relayouts to bf16 tiles):
    # shift the target bit to the LSB, isolate, map {0,1} -> {-1,+1}.
    bits = (rep >> (k % 32)) & 1
    return (2 * bits - 1).astype(dtype)


# ---------------------------------------------------------------------------
# Single-mask kernel (distillation / prefill shapes)
# ---------------------------------------------------------------------------

def _binary_matmul_kernel(x_ref, p_ref, scale_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    signs = _unpack_pm1(p_ref[:], x_ref.dtype)
    acc_ref[:] += jnp.dot(x_ref[:], signs, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def binary_matmul_pallas(x: jax.Array, packed: jax.Array, scale,
                         *, interpret: bool = False, out_dtype=None):
    """``scale * (x @ sign(packed))`` — x ``(M, K)``, packed ``(K//32, N)``."""
    m, kdim = x.shape
    k32, n = packed.shape
    assert kdim == k32 * 32, (x.shape, packed.shape)
    out_dtype = out_dtype or x.dtype

    bm = _pick_block(m, (256, 128, 64, 32, 16, 8, 4, 2, 1))
    bk = _pick_block(kdim, (512, 256, 128, 64, 32))
    bn = _pick_block(n, (256, 128, 64, 32, 16, 8))
    grid = (m // bm, n // bn, kdim // bk)

    scale_arr = jnp.reshape(jnp.asarray(scale, jnp.float32), (1,))
    return pl.pallas_call(
        _binary_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 32, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * kdim,
            bytes_accessed=m * kdim * 2 + k32 * n * 4 + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, packed, scale_arr)


# ---------------------------------------------------------------------------
# Fused multi-tenant serving kernel
# ---------------------------------------------------------------------------

def _fused_tenant_kernel(ids_ref, x_ref, w_ref, p_ref, scales_ref,
                         o_ref, acc_ref, *, nk: int, nb: int):
    k, b = pl.program_id(1), pl.program_id(2)

    @pl.when((k == 0) & (b == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Shared base GEMM: all rows at once, once per (n, k) tile.
    @pl.when(b == 0)
    def _():
        acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                              preferred_element_type=jnp.float32)

    # Per-row 1-bit delta: the packed block for tenant ids[b] was
    # selected by the BlockSpec index_map (scalar prefetch). Mosaic
    # can't address a single sublane row dynamically, so compute the
    # dot for all rows (the MXU is streaming-weight-bound at these M
    # anyway) and mask the accumulation to row b.
    signs = _unpack_pm1(p_ref[0], x_ref.dtype)
    alpha = scales_ref[ids_ref[b]]
    contrib = jnp.dot(x_ref[:], signs, preferred_element_type=jnp.float32)
    rowmask = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 0) == b
    acc_ref[:] += jnp.where(rowmask, alpha * contrib, 0.0)

    @pl.when((k == nk - 1) & (b == nb - 1))
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# Decode-shaped tenant delta kernel (VPU formulation)
# ---------------------------------------------------------------------------
#
# At decode (M = a few rows), the MXU is weight-load bound: it consumes
# the large operand at ~128 elem/cycle (~120 G elem/s measured), so
# pushing the 32x-unpacked sign matrix through it costs ~16x more than
# streaming the packed words from HBM. The VPU instead processes one
# *bit-plane* per instruction bundle: for bit position s,
#
#   plane_s = (packed >> s) & 1            (2 int ops / word-element)
#   acc    += plane_s * xq[..., s]         (int multiply-accumulate)
#
# with activations pre-quantized to int (scale chosen so bf16 inputs are
# represented exactly), giving ~4 VPU ops per unpacked element — the
# best of the formulations measured on v5e/v6e-class chips (vs ~12
# effective for the MXU path and ~50 for the XLA gather/unpack path).
# The kernel is VPU-throughput-bound; the shared W16 base matmul runs
# as a plain XLA matmul (which reaches HBM roofline at small M) outside
# this kernel.

def _tenant_delta_kernel(ids_ref, xq_ref, p_ref, scales_ref, xsum_ref,
                         o_ref, acc_ref, *, nk: int, nb: int):
    ki, b = pl.program_id(1), pl.program_id(2)

    @pl.when((ki == 0) & (b == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = p_ref[0]                      # (W, BN) int32 packed words
    xq = xq_ref[0]                    # (W, 32) int32 quantized activations
    isum = jnp.zeros(p.shape, jnp.int32)
    for s in range(32):
        plane = (p >> s) & 1
        isum += plane * xq[:, s][:, None]
    # y = alpha * (2*sum(x*bit) - sum(x)) : bit 1 -> +1, bit 0 -> -1.
    alpha = scales_ref[ids_ref[b]]
    contrib = (2.0 * jnp.sum(isum, axis=0).astype(jnp.float32)
               - xsum_ref[b, ki])
    rowmask = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 0) == b
    acc_ref[:] += jnp.where(rowmask, alpha * contrib[None, :], 0.0)

    @pl.when((ki == nk - 1) & (b == nb - 1))
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


X_QUANT_BITS = 14  # bf16 has an 8-bit mantissa; 14-bit grid is exact-ish


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def tenant_delta_matmul_pallas(x: jax.Array, packed_stack: jax.Array,
                               scales: jax.Array, tenant_ids: jax.Array, *,
                               interpret: bool = False, out_dtype=None):
    """``Y[b] = scales[ids[b]] * (X[b] @ sign(P[ids[b]]))`` — decode shape.

    VPU bit-plane kernel (see module notes). Activations are quantized
    per call to a shared int grid: ``xq = round(x * 2**QB / xmax)``; for
    bf16 inputs and the delta term (already a 1-bit approximation) this
    is numerically lossless in practice.

    Args: x ``(B, K)``; packed_stack ``(T, K//32, N)``; scales ``(T,)``;
    tenant_ids ``(B,)``. Returns ``(B, N)`` f32-accumulated.
    """
    bsz, kdim = x.shape
    t, k32, n = packed_stack.shape
    assert k32 * 32 == kdim
    out_dtype = out_dtype or x.dtype

    bk = _pick_block(kdim, (2048, 1024, 512, 256, 128, 64, 32))
    bn = _pick_block(n, (2048, 1024, 512, 256, 128, 64, 32, 16, 8))
    nk = kdim // bk
    grid = (n // bn, nk, bsz)

    xf = x.astype(jnp.float32)
    xmax = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-30)
    xscale = xmax / (2.0 ** X_QUANT_BITS)
    xq = jnp.round(xf / xscale).astype(jnp.int32)
    xq_r = xq.reshape(bsz, k32, 32)
    # Per (row, k-block) sum of the quantized x (for the 2S - sum trick),
    # in de-quantized units.
    xsum = (jnp.sum(xq_r.reshape(bsz, nk, bk // 32 * 32), axis=-1)
            .astype(jnp.float32))

    kernel = functools.partial(_tenant_delta_kernel, nk=nk, nb=bsz)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bk // 32, 32),
                         lambda ni, ki, bi, ids: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk // 32, bn),
                         lambda ni, ki, bi, ids: (ids[bi], ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bsz, bn), lambda ni, ki, bi, ids: (0, ni),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bsz, bn), jnp.float32)],
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * kdim,
            bytes_accessed=bsz * k32 * n * 4 + bsz * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(tenant_ids, jnp.int32), xq_r, packed_stack,
      jnp.asarray(scales, jnp.float32), xsum)
    return (y * xscale).astype(out_dtype)


# ---------------------------------------------------------------------------
# Pair-packed decode kernel (VPU, 2 output columns per word)
# ---------------------------------------------------------------------------
#
# Halves the bit-plane work of _tenant_delta_kernel: each int32 word
# holds 16 sign bits for TWO output columns (ops/packing.py::repack_pairs
# layout), so one shift+and+multiply+add accumulates two unpacked
# elements. Cross-half carries cannot occur because activations are
# quantized to a non-negative 12-bit grid and each half accumulates only
# its word's 16 planes (max 16 * 4095 < 2^16); 32-bit wraparound is
# modular and the halves are recovered exactly by mask/logical-shift.
#
# Affine dequantization: with xq = (x - xmin)/s in [0, 4095],
#   sum_k sign_k * x_k = s*(2*S - sum(xq)) + xmin*(2*popcount - K)
# where S = sum_k bit_k * xq_k is what the kernel accumulates and
# popcount is static per mask column (precomputed at repack time).
# Measured 1.43x over the one-column i32 formulation (BENCHNOTES.md).

PAIR_Q_LEVELS = 4095   # 12-bit grid: 16 * 4095 = 65520 < 2^16 (no carry)
PAIR_BN = 256          # output columns per 128-lane pair group


def _pair_plane_sums(p, xq):
    """VPU bit-plane loop over a pair-packed tile.

    p: ``(Wp, BNH)`` int32 pair words (16 sign bits per half, two output
    columns per word); xq: ``(Wp, 16)`` int32 activations in
    ``[0, PAIR_Q_LEVELS]``. Returns fp32 ``(1, BNH)`` half-sums
    ``S = sum_k bit_k * xq_k`` for the low / high output columns.
    Exactness: each 16-bit half accumulates at most 16 * 4095 < 2^16, so
    int32 wraparound is modular and the halves split exactly.
    """
    inner = jnp.zeros(p.shape, jnp.int32)
    for s in range(16):
        pairbits = (p >> s) & 0x00010001
        inner += pairbits * xq[:, s][:, None]
    lo = inner & 0xFFFF
    hi = jax.lax.shift_right_logical(inner, 16)
    s_lo = jnp.sum(lo, axis=0, keepdims=True).astype(jnp.float32)
    s_hi = jnp.sum(hi, axis=0, keepdims=True).astype(jnp.float32)
    return s_lo, s_hi


def _pair_quantize(x, scales, tenant_ids):
    """Host-side (XLA) prep shared by the pair kernels: quantize rows to
    the non-negative PAIR_Q_LEVELS affine grid and fold the tenant scale
    into the two dequantization coefficients.

    Returns ``(xq (B, K//16, 16) int32, sxq (B,) f32, a1 (B,) f32,
    a2 (B,) f32)`` with ``a1 = alpha * step``, ``a2 = alpha * xmin``.
    """
    bsz, kdim = x.shape
    xf = x.astype(jnp.float32)
    xmin = jnp.min(xf, axis=1)
    xmax = jnp.max(xf, axis=1)
    step = jnp.maximum((xmax - xmin) / PAIR_Q_LEVELS, 1e-30)
    xq = jnp.round((xf - xmin[:, None]) / step[:, None]).astype(jnp.int32)
    sxq = jnp.sum(xq, axis=1).astype(jnp.float32)
    alpha = jnp.asarray(scales, jnp.float32)[tenant_ids]
    return xq.reshape(bsz, kdim // 16, 16), sxq, alpha * step, alpha * xmin


def _colsum_to_pair_order(colsum, t, n):
    """Reorder ``(T, N)`` per-column popcount corrections into the pair
    layout's group-major order: ``c2p[t, h, g*128 + r] =
    colsum[t, g*256 + 128*h + r]`` so each kernel block reads a
    contiguous ``(2, BNH)`` lo/hi slice."""
    nblk = n // PAIR_BN
    return (colsum.reshape(t, nblk, 2, PAIR_BN // 2)
            .transpose(0, 2, 1, 3).reshape(t, 2, n // 2))


def _pair_reassemble(y_lo, y_hi, bsz, n):
    """Interleave the kernels' lo/hi outputs back into natural column
    order (group g's low half then high half)."""
    nblk = n // PAIR_BN
    return jnp.stack([y_lo.reshape(bsz, nblk, PAIR_BN // 2),
                      y_hi.reshape(bsz, nblk, PAIR_BN // 2)],
                     axis=2).reshape(bsz, n)


def _tenant_delta_pair_kernel(ids_ref, xq_ref, p_ref, a1_ref, a2_ref,
                              sxq_ref, c2_ref, olo_ref, ohi_ref,
                              alo_ref, ahi_ref, *, nk: int, nb: int):
    ki, b = pl.program_id(1), pl.program_id(2)

    @pl.when((ki == 0) & (b == 0))
    def _():
        alo_ref[:] = jnp.zeros_like(alo_ref)
        ahi_ref[:] = jnp.zeros_like(ahi_ref)

    s_lo, s_hi = _pair_plane_sums(p_ref[0], xq_ref[0])

    a1 = a1_ref[b]
    rowmask = jax.lax.broadcasted_iota(jnp.int32, alo_ref.shape, 0) == b
    alo_ref[:] += jnp.where(rowmask, (2.0 * a1) * s_lo, 0.0)
    ahi_ref[:] += jnp.where(rowmask, (2.0 * a1) * s_hi, 0.0)

    @pl.when(ki == nk - 1)
    def _():
        c2 = c2_ref[0]                                   # (2, 128)
        off = a1 * sxq_ref[b]
        alo_ref[:] += jnp.where(rowmask, a2_ref[b] * c2[0:1] - off, 0.0)
        ahi_ref[:] += jnp.where(rowmask, a2_ref[b] * c2[1:2] - off, 0.0)

    @pl.when((ki == nk - 1) & (b == nb - 1))
    def _():
        olo_ref[:] = alo_ref[:].astype(olo_ref.dtype)
        ohi_ref[:] = ahi_ref[:].astype(ohi_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def tenant_delta_matmul_pair_pallas(x: jax.Array, packed_pairs: jax.Array,
                                    colsum: jax.Array, scales: jax.Array,
                                    tenant_ids: jax.Array, *,
                                    interpret: bool = False, out_dtype=None):
    """``Y[b] = scales[ids[b]] * (X[b] @ sign(P[ids[b]]))`` — decode shape,
    pair-packed layout (see :func:`...packing.repack_pairs`).

    Args: x ``(B, K)``; packed_pairs ``(T, K//16, N//2)``; colsum
    ``(T, N)`` fp32 = 2*popcount - K; scales ``(T,)``; tenant_ids
    ``(B,)``. Returns ``(B, N)``.
    """
    bsz, kdim = x.shape
    t, k16, nhalf = packed_pairs.shape
    n = nhalf * 2
    assert k16 * 16 == kdim, (x.shape, packed_pairs.shape)
    assert colsum.shape == (t, n), (colsum.shape, (t, n))
    out_dtype = out_dtype or x.dtype

    bk = _pick_block(kdim, (4096, 2048, 1024, 512, 256, 128, 64, 32))
    nk = kdim // bk
    # Lanes per grid step: a block may span many 128-lane pair groups —
    # the pair layout is group-major so wide blocks stay contiguous.
    bnh = _pick_block(nhalf, (1024, 512, 256, 128))
    grid = (nhalf // bnh, nk, bsz)

    xq_r, sxq, a1, a2 = _pair_quantize(x, scales, tenant_ids)
    c2p = _colsum_to_pair_order(colsum, t, n)

    kernel = functools.partial(_tenant_delta_pair_kernel, nk=nk, nb=bsz)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bk // 16, 16),
                         lambda ni, ki, bi, ids: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk // 16, bnh),
                         lambda ni, ki, bi, ids: (ids[bi], ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, bnh),
                         lambda ni, ki, bi, ids: (ids[bi], 0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bsz, bnh), lambda ni, ki, bi, ids: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, bnh), lambda ni, ki, bi, ids: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((bsz, bnh), jnp.float32),
                        pltpu.VMEM((bsz, bnh), jnp.float32)],
    )
    y_lo, y_hi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bsz, nhalf), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, nhalf), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * kdim,
            bytes_accessed=bsz * k16 * nhalf * 4 + bsz * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(tenant_ids, jnp.int32), xq_r, packed_pairs,
      a1, a2, sxq, c2p)
    return _pair_reassemble(y_lo, y_hi, bsz, n).astype(out_dtype)


# ---------------------------------------------------------------------------
# Fused base + pair-packed delta decode kernel (MEASURED NEGATIVE — kept
# as a documented dead end, not dispatched)
# ---------------------------------------------------------------------------
#
# Hypothesis: the decode hot path runs the shared base matmul (XLA,
# HBM-bound) and the pair-packed delta kernel (VPU-bound) as separate
# launches; fusing both in one pallas_call should hide the base weight
# DMA under the VPU bit-plane compute (projected ~1.5x).
#
# Measured (v5e, experiments/fused_base_bench.py, T=B=8): 0.867-0.892x
# vs the separate-launch composition on mlp/down/qkv shapes. XLA already
# overlaps the base matmul's HBM streaming with the Pallas kernel across
# op boundaries (composition measures 360 us on the mlp shape vs a
# 157+297 us component sum), while this kernel serializes the b==0 MXU
# dot against the VPU loop within each grid step. See BENCHNOTES.md.
#
# Layout trick that makes this free: the pair layout is group-major
# (ops/packing.py::repack_pairs) — pair-word column g*128 + r covers
# natural output columns g*256 + r (low half) and g*256 + 128 + r
# (high half). A lane block of BNH = G*128 pair lanes therefore matches
# the NATURAL contiguous base slice W[ki*bk:(ki+1)*bk, ni*2*BNH:
# (ni+1)*2*BNH]: no re-layout or second copy of the base weights, and
# each group's lo/hi outputs are 128-aligned lane slices of the base
# dot. BNH is parameterized like the standalone pair kernel (narrow
# blocks re-fetch the xq/SMEM operands every step — measured 0.61x at
# 256-lane blocks for the standalone kernel, BENCHNOTES.md).

def _fused_base_pair_kernel(ids_ref, xq_ref, xb_ref, w_ref, p_ref, a1_ref,
                            a2_ref, sxq_ref, c2_ref, olo_ref, ohi_ref,
                            alo_ref, ahi_ref, *, nk: int, nb: int):
    ki, b = pl.program_id(1), pl.program_id(2)
    bnh = alo_ref.shape[1]

    @pl.when((ki == 0) & (b == 0))
    def _():
        alo_ref[:] = jnp.zeros_like(alo_ref)
        ahi_ref[:] = jnp.zeros_like(ahi_ref)

    # Shared base GEMM for all rows, once per (n, k) tile (the b loop is
    # innermost, so the w/xb blocks are fetched once and elided across b).
    # MXU work overlapping the VPU bit-plane loop below.
    @pl.when(b == 0)
    def _():
        yb = jnp.dot(xb_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32)   # (B, 2*BNH)
        # De-interleave natural columns into the pair-group lo/hi halves:
        # group g's natural columns [256g, 256g+128) are its lo lanes,
        # [256g+128, 256g+256) its hi lanes. Static 128-aligned slices.
        for g in range(bnh // 128):
            alo_ref[:, g * 128:(g + 1) * 128] += yb[:, g * 256:g * 256 + 128]
            ahi_ref[:, g * 128:(g + 1) * 128] += yb[:, g * 256 + 128:
                                                    (g + 1) * 256]

    # Pair-packed 1-bit delta for row b (shared body; see
    # _pair_plane_sums for the carry/dequant invariants).
    s_lo, s_hi = _pair_plane_sums(p_ref[0], xq_ref[0])

    a1 = a1_ref[b]
    rowmask = jax.lax.broadcasted_iota(jnp.int32, alo_ref.shape, 0) == b
    alo_ref[:] += jnp.where(rowmask, (2.0 * a1) * s_lo, 0.0)
    ahi_ref[:] += jnp.where(rowmask, (2.0 * a1) * s_hi, 0.0)

    @pl.when(ki == nk - 1)
    def _():
        c2 = c2_ref[0]                                   # (2, BNH)
        off = a1 * sxq_ref[b]
        alo_ref[:] += jnp.where(rowmask, a2_ref[b] * c2[0:1] - off, 0.0)
        ahi_ref[:] += jnp.where(rowmask, a2_ref[b] * c2[1:2] - off, 0.0)

    @pl.when((ki == nk - 1) & (b == nb - 1))
    def _():
        olo_ref[:] = alo_ref[:].astype(olo_ref.dtype)
        ohi_ref[:] = ahi_ref[:].astype(ohi_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "out_dtype", "lane_block"))
def fused_base_pair_matmul_pallas(x: jax.Array, w_base: jax.Array,
                                  packed_pairs: jax.Array,
                                  colsum: jax.Array, scales: jax.Array,
                                  tenant_ids: jax.Array, *,
                                  interpret: bool = False, out_dtype=None,
                                  lane_block: int = 0):
    """``Y[b] = X[b] @ W + scales[ids[b]] * (X[b] @ sign(P[ids[b]]))`` —
    decode shape, pair-packed delta layout, base matmul fused in-kernel
    (the reference runs base GEMM and binary_bmm as separate launches,
    demo_backend.py:93-98; here the base weight streaming hides under
    the VPU bit-plane compute).

    Args: x ``(B, K)``; w_base ``(K, N)`` natural layout (shared with
    the prefill path — no second copy); packed_pairs ``(T, K//16,
    N//2)``; colsum ``(T, N)``; scales ``(T,)``; tenant_ids ``(B,)``;
    lane_block: pair lanes per grid step (0 = widest dividing block).
    Returns ``(B, N)``.
    """
    bsz, kdim = x.shape
    kw, n = w_base.shape
    t, k16, nhalf = packed_pairs.shape
    assert kw == kdim and k16 * 16 == kdim and nhalf * 2 == n, (
        x.shape, w_base.shape, packed_pairs.shape)
    assert n % PAIR_BN == 0 and colsum.shape == (t, n)
    out_dtype = out_dtype or x.dtype

    bnh = (lane_block if lane_block
           else _pick_block(nhalf, (256, 128)))
    assert nhalf % bnh == 0 and bnh % 128 == 0, (nhalf, bnh)
    # VMEM budget: the (bk, 2*bnh) bf16 base block is double-buffered by
    # Mosaic against the ~16 MB scoped-vmem limit — cap it at 4 MB
    # (bk * bnh <= 1M elements) and shrink bk to fit.
    bk = _pick_block(kdim, tuple(
        c for c in (4096, 2048, 1024, 512, 256, 128, 64, 32)
        if c * bnh <= 1 << 20 or c == 32))
    nk = kdim // bk
    grid = (nhalf // bnh, nk, bsz)

    xq_r, sxq, a1, a2 = _pair_quantize(x, scales, tenant_ids)
    xb = x.astype(w_base.dtype)
    c2p = _colsum_to_pair_order(colsum, t, n)

    kernel = functools.partial(_fused_base_pair_kernel, nk=nk, nb=bsz)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bk // 16, 16),
                         lambda ni, ki, bi, ids: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, bk), lambda ni, ki, bi, ids: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, 2 * bnh), lambda ni, ki, bi, ids: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk // 16, bnh),
                         lambda ni, ki, bi, ids: (ids[bi], ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, bnh),
                         lambda ni, ki, bi, ids: (ids[bi], 0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bsz, bnh), lambda ni, ki, bi, ids: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, bnh), lambda ni, ki, bi, ids: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((bsz, bnh), jnp.float32),
                        pltpu.VMEM((bsz, bnh), jnp.float32)],
    )
    y_lo, y_hi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bsz, nhalf), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, nhalf), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * kdim * 2,
            bytes_accessed=(kdim * n * 2              # base, once
                            + bsz * k16 * nhalf * 4   # one pair mask per row
                            + bsz * kdim * 2 + bsz * n * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(tenant_ids, jnp.int32), xq_r, xb, w_base, packed_pairs,
      a1, a2, sxq, c2p)
    return _pair_reassemble(y_lo, y_hi, bsz, n).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def fused_tenant_matmul_pallas(x: jax.Array, w_base: jax.Array,
                               packed_stack: jax.Array, scales: jax.Array,
                               tenant_ids: jax.Array, *,
                               interpret: bool = False, out_dtype=None):
    """``Y[b] = X[b] @ W + scales[ids[b]] * (X[b] @ sign(P[ids[b]]))``.

    Args:
      x: ``(B, K)`` activations (decode step: one row per sequence slot).
      w_base: ``(K, N)`` shared base weights.
      packed_stack: ``(T, K//32, N)`` int32 — all tenants' packed signs.
      scales: ``(T,)`` fp32 per-tenant per-matrix scale.
      tenant_ids: ``(B,)`` int32 in [0, T).
    Returns ``(B, N)``.
    """
    bsz, kdim = x.shape
    kw, n = w_base.shape
    t, k32, np_ = packed_stack.shape
    assert kw == kdim and k32 * 32 == kdim and np_ == n
    out_dtype = out_dtype or x.dtype

    bk = _pick_block(kdim, (512, 256, 128, 64, 32))
    bn = _pick_block(n, (512, 256, 128, 64, 32, 16, 8))
    grid = (n // bn, kdim // bk, bsz)
    nk, nb = kdim // bk, bsz

    kernel = functools.partial(_fused_tenant_kernel, nk=nk, nb=nb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bsz, bk), lambda ni, ki, bi, ids: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda ni, ki, bi, ids: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk // 32, bn),
                         lambda ni, ki, bi, ids: (ids[bi], ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bsz, bn), lambda ni, ki, bi, ids: (0, ni),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bsz, bn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * kdim * 2,
            bytes_accessed=(kdim * n * 2          # base, once
                            + bsz * k32 * n * 4   # one packed mask per row
                            + bsz * kdim * 2 + bsz * n * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(tenant_ids, jnp.int32), x, w_base, packed_stack,
      jnp.asarray(scales, jnp.float32))


# ---------------------------------------------------------------------------
# Transposed kernel + trainable (custom-VJP) binary matmul
# ---------------------------------------------------------------------------

def _binary_matmul_t_kernel(g_ref, p_ref, scale_ref, o_ref, acc_ref):
    n = pl.program_id(2)

    @pl.when(n == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    signs = _unpack_pm1(p_ref[:], g_ref.dtype)        # (BK, BN)
    # out[m, k] = sum_n g[m, n] * signs[k, n]  (contract both N axes)
    acc_ref[:] += jax.lax.dot_general(
        g_ref[:], signs, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(n == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def binary_matmul_t_pallas(g: jax.Array, packed: jax.Array, scale,
                           *, interpret: bool = False, out_dtype=None):
    """``scale * (g @ sign(packed).T)`` — g ``(M, N)``, packed
    ``(K//32, N)``; returns ``(M, K)``. The backward operand of
    :func:`binary_matmul_pallas` (cotangent w.r.t. activations)."""
    m, n = g.shape
    k32, np_ = packed.shape
    assert np_ == n, (g.shape, packed.shape)
    kdim = k32 * 32
    out_dtype = out_dtype or g.dtype

    bm = _pick_block(m, (256, 128, 64, 32, 16, 8, 4, 2, 1))
    bk = _pick_block(kdim, (512, 256, 128, 64, 32))
    bn = _pick_block(n, (512, 256, 128, 64, 32, 16, 8))
    grid = (m // bm, kdim // bk, n // bn)

    scale_arr = jnp.reshape(jnp.asarray(scale, jnp.float32), (1,))
    return pl.pallas_call(
        _binary_matmul_t_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bn), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 32, bn), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, bk), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, kdim), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bk), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * kdim,
            bytes_accessed=m * n * 2 + k32 * n * 4 + m * kdim * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(g, packed, scale_arr)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def binary_matmul_trainable(x, packed, scale, interpret=False):
    """Differentiable ``scale * (x @ sign(packed))`` with Pallas fwd/bwd.

    Gradients flow to ``x`` (through the transposed kernel) and to
    ``scale`` (the only trainable leaf in scale distillation,
    reference train.py:60-88); the packed bits are constants. Used by
    the distillation student at training shapes (M = batch*seq), where
    the MXU kernels amortize; the XLA lowering remains the
    autodiff-by-construction fallback.
    """
    return binary_matmul_pallas(x, packed, scale, interpret=interpret)


def _bmt_fwd(x, packed, scale, interpret):
    y = binary_matmul_pallas(x, packed, scale, interpret=interpret)
    return y, (x, packed, scale)


def _bmt_bwd(interpret, res, g):
    x, packed, scale = res
    g32 = g.astype(jnp.float32)
    # u = x @ sign  (recomputed — cheaper than saving an (M, N) residual
    # per projection through the whole backward pass)
    u = binary_matmul_pallas(x, packed, 1.0, interpret=interpret,
                             out_dtype=jnp.float32)
    d_scale = jnp.sum(g32 * u).astype(jnp.asarray(scale).dtype)
    d_x = binary_matmul_t_pallas(g.astype(x.dtype), packed, scale,
                                 interpret=interpret,
                                 out_dtype=x.dtype)
    return d_x, None, d_scale


binary_matmul_trainable.defvjp(_bmt_fwd, _bmt_bwd)


# ---------------------------------------------------------------------------
# Tenant-routed dense matmul (per-tenant lm_head / embeddings)
# ---------------------------------------------------------------------------

def _tenant_dense_kernel(ids_ref, x_ref, w_ref, o_ref, acc_ref, *,
                         nk: int, nb: int):
    ki, b = pl.program_id(1), pl.program_id(2)

    @pl.when((ki == 0) & (b == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Row b's weight block was selected by the scalar-prefetched tenant
    # id in the BlockSpec index_map — the gather never materializes in
    # HBM. M=1, so contract on the VPU (multiply + sublane-reduce); the
    # MXU would be weight-load bound here (BENCHNOTES.md).
    w = w_ref[0].astype(jnp.float32)                    # (BK, BN)
    xcol = x_ref[0, 0, :].astype(jnp.float32)[:, None]  # (BK, 1)
    contrib = jnp.sum(w * xcol, axis=0)                 # (BN,)
    rowmask = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 0) == b
    acc_ref[:] += jnp.where(rowmask, contrib[None, :], 0.0)

    @pl.when((ki == nk - 1) & (b == nb - 1))
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def tenant_dense_matmul_pallas(x: jax.Array, w_stack: jax.Array,
                               tenant_ids: jax.Array, *,
                               interpret: bool = False, out_dtype=None):
    """``Y[b] = X[b] @ W[ids[b]]`` — per-tenant dense weights at decode
    shapes (the uncompressed lm_head / tied-embedding projection,
    reference DataParallelModule demo_backend.py:62-79).

    x: ``(B, K)``; w_stack: ``(T, K, N)``; tenant_ids: ``(B,)``.
    """
    bsz, kdim = x.shape
    t, kw, n = w_stack.shape
    assert kw == kdim
    out_dtype = out_dtype or x.dtype

    bk = _pick_block(kdim, (1024, 512, 256, 128, 64, 32, 16, 8))
    bn = _pick_block(n, (2048, 1024, 512, 256, 128, 64, 32, 16, 8))
    nk = kdim // bk
    grid = (n // bn, nk, bsz)

    kernel = functools.partial(_tenant_dense_kernel, nk=nk, nb=bsz)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            # x fed as (B, 1, K): Mosaic requires the last two block dims
            # to divide (8, 128) or equal the array dims — (1, bk) vs
            # array (1, K) satisfies that; a 2-D (1, bk) block would not.
            pl.BlockSpec((1, 1, bk), lambda ni, ki, bi, ids: (bi, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, bn),
                         lambda ni, ki, bi, ids: (ids[bi], ki, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bsz, bn), lambda ni, ki, bi, ids: (0, ni),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bsz, bn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * kdim,
            bytes_accessed=bsz * kdim * n * 2 + bsz * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(tenant_ids, jnp.int32), x[:, None, :], w_stack)
