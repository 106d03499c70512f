"""Pallas TPU kernel for the W4 (grouped int4 RTN) base matmul.

The W4 density mode (research/quantized_base.py, TPU counterpart of the
reference's GPTQ-base ablation, reference bitdelta/misc.py:70-126) ships
its base matmul as an XLA grouped einsum (``int4_matmul``): nibble
unpack -> bf16 per-group contraction. At decode M that materializes the
unpacked operand and pushes it through the MXU at the known weight-load
wall (~120 G elem/s, BENCHNOTES.md) — ~58 ms of the measured 140 ms
32L/T8 density step.

This kernel streams the PACKED words from HBM and unpacks nibbles to
bf16 inside VMEM, feeding per-group ``jnp.dot``s whose partials are
scaled by the per-(group, column) RTN scale before cross-group
accumulation — no dense int4 operand ever exists outside the current
(bk, bn) block. Math is identical to ``int4_matmul`` (same group
decomposition), so numerics match the XLA path to accumulation order.

Layout (research/quantized_base.Int4Weight):
  packed ``(K//8, N)`` int32 — 8 two's-complement nibbles along K,
    LSB-first (nibble s of word k8 is row 8*k8 + s);
  scale ``(K//INT4_GROUP, N)`` fp32, INT4_GROUP = 128 — one block row
    of sublanes per group, which is what makes the in-kernel scale
    application a single broadcast multiply per group dot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..research.quantized_base import INT4_GROUP


def _pick_block(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    raise ValueError(f"dim {dim} not divisible by any of {candidates}")


def _unpack_nibbles_tile(p: jax.Array, dtype) -> jax.Array:
    """``(Wk, BN)`` int32 words -> ``(8*Wk, BN)`` signed values in
    [-8, 7] as ``dtype``; LSB-first along K (Int4Weight layout)."""
    rep = jnp.repeat(p, 8, axis=0)
    r = jax.lax.broadcasted_iota(jnp.int32, rep.shape, 0)
    nib = (rep >> ((r % 8) * 4)) & 0xF
    return ((nib ^ 8) - 8).astype(dtype)


def _w4_matmul_kernel(x_ref, p_ref, s_ref, o_ref, acc_ref, *, ng: int):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_nibbles_tile(p_ref[:], x_ref.dtype)      # (bk, bn)
    for g in range(ng):
        sub = w[g * INT4_GROUP:(g + 1) * INT4_GROUP]
        yg = jnp.dot(x_ref[:, g * INT4_GROUP:(g + 1) * INT4_GROUP], sub,
                     preferred_element_type=jnp.float32)
        acc_ref[:] += yg * s_ref[g][None, :]

    @pl.when(ki == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def w4_matmul_pallas(x: jax.Array, packed: jax.Array, scale: jax.Array,
                     *, interpret: bool = False, out_dtype=None):
    """``x @ deq(Int4Weight(packed, scale))`` — x ``(M, K)`` (decode
    shapes: M = a few rows), packed ``(K//8, N)`` int32, scale
    ``(K//INT4_GROUP, N)`` f32. Returns ``(M, N)`` f32-accumulated."""
    m, kdim = x.shape
    k8, n = packed.shape
    ngroups = kdim // INT4_GROUP
    assert k8 * 8 == kdim, (x.shape, packed.shape)
    assert scale.shape == (ngroups, n), (scale.shape, (ngroups, n))
    out_dtype = out_dtype or x.dtype

    # Mosaic block rule: the scale block's sublane dim (bk//INT4_GROUP)
    # must be divisible by 8 OR equal the whole array dim — so bk is
    # 1024+ (8 groups/block) at real shapes, or the whole K otherwise.
    for c in (1024, 2048, 4096):
        if kdim % c == 0:
            bk = c
            break
    else:
        bk = kdim
    bn = _pick_block(n, (512, 256, 128, 64, 32, 16, 8))
    grid = (n // bn, kdim // bk)

    kernel = functools.partial(_w4_matmul_kernel, ng=bk // INT4_GROUP)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, bk), lambda ni, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 8, bn), lambda ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // INT4_GROUP, bn), lambda ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda ni, ki: (0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * kdim,
            bytes_accessed=k8 * n * 4 + ngroups * n * 4 + m * kdim * 2
                           + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, packed, scale).astype(out_dtype)
