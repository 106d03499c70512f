"""Probe: grouped-row pair kernel — amortize bit-plane extraction over
rows that share a tenant.

The deployed pair kernel (ops/pallas_binary_gemm.py) costs 4 VPU ops per
word-plane for ONE row (shift, and, mul, add) = 2.0 ops per unpacked
element. When two decode rows share a tenant (common in real serving:
more slots than tenants), the shift+and can be shared:

  6 ops per word-plane for TWO rows = 1.5 ops/elem -> ideal 1.33x.

Grid: (n_blocks, k_blocks, B//2); each step processes a row PAIR with
one packed-block fetch and one plane extraction. Requires the pair to
share a tenant (the engine can sort slots by tenant; odd groups fall
back to the per-row kernel).

Measures vs the deployed pair kernel at B=8, T=4, ids=[0,0,1,1,2,2,3,3].
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from bitdelta_tpu.core.delta import BinaryDelta, pair_delta
from bitdelta_tpu.ops.pallas_binary_gemm import (
    PAIR_BN, PAIR_Q_LEVELS, tenant_delta_matmul_pair_pallas)

B = int(os.environ.get("B", "8"))
T = int(os.environ.get("T", "4"))
K = int(os.environ.get("K", "4096"))
N = int(os.environ.get("N", "14336"))
STEPS = 256
TRIALS = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


def _pick_block(dim, candidates):
    for c in candidates:
        if dim % c == 0:
            return c
    raise ValueError


def _grouped_pair_kernel(ids_ref, xq_ref, p_ref, a1_ref, a2_ref,
                         sxq_ref, c2_ref, olo_ref, ohi_ref,
                         alo_ref, ahi_ref, *, nk: int, ng: int):
    ki, gi = pl.program_id(1), pl.program_id(2)

    @pl.when((ki == 0) & (gi == 0))
    def _():
        alo_ref[:] = jnp.zeros_like(alo_ref)
        ahi_ref[:] = jnp.zeros_like(ahi_ref)

    p = p_ref[0]                       # (Wp, BNH) pair words
    xq = xq_ref[0]                     # (2, Wp, 16)
    xq0, xq1 = xq[0], xq[1]
    inner0 = jnp.zeros(p.shape, jnp.int32)
    inner1 = jnp.zeros(p.shape, jnp.int32)
    for s in range(16):
        pairbits = (p >> s) & 0x00010001       # shared across the pair
        inner0 += pairbits * xq0[:, s][:, None]
        inner1 += pairbits * xq1[:, s][:, None]

    rows = jax.lax.broadcasted_iota(jnp.int32, alo_ref.shape, 0)
    for r, inner in ((0, inner0), (1, inner1)):
        b = 2 * gi + r
        lo = inner & 0xFFFF
        hi = jax.lax.shift_right_logical(inner, 16)
        s_lo = jnp.sum(lo, axis=0, keepdims=True).astype(jnp.float32)
        s_hi = jnp.sum(hi, axis=0, keepdims=True).astype(jnp.float32)
        a1 = a1_ref[b]
        rowmask = rows == b
        alo_ref[:] += jnp.where(rowmask, (2.0 * a1) * s_lo, 0.0)
        ahi_ref[:] += jnp.where(rowmask, (2.0 * a1) * s_hi, 0.0)

        @pl.when(ki == nk - 1)
        def _():
            c2 = c2_ref[0]
            off = a1 * sxq_ref[b]
            alo_ref[:] += jnp.where(rowmask, a2_ref[b] * c2[0:1] - off, 0.0)
            ahi_ref[:] += jnp.where(rowmask, a2_ref[b] * c2[1:2] - off, 0.0)

    @pl.when((ki == nk - 1) & (gi == ng - 1))
    def _():
        olo_ref[:] = alo_ref[:].astype(olo_ref.dtype)
        ohi_ref[:] = ahi_ref[:].astype(ohi_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def grouped_pair_matmul(x, packed_pairs, colsum, scales, tenant_ids, *,
                        interpret=False, out_dtype=None):
    """Same contract as tenant_delta_matmul_pair_pallas, but rows
    (2i, 2i+1) MUST share a tenant (ids[2i] == ids[2i+1])."""
    bsz, kdim = x.shape
    t, k16, nhalf = packed_pairs.shape
    n = nhalf * 2
    assert bsz % 2 == 0
    out_dtype = out_dtype or x.dtype

    bk = _pick_block(kdim, (4096, 2048, 1024, 512, 256, 128, 64, 32))
    nk = kdim // bk
    bnh = _pick_block(nhalf, (1024, 512, 256, 128))
    ng = bsz // 2
    grid = (nhalf // bnh, nk, ng)

    xf = x.astype(jnp.float32)
    xmin = jnp.min(xf, axis=1)
    xmax = jnp.max(xf, axis=1)
    step = jnp.maximum((xmax - xmin) / PAIR_Q_LEVELS, 1e-30)
    xq = jnp.round((xf - xmin[:, None]) / step[:, None]).astype(jnp.int32)
    sxq = jnp.sum(xq, axis=1).astype(jnp.float32)
    alpha = jnp.asarray(scales, jnp.float32)[tenant_ids]
    a1 = alpha * step
    a2 = alpha * xmin
    xq_g = xq.reshape(ng, 2, k16, 16)

    nblk = n // PAIR_BN
    c2p = (colsum.reshape(t, nblk, 2, PAIR_BN // 2)
           .transpose(0, 2, 1, 3).reshape(t, 2, nhalf))

    kernel = functools.partial(_grouped_pair_kernel, nk=nk, ng=ng)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, bk // 16, 16),
                         lambda ni, ki, gi, ids: (gi, 0, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk // 16, bnh),
                         lambda ni, ki, gi, ids: (ids[2 * gi], ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, bnh),
                         lambda ni, ki, gi, ids: (ids[2 * gi], 0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bsz, bnh), lambda ni, ki, gi, ids: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, bnh), lambda ni, ki, gi, ids: (0, ni),
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
        interpret=interpret,
    )(jnp.asarray(tenant_ids, jnp.int32), xq_g, packed_pairs,
      a1, a2, sxq, c2p)
    y = jnp.stack([y_lo.reshape(bsz, nblk, PAIR_BN // 2),
                   y_hi.reshape(bsz, nblk, PAIR_BN // 2)],
                  axis=2).reshape(bsz, n)
    return y.astype(out_dtype)


def main():
    key = jax.random.PRNGKey(0)
    packed = jax.random.randint(key, (T, K // 32, N), -2**31, 2**31 - 1,
                                jnp.int32)
    scales = jnp.linspace(0.005, 0.02, T).astype(jnp.float32)
    ids = jnp.asarray([i // (B // T) for i in range(B)], jnp.int32)
    pd = pair_delta(BinaryDelta(packed=packed, scale=scales))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, K), jnp.bfloat16)

    want = tenant_delta_matmul_pair_pallas(
        x0, pd.packed_pairs, pd.colsum, scales, ids, out_dtype=jnp.float32)
    got = grouped_pair_matmul(
        x0, pd.packed_pairs, pd.colsum, scales, ids, out_dtype=jnp.float32)
    err = float(jnp.max(jnp.abs(got - want)))
    rel = err / float(jnp.max(jnp.abs(want)))
    log(f"numerics: max abs {err:.4f} rel {rel:.2e}")

    @jax.jit
    def null(x):
        return x.sum()
    def mintime(fn, *a, n=TRIALS):
        float(fn(*a))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    floor = min(mintime(null, jnp.ones((8,)), n=5) for _ in range(2))

    def chain(fn):
        @jax.jit
        def run(x):
            def body(x, _):
                y = fn(x)
                x = x + y[:, :K].astype(x.dtype) * jnp.bfloat16(1e-6)
                return x, ()
            x, _ = jax.lax.scan(body, x, None, length=STEPS)
            return x.astype(jnp.float32).sum()
        return run

    t_pair = (mintime(chain(lambda x: tenant_delta_matmul_pair_pallas(
        x, pd.packed_pairs, pd.colsum, scales, ids,
        out_dtype=jnp.float32)), x0) - floor) / STEPS
    t_grp = (mintime(chain(lambda x: grouped_pair_matmul(
        x, pd.packed_pairs, pd.colsum, scales, ids,
        out_dtype=jnp.float32)), x0) - floor) / STEPS
    rate_p = B * K * N / t_pair / 1e9
    rate_g = B * K * N / t_grp / 1e9
    log(f"pair    {t_pair*1e6:7.1f} us  {rate_p:6.0f} G elem/s")
    log(f"grouped {t_grp*1e6:7.1f} us  {rate_g:6.0f} G elem/s  "
        f"speedup {t_pair/t_grp:.2f}x")


if __name__ == "__main__":
    main()
