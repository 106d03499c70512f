"""Probe: can anything beat XLA's dense x @ W at decode M (<=8 rows)?

Floor-corrected measurement (BENCHNOTES.md) shows XLA runs the M=6..8
bf16 dense matmul at ~157 us per 117 MB weight = 0.75 TB/s effective —
half the chip's measured 1.6 TB/s stream rate. This probes alternative
formulations; per-iteration timing subtracts the measured null-call
floor and chains STEPS in-jit iterations with data deps.

Formulations:
  xla        — jnp.matmul baseline
  xla_f32acc — preferred_element_type f32 (what the model path uses)
  pallas_mxu — tiled Pallas kernel, jnp.dot per (bk, bn) tile
  pallas_vpu — Pallas kernel, broadcast-FMA on the VPU (no MXU)
  pallas_mxu_bigM — pad M to 128 with zeros (MXU-shaped), slice back
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

M = int(os.environ.get("M", "8"))
K = int(os.environ.get("K", "4096"))
N = int(os.environ.get("N", "14336"))
STEPS = int(os.environ.get("STEPS", "1024"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def mintime(fn, *a, n=3):
    float(fn(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _dense_kernel(x_ref, w_ref, o_ref, acc_ref, *, nk):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bk", "bn"))
def pallas_mxu(x, w, bk=512, bn=2048):
    m, k = x.shape
    _, n = w.shape
    nk = k // bk
    return pl.pallas_call(
        functools.partial(_dense_kernel, nk=nk),
        grid=(n // bn, nk),
        in_specs=[
            pl.BlockSpec((m, bk), lambda ni, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda ni, ki: (0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=k * n * 2 + m * k * 2 + m * n * 2,
            transcendentals=0),
    )(x, w)


def _dense_vpu_kernel(x_ref, w_ref, o_ref, acc_ref, *, nk, bk, m):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:].astype(jnp.float32)              # (bk, bn)
    # Broadcast-FMA: for each row r, acc[r] += sum_k x[r,k] * w[k,:].
    # Sublane reduction via per-row multiply + sum.
    for r in range(m):
        xr = x_ref[r, :].astype(jnp.float32)[:, None]   # (bk, 1)
        acc_ref[r, :] += jnp.sum(w * xr, axis=0)

    @pl.when(ki == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bk", "bn"))
def pallas_vpu(x, w, bk=512, bn=2048):
    m, k = x.shape
    _, n = w.shape
    nk = k // bk
    return pl.pallas_call(
        functools.partial(_dense_vpu_kernel, nk=nk, bk=bk, m=m),
        grid=(n // bn, nk),
        in_specs=[
            pl.BlockSpec((m, bk), lambda ni, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda ni, ki: (0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
    )(x, w)


def main():
    @jax.jit
    def null(x):
        return x.sum()

    floor = min(mintime(null, jnp.ones((8,)), n=6) for _ in range(2))
    log(f"floor {floor*1e3:.1f} ms; stream bound "
        f"{K*N*2/1.6e12*1e6:.1f} us")

    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)

    def chain(callable_):
        @jax.jit
        def run(x):
            def body(x, _):
                y = callable_(x, w)          # (M, N)
                x = x + y[:, :1].astype(x.dtype) * 1e-6
                return x, ()
            x, _ = jax.lax.scan(body, x, None, length=STEPS)
            return x.astype(jnp.float32).sum()
        return run

    variants = {
        "xla": lambda x, w: x @ w,
        "xla_f32acc": lambda x, w: jnp.matmul(
            x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        "pallas_mxu_512x2048": lambda x, w: pallas_mxu(x, w, 512, 2048),
        "pallas_mxu_1024x2048": lambda x, w: pallas_mxu(x, w, 1024, 2048),
        "pallas_mxu_2048x1024": lambda x, w: pallas_mxu(x, w, 2048, 1024),
        "pallas_vpu_512x2048": lambda x, w: pallas_vpu(x, w, 512, 2048),
    }
    # correctness first
    want = jnp.matmul(x0, w, preferred_element_type=jnp.float32)
    for name, fn in variants.items():
        got = fn(x0, w).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
        t = (mintime(chain(fn), x0) - floor) / STEPS
        bw = K * N * 2 / t / 1e12
        log(f"{name:22s} err={err:.4f}  {t*1e6:7.1f} us  {bw:.2f} TB/s")


if __name__ == "__main__":
    main()
