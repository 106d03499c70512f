"""On-chip A/B: fused base+pair decode kernel vs the serial composition
(XLA base matmul, then the pair-packed VPU delta kernel).

The decode hot path runs base (HBM-bound, ~157 us per 117 MB matmul) and
delta (VPU-bound, ~297 us at T=8 mlp) serially; the fused kernel streams
the base weight while the VPU chews bit-planes — projected up to ~1.5x
per projection (BENCHNOTES.md "Ideas"). Also sweeps lane_block (the
ADVICE-flagged narrow-block DMA tradeoff) and runs a compiled numerics
check (CLAUDE.md rule: every kernel needs an on-chip numerics check).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from bitdelta_tpu.core.delta import BinaryDelta, pair_delta
from bitdelta_tpu.ops.pallas_binary_gemm import (
    fused_base_pair_matmul_pallas, tenant_delta_matmul_pair_pallas)

T = B = int(os.environ.get("T", "8"))
STEPS = int(os.environ.get("STEPS", "256"))
TRIALS = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


def measure_floor():
    @jax.jit
    def null(x):
        return x.sum()
    x = jnp.ones((8,), jnp.float32)
    float(null(x))
    outs = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(null(x))
        outs.append(time.perf_counter() - t0)
    return min(outs)


def bench_shape(k, n, floor):
    log(f"--- shape K={k} N={n} T=B={T} ---")
    packed = jax.random.randint(jax.random.PRNGKey(0), (T, k // 32, n),
                                -2**31, 2**31 - 1, jnp.int32)
    scales = jnp.full((T,), 0.01, jnp.float32)
    ids = jnp.arange(B, dtype=jnp.int32)
    pd = pair_delta(BinaryDelta(packed=packed, scale=scales))
    w = (jax.random.normal(jax.random.PRNGKey(2), (k, n), jnp.float32)
         * 0.02).astype(jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, k), jnp.bfloat16)

    # Compiled numerics: fused vs serial on the same inputs.
    def serial_once(x):
        yb = jnp.matmul(x, w, preferred_element_type=jnp.float32)
        yd = tenant_delta_matmul_pair_pallas(
            x, pd.packed_pairs, pd.colsum, scales, ids,
            out_dtype=jnp.float32)
        return yb + yd

    want = np.asarray(jax.jit(serial_once)(x0))
    got = np.asarray(fused_base_pair_matmul_pallas(
        x0, w, pd.packed_pairs, pd.colsum, scales, ids,
        out_dtype=jnp.float32))
    rel = (np.abs(got - want).max()
           / max(np.abs(want).max(), 1e-9))
    log(f"  compiled numerics: max rel err {rel:.2e} "
        f"{'OK' if rel < 2e-2 else 'FAIL'}")

    def chain(fn):
        kn = min(k, n)

        @jax.jit
        def run(x):
            def body(x, _):
                y = fn(x)
                x = x.at[:, :kn].add(y[:, :kn].astype(x.dtype)
                                     * jnp.bfloat16(1e-6))
                return x, ()
            x, _ = jax.lax.scan(body, x, None, length=STEPS)
            return x.sum()
        return run

    variants = {"serial": chain(serial_once)}
    nhalf = n // 2
    for lb in (128, 256, 512, 1024):
        if nhalf % lb == 0:
            variants[f"fused_lb{lb}"] = chain(
                lambda x, lb=lb: fused_base_pair_matmul_pallas(
                    x, w, pd.packed_pairs, pd.colsum, scales, ids,
                    out_dtype=jnp.float32, lane_block=lb))

    results = {}
    for name, run in variants.items():
        v = float(run(x0))  # compile + first
        ts = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            v = float(run(x0))
            ts.append(time.perf_counter() - t0)
        per = max(min(ts) - floor, 1e-9) / STEPS
        results[name] = per
        log(f"  {name:12s}: {per*1e6:9.1f} us/call  (checksum {v:.3e})")
    best = min((v, k_) for k_, v in results.items() if k_ != "serial")
    log(f"  best fused: {best[1]} -> {results['serial']/best[0]:.3f}x "
        f"vs serial")
    return results


def main():
    log(f"devices: {jax.devices()}")
    floor = measure_floor()
    log(f"null-call floor: {floor*1e3:.1f} ms (subtracted)")
    bench_shape(4096, 14336, floor)   # gate/up_proj (mlp)
    bench_shape(14336, 4096, floor)   # down_proj
    bench_shape(4096, 4096, floor)    # q/o_proj


if __name__ == "__main__":
    main()
