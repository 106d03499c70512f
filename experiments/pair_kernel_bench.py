"""On-chip A/B: pair-packed vs one-column VPU delta kernel at decode
shapes (Mistral-7B mlp matmul: K=4096, N=14336, T=B=8)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from bitdelta_tpu.core.delta import BinaryDelta, pair_delta
from bitdelta_tpu.ops.pallas_binary_gemm import (
    tenant_delta_matmul_pair_pallas, tenant_delta_matmul_pallas)

T = B = int(os.environ.get("T", "8"))
K = int(os.environ.get("K", "4096"))
N = int(os.environ.get("N", "14336"))
STEPS = 256
TRIALS = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    key = jax.random.PRNGKey(0)
    packed = jax.random.randint(key, (T, K // 32, N), -2**31, 2**31 - 1,
                                jnp.int32)
    scales = jnp.full((T,), 0.01, jnp.float32)
    ids = jnp.arange(B, dtype=jnp.int32)
    pd = pair_delta(BinaryDelta(packed=packed, scale=scales))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, K), jnp.bfloat16)

    def chain(fn):
        @jax.jit
        def run(x):
            def body(x, _):
                y = fn(x)
                # feed a slice of y back into x so steps are dependent
                x = x + y[:, :K].astype(x.dtype) * jnp.bfloat16(1e-6)
                return x, ()
            x, _ = jax.lax.scan(body, x, None, length=STEPS)
            return x.sum()
        return run

    variants = {
        "one_col": chain(lambda x: tenant_delta_matmul_pallas(
            x, packed, scales, ids, out_dtype=jnp.float32)),
        "pair": chain(lambda x: tenant_delta_matmul_pair_pallas(
            x, pd.packed_pairs, pd.colsum, scales, ids,
            out_dtype=jnp.float32)),
    }
    results = {}
    for name, run in variants.items():
        v = float(run(x0))  # compile + first
        ts = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            v = float(run(x0))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / STEPS
        rate = B * K * N / per
        results[name] = per
        log(f"{name:8s}: {per*1e6:9.1f} us/call  "
            f"{rate/1e9:7.1f} G unpacked-elem/s  (checksum {v:.3e})")
    log(f"speedup pair vs one_col: {results['one_col']/results['pair']:.2f}x")


if __name__ == "__main__":
    main()
