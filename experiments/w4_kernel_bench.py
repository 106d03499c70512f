"""On-chip numerics + A/B for the Pallas W4 base-matmul kernel
(ops/pallas_int4.py) at the decode shape that dominates the W4 density
step (Mistral-7B mlp matmul: K=4096, N=14336, M=8 rows).

Rows (chained, floor-corrected per BENCHNOTES methodology):
  xla_einsum : research/quantized_base.int4_matmul — the deployed path,
               ~58 ms of the measured 140 ms 32L/T8 density step;
  w4_pallas  : the new kernel (in-VMEM nibble unpack + group-scaled
               partial dots);
  int8_xla   : Int8Weight matmul yardstick (HBM roofline, 2x bf16);
  bf16_xla   : dense bf16 matmul yardstick (HBM roofline).

Numerics: compiled w4_pallas vs int4_matmul (same group math — must
agree to accumulation order) and vs the dense dequantized product.
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

from bitdelta_tpu.ops.pallas_int4 import w4_matmul_pallas
from bitdelta_tpu.research.quantized_base import (
    Int8Weight, dequantize_int4, int4_matmul, int8_matmul, quantize_int4)

INTERP = jax.default_backend() != "tpu"  # CPU smoke: interpret mode
# CPU's dot thunk lacks bf16 x bf16 -> f32; f32 there (smoke only).
CDTYPE = jnp.float32 if INTERP else jnp.bfloat16
M = int(os.environ.get("M", "8"))
K = int(os.environ.get("K", "4096"))
N = int(os.environ.get("N", "14336"))
STEPS = int(os.environ.get("STEPS", "256"))
TRIALS = int(os.environ.get("TRIALS", "4"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def measure_floor():
    """The bench harness's floor measurement (single methodology — if
    the BENCHNOTES floor-correction recipe changes there, these numbers
    stay comparable to bench-produced rows)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    return bench.measure_floor()


def main():
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    # Weight values on-device (host transfer of 117 MB would take minutes).
    wdense = jax.random.normal(keys[0], (K, N), jnp.float32) * 0.02
    q4 = quantize_int4(wdense)
    q8 = Int8Weight(
        q=jax.random.randint(keys[1], (K, N), -127, 128, jnp.int8),
        scale=jnp.full((N,), 2e-4, jnp.float32))
    wbf = jax.random.normal(keys[2], (K, N), CDTYPE) * 0.02
    x0 = jax.random.normal(keys[3], (M, K), CDTYPE)

    # --- compiled numerics (CLAUDE.md kernel convention) ---
    xs = jax.random.normal(keys[4], (M, K), jnp.float32)
    got = np.asarray(w4_matmul_pallas(xs, q4.packed, q4.scale,
                                      interpret=INTERP,
                                      out_dtype=jnp.float32))
    want = np.asarray(int4_matmul(xs, q4, compute_dtype=jnp.float32))
    dense = np.asarray(xs @ dequantize_int4(q4, jnp.float32))
    rel_xla = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    rel_dense = np.abs(got - dense).max() / max(np.abs(dense).max(), 1e-9)
    log(f"numerics: rel vs int4_matmul {rel_xla:.2e}, "
        f"rel vs dense fusion {rel_dense:.2e}")
    assert rel_xla < 5e-3 and rel_dense < 5e-3, (rel_xla, rel_dense)

    floor = measure_floor()
    log(f"floor {floor*1e3:.1f} ms")

    def chain(fn):
        @jax.jit
        def run(x):
            def body(x, _):
                y = fn(x)
                x = x + y[:, :K].astype(x.dtype) * jnp.bfloat16(1e-6)
                return x, ()
            x, _ = jax.lax.scan(body, x, None, length=STEPS)
            return x.sum()
        return run

    variants = {
        "xla_einsum": chain(lambda x: int4_matmul(
            x, q4, compute_dtype=CDTYPE, out_dtype=jnp.float32)),
        "w4_pallas": chain(lambda x: w4_matmul_pallas(
            x, q4.packed, q4.scale, interpret=INTERP,
            out_dtype=jnp.float32)),
        "int8_xla": chain(lambda x: int8_matmul(
            x, q8, compute_dtype=CDTYPE).astype(jnp.float32)),
        "bf16_xla": chain(lambda x: jnp.matmul(
            x, wbf, preferred_element_type=jnp.float32)),
    }
    results = {}
    for name, run in variants.items():
        t0 = time.time()
        v = float(run(x0))
        c1 = time.time() - t0
        ts = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            v = float(run(x0))
            ts.append(time.perf_counter() - t0)
        per = max(min(ts) - floor, 1e-9) / STEPS
        results[name] = per
        log(f"{name:10s}: {per*1e6:9.1f} us/call  "
            f"{K*N/per/1e9:7.1f} G weight-elem/s  "
            f"(compile+first {c1:.0f}s, checksum {v:.3e})")
    log(f"w4_pallas vs xla_einsum: "
        f"{results['xla_einsum']/results['w4_pallas']:.2f}x; "
        f"vs int8 yardstick: "
        f"{results['w4_pallas']/results['int8_xla']:.2f}x int8's time")
    import json
    print(json.dumps({k: v for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
