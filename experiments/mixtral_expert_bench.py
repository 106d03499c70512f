"""Mixtral routed expert-delta decode cost on real hardware.

Measures the three formulations of the per-(row, expert) 1-bit delta at
decode shapes (VERDICT r2 item 2 — the old path materialized dense
(B, E, K, N) signs, the class of XLA path BENCHNOTES measured at ~12x
the kernel cost):

  routed_pair      — models/mixtral.py's deployed path: (tenant, expert)
                     flattened into the pair VPU kernel's stack axis,
                     B*top_k routed rows (work scales with top_k, not E).
  routed_canonical — same routing through the one-column bit-plane kernel.
  xla_dense        — the old dense-sign einsum (set XLA_DENSE=1; at full
                     width it stages a ~5.6 GB sign tensor — shrink
                     first), evaluated over ALL E experts.
  llama_ref        — the llama gate_proj pair-kernel call at the same
                     per-element work, the "within ~2x" yardstick.

Env: SHRINK (divide K/N), T (tenants), TOPK, STEPS, TRIALS.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from bitdelta_tpu.core.delta import BinaryDelta, pair_delta

SHRINK = int(os.environ.get("SHRINK", "1"))
T = int(os.environ.get("T", "6"))
E = 8
TOPK = int(os.environ.get("TOPK", "2"))
K = 4096 // SHRINK
N = 14336 // SHRINK // 256 * 256
STEPS = int(os.environ.get("STEPS", "512"))
TRIALS = int(os.environ.get("TRIALS", "3"))
XLA_DENSE = os.environ.get("XLA_DENSE", "0") == "1"


def log(m):
    print(m, file=sys.stderr, flush=True)


_FLOOR = None


def _measure_floor():
    """Null jit-call + readback cost through the relay (CLAUDE.md
    measurement rule: floor-correct AND chain, else the 30-140 ms
    round-trip inflates per-step numbers)."""
    @jax.jit
    def null(x):
        return x.sum()
    x = jnp.ones((8,), jnp.float32)
    float(null(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(null(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _timeit(run, x0, ops, work_elems):
    global _FLOOR
    if _FLOOR is None:
        _FLOOR = _measure_floor()
        log(f"null-call floor: {_FLOOR*1e3:.1f} ms (subtracted)")
    v = float(run(x0, *ops))  # compile + first call
    ts = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        v = float(run(x0, *ops))
        ts.append(time.perf_counter() - t0)
    per = max(min(ts) - _FLOOR, 1e-9) / STEPS
    log(f"  {per*1e6:9.1f} us/call  {work_elems/per/1e9:8.2f} "
        f"G unpacked-elem/s  (checksum {v:.3e})")
    return per


def chain(fn):
    """Chained-steps runner. The big operands are jit ARGUMENTS (a
    closure would embed the multi-hundred-MB packed stacks as program
    constants — the relay's remote compiler rejects the body with
    HTTP 413)."""
    @jax.jit
    def run(x, *ops):
        def body(x, _):
            y = fn(x, *ops)
            x = x + y[..., :K].astype(x.dtype) * jnp.bfloat16(1e-6)
            return x, ()
        x, _ = jax.lax.scan(body, x, None, length=STEPS)
        return x.sum()
    return run


def numerics_check():
    """Compiled parity of the routed kernels vs the XLA lowering at a
    small shape (CLAUDE.md kernel rule: interpret-mode tests AND a
    compiled check on the real chip)."""
    import numpy as np

    from bitdelta_tpu.ops.binary_matmul import tenant_binary_matmul
    from bitdelta_tpu.ops.pallas_binary_gemm import (
        tenant_delta_matmul_pair_pallas, tenant_delta_matmul_pallas)

    key = iter(jax.random.split(jax.random.PRNGKey(42), 4))
    G, Kc, Nc, R = 12, 512, 512, 8
    packed = jax.random.bits(next(key), (G, Kc // 32, Nc),
                             jnp.uint32).astype(jnp.int32)
    scales = 0.01 + 0.002 * jnp.arange(G, dtype=jnp.float32)
    ids = (jnp.arange(R, dtype=jnp.int32) * 5) % G
    x = jax.random.normal(next(key), (R, Kc), jnp.bfloat16)
    want = tenant_binary_matmul(x[:, None, :], packed, scales, ids,
                                compute_dtype=jnp.float32)[:, 0]
    d = BinaryDelta(packed=packed, scale=scales)
    pd = pair_delta(d)
    got_p = tenant_delta_matmul_pair_pallas(
        x, pd.packed_pairs, pd.colsum, pd.scale, ids,
        out_dtype=jnp.float32)
    got_c = tenant_delta_matmul_pallas(x, packed, scales, ids,
                                       out_dtype=jnp.float32)
    for name, got in (("pair", got_p), ("canonical", got_c)):
        rel = float(jnp.max(jnp.abs(got - want))
                    / jnp.max(jnp.abs(want)))
        assert rel < 3e-3, (name, rel)
        log(f"  compiled {name} kernel == XLA on routed stack "
            f"(rel {rel:.1e})")


def main():
    key = iter(jax.random.split(jax.random.PRNGKey(0), 16))
    log(f"backend={jax.default_backend()} T={T} E={E} topk={TOPK} "
        f"K={K} N={N}")
    numerics_check()

    # (T*E) flattened expert-delta stack for one w1-shaped matrix.
    packed = jax.random.bits(next(key), (T * E, K // 32, N), jnp.uint32) \
        .astype(jnp.int32)
    stack = BinaryDelta(packed=packed,
                        scale=jnp.full((T * E,), 0.01, jnp.float32))
    pstack = pair_delta(stack)
    # Routed ids: batch row b -> tenant b, experts (b, b+3) % E.
    rows = jnp.arange(T * TOPK) // TOPK
    experts = (rows + 3 * (jnp.arange(T * TOPK) % TOPK)) % E
    flat_ids = (rows * E + experts).astype(jnp.int32)
    x0 = jax.random.normal(next(key), (T * TOPK, K), jnp.bfloat16)
    routed_work = T * TOPK * K * N

    from bitdelta_tpu.ops.pallas_binary_gemm import (
        tenant_delta_matmul_pair_pallas, tenant_delta_matmul_pallas)

    log(f"routed_pair       ({T * TOPK} rows, stack {T * E}):")
    t_pair = _timeit(
        chain(lambda x, pp, cs, sc, ids: tenant_delta_matmul_pair_pallas(
            x, pp, cs, sc, ids, out_dtype=jnp.float32)),
        x0, (pstack.packed_pairs, pstack.colsum, pstack.scale, flat_ids),
        routed_work)

    log("routed_canonical:")
    _timeit(
        chain(lambda x, p, sc, ids: tenant_delta_matmul_pallas(
            x, p, sc, ids, out_dtype=jnp.float32)),
        x0, (stack.packed, stack.scale, flat_ids), routed_work)

    # llama yardstick: same kernel, T rows / T-stack (gate_proj serving
    # shape) — per-element rates should be within ~2x.
    lstack = pair_delta(BinaryDelta(
        packed=packed[:T], scale=jnp.full((T,), 0.01, jnp.float32)))
    xl = jax.random.normal(next(key), (T, K), jnp.bfloat16)
    log(f"llama_ref         ({T} rows, stack {T}):")
    t_ref = _timeit(
        chain(lambda x, pp, cs, sc, ids: tenant_delta_matmul_pair_pallas(
            x, pp, cs, sc, ids, out_dtype=jnp.float32)),
        xl, (lstack.packed_pairs, lstack.colsum, lstack.scale,
             jnp.arange(T, dtype=jnp.int32)), T * K * N)

    per_elem_routed = t_pair / routed_work
    per_elem_ref = t_ref / (T * K * N)
    log(f"routed-vs-llama per-element ratio: "
        f"{per_elem_routed / per_elem_ref:.2f}x (target < ~2x)")

    if XLA_DENSE:
        from bitdelta_tpu.ops.packing import unpack_to_pm1

        tenant_ids = rows[::TOPK].astype(jnp.int32)  # (T,) one per row
        packed4 = packed.reshape(T, E, K // 32, N)
        xd = jax.random.normal(next(key), (T, K), jnp.bfloat16)

        def dense(x, p4, ids):
            p = jnp.take(p4, ids, axis=0)
            signs = unpack_to_pm1(p, jnp.bfloat16)      # (T, E, K, N)
            return jnp.einsum("bd,bedn->ben", x, signs,
                              preferred_element_type=jnp.float32) * 0.01
        log(f"xla_dense         ({T} rows x ALL {E} experts):")
        _timeit(chain(lambda x, p4, ids: dense(x, p4, ids)
                      .reshape(T, -1)),
                xd, (packed4, tenant_ids), T * E * K * N)


if __name__ == "__main__":
    main()
