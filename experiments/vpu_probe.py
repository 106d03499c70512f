"""VPU formulation probe for the 1-bit delta bit-plane kernel.

Measures, on the real chip, unpacked-elements/second for candidate
formulations of `sum_s bit(p, s) * x_s` (the inner loop of
bitdelta_tpu/ops/pallas_binary_gemm.py::_tenant_delta_kernel), to decide
whether i16 double-pumping / bf16 FMA / incremental shifts beat the
current 4-op i32 formulation (BENCHNOTES.md "ideas not yet exhausted").

Each variant runs a Pallas kernel whose body repeats the full plane loop
REPS times on a VMEM-resident tile with a data dependence between
repetitions (accumulator feeds back), then we chain CHAIN kernel calls
inside one jit via lax.scan. Timing = host readback of one scalar
(the only reliable sync through the relay; see CLAUDE.md).
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

W, BN = 128, 512          # packed words tile: (W, BN); 32*W unpacked K rows
REPS = 512                # plane-loop repetitions inside the kernel
CHAIN = 64                # kernel calls chained in one jit
TRIALS = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


# --- variant bodies: (p_tile, xq_tile, acc) -> acc ------------------------

def body_i32_mul(p, xq, acc):
    # current formulation: 4 ops / unpacked element
    for s in range(32):
        plane = (p >> s) & 1
        acc += plane * xq[:, s][:, None]
    return acc


def body_i32_incr(p, xq, acc):
    # incremental left shift + arithmetic sign-bit mask + and + add
    q = p
    for s in range(31, -1, -1):
        m = q >> 31                      # arithmetic: 0 or -1 (bit 31)
        acc += m & xq[:, s][:, None]
        q = q << 1
    return acc


def body_i16_mul(p16, xq16, acc16):
    # i16 formulation (16 planes per word); 2x if the VPU double-pumps
    # 16-bit lanes. arith.shrsi doesn't legalize on i16 vectors, so
    # extract via mask-compare-select instead of shift-and.
    for s in range(16):
        mask = (1 << s) if s < 15 else -(1 << 15)  # 0x8000 as signed i16
        bit = (p16 & jnp.int16(mask)) != jnp.int16(0)
        acc16 += jnp.where(bit, xq16[:, s][:, None], jnp.int16(0))
    return acc16


def body_bf16_fma(p, xbf, accf):
    # extract in i32, convert to bf16, FMA in bf16
    for s in range(32):
        plane = ((p >> s) & 1).astype(jnp.bfloat16)
        accf += plane * xbf[:, s][:, None]
    return accf


def body_f32_fma(p, xf, accf):
    for s in range(32):
        plane = ((p >> s) & 1).astype(jnp.float32)
        accf += plane * xf[:, s][:, None]
    return accf


def body_pair_mul(p, xq, acc):
    # pair-packed: each word holds 16 K-bits for TWO output columns
    # (low/high 16-bit halves). One shift+and+mul+add handles 2 unpacked
    # elements; halves can't cross-carry because per-word accumulation of
    # 16 planes of 11-bit non-negative xq stays < 2^16.
    for s in range(16):
        pair = (p >> s) & 0x00010001
        acc += pair * xq[:, s][:, None]
    return acc


def body_pair_split(p, xq, acc):
    # pair formulation + the real epilogue costs (half split + reduce)
    inner = jnp.zeros(p.shape, jnp.int32)
    for s in range(16):
        pair = (p >> s) & 0x00010001
        inner += pair * xq[:, s][:, None]
    lo = inner & 0xFFFF
    hi = jax.lax.shift_right_logical(inner, 16)
    return acc + lo + hi


def body_pair_fullx(p, xq, acc):
    # pair formulation with a full-tile x operand (wrong math): isolates
    # the per-plane (W,1)->(W,BN) lane-broadcast cost. xq here is fed as
    # an independent (W, BN) array (see run_variant special case).
    for s in range(16):
        pair = (p >> s) & 0x00010001
        acc += pair * xq
    return acc


def body_pair_nobc(p, xq, acc):
    # diagnostic: no per-plane lane-broadcast (wrong math) — isolates the
    # cost of broadcasting xq[:, s] across lanes each plane.
    xconst = acc ^ 3  # (W, BN)-shaped data dep, 1 op
    for s in range(16):
        pair = (p >> s) & 0x00010001
        acc += pair * xconst
    return acc


def body_pair_mul2(p, xq, acc):
    # pair formulation with TWO independent accumulator chains: breaks
    # the loop-carried add dependency (the plane loop's adds serialize
    # on `inner` — suspected issue-rate limiter behind the measured
    # 2.6 effective ops/elem vs the 2.0 op-count floor). Each chain
    # accumulates 8 planes <= 8*4095 < 2^15; the final combine stays
    # < 2^16 per half, so the modular split is still exact.
    a0 = jnp.zeros_like(acc)
    a1 = jnp.zeros_like(acc)
    for s in range(0, 16, 2):
        a0 += ((p >> s) & 0x00010001) * xq[:, s][:, None]
        a1 += ((p >> (s + 1)) & 0x00010001) * xq[:, s + 1][:, None]
    return acc + a0 + a1


def body_pair_mul4(p, xq, acc):
    # four chains (register-pressure risk: grouped-row probe showed two
    # live (W, BN) accumulators already hurt in a DIFFERENT shape)
    chains = [jnp.zeros_like(acc) for _ in range(4)]
    for s in range(16):
        chains[s % 4] = chains[s % 4] + (
            ((p >> s) & 0x00010001) * xq[:, s][:, None])
    return acc + ((chains[0] + chains[1]) + (chains[2] + chains[3]))


VARIANTS = {
    "i32_mul": (body_i32_mul, jnp.int32, jnp.int32, 32),
    "pair_mul": (body_pair_mul, jnp.int32, jnp.int32, 32),
    "pair_mul2": (body_pair_mul2, jnp.int32, jnp.int32, 32),
    "pair_mul4": (body_pair_mul4, jnp.int32, jnp.int32, 32),
    "pair_split": (body_pair_split, jnp.int32, jnp.int32, 32),
    "pair_nobc": (body_pair_nobc, jnp.int32, jnp.int32, 32),
    "pair_fullx": (body_pair_fullx, jnp.int32, jnp.int32, 32),
    "i32_incr": (body_i32_incr, jnp.int32, jnp.int32, 32),
    "i16_mul": (body_i16_mul, jnp.int16, jnp.int16, 16),
    "bf16_fma": (body_bf16_fma, jnp.int32, jnp.bfloat16, 32),
    "f32_fma": (body_f32_fma, jnp.int32, jnp.float32, 32),
}


def run_variant(name):
    body, pdtype, xdtype, nbits = VARIANTS[name]
    accdtype = xdtype if xdtype != jnp.int16 else jnp.int16

    def kernel(p_ref, x_ref, o_ref):
        p = p_ref[:]
        xq = x_ref[:]
        acc = jnp.zeros((p.shape[0], p.shape[1]), accdtype)

        def rep(i, acc):
            a = body(p, xq, acc)
            # fold the iteration index in so reps can't be collapsed
            return a + i.astype(accdtype)
        acc = jax.lax.fori_loop(0, REPS, rep, acc)
        o_ref[:] = acc.astype(o_ref.dtype)

    key = jax.random.PRNGKey(0)
    if name == "pair_fullx":
        p = jax.random.randint(key, (W, BN), -2**31, 2**31 - 1, jnp.int32)
        x = jax.random.randint(jax.random.PRNGKey(1), (W, BN), 0, 4095,
                               jnp.int32)
    elif pdtype == jnp.int16:
        p = jax.random.randint(key, (W, BN), -2**15, 2**15 - 1,
                               jnp.int32).astype(jnp.int16)
        x = jax.random.randint(jax.random.PRNGKey(1), (W, nbits), 0, 63,
                               jnp.int32).astype(jnp.int16)
    else:
        p = jax.random.randint(key, (W, BN), -2**31, 2**31 - 1, jnp.int32)
        if xdtype == jnp.int32:
            x = jax.random.randint(jax.random.PRNGKey(1), (W, nbits), 0,
                                   16383, jnp.int32)
        else:
            x = jax.random.normal(jax.random.PRNGKey(1), (W, nbits),
                                  xdtype)

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, BN), jnp.float32),
    )

    @jax.jit
    def chained(p, x):
        def step(carry, _):
            out = call(p + carry.astype(p.dtype)[:1, :1].astype(p.dtype),
                       x)
            return out[:1, :1].astype(jnp.int32), out.sum()
        _, outs = jax.lax.scan(step, jnp.zeros((1, 1), jnp.int32), None,
                               length=CHAIN)
        return outs.sum()

    v = float(chained(p, x))  # compile + first run
    ts = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        v = float(chained(p, x))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    unpacked = W * BN * nbits * REPS * CHAIN
    rate = unpacked / t
    log(f"{name:10s}: {t*1e3:8.2f} ms  -> {rate/1e9:7.2f} G unpacked-elem/s"
        f"  (checksum {v:.3e})")
    return rate


def main():
    log(f"backend: {jax.default_backend()}  tile=({W},{BN}) reps={REPS} "
        f"chain={CHAIN}")
    names = sys.argv[1:] or list(VARIANTS)
    results = {}
    for name in names:
        try:
            results[name] = run_variant(name)
        except Exception as e:  # noqa: BLE001 - probe must survive variants
            log(f"{name:10s}: FAILED ({type(e).__name__}: {e})")
    if "i32_mul" in results:
        base = results["i32_mul"]
        for k, r in results.items():
            log(f"  {k}: {r / base:.2f}x vs i32_mul")


if __name__ == "__main__":
    main()
