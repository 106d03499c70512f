"""Attribute ~100% of the multi-tenant decode step (VERDICT r4 item 8).

The bench's 16L/T6 step measures ~20 ms with vpu_frac ~0.69 — the gap
between 0.69 and 1.0 (~6 ms) was unitemized. This experiment builds the
EXACT bench world (W8 base + pair deltas + 1-bit compressed heads,
bench.build_serve_world shapes) and produces two views:

1. SUBTRACTIVE ladder — the full step with one component removed at a
   time (marginal cost, includes overlap effects):
     full, no_head_delta, no_proj_delta, no_delta(all), dense_head.
2. STANDALONE chains — each component at its exact step shapes in
   isolation (pure-rate cost, no overlap):
     base W8 matmuls, pair proj deltas, flash decode attention,
     shared lm_head matmul + lm_head pair delta. (The embed delta
     gather and norms/rotary/sampling are NOT separately chained —
     they are the printed glue residual.)

The BENCHNOTES table is: full == sum(standalone) - overlap_credit,
with the subtractive column naming each component's *marginal* price.

Usage (real chip): PYTHONPATH=/root/repo python experiments/step_attribution.py
CPU smoke: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu L=2 SHRINK=16 ...
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # the bench world builders ARE the spec being attributed
from bitdelta_tpu.models import llama

L = int(os.environ.get("L", "16"))
STEPS = int(os.environ.get("STEPS", "64"))
TRIALS = int(os.environ.get("TRIALS", "3"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("BENCH_SHRINK", os.environ.get("SHRINK", "1"))
    bench.NUM_LAYERS = L
    bench.STEPS = STEPS
    bench.TRIALS = TRIALS
    cfg = bench.build_cfg(L)
    T = bench.TENANTS
    backend = jax.default_backend()
    kernel = "pallas" if backend == "tpu" else "xla"
    tenant_ids = jnp.arange(T, dtype=jnp.int32)
    log(f"building bench serve world {L}L x {T}T on {backend} ...")
    params, deltas = bench.build_serve_world(cfg)

    def step_with(d):
        def fn(p, dd, tokens, cache):
            return llama.decode_step(cfg, p, tokens, cache, deltas=dd,
                                     tenant_ids=tenant_ids,
                                     compute_dtype=jnp.bfloat16,
                                     kernel=kernel)
        return fn

    results = {}

    def run_variant(name, d):
        run, tok0 = bench.make_chained(cfg, kernel, step_with(d), T)
        t, c1 = bench.timed(run, params, d, tok0)
        results[name] = t
        log(f"{name:16s}: {t*1e3:8.3f} ms/step (compile+first {c1:.0f}s)")
        return t

    # --- subtractive ladder ---
    proj_only = {k: v for k, v in deltas.items()
                 if k not in ("embed", "lm_head")}
    head_only = {k: v for k, v in deltas.items()
                 if k in ("embed", "lm_head")}
    t_full = run_variant("full", deltas)
    run_variant("no_head_delta", proj_only)   # marginal head-delta cost
    run_variant("no_proj_delta", head_only)   # marginal proj-delta cost
    run_variant("no_delta", None)             # marginal total delta cost

    # --- standalone component chains (pure rates, no overlap) ---
    floor = bench._FLOOR

    def chain_scalar(fn, x0, *ops):
        """Weights/deltas enter as jit ARGUMENTS (``*ops``), never as
        closure captures — captured multi-GB constants make the remote
        compile effectively never finish (BENCHNOTES, distillation)."""
        @jax.jit
        def run(x, *ops):
            def body(x, _):
                y = fn(x, *ops)
                # Row-scalar feedback keeps a real data dependency while
                # tolerating any output width.
                return x + (jnp.sum(y, axis=-1, keepdims=True)
                            * jnp.float32(1e-12)).astype(x.dtype), ()
            x, _ = jax.lax.scan(body, x, None, length=STEPS)
            return x.sum()
        float(run(x0, *ops))
        ts = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            float(run(x0, *ops))
            ts.append(time.perf_counter() - t0)
        return max(min(ts) - floor, 1e-9) / STEPS

    D = cfg.hidden_size
    lay = params["layers"]
    x0 = jax.random.normal(jax.random.PRNGKey(5), (T, D), jnp.bfloat16)

    def widen(h, k):
        """Width-k input derived from h (data-dependent, no reshapes of
        the weight)."""
        if k == D:
            return h
        reps = -(-k // D)
        return jnp.concatenate([h] * reps, axis=-1)[:, :k]

    def fold(h, y):
        return h + (jnp.sum(y, axis=-1, keepdims=True)
                    * jnp.float32(1e-12)).astype(h.dtype)

    # base W8 matmuls: all 7 projections, all L layers (scan over L).
    def base_all(x, lay_a):
        def layer(h, i):
            for name, (k, n) in bench.proj_shapes(cfg).items():
                w = jax.tree.map(lambda a: a[i], lay_a[name])
                h = fold(h, llama._base_matmul(widen(h, k), w,
                                               jnp.bfloat16))
            return h, ()
        h, _ = jax.lax.scan(layer, x, jnp.arange(L))
        return h
    proj_lay = {name: lay[name] for name in bench.proj_shapes(cfg)}
    results["standalone_base"] = chain_scalar(base_all, x0, proj_lay)
    log(f"standalone_base : {results['standalone_base']*1e3:8.3f} ms/step")

    # pair proj deltas: every projection's tenant kernel, all layers.
    from bitdelta_tpu.core.delta import PairedBinaryDelta
    from bitdelta_tpu.ops.pallas_binary_gemm import (
        tenant_delta_matmul_pair_pallas, tenant_delta_matmul_pallas)

    def delta_all(x, deltas_a):
        def layer(h, i):
            for name, (k, n) in bench.proj_shapes(cfg).items():
                d = jax.tree.map(lambda a: a[i], deltas_a[name])
                xin = widen(h, k)
                if kernel == "pallas":
                    if isinstance(d, PairedBinaryDelta):
                        y = tenant_delta_matmul_pair_pallas(
                            xin, d.packed_pairs, d.colsum, d.scale,
                            tenant_ids, out_dtype=jnp.float32)
                    else:
                        y = tenant_delta_matmul_pallas(
                            xin, d.packed, d.scale, tenant_ids,
                            out_dtype=jnp.float32)
                else:
                    from bitdelta_tpu.ops.binary_matmul import (
                        tenant_binary_matmul)
                    from bitdelta_tpu.ops.packing import unpair_packed
                    packed = (unpair_packed(d.packed_pairs)
                              if isinstance(d, PairedBinaryDelta)
                              else d.packed)
                    y = tenant_binary_matmul(xin[:, None], packed,
                                             d.scale, tenant_ids,
                                             compute_dtype=jnp.bfloat16
                                             )[:, 0]
                h = fold(h, y)
            return h, ()
        h, _ = jax.lax.scan(layer, x, jnp.arange(L))
        return h
    results["standalone_proj_delta"] = chain_scalar(delta_all, x0,
                                                    proj_only)
    log(f"standalone_proj_delta: "
        f"{results['standalone_proj_delta']*1e3:8.3f} ms/step")

    # shared lm_head matmul + its pair delta (the per-step head cost).
    def head(x, wlm, dlm):
        y = jnp.matmul(x, wlm, preferred_element_type=jnp.float32)
        if kernel == "pallas":
            yd = tenant_delta_matmul_pair_pallas(
                x, dlm.packed_pairs, dlm.colsum, dlm.scale, tenant_ids,
                out_dtype=jnp.float32)
        else:
            from bitdelta_tpu.ops.binary_matmul import tenant_binary_matmul
            from bitdelta_tpu.ops.packing import unpair_packed
            yd = tenant_binary_matmul(x[:, None],
                                      unpair_packed(dlm.packed_pairs),
                                      dlm.scale, tenant_ids,
                                      compute_dtype=jnp.bfloat16)[:, 0]
        return (y + yd)
    results["standalone_head"] = chain_scalar(head, x0, params["lm_head"],
                                              deltas["lm_head"])
    log(f"standalone_head : {results['standalone_head']*1e3:8.3f} ms/step")

    # flash decode attention at the step's exact cache shape.
    cache = llama.init_cache(cfg, T, bench.MAX_SEQ, jnp.bfloat16)
    cache = cache._replace(length=jnp.full((T,), 32, jnp.int32))
    qkv = jax.random.normal(jax.random.PRNGKey(6),
                            (T, 1, cfg.num_heads, cfg.head_dim),
                            jnp.bfloat16)

    if kernel == "pallas":
        from bitdelta_tpu.ops.flash_decode import flash_decode_attention

        @jax.jit
        def attn_chain(q, k, v, lengths):
            def body(q, _):
                o = flash_decode_attention(
                    q, k, v, lengths,
                    window=cfg.sliding_window or bench.MAX_SEQ)
                return q + o * jnp.bfloat16(1e-6), ()
            q, _ = jax.lax.scan(body, q, None, length=STEPS * L)
            return q.sum()

        kb = cache.k[0]
        vb = cache.v[0]
        float(attn_chain(qkv[:, 0], kb, vb, cache.length))
        ts = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            float(attn_chain(qkv[:, 0], kb, vb, cache.length))
            ts.append(time.perf_counter() - t0)
        results["standalone_attn"] = \
            max(min(ts) - floor, 1e-9) / STEPS  # already x L inside
        log(f"standalone_attn : {results['standalone_attn']*1e3:8.3f} "
            f"ms/step (flash, {L} layers)")

    # --- the table ---
    comp = sum(results.get(k, 0.0) for k in
               ("standalone_base", "standalone_proj_delta",
                "standalone_head", "standalone_attn"))
    glue = t_full - comp
    log("--- attribution (ms/step) ---")
    for k, v in results.items():
        log(f"{k:22s} {v*1e3:8.3f}  ({v/t_full*100:5.1f}% of full)")
    log(f"{'sum(standalone)':22s} {comp*1e3:8.3f}  "
        f"({comp/t_full*100:5.1f}%)")
    log(f"{'glue+overlap residual':22s} {glue*1e3:8.3f}  "
        f"({glue/t_full*100:5.1f}%)")
    print(json.dumps({k: v for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
