"""Headline benchmark: multi-tenant 1-bit-delta decode vs naive serving.

Measures, on real hardware, the serving decomposition behind the
reference's headline claims (~2x batched 1-bit delta GEMM vs naive
per-model forward; docs/index.html:394-404, README.md:17):

  ours  = one decode step for T tenants: shared W16 base (XLA, HBM
          roofline at small M) + per-row 1-bit delta (Pallas VPU
          bit-plane kernel) + per-tenant embed/norms/head.
  naive = each tenant decoded through its own dense W16 model
          (batch 1 per tenant — what you must do without BitDelta),
          measured as T x a single-model decode step.

Model: Mistral-7B cross-section (hidden 4096, inter 14336, GQA 8),
reduced to NUM_LAYERS so base + T tenants + the naive dense model fit
one chip; per-layer traffic matches the full model.

Timing: this environment's device tunnel makes ``block_until_ready``
unreliable and adds 30-100ms jitter per host round-trip, so each
measurement chains BENCH_STEPS decode steps *inside one jit* (token and
cache feed back step-to-step) and fetches a single scalar; per-step time
= total / steps, min over trials. See BENCHNOTES.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
value = measured speedup and vs_baseline = value / 2.0 (the reference's
reported ~2x).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bitdelta_tpu.core.delta import BinaryDelta
from bitdelta_tpu.models.config import ModelConfig
from bitdelta_tpu.models import llama

NUM_LAYERS = int(os.environ.get("BENCH_LAYERS", "8"))
TENANTS = int(os.environ.get("BENCH_TENANTS", "8"))  # reference ablation B=8
STEPS = int(os.environ.get("BENCH_STEPS", "64"))
TRIALS = int(os.environ.get("BENCH_TRIALS", "3"))
MAX_SEQ = 256
REFERENCE_SPEEDUP = 2.0  # docs/index.html:394-404


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def proj_shapes(cfg):
    return {
        "q_proj": (cfg.hidden_size, cfg.q_dim),
        "k_proj": (cfg.hidden_size, cfg.kv_dim),
        "v_proj": (cfg.hidden_size, cfg.kv_dim),
        "o_proj": (cfg.q_dim, cfg.hidden_size),
        "gate_proj": (cfg.hidden_size, cfg.intermediate_size),
        "up_proj": (cfg.hidden_size, cfg.intermediate_size),
        "down_proj": (cfg.intermediate_size, cfg.hidden_size),
    }


def measure_floor():
    """Min cost of a null jit call + host readback through the relay
    (~27 ms measured); subtracted from every chained total so per-step
    numbers aren't inflated by floor/STEPS (BENCHNOTES.md)."""
    @jax.jit
    def null(x):
        return x.sum()
    x = jnp.ones((8,), jnp.float32)
    float(null(x))
    return min(_mintrial(null, x) for _ in range(5))


def _mintrial(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


_FLOOR = None


def timed(fn, *args):
    """Fetch-synced, floor-corrected total across STEPS chained steps."""
    global _FLOOR
    if _FLOOR is None:
        _FLOOR = measure_floor()
        log(f"null-call floor: {_FLOOR*1e3:.1f} ms (subtracted)")
    t0 = time.time()
    v = float(fn(*args))
    compile_and_first = time.time() - t0
    ts = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        v = float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - _FLOOR, 1e-9) / STEPS, compile_and_first


def main():
    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")
    shrink = int(os.environ.get("BENCH_SHRINK", "1"))  # smoke-test divisor
    cfg = ModelConfig(vocab_size=32000 // shrink,
                      hidden_size=4096 // shrink,
                      intermediate_size=14336 // shrink // 32 * 32,
                      num_layers=NUM_LAYERS,
                      num_heads=max(32 // shrink, 1),
                      num_kv_heads=max(8 // shrink, 1),
                      max_seq_len=MAX_SEQ, sliding_window=4096)
    key = jax.random.PRNGKey(0)
    params = llama.init_params(cfg, key, jnp.bfloat16)

    deltas = {}
    for i, (name, (k, n)) in enumerate(proj_shapes(cfg).items()):
        words = jax.random.randint(
            jax.random.PRNGKey(100 + i),
            (cfg.num_layers, TENANTS, k // 32, n),
            -2**31, 2**31 - 1, jnp.int32)
        deltas[name] = BinaryDelta(
            packed=words,
            scale=jnp.full((cfg.num_layers, TENANTS), 0.01, jnp.float32))

    compress_heads = os.environ.get("BENCH_COMPRESS_EMBEDS", "1") == "1"
    serve_params = dict(params)
    serve_params["layers"] = dict(params["layers"])
    if compress_heads:
        # compress_embeddings serving mode: shared base embed/lm_head +
        # per-tenant 1-bit deltas (packed along D). ~2x tenant density
        # and no per-tenant dense head streaming at decode.
        deltas["embed"] = BinaryDelta(
            packed=jax.random.randint(
                jax.random.PRNGKey(200),
                (TENANTS, cfg.hidden_size // 32, cfg.vocab_size),
                -2**31, 2**31 - 1, jnp.int32),
            scale=jnp.full((TENANTS,), 0.01, jnp.float32))
        deltas["lm_head"] = BinaryDelta(
            packed=jax.random.randint(
                jax.random.PRNGKey(201),
                (TENANTS, cfg.hidden_size // 32, cfg.vocab_size),
                -2**31, 2**31 - 1, jnp.int32),
            scale=jnp.full((TENANTS,), 0.01, jnp.float32))
    else:
        serve_params["embed"] = jnp.tile(params["embed"][None],
                                         (TENANTS, 1, 1))
        serve_params["lm_head"] = jnp.tile(params["lm_head"][None],
                                           (TENANTS, 1, 1))
    serve_params["final_norm"] = jnp.tile(params["final_norm"][None],
                                          (TENANTS, 1))
    serve_params["layers"]["attn_norm"] = jnp.tile(
        params["layers"]["attn_norm"][:, None], (1, TENANTS, 1))
    serve_params["layers"]["mlp_norm"] = jnp.tile(
        params["layers"]["mlp_norm"][:, None], (1, TENANTS, 1))
    quant_base = os.environ.get("BENCH_QUANT_BASE", "0") == "1"
    if quant_base:
        # W8+W1 mode: both sides serve the int8 base (apples-to-apples;
        # halves base HBM traffic — measured 1.95x on the base matmul).
        from bitdelta_tpu.research.quantized_base import (
            quantize_base_projections)

        serve_params = quantize_base_projections(serve_params)
        params = quantize_base_projections(params)
    jax.block_until_ready(serve_params)

    kernel = "pallas" if backend == "tpu" else "xla"
    if kernel == "pallas":
        # Serving delta layout: pair-packed (2 output columns per word),
        # 1.46x the one-column VPU kernel (BENCHNOTES.md).
        from bitdelta_tpu.core.delta import pair_delta

        # "embed" stays canonical — it is consumed by gather, not matmul.
        deltas = {k: (pair_delta(d)
                      if k != "embed" and d.packed.shape[-1] % 256 == 0
                      else d)
                  for k, d in deltas.items()}
    tenant_ids = jnp.arange(TENANTS, dtype=jnp.int32)

    def chained(step_fn, batch):
        cache0 = llama.init_cache(cfg, batch, MAX_SEQ, jnp.bfloat16)
        cache0 = cache0._replace(
            length=jnp.full((batch,), 32, jnp.int32))
        tokens0 = jnp.ones((batch, 1), jnp.int32)

        @jax.jit
        def run(params, deltas_or_none, cache, tokens):
            def body(carry, _):
                tokens, cache = carry
                logits, cache = step_fn(params, deltas_or_none, tokens,
                                        cache)
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(
                    jnp.int32)[:, None]
                # keep cache length fixed so window cost is constant
                cache = cache._replace(length=cache.length - 1)
                return (nxt, cache), ()
            (tokens, cache), _ = jax.lax.scan(
                body, (tokens, cache), None, length=STEPS)
            return tokens.sum() + cache.length.sum()
        return run, cache0, tokens0

    def ours_step(p, d, tokens, cache):
        return llama.decode_step(cfg, p, tokens, cache, deltas=d,
                                 tenant_ids=tenant_ids,
                                 compute_dtype=jnp.bfloat16, kernel=kernel)

    def naive_step(p, _unused, tokens, cache):
        # same kernel policy as ours (incl. flash decode attention) —
        # the comparison isolates the multi-tenant decomposition, not
        # attention implementation differences.
        return llama.decode_step(cfg, p, tokens, cache,
                                 compute_dtype=jnp.bfloat16, kernel=kernel)

    log("compiling + running ours (multi-tenant fused) ...")
    run_o, cache_o, tok_o = chained(ours_step, TENANTS)
    t_ours, c1 = timed(run_o, serve_params, deltas, cache_o, tok_o)
    log(f"  ours: {t_ours*1e3:.2f} ms/step (first call incl compile "
        f"{c1:.0f}s)")

    log("compiling + running naive (single-tenant dense) ...")
    run_n, cache_n, tok_n = chained(naive_step, 1)
    t_one, c2 = timed(run_n, params, None, cache_n, tok_n)
    t_naive = t_one * TENANTS
    log(f"  naive: {t_one*1e3:.2f} ms/model-step x {TENANTS} = "
        f"{t_naive*1e3:.2f} ms")

    toks_ours = TENANTS / t_ours
    speedup = t_naive / t_ours
    log(f"ours throughput: {toks_ours:.1f} tok/s ({TENANTS} tenants, "
        f"{NUM_LAYERS} layers); speedup vs naive: {speedup:.2f}x "
        f"(reference ~{REFERENCE_SPEEDUP}x)")

    print(json.dumps({
        "metric": "multitenant_1bit_decode_speedup_vs_naive",
        "value": round(speedup, 3),
        "unit": f"x (T={TENANTS}, Mistral-7B-shaped {NUM_LAYERS} layers, "
                f"{backend})",
        "vs_baseline": round(speedup / REFERENCE_SPEEDUP, 3),
    }))


if __name__ == "__main__":
    main()
