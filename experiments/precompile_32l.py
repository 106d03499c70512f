"""Pre-compile the 32L bench programs into the persistent compile cache
WITHOUT allocating any HBM: jit(...).lower(<ShapeDtypeStructs>).compile()
runs the remote compile against abstract operands only.

Why: every 32L rung this round died at BUILD (pool competitor), so the
32L chained programs have never compiled — a future successful
dip-window build would pay the 1-5 min remote compile inside its
critical window, right when the competitor is about to return. Warming
the cache shortens the 32L critical path to build + trials (~3 min),
roughly doubling the chance a dip lasts long enough.

Runs on the TPU client but touches no device buffers beyond jax's
bootstrap. Safe next to a mostly-full pool.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("BENCH_LAYERS", "32")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from bench import proj_shapes, log
from bitdelta_tpu.core.delta import BinaryDelta, PairedBinaryDelta
from bitdelta_tpu.models import llama
from bitdelta_tpu.research.quantized_base import Int8Weight

SDS = jax.ShapeDtypeStruct


def serve_world_structs(cfg, tenants):
    """ShapeDtypeStruct mirror of bench.build_serve_world's output."""
    L, T = cfg.num_layers, tenants
    D, V = cfg.hidden_size, cfg.vocab_size
    layers = {
        "attn_norm": SDS((L, T, D), jnp.bfloat16),
        "mlp_norm": SDS((L, T, D), jnp.bfloat16),
    }
    deltas = {}
    for name, (k, n) in proj_shapes(cfg).items():
        layers[name] = Int8Weight(q=SDS((L, k, n), jnp.int8),
                                  scale=SDS((L, n), jnp.float32))
        if n % 256 == 0:
            deltas[name] = PairedBinaryDelta(
                packed_pairs=SDS((L, T, k // 16, n // 2), jnp.int32),
                colsum=SDS((L, T, n), jnp.float32),
                scale=SDS((L, T), jnp.float32))
        else:
            deltas[name] = BinaryDelta(
                packed=SDS((L, T, k // 32, n), jnp.int32),
                scale=SDS((L, T), jnp.float32))
    params = {
        "layers": layers,
        "final_norm": SDS((T, D), jnp.bfloat16),
        "embed": SDS((V, D), jnp.bfloat16),
        "lm_head": SDS((D, V), jnp.bfloat16),
    }
    deltas["embed"] = BinaryDelta(packed=SDS((T, D // 32, V), jnp.int32),
                                  scale=SDS((T,), jnp.float32))
    deltas["lm_head"] = PairedBinaryDelta(
        packed_pairs=SDS((T, D // 16, V // 2), jnp.int32),
        colsum=SDS((T, V), jnp.float32),
        scale=SDS((T,), jnp.float32))
    return params, deltas


def naive_structs(cfg, dtype):
    L, D, V = cfg.num_layers, cfg.hidden_size, cfg.vocab_size
    layers = {
        "attn_norm": SDS((L, D), jnp.bfloat16),
        "mlp_norm": SDS((L, D), jnp.bfloat16),
    }
    for name, (k, n) in proj_shapes(cfg).items():
        if dtype == "int8":
            layers[name] = Int8Weight(q=SDS((L, k, n), jnp.int8),
                                      scale=SDS((L, n), jnp.float32))
        else:
            layers[name] = SDS((L, k, n), jnp.bfloat16)
    return {
        "layers": layers,
        "final_norm": SDS((D,), jnp.bfloat16),
        "embed": SDS((V, D), jnp.bfloat16),
        "lm_head": SDS((D, V), jnp.bfloat16),
    }


def compile_one(label, step_fn, params_struct, deltas_struct, batch, cfg,
                kernel):
    run, tok0 = bench.make_chained(cfg, kernel, step_fn, batch)
    t0 = time.time()
    lowered = run.lower(params_struct, deltas_struct, tok0)
    lowered.compile()
    log(f"[precompile] {label}: compiled in {time.time()-t0:.0f}s")


def main():
    backend = jax.default_backend()
    kernel = "pallas" if backend == "tpu" else "xla"
    cfg = bench.build_cfg()
    T = bench.TENANTS
    log(f"[precompile] backend={backend} L={cfg.num_layers} T={T} "
        f"kernel={kernel}")

    p, d = serve_world_structs(cfg, T)
    tenant_ids = jnp.arange(T, dtype=jnp.int32)

    def ours_step(pp, dd, tokens, cache):
        return llama.decode_step(cfg, pp, tokens, cache, deltas=dd,
                                 tenant_ids=tenant_ids,
                                 compute_dtype=jnp.bfloat16, kernel=kernel)

    compile_one("ours 32L/T%d" % T, ours_step, p, d, T, cfg, kernel)

    nstep = bench._naive_step_fn(cfg, kernel)
    compile_one("naive_bf16 32L", nstep, naive_structs(cfg, "bf16"),
                None, 1, cfg, kernel)
    compile_one("naive_w8 32L", nstep, naive_structs(cfg, "int8"),
                None, 1, cfg, kernel)
    log("[precompile] done — persistent cache warmed")


if __name__ == "__main__":
    main()
