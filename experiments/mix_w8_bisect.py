"""Bisect mix_naive_w8's 85.5 ms/step (10x the bf16 naive step).

The int8 expert einsum is at roofline in isolation
(int8_expert_probe.py: 159 us vs bf16 319 us for E=2) — so the
pathology is in the model composition. Swap each weight group's dtype
independently and time the chained decode step.
"""
import os, time
os.environ["BENCH_LAYERS"] = os.environ.get("BENCH_LAYERS", "8")
os.environ["BENCH_TENANTS"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
import bench
from bitdelta_tpu.models import mixtral
from bitdelta_tpu.research.quantized_base import Int8Weight

def log(m): print(m, flush=True)

cfg = bench.build_mix_cfg(int(os.environ["BENCH_LAYERS"]), 2)
bench._FLOOR = None
bench.STEPS = 32

base_bf16 = bench.build_mix_naive_params(cfg, "bf16")
base_int8 = bench.build_mix_naive_params(cfg, "int8")

def variant(attn, experts):
    src_a = base_int8 if attn == "int8" else base_bf16
    src_e = base_int8 if experts == "int8" else base_bf16
    layers = dict(base_bf16["layers"])
    for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
        layers[n] = src_a["layers"][n]
    for n in ("w1", "w3", "w2"):
        layers[n] = src_e["layers"][n]
    return {**base_bf16, "layers": layers}

def step_fn(p, _u, tokens, cache):
    return mixtral.decode_step(cfg, p, tokens, cache,
                               compute_dtype=jnp.bfloat16, kernel="pallas")

for attn, experts in (("bf16","bf16"), ("int8","bf16"), ("bf16","int8"), ("int8","int8")):
    params = variant(attn, experts)
    run, cache0, tok0 = bench.make_chained(cfg, "pallas", step_fn, 1)
    t, c1 = bench.timed(run, params, None, cache0, tok0)
    log(f"attn={attn} experts={experts}: {t*1e3:.2f} ms/step (compile {c1:.0f}s)")
log("DONE")
