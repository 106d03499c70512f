"""W4-base density bench: how many FULL Mistral-7B-width tenants fit
one 16 GB v5e when the shared base is int4 (W4+W1 serving mode)?

The headline bench (bench.py) serves T=6 on the W8 base (7 GB); the W4
base (~3.7 GB packed+scales) frees ~3.3 GB for more 1-bit tenants —
the DENSITY configuration (README "--quantize_base int4"). This
experiment builds the 32L serve world directly in deployment layout
(Int4Weight base + pair-packed deltas + 1-bit heads), runs the chained
multi-tenant decode step, and reports tok/s/chip at the highest tenant
count that fits.

Reference stakes: the reference's GPTQ+delta row (reference
docs/index.html:419-457) is an offline quality ablation; it never
SERVED a quantized base, let alone 10 tenants/GPU. BASELINE.md's north
star is ">=6 tenants/chip" — this is the beyond-parity density version.

Memory at T tenants, 32L, S=128 cache: base 3.7 GB + deltas 0.87*T GB
+ heads/embed ~0.9 GB + KV 0.13*T GB -> T=10 ~= 14.6 GB.

Usage (detached, chip exclusive):
  python experiments/density_w4_bench.py
Each tenant rung runs in its OWN subprocess (process exit is the only
real free through the pooled-chip relay — bench.py module notes).
Env: DW4_TENANTS (ladder start, default 10), DW4_SEQ (default 128),
BENCH_LAYERS/STEPS/TRIALS/SHRINK as in bench.py.
"""
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("BENCH_LAYERS", "32")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TENANTS0 = int(os.environ.get("DW4_TENANTS", "10"))
MAX_SEQ = int(os.environ.get("DW4_SEQ", "128"))


def child_main(tenants):
    import jax
    import jax.numpy as jnp

    import bench
    from bench import log, proj_shapes, rand_bits
    from bitdelta_tpu.core.delta import BinaryDelta, PairedBinaryDelta
    from bitdelta_tpu.models import llama
    from bitdelta_tpu.research.quantized_base import (INT4_GROUP,
                                                      Int4Weight)

    bench.MAX_SEQ = MAX_SEQ  # build_cfg + make_chained read it

    def build_w4_world(cfg):
        L, T = cfg.num_layers, tenants
        D, V = cfg.hidden_size, cfg.vocab_size
        keys = iter(jax.random.split(jax.random.PRNGKey(7), 64))

        layers = {
            "attn_norm": jnp.ones((L, T, D), jnp.bfloat16),
            "mlp_norm": jnp.ones((L, T, D), jnp.bfloat16),
        }
        deltas = {}
        for name, (k, n) in proj_shapes(cfg).items():
            layers[name] = Int4Weight(
                packed=rand_bits(next(keys), (L, k // 8, n)),
                scale=jnp.full((L, k // INT4_GROUP, n), 4e-4,
                               jnp.float32))
            if n % 256 == 0:
                deltas[name] = PairedBinaryDelta(
                    packed_pairs=rand_bits(next(keys),
                                           (L, T, k // 16, n // 2)),
                    colsum=jnp.zeros((L, T, n), jnp.float32),
                    scale=jnp.full((L, T), 0.01, jnp.float32))
            else:  # pair-ineligible (kv_dim in shrink mode)
                deltas[name] = BinaryDelta(
                    packed=rand_bits(next(keys), (L, T, k // 32, n)),
                    scale=jnp.full((L, T), 0.01, jnp.float32))
        params = {
            "layers": layers,
            "final_norm": jnp.ones((T, D), jnp.bfloat16),
            # bench.rand_weight: ONE fused ratcheting slab write (no
            # f32 staging next to the tightest-fit T=10 world).
            "embed": bench.rand_weight(next(keys), (V, D)),
            "lm_head": bench.rand_weight(next(keys), (D, V)),
        }
        deltas["embed"] = BinaryDelta(
            packed=rand_bits(next(keys), (T, D // 32, V)),
            scale=jnp.full((T,), 0.01, jnp.float32))
        deltas["lm_head"] = PairedBinaryDelta(
            packed_pairs=rand_bits(next(keys), (T, D // 16, V // 2)),
            colsum=jnp.zeros((T, V), jnp.float32),
            scale=jnp.full((T,), 0.01, jnp.float32))
        return params, deltas

    backend = jax.default_backend()
    kernel = "pallas" if backend == "tpu" else "xla"
    # CPU's dot thunk lacks bf16 x bf16 -> f32; f32 there (smoke only).
    cdtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    cfg = bench.build_cfg()
    tenant_ids = jnp.arange(tenants, dtype=jnp.int32)
    log(f"[w4 T={tenants}] building W4 serve world: {cfg.num_layers}L, "
        f"S={MAX_SEQ} ...")
    params, deltas = bench.build_resilient(
        lambda: build_w4_world(cfg), "W4 serve world")

    def step(p, d, tokens, cache):
        return llama.decode_step(cfg, p, tokens, cache, deltas=d,
                                 tenant_ids=tenant_ids,
                                 compute_dtype=cdtype, kernel=kernel)

    log(f"[w4 T={tenants}] compiling + running the chained step ...")
    run, tok0 = bench.make_chained(cfg, kernel, step, tenants)
    t, c1 = bench.timed(run, params, deltas, tok0)
    log(f"[w4 T={tenants}] {t*1e3:.2f} ms/step = {tenants/t:.1f} tok/s "
        f"(first call incl compile {c1:.0f}s)")
    print(json.dumps({
        "metric": "w4_density_tenants_per_chip",
        "value": tenants,
        "unit": (f"full {cfg.num_layers}L Mistral-7B-width tenants on "
                 f"one v5e (W4 base + W1 pair deltas, S={MAX_SEQ})"),
        "tok_s_per_chip": round(tenants / t, 1),
        "ms_per_step": round(t * 1e3, 2),
        "backend": backend,
    }), flush=True)


def main():
    if os.environ.get("DW4_PHASE"):
        return child_main(int(os.environ["DW4_PHASE"]))
    last = "no tenant rung fit"
    for tenants in range(TENANTS0, max(min(5, TENANTS0 - 1), 0), -1):
        print(f"=== W4 density rung T={tenants} ===", file=sys.stderr,
              flush=True)
        env = {**os.environ, "DW4_PHASE": str(tenants)}
        p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, stdout=subprocess.PIPE, text=True)
        rec = None
        for line in reversed(p.stdout.strip().splitlines()):
            try:
                rec = json.loads(line)
                break
            except ValueError:
                continue
        if p.returncode == 0 and rec and "error" not in rec:
            print(json.dumps(rec), flush=True)
            return
        last = f"T={tenants} rc={p.returncode}"
        print(f"  {last} — degrading after 60s", file=sys.stderr,
              flush=True)
        time.sleep(60)
    print(json.dumps({"error": last}), flush=True)


if __name__ == "__main__":
    main()
