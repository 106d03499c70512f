"""int8 vs bf16 KV cache at long context: chained decode on real HW.

At S_max=4096 with full slots the decode bottleneck is streaming the
cache (BENCHNOTES.md); int8 KV halves that stream with in-VMEM dequant
(ops/kv_quant.py, ops/flash_decode.py). This probe measures a chained
multi-layer decode step at long, full-length contexts for both cache
dtypes and prints per-step times + the implied cache-stream bandwidth.

Run ON the chip: python experiments/int8_kv_bench.py
Knobs: KVB_LAYERS (8), KVB_SEQ (4096), KVB_SLOTS (8), KVB_STEPS (32).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bitdelta_tpu.models import llama
from bitdelta_tpu.models.config import ModelConfig

L = int(os.environ.get("KVB_LAYERS", "8"))
S = int(os.environ.get("KVB_SEQ", "4096"))
B = int(os.environ.get("KVB_SLOTS", "8"))
STEPS = int(os.environ.get("KVB_STEPS", "32"))
TRIALS = 3


def log(m):
    print(m, file=sys.stderr, flush=True)


def mintime(fn, *args):
    float(fn(*args))
    ts = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    cfg = ModelConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=14336, num_layers=L,
                      num_heads=32, num_kv_heads=8, max_seq_len=S,
                      sliding_window=None)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    kernel = "pallas" if jax.default_backend() == "tpu" else "xla"

    @jax.jit
    def null(x):
        return x.sum()
    floor = min(mintime(null, jnp.ones((8,))) for _ in range(3))
    log(f"floor {floor*1e3:.1f} ms")

    results = {}
    for kv_dtype in (None, "int8"):
        cache = llama.init_cache(cfg, B, S, jnp.bfloat16, kv_dtype=kv_dtype)
        # Full-length rows: worst-case cache stream.
        cache = cache._replace(length=jnp.full((B,), S - STEPS - 1,
                                               jnp.int32))
        tokens0 = jnp.ones((B, 1), jnp.int32)

        @jax.jit
        def run(params, cache, tokens):
            def body(carry, _):
                tokens, cache = carry
                logits, cache = llama.decode_step(
                    cfg, params, tokens, cache,
                    compute_dtype=jnp.bfloat16, kernel=kernel)
                nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)[:, None]
                cache = cache._replace(length=cache.length - 1)
                return (nxt, cache), ()
            (tokens, cache), _ = jax.lax.scan(body, (tokens, cache), None,
                                              length=STEPS)
            return tokens.sum() + cache.length.sum()

        t = (mintime(run, params, cache, tokens0) - floor) / STEPS
        kv_bytes = (2 * L * B * S * cfg.num_kv_heads * cfg.head_dim
                    * (1 if kv_dtype else 2))
        results[kv_dtype or "bf16"] = t
        log(f"kv={kv_dtype or 'bf16'}: {t*1e3:.2f} ms/step; cache "
            f"{kv_bytes/1e9:.2f} GB -> {kv_bytes/t/1e12:.2f} TB/s "
            f"effective cache stream")
    sp = results["bf16"] / results["int8"]
    log(f"int8 KV speedup at S={S}, B={B}, {L}L: {sp:.2f}x")


if __name__ == "__main__":
    main()
