"""Bisect the multi-tenant decode step cost on real hardware.

Variants: full (pair kernels), no-delta (tenant extras only), and a
pallas-launch-overhead probe (pair kernel at minimal N).
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
from bitdelta_tpu.models.config import ModelConfig
from bitdelta_tpu.models import llama

T = 8
L = int(os.environ.get("L", "8"))
STEPS = 64
TRIALS = 3
MAX_SEQ = 256


def log(m):
    print(m, file=sys.stderr, flush=True)


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


def main():
    cfg = ModelConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=14336, num_layers=L,
                      num_heads=32, num_kv_heads=8,
                      max_seq_len=MAX_SEQ, sliding_window=4096)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)

    deltas = {}
    for i, (name, (k, n)) in enumerate(proj_shapes(cfg).items()):
        words = jax.random.randint(jax.random.PRNGKey(100 + i),
                                   (L, T, k // 32, n), -2**31, 2**31 - 1,
                                   jnp.int32)
        deltas[name] = BinaryDelta(packed=words,
                                   scale=jnp.full((L, T), 0.01, jnp.float32))
    deltas["lm_head"] = BinaryDelta(
        packed=jax.random.randint(jax.random.PRNGKey(201),
                                  (T, cfg.hidden_size // 32, cfg.vocab_size),
                                  -2**31, 2**31 - 1, jnp.int32),
        scale=jnp.full((T,), 0.01, jnp.float32))
    deltas["embed"] = BinaryDelta(
        packed=jax.random.randint(jax.random.PRNGKey(202),
                                  (T, cfg.hidden_size // 32, cfg.vocab_size),
                                  -2**31, 2**31 - 1, jnp.int32),
        scale=jnp.full((T,), 0.01, jnp.float32))
    pdeltas = {k: (pair_delta(d) if k != "embed" else d)
               for k, d in deltas.items()}

    serve_params = dict(params)
    serve_params["layers"] = dict(params["layers"])
    serve_params["final_norm"] = jnp.tile(params["final_norm"][None], (T, 1))
    serve_params["layers"]["attn_norm"] = jnp.tile(
        params["layers"]["attn_norm"][:, None], (1, T, 1))
    serve_params["layers"]["mlp_norm"] = jnp.tile(
        params["layers"]["mlp_norm"][:, None], (1, T, 1))

    tenant_ids = jnp.arange(T, dtype=jnp.int32)

    def chained(step_fn):
        cache0 = llama.init_cache(cfg, T, MAX_SEQ, jnp.bfloat16)
        cache0 = cache0._replace(length=jnp.full((T,), 32, jnp.int32))
        tokens0 = jnp.ones((T, 1), jnp.int32)

        @jax.jit
        def run(params, d, cache, tokens):
            def body(carry, _):
                tokens, cache = carry
                logits, cache = step_fn(params, d, tokens, cache)
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(
                    jnp.int32)[:, None]
                cache = cache._replace(length=cache.length - 1)
                return (nxt, cache), ()
            (tokens, cache), _ = jax.lax.scan(body, (tokens, cache), None,
                                              length=STEPS)
            return tokens.sum() + cache.length.sum()
        return run, cache0, tokens0

    def timed(fn, *args):
        v = float(fn(*args))
        ts = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            v = float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts) / STEPS

    def full(p, d, tok, cache):
        return llama.decode_step(cfg, p, tok, cache, deltas=d,
                                 tenant_ids=tenant_ids,
                                 compute_dtype=jnp.bfloat16, kernel="pallas")

    def nodelta(p, d, tok, cache):
        return llama.decode_step(cfg, p, tok, cache,
                                 tenant_ids=tenant_ids,
                                 compute_dtype=jnp.bfloat16, kernel="pallas")

    run, c0, t0 = chained(full)
    t_full = timed(run, serve_params, pdeltas, c0, t0)
    log(f"full (pair kernels):      {t_full*1e3:7.2f} ms/step")

    run, c0, t0 = chained(nodelta)
    t_nod = timed(run, serve_params, None, c0, t0)
    log(f"no-delta (extras only):   {t_nod*1e3:7.2f} ms/step")
    log(f"delta cost:               {(t_full-t_nod)*1e3:7.2f} ms/step")

    # Pallas launch-overhead probe: pair kernel at minimal work.
    from bitdelta_tpu.ops.pallas_binary_gemm import (
        tenant_delta_matmul_pair_pallas)

    tiny = pair_delta(BinaryDelta(
        packed=jax.random.randint(jax.random.PRNGKey(7), (T, 4096 // 32, 256),
                                  -2**31, 2**31 - 1, jnp.int32),
        scale=jnp.full((T,), 0.01, jnp.float32)))
    x0 = jax.random.normal(jax.random.PRNGKey(8), (T, 4096), jnp.bfloat16)

    @jax.jit
    def many(x):
        def body(x, _):
            y = tenant_delta_matmul_pair_pallas(
                x, tiny.packed_pairs, tiny.colsum, tiny.scale, tenant_ids,
                out_dtype=jnp.float32)
            return x + y[:, :1].astype(x.dtype) * jnp.bfloat16(1e-6), ()
        x, _ = jax.lax.scan(body, x, None, length=512)
        return x.sum()

    v = float(many(x0))
    ts = []
    for _ in range(TRIALS):
        tt = time.perf_counter()
        v = float(many(x0))
        ts.append(time.perf_counter() - tt)
    per = min(ts) / 512
    work = T * 4096 * 256 / 1.58e12  # s at measured pair rate
    log(f"pair kernel @ N=256:      {per*1e6:7.1f} us/call "
        f"(work ~{work*1e6:.1f} us -> overhead ~{(per-work)*1e6:.1f} us)")


if __name__ == "__main__":
    main()
