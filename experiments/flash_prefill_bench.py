"""On-chip numerics + timing for the flash-prefill attention kernel.

Compares the XLA score-materializing attention (models/llama._attention)
against the blockwise Pallas kernel at serving-prefill shapes (queries
fresh at 0, K/V written into a cache padded to S_max). Timing per
BENCHNOTES.md: chain STEPS iterations inside one jit with data deps,
fetch one scalar, subtract the measured null-call floor.
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

from bitdelta_tpu.models import llama
from bitdelta_tpu.models.config import ModelConfig
from bitdelta_tpu.ops.flash_prefill import flash_prefill_attention

B = int(os.environ.get("B", "4"))
SQ = int(os.environ.get("SQ", "512"))
SK = int(os.environ.get("SK", "4096"))
H, KV, HD = 32, 8, 128
WINDOW = int(os.environ["WINDOW"]) if "WINDOW" in os.environ else None
STEPS = int(os.environ.get("STEPS", "64"))
TRIALS = 3


def log(m):
    print(m, file=sys.stderr, flush=True)


def mintime(fn, *args, n=TRIALS):
    float(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    cfg = ModelConfig(vocab_size=32000, hidden_size=H * HD,
                      intermediate_size=14336, num_layers=1, num_heads=H,
                      num_kv_heads=KV, max_seq_len=SK, sliding_window=WINDOW)
    kk, kv_, kq = jax.random.split(jax.random.PRNGKey(0), 3)
    k = jnp.zeros((B, SK, KV, HD), jnp.bfloat16)
    v = jnp.zeros((B, SK, KV, HD), jnp.bfloat16)
    k = k.at[:, :SQ].set(jax.random.normal(kk, (B, SQ, KV, HD), jnp.bfloat16))
    v = v.at[:, :SQ].set(jax.random.normal(kv_, (B, SQ, KV, HD), jnp.bfloat16))
    q0 = jax.random.normal(kq, (B, SQ, H, HD), jnp.bfloat16)

    @jax.jit
    def null(x):
        return x.sum()

    floor = mintime(null, jnp.ones((8,)), n=5)
    log(f"null-call floor: {floor*1e3:.1f} ms (subtracted below)")
    flops = 4 * B * H * SQ * SQ * HD / 2
    log(f"attention flops/call {flops/1e9:.1f} GFLOP; "
        f"XLA scores workspace {B*H*SQ*SK*4/1e9:.2f} GB")

    q_positions = jnp.broadcast_to(jnp.arange(SQ)[None, :], (B, SQ))

    for name, lengths in [
        ("full", jnp.full((B,), SQ, jnp.int32)),
        ("mixed", jnp.asarray(np.linspace(64, SQ, B).astype(np.int32))),
    ]:
        kv_valid = jnp.arange(SK)[None, :] < lengths[:, None]
        live = (jnp.arange(SQ)[None, :] < lengths[:, None])[..., None]

        want = jnp.where(live, llama._attention(
            cfg, q0, k, v, q_positions, kv_valid), 0.0)
        got = flash_prefill_attention(q0, k, v, lengths, window=WINDOW)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        rel = err / float(jnp.max(jnp.abs(want.astype(jnp.float32))))

        def chain(call):
            @jax.jit
            def run(q, k, v):
                def body(q, _):
                    o = call(q, k, v)                        # (B,SQ,H*HD)
                    return (q + o.reshape(B, SQ, H, HD)
                            .astype(jnp.bfloat16) * 1e-3), ()
                q, _ = jax.lax.scan(body, q, None, length=STEPS)
                return q.astype(jnp.float32).sum()
            return run

        t_x = (mintime(chain(lambda q, k, v: llama._attention(
            cfg, q, k, v, q_positions, kv_valid)), q0, k, v) - floor) / STEPS
        t_f = (mintime(chain(lambda q, k, v: flash_prefill_attention(
            q, k, v, lengths, window=WINDOW)), q0, k, v) - floor) / STEPS
        log(f"[{name:6s}] err={err:.4f} rel={rel:.4f}  "
            f"xla {t_x*1e6:9.1f} us  flash {t_f*1e6:9.1f} us  "
            f"speedup {t_x/t_f:5.2f}x  "
            f"flash {flops/t_f/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
