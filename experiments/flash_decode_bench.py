"""On-chip numerics + timing for the flash-decode attention kernel.

Compares the XLA whole-cache attention path against the length-aware
Pallas kernel at serving decode shapes. Timing per BENCHNOTES.md:
chain STEPS iterations inside one jit with data deps, fetch one scalar —
AND subtract the measured null-call floor (~27 ms per host readback
through the axon relay), which otherwise inflates per-iteration numbers
by floor/STEPS (~53 us at STEPS=512!).
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
from bitdelta_tpu.ops.flash_decode import flash_decode_attention

B = int(os.environ.get("B", "8"))
S = int(os.environ.get("S", "4096"))
H, KV, HD = 32, 8, 128
WINDOW = None
STEPS = int(os.environ.get("STEPS", "2048"))
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
                      num_kv_heads=KV, max_seq_len=S, sliding_window=WINDOW)
    k = jax.random.normal(jax.random.PRNGKey(0), (B, S, KV, HD), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(1), (B, S, KV, HD), jnp.bfloat16)
    q0 = jax.random.normal(jax.random.PRNGKey(2), (B, 1, H, HD), jnp.bfloat16)

    @jax.jit
    def null(x):
        return x.sum()

    floor = mintime(null, jnp.ones((8,)), n=5)
    log(f"null-call floor: {floor*1e3:.1f} ms (subtracted below)")

    roofline = 2 * B * S * KV * HD * 2 / 1.6e12
    log(f"full-cache K+V stream at 1.6 TB/s: {roofline*1e6:.1f} us")

    for frac_name, lengths in [
        ("full", jnp.full((B,), S, jnp.int32)),
        ("half", jnp.full((B,), S // 2, jnp.int32)),
        ("short-128", jnp.full((B,), 128, jnp.int32)),
        ("mixed", jnp.asarray(np.linspace(64, S, B).astype(np.int32))),
    ]:
        valid = jnp.arange(S)[None, :] < lengths[:, None]
        q_pos = (lengths - 1)[:, None]

        # numerics (single call)
        want = llama._attention(cfg, q0, k, v, q_pos, valid)
        got = flash_decode_attention(q0[:, 0], k, v, lengths,
                                     window=WINDOW).reshape(B, 1, -1)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        rel = err / float(jnp.max(jnp.abs(want.astype(jnp.float32))))

        @jax.jit
        def run_xla(q, k, v):
            def body(q, _):
                o = llama._attention(cfg, q, k, v, q_pos, valid)
                return o.reshape(B, 1, H, HD).astype(jnp.bfloat16), ()
            q, _ = jax.lax.scan(body, q, None, length=STEPS)
            return q.astype(jnp.float32).sum()

        @jax.jit
        def run_flash(q, k, v):
            def body(q, _):
                o = flash_decode_attention(q[:, 0], k, v, lengths,
                                           window=WINDOW)
                return o[:, None].astype(jnp.bfloat16), ()
            q, _ = jax.lax.scan(body, q, None, length=STEPS)
            return q.astype(jnp.float32).sum()

        t_x = (mintime(run_xla, q0, k, v) - floor) / STEPS
        t_f = (mintime(run_flash, q0, k, v) - floor) / STEPS
        log(f"[{frac_name:9s}] err={err:.4f} rel={rel:.4f}  "
            f"xla {t_x*1e6:8.1f} us  flash {t_f*1e6:8.1f} us  "
            f"speedup {t_x/t_f:5.2f}x")


if __name__ == "__main__":
    main()
