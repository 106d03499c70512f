"""Probe the pooled chip's free HBM: materialize 256 MB blocks until
RESOURCE_EXHAUSTED, report the total, exit (process exit is the only
real free through the relay — BENCHNOTES.md).

Usage: python experiments/hbm_probe.py  (exits 0; prints one JSON line)
Never kill this process mid-run — let it finish (it is quick unless the
relay is wedged, in which case the acquire watchdog exits it).
"""
import json
import os
import sys
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

BLOCK_MB = 256
# Optional cap (MB): probe only up to this much, then exit — a capped
# probe answers "would an X-GB build fit right now?" without grabbing
# (and then slow-reaping) the whole pool.
MAX_BLOCKS = int(os.environ.get("PROBE_MAX_MB", str(64 * 256))) // BLOCK_MB


def main():
    acquired = threading.Event()
    acquire_s = int(os.environ.get("PROBE_ACQUIRE_TIMEOUT_S", "600"))

    def watchdog():
        if not acquired.wait(acquire_s):
            print(json.dumps({"error": f"chip acquire > {acquire_s}s"}),
                  flush=True)
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    t0 = time.time()
    backend = jax.default_backend()
    # touch the device with a trivial op first
    float(jnp.ones((8,), jnp.float32).sum())
    acquired.set()
    acquire_time = time.time() - t0

    blocks = []
    n = BLOCK_MB * 1024 * 1024 // 4
    for i in range(MAX_BLOCKS):
        try:
            b = jnp.zeros((n,), jnp.float32)
            # force materialization (lazy relay alloc)
            float(b[:1].sum())
            blocks.append(b)
        except Exception as e:  # noqa: BLE001
            if "RESOURCE_EXHAUSTED" not in repr(e):
                print(json.dumps({"error": repr(e)[:300],
                                  "free_mb": len(blocks) * BLOCK_MB}),
                      flush=True)
                return
            break
    print(json.dumps({"backend": backend,
                      "acquire_s": round(acquire_time, 1),
                      "free_mb": len(blocks) * BLOCK_MB,
                      "capped": len(blocks) == MAX_BLOCKS}), flush=True)


if __name__ == "__main__":
    main()
