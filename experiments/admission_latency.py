"""Admission latency under concurrent chunked decode (VERDICT r2 item 6).

A stepper thread drives Engine.step() continuously (decode_chunk device
steps per call, the serving configuration); the main thread submits
requests at random intervals and measures wall-clock from ``submit()``
entry to return — prefill (outside the engine lock) plus the wait for
the lock to insert the row cache. With chunked decode the lock is held
for a whole device chunk + readback, which is exactly the window this
probes.

Env: CHUNK (decode chunk, default 16), NREQ, LAYERS, SHRINK.
Prints a JSON line with p50/p95 admission latency and the decode
throughput sustained while admitting.
"""

import json
import os
import sys
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from bitdelta_tpu.core.compress import compress_model
from bitdelta_tpu.models import llama
from bitdelta_tpu.models.config import ModelConfig
from bitdelta_tpu.serving.engine import Engine, Request
from bitdelta_tpu.serving.stacking import stack_tenants

CHUNK = int(os.environ.get("CHUNK", "16"))
NREQ = int(os.environ.get("NREQ", "24"))
LAYERS = int(os.environ.get("LAYERS", "8"))
SHRINK = int(os.environ.get("SHRINK", "1"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    cfg = ModelConfig(vocab_size=32000 // SHRINK // 256 * 256,
                      hidden_size=4096 // SHRINK,
                      intermediate_size=14336 // SHRINK // 256 * 256,
                      num_layers=LAYERS, num_heads=max(32 // SHRINK, 1),
                      num_kv_heads=max(8 // SHRINK, 1), max_seq_len=256,
                      dtype="bfloat16")
    base = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    tenants = []
    for t in range(2):
        fine = dict(base)
        fine["layers"] = {k: (v * (1.01 + 0.01 * t) if v.ndim == 3 else v)
                          for k, v in base["layers"].items()}
        tenants.append(compress_model(base, fine))
    stack = stack_tenants(cfg, base, tenants)
    kernel = "pallas" if jax.default_backend() == "tpu" else "xla"
    eng = Engine(cfg, stack, max_slots=6, max_seq=256,
                 prefill_buckets=(64,), kernel=kernel,
                 decode_chunk=CHUNK, compute_dtype=jnp.bfloat16)
    log(f"warmup (kernel={kernel}, chunk={CHUNK}) ...")
    eng.warmup()

    # Two persistent background streams keep decode busy the whole time.
    for t in range(2):
        eng.submit(Request(prompt_ids=[5, 9, 2, 7], tenant_id=t,
                           max_new_tokens=4096))

    stop = threading.Event()
    tokens_done = [0]

    def stepper():
        # pump(): the pipelined serving loop (what server.py runs since
        # round 4) — the next chunk dispatches before the previous one's
        # readback, and admissions' inserts enqueue behind in-flight
        # chunks instead of waiting out the engine lock.
        while not stop.is_set():
            evs = eng.pump()
            tokens_done[0] += sum(1 for e in evs if e.new_token)
            if not evs:
                time.sleep(0.001)

    th = threading.Thread(target=stepper, daemon=True)
    rng = np.random.default_rng(0)
    lat = []
    t_start = time.perf_counter()
    th.start()
    try:
        for i in range(NREQ):
            time.sleep(float(rng.uniform(0.02, 0.15)))
            req = Request(prompt_ids=list(rng.integers(
                1, cfg.vocab_size, 24)), tenant_id=int(i % 2),
                max_new_tokens=8)
            t0 = time.perf_counter()
            slot = eng.submit(req)
            lat.append(time.perf_counter() - t0)
            # let it finish so slots recycle
            while eng.slots[slot].active:
                time.sleep(0.005)
    finally:
        stop.set()
        th.join(timeout=30)
    wall = time.perf_counter() - t_start
    lat_ms = np.sort(np.asarray(lat) * 1e3)
    out = {
        "metric": "admission_latency_p50_ms",
        "value": round(float(np.percentile(lat_ms, 50)), 1),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
        "max_ms": round(float(lat_ms[-1]), 1),
        "n": len(lat),
        "decode_chunk": CHUNK,
        "layers": LAYERS,
        "concurrent_decode_tok_s": round(tokens_done[0] / wall, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
