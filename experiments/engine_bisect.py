"""Bisect Engine.generate()'s orchestration tax (VERDICT r3 item 2).

BENCH_r03 measured the engine at 34% of the raw chained-step rate; the
round-4 pipelined engine (pump(): dispatch chunk N+1 before consuming
chunk N) lifted that to ~0.45. This experiment times each component of
the serving loop separately on the real chip so the remaining gap is
attributed, not guessed:

  1. warmed admission (submit) wall time, serial and 6-way threaded;
  2. chunk dispatch wall (host cost of _dispatch_chunk: array staging +
     jit dispatch RPC through the relay);
  3. consume wall (readback wait + host fan-out), split into the
     np.asarray sync and the event loop;
  4. steady-state pump period vs the raw device cost (chunk x per-step
     from the chained bench) — the pipelining residual;
  5. end-to-end generate() tok/s at decode_chunk in {8, 16, 32}.

World: 8-layer full Mistral-7B width, T=2 tenants (fits next to pool
noise; per-layer costs extrapolate linearly — BENCHNOTES).

Run detached on the real chip:
  setsid nohup env PYTHONPATH=/root/repo:$PYTHONPATH \
      python experiments/engine_bisect.py > /tmp/r4/engine_bisect.log 2>&1 &
"""

import os
import statistics
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bitdelta_tpu.models.config import ModelConfig
from bitdelta_tpu.serving.engine import Engine, Request
from bitdelta_tpu.serving.stacking import TenantStack
from bitdelta_tpu.core.delta import BinaryDelta, PairedBinaryDelta

L = int(os.environ.get("BISECT_LAYERS", "8"))
T = int(os.environ.get("BISECT_TENANTS", "2"))
MAX_SEQ = 256
CHUNKS = (8, 16, 32)
NEW_TOKENS = 64


def log(m):
    print(m, flush=True)


def build_world():
    import bench
    os.environ["BENCH_LAYERS"] = str(L)
    os.environ["BENCH_TENANTS"] = str(T)
    import importlib
    importlib.reload(bench)
    cfg = bench.build_cfg(num_layers=L)
    params, deltas = bench.build_serve_world(cfg)
    return cfg, params, deltas


def main():
    log(f"devices: {jax.devices()}")
    cfg, params, deltas = build_world()
    stack = TenantStack(params=params, deltas=deltas,
                        vocab_sizes=jnp.full((T,), cfg.vocab_size,
                                             jnp.int32),
                        num_tenants=T)
    eng = Engine(cfg, stack, max_slots=T, max_seq=MAX_SEQ,
                 prefill_buckets=(64,), kernel="pallas",
                 compute_dtype=jnp.bfloat16, decode_chunk=16)
    t0 = time.time()
    eng.warmup()
    log(f"warmup {time.time()-t0:.0f}s")

    rng = np.random.default_rng(0)

    def req(t, n=NEW_TOKENS):
        return Request(prompt_ids=list(rng.integers(1, cfg.vocab_size, 30)),
                       tenant_id=t, max_new_tokens=n)

    # --- 1. warmed admissions -------------------------------------------
    times = []
    for i in range(6):
        r = req(i % T, n=4)
        t0 = time.perf_counter()
        slot = eng.submit(r)
        times.append(time.perf_counter() - t0)
        # drain the short generation so the engine is idle again
        while eng.slots[slot].active:
            eng.step()
    log(f"[admit serial] per-submit ms: "
        f"{[round(x*1e3,1) for x in times]} "
        f"(median {statistics.median(times)*1e3:.1f})")

    # --- 2/3/4. dispatch vs consume in the pump loop --------------------
    slots = [eng.submit(req(t)) for t in range(T)]
    disp, cons, periods = [], [], []
    last_consume_end = None
    n_chunks = 0
    while any(eng.slots[s].active for s in slots):
        t0 = time.perf_counter()
        ticket, pre = eng._dispatch_chunk()
        t1 = time.perf_counter()
        if ticket is not None:
            eng._inflight.append(ticket)
        events = list(pre)
        if eng._inflight and (ticket is None or len(eng._inflight) > 1):
            events += eng._consume_chunk(eng._inflight.pop(0))
        t2 = time.perf_counter()
        disp.append(t1 - t0)
        cons.append(t2 - t1)
        if last_consume_end is not None:
            periods.append(t2 - last_consume_end)
        last_consume_end = t2
        n_chunks += 1
    log(f"[pump x{n_chunks}] dispatch ms: "
        f"median {statistics.median(disp)*1e3:.1f} "
        f"max {max(disp)*1e3:.1f}; consume ms: "
        f"median {statistics.median(cons)*1e3:.1f} "
        f"max {max(cons)*1e3:.1f}; period ms: "
        f"median {statistics.median(periods)*1e3:.1f}"
        if periods else "no periods")

    # --- raw chained-step yardstick (same 16-step granularity) ----------
    # chain 16 decode steps exactly like bench.make_chained and time via
    # scalar fetch — the device-only cost of one chunk.
    import bench
    bench.STEPS = 16
    bench._FLOOR = None

    def ours_step(p, d, tokens, cache):
        from bitdelta_tpu.models import llama
        return llama.decode_step(cfg, p, tokens, cache, deltas=d,
                                 tenant_ids=jnp.arange(T, dtype=jnp.int32),
                                 compute_dtype=jnp.bfloat16,
                                 kernel="pallas")

    run, cache0, tok0 = bench.make_chained(cfg, "pallas", ours_step, T)
    t_step, _ = bench.timed(run, params, deltas, cache0, tok0)
    log(f"[raw chain] {t_step*1e3:.2f} ms/step -> chunk16 device cost "
        f"{t_step*16*1e3:.1f} ms")

    # --- 5. end-to-end generate() at several chunk sizes ----------------
    for ch in CHUNKS:
        e2 = Engine(cfg, stack, max_slots=T, max_seq=MAX_SEQ,
                    prefill_buckets=(64,), kernel="pallas",
                    compute_dtype=jnp.bfloat16, decode_chunk=ch)
        e2.warmup()
        reqs = [req(t) for t in range(T)]
        t0 = time.perf_counter()
        outs = e2.generate(reqs)
        dt = time.perf_counter() - t0
        toks = sum(len(o) for o in outs)
        log(f"[generate chunk={ch}] {toks} tokens in {dt:.2f}s = "
            f"{toks/dt:.1f} tok/s (raw-chain equiv "
            f"{T/t_step:.1f} tok/s, ratio {toks/dt/(T/t_step):.2f})")
        del e2

    log("engine_bisect: DONE")


if __name__ == "__main__":
    main()
