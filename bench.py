"""Headline benchmark: FULL-model multi-tenant 1-bit decode vs naive.

Round-2 upgrade over the r01 model-slice bench: the default shape is the
real 32-layer Mistral-7B, T=8 tenants, on one 16 GB v5e — the
deploy-density configuration (int8 base + pair-packed 1-bit deltas +
1-bit compressed embeddings/lm_head). A bf16 base cannot even hold TWO
dense tenants on this chip, which is the point of BitDelta serving
(reference README.md:18 "6x Mistral-7B in <30GB" on GPU).

  ours       = one decode step for T tenants: shared W8 base (XLA int8
               matmul at the HBM roofline) + per-row pair-packed 1-bit
               delta (Pallas VPU kernel) + 1-bit per-tenant heads.
  naive_bf16 = each tenant served as its own dense bf16 fine-tune
               (what the reference's users run today), T x one
               single-model decode step.
  naive_w8   = same but int8-quantized fine-tunes (same weight precision
               as our base — the conservative apples-to-apples row).

Primary metric: speedup vs naive_bf16 (the reference claims ~2x for its
batched kernel, docs/index.html:394-404). Extra JSON keys carry absolute
tok/s/chip, the W8-vs-W8 speedup, modeled speed-of-light fractions
(HBM stream + VPU bit-plane rate; BENCHNOTES.md rooflines), and an
ENGINE-level tok/s measured through Engine.generate() with chunked
decode (admission + sampling + host syncs included).

Timing: this environment's device tunnel makes ``block_until_ready``
unreliable and adds 30-100 ms jitter per host round-trip, so each
measurement chains BENCH_STEPS decode steps *inside one jit* (token and
cache feed back step-to-step), fetches a single scalar, and subtracts a
measured null-call floor; per-step = total / steps, min over trials.
See BENCHNOTES.md.

Artifact delivery (round 5, VERDICT r4 item 1 — r04's artifact was
parsed:null because one JSON line printed only after the final rung and
the driver's timeout killed the run first): the parent now emits a JSON
line {"metric", "value", "unit", "vs_baseline", ...} after EVERY stage
(bootstrap -> guaranteed-fit safe rung -> engine row -> north-star
upgrade -> Mixtral), last-line-wins, and installs SIGTERM/SIGINT/SIGALRM
handlers that re-emit the best-so-far record as the actual last line of
output before exiting — so even a timeout kill yields a parsed artifact.
A total wall budget (BENCH_WALL_BUDGET_S) paces the ladder inside the
driver's patience; phase children get their own SIGALRM so they exit
CLEANLY when over budget (process exit is the only real HBM free
through this relay — a SIGKILLed child leaks server-side, CLAUDE.md).
"""

import gc
import json
import os
import signal
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bitdelta_tpu.core.delta import BinaryDelta, PairedBinaryDelta
from bitdelta_tpu.models.config import ModelConfig
from bitdelta_tpu.models import llama

NUM_LAYERS = int(os.environ.get("BENCH_LAYERS", "32"))
# 6 tenants = the reference demo's headline config (README.md:18) and the
# BASELINE north star (">=6 Mistral-7B tenants/chip"); T=8 with the full
# 32L W8 stack overruns the 16 GB v5e by ~0.5 GB (measured OOM).
TENANTS = int(os.environ.get("BENCH_TENANTS", "6"))
STEPS = int(os.environ.get("BENCH_STEPS", "32"))
TRIALS = int(os.environ.get("BENCH_TRIALS", "3"))
RUN_ENGINE = os.environ.get("BENCH_ENGINE", "1") == "1"
ENGINE_CHUNK = int(os.environ.get("BENCH_ENGINE_CHUNK", "16"))
ENGINE_NEW_TOKENS = int(os.environ.get("BENCH_ENGINE_NEW_TOKENS", "64"))
MAX_SEQ = 256
REFERENCE_SPEEDUP = 2.0  # docs/index.html:394-404

# Round-5 staged-ladder knobs (parent only; see main()).
# Total wall budget: comfortably inside the driver's observed patience
# (r04 was killed by `timeout`; r03's full safe-rung run took ~6 min on
# a cooperative pool). 0 disables the alarm (manual camping).
WALL_BUDGET_S = int(os.environ.get("BENCH_WALL_BUDGET_S", "2400"))
# The guaranteed-fit first rung: 16L/T6 built fine inside pool dips all
# of round 4 (~7.5 GB world); its record lands before any 32L camping.
SAFE_LAYERS = int(os.environ.get("BENCH_SAFE_LAYERS", "16"))
# Seconds reserved for the Mixtral ladder after the upgrade camp.
MIX_RESERVE_S = int(os.environ.get("BENCH_MIX_RESERVE_S", "600"))
# Minimum remaining budget to start another north-star upgrade attempt.
UPGRADE_MIN_S = int(os.environ.get("BENCH_UPGRADE_MIN_S", "480"))

# Measured machine rooflines (BENCHNOTES.md; floor-corrected, chained).
HBM_BYTES_PER_S = 0.72e12        # achievable stream (88% of v5e spec)
# Pair-kernel bit-plane rate: 1.58 T unpacked-elem/s (measured 1579 G/s
# at the mlp decode shape, experiments/pair_kernel_bench.py). Round 3
# shipped 1.58e15 here (a "G elem/us" unit typo) which reported
# vpu_frac 0.001; the truth is the T=6 step is VPU-delta-BOUND (~0.69).
VPU_UNPACKED_ELEM_PER_S = 1.58e12


def log(msg):
    print(msg, file=sys.stderr, flush=True)


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


def measure_floor():
    """Min cost of a null jit call + host readback through the relay
    (~25 ms measured); subtracted from every chained total so per-step
    numbers aren't inflated by floor/STEPS (BENCHNOTES.md)."""
    @jax.jit
    def null(x):
        return x.sum()
    x = jnp.ones((8,), jnp.float32)
    float(null(x))
    return min(_mintrial(null, x) for _ in range(5))


def _mintrial(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


_FLOOR = None


def timed(fn, *args):
    """Fetch-synced, floor-corrected total across STEPS chained steps."""
    global _FLOOR
    if _FLOOR is None:
        _FLOOR = measure_floor()
        log(f"null-call floor: {_FLOOR*1e3:.1f} ms (subtracted)")
    t0 = time.time()
    float(fn(*args))
    compile_and_first = time.time() - t0
    ts = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - _FLOOR, 1e-9) / STEPS, compile_and_first


from functools import partial


@partial(jax.jit, static_argnums=(1, 2))
def _rand_bits_jit(key, shape, dtype):
    nbits = jnp.dtype(dtype).itemsize * 8
    *lead, last = shape
    raw = jax.random.bits(key, (*lead, last * nbits // 32), jnp.uint32)
    # bitcast to a narrower dtype appends a (32/nbits,) axis; reshape
    # folds it back into the last dim.
    return jax.lax.bitcast_convert_type(raw, dtype).reshape(shape)


def ratchet(make, what="slab"):
    """Allocate ONE slab with hold-and-retry: on RESOURCE_EXHAUSTED,
    keep every slab already held (memory we hold is safe from the
    pool's competitor — only FREED memory gets snatched) and retry just
    this slab after a short wait. Turns a build race the competitor
    wins in seconds into a ratchet: each of its transient releases gets
    banked into our world. Contrast build_resilient, which rebuilds
    from scratch (the OOMed partial is unreturnable AND unreusable
    in-process, so scratch-rebuilds dig the hole deeper)."""
    # ~5 min default siege per slab: long enough to bank a competitor
    # dip that lands mid-build, short enough that a fully-squatted pool
    # degrades the rung ladder at r03-like cadence (the artifact must
    # land within the driver's patience; raise for manual camping).
    tries = max(1, int(os.environ.get("BENCH_SLAB_TRIES", "20")))
    wait_s = float(os.environ.get("BENCH_SLAB_WAIT_S", "15"))
    for attempt in range(tries):
        try:
            out = make()
            _force(out)   # real materialization (relay commits lazily)
            return out
        except Exception as e:  # noqa: BLE001 — re-raised unless OOM
            if not _is_oom(e):
                raise
            if attempt == tries - 1:
                raise
            if attempt % 4 == 0:
                log(f"  slab OOM ({what}) — holding "
                    f"{attempt + 1}/{tries}, retry in {wait_s:.0f}s")
            time.sleep(wait_s)


def rand_bits(key, shape, dtype=jnp.int32):
    """Random packed words with temps no larger than the output.

    ``jax.random.bits`` at sub-32-bit dtypes stages 4 B/elem of
    threefry words before narrowing — an 8 GB spike on the 7 GB int8
    base that OOMed the 16 GB chip. Generate out-size uint32 words and
    bitcast to the target width instead (values are uniform bits either
    way). The whole chain runs under ONE jit so XLA fuses threefry →
    bitcast into a single output write: eagerly, the raw uint32 buffer
    materializes next to the output (2x bytes — a 3.8 GB transient on
    the (32, 4096, 14336) int8 gate slab, observed OOM when the pooled
    chip wasn't empty). Allocation ratchets (see :func:`ratchet`)."""
    nbits = jnp.dtype(dtype).itemsize * 8
    assert (shape[-1] * nbits) % 32 == 0
    return ratchet(lambda: _rand_bits_jit(key, tuple(shape), dtype),
                   f"rand_bits{tuple(shape)}")


@partial(jax.jit, static_argnums=(1, 2))
def _rand_weight_jit(key, shape, dtype):
    # Uniform int8 bits cast to the target dtype and scaled: ONE fused
    # threefry -> cast -> scale output write. jax.random.normal would
    # stage an f32 temp (2-4x the bf16 output — 7.5 GB on the 32L gate
    # stack); uniform +-0.02 weights time identically. A last dim that
    # doesn't fill whole 32-bit words (e.g. a (L, D, 2) router at E=2)
    # generates padded and slices.
    *lead, last = shape
    pad = -last % 4
    raw = _rand_bits_jit(key, (*lead, last + pad), jnp.int8)
    if pad:
        raw = raw[..., :last]
    return (raw.astype(dtype) * (0.02 / 127.0)).astype(dtype)


def rand_weight(key, shape, dtype=jnp.bfloat16):
    """Plausible-magnitude random dense weights allocated as ONE fused
    slab write (no f32 staging), with ratcheting."""
    return ratchet(lambda: _rand_weight_jit(key, tuple(shape), dtype),
                   f"rand_weight{tuple(shape)}")


def build_cfg(num_layers=None):
    shrink = int(os.environ.get("BENCH_SHRINK", "1"))  # smoke divisor
    return ModelConfig(vocab_size=32000 // shrink // 256 * 256,
                       hidden_size=4096 // shrink,
                       intermediate_size=14336 // shrink // 256 * 256,
                       num_layers=NUM_LAYERS if num_layers is None
                       else num_layers,
                       num_heads=max(32 // shrink, 1),
                       num_kv_heads=max(8 // shrink, 1),
                       max_seq_len=MAX_SEQ, sliding_window=4096)


def build_serve_world(cfg):
    """Serving stack built DIRECTLY in deployment layout (W8 base, pair
    deltas) so peak memory never doubles through conversions."""
    from bitdelta_tpu.research.quantized_base import Int8Weight

    L, T = cfg.num_layers, TENANTS
    D, V = cfg.hidden_size, cfg.vocab_size
    keys = iter(jax.random.split(jax.random.PRNGKey(7), 64))

    layers = {
        "attn_norm": jnp.ones((L, T, D), jnp.bfloat16),
        "mlp_norm": jnp.ones((L, T, D), jnp.bfloat16),
    }
    deltas = {}
    for name, (k, n) in proj_shapes(cfg).items():
        layers[name] = Int8Weight(
            q=rand_bits(next(keys), (L, k, n), jnp.int8),
            scale=jnp.full((L, n), 2e-4, jnp.float32))
        if n % 256 == 0:
            deltas[name] = PairedBinaryDelta(
                packed_pairs=rand_bits(next(keys), (L, T, k // 16, n // 2)),
                colsum=jnp.zeros((L, T, n), jnp.float32),
                scale=jnp.full((L, T), 0.01, jnp.float32))
        else:  # pair-ineligible (kv_dim in shrink mode): canonical words
            deltas[name] = BinaryDelta(
                packed=rand_bits(next(keys), (L, T, k // 32, n)),
                scale=jnp.full((L, T), 0.01, jnp.float32))
    params = {
        "layers": layers,
        "final_norm": jnp.ones((T, D), jnp.bfloat16),
        "embed": rand_weight(next(keys), (V, D)),
        "lm_head": rand_weight(next(keys), (D, V)),
    }
    # 1-bit compressed per-tenant embeddings/lm_head (shared base +
    # delta): kills the per-tenant dense (V, D) tensors entirely.
    deltas["embed"] = BinaryDelta(
        packed=rand_bits(next(keys), (T, D // 32, V)),
        scale=jnp.full((T,), 0.01, jnp.float32))
    deltas["lm_head"] = PairedBinaryDelta(
        packed_pairs=rand_bits(next(keys), (T, D // 16, V // 2)),
        colsum=jnp.zeros((T, V), jnp.float32),
        scale=jnp.full((T,), 0.01, jnp.float32))
    return params, deltas


def accounting(cfg, t_ours):
    """Modeled speed-of-light decomposition of one multi-tenant step."""
    L, T = cfg.num_layers, TENANTS
    D, V = cfg.hidden_size, cfg.vocab_size
    proj_elems = sum(k * n for k, n in proj_shapes(cfg).values()) * L
    hbm = (proj_elems                      # int8 base, 1 B/elem
           + proj_elems // 8 * T           # packed deltas, 1 bit/elem
           + D * V * 2                     # shared bf16 lm_head
           + D * V // 8 * T                # 1-bit head deltas
           + 2 * L * T * 32 * cfg.num_kv_heads * cfg.head_dim * 2)  # KV@32
    vpu = (proj_elems + D * V) * T         # unpacked delta elems
    t_hbm = hbm / HBM_BYTES_PER_S
    t_vpu = vpu / VPU_UNPACKED_ELEM_PER_S
    return {
        "hbm_bytes_per_step": hbm,
        "vpu_unpacked_elems_per_step": vpu,
        "hbm_frac": round(t_hbm / t_ours, 3),
        "vpu_frac": round(t_vpu / t_ours, 3),
        "sol_frac_overlapped": round(max(t_hbm, t_vpu) / t_ours, 3),
    }


def make_chained(cfg, kernel, step_fn, batch):
    """Chained decode steps with the KV cache built INSIDE the jit: a
    cache passed as a (non-donated) argument must be preserved by XLA
    while the scan carries an updated copy — two live 1.6 GB buffers at
    the 32L/T6 world, which pushed the phase to ~16.2 GB and OOMed the
    north-star rung even on an EMPTY chip. In-jit init keeps exactly
    one cache buffer (the scan carry, updated in place) and adds only a
    ~2 ms zeros-write per call (<0.4% of a 32-step total, and it makes
    "ours" marginally slower, never faster)."""
    tokens0 = jnp.ones((batch, 1), jnp.int32)

    @jax.jit
    def run(params, deltas_or_none, tokens):
        cache = llama.init_cache(cfg, batch, MAX_SEQ, jnp.bfloat16)
        cache = cache._replace(length=jnp.full((batch,), 32, jnp.int32))

        def body(carry, _):
            tokens, cache = carry
            logits, cache = step_fn(params, deltas_or_none, tokens, cache)
            nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)[:, None]
            # keep cache length fixed so window cost is constant
            cache = cache._replace(length=cache.length - 1)
            return (nxt, cache), ()
        (tokens, cache), _ = jax.lax.scan(body, (tokens, cache), None,
                                          length=STEPS)
        return tokens.sum() + cache.length.sum()
    return run, tokens0


def bench_engine(cfg, params, deltas, kernel, model=None):
    """Engine-level tok/s: Engine.generate() through chunked decode —
    includes admission/prefill, sampling, host syncs, event fan-out."""
    from bitdelta_tpu.serving.engine import Engine, Request
    from bitdelta_tpu.serving.stacking import TenantStack

    stack = TenantStack(params=params, deltas=deltas,
                        vocab_sizes=jnp.full((TENANTS,), cfg.vocab_size,
                                             jnp.int32),
                        num_tenants=TENANTS)
    # Serving cache sized to the bench generations (30-token prompt +
    # ENGINE_NEW_TOKENS < 128): at S=256 the engine cache PLUS the
    # batched-prefill rowcache (both (L, B, S, KV, hd)) added ~3.2 GB
    # on top of the 13 GB world — over the 15.9 GB chip at 32L/T6.
    assert 64 + ENGINE_NEW_TOKENS <= MAX_SEQ, (
        f"BENCH_ENGINE_NEW_TOKENS={ENGINE_NEW_TOKENS} overflows the "
        f"prefill bucket 64 + MAX_SEQ {MAX_SEQ} serving cache")
    eng_seq = min(MAX_SEQ, max(128, 64 + ENGINE_NEW_TOKENS))
    eng = Engine(cfg, stack, max_slots=TENANTS, max_seq=eng_seq,
                 prefill_buckets=(64,), kernel=kernel, model=model,
                 compute_dtype=jnp.bfloat16, decode_chunk=ENGINE_CHUNK)
    log("engine warmup (prefill bucket + decode chunk compiles) ...")
    t0 = time.time()
    eng.warmup()
    log(f"  warmup {time.time()-t0:.0f}s; generating "
        f"{TENANTS} x {ENGINE_NEW_TOKENS} tokens ...")
    rng = np.random.default_rng(0)
    reqs = [Request(prompt_ids=list(rng.integers(1, cfg.vocab_size, 30)),
                    tenant_id=t, max_new_tokens=ENGINE_NEW_TOKENS)
            for t in range(TENANTS)]
    # All trials recorded; the headline engine_tok_s is the MEDIAN of
    # the steady trials (trial 0 absorbs warmup's queued device tail —
    # block_until_ready lies through the relay — and is excluded).
    # Round 4 shipped best-of-trials, which under pool-competitor noise
    # is one-sided selection (VERDICT r4 weak 3); the median is the
    # bisect-grade number, with best kept alongside for comparison.
    trials = []
    for trial in range(1 + max(3, TRIALS)):
        t0 = time.perf_counter()
        outs = eng.generate(reqs)
        dt = time.perf_counter() - t0
        toks = sum(len(o) for o in outs)
        log(f"  engine trial {trial}: {toks} tokens in {dt:.2f}s = "
            f"{toks/dt:.1f} tok/s (chunk={ENGINE_CHUNK})"
            + (" [warmup-tail, excluded]" if trial == 0 else ""))
        trials.append(toks / dt)
    steady = sorted(trials[1:])
    n = len(steady)
    med = (steady[n // 2] if n % 2
           else 0.5 * (steady[n // 2 - 1] + steady[n // 2]))
    return {"engine_tok_s": round(med, 1),
            "engine_tok_s_best": round(max(trials), 1),
            "engine_trials": [round(t, 1) for t in trials]}


def _force(tree):
    """Materialize every leaf NOW. The pooled-chip relay defers buffer
    commitment (block_until_ready returns before HBM is touched), so an
    over-budget world only explodes later inside a timed/compiled call.
    Reading a scalar derived from each leaf forces its generating
    computation — and therefore its full allocation — to run here,
    inside the caller's retry guard."""
    acc = 0.0
    for leaf in jax.tree.leaves(tree):
        sl = leaf[(0,) * (leaf.ndim - 1)][:1] if leaf.ndim else leaf
        acc += float(jnp.sum(sl.astype(jnp.float32)))
    return acc


def _is_oom(e) -> bool:
    return "RESOURCE_EXHAUSTED" in repr(e)


def build_resilient(builder, what, retries=None, wait_s=90, before=None):
    """Run ``builder()`` with retry-on-RESOURCE_EXHAUSTED.

    The bench chip is a POOLED v5e behind a relay: other clients' (or a
    killed predecessor's) allocations can transiently hold HBM, so a
    build that fits by >2 GB on a quiet chip can still OOM. Waiting and
    retrying is the honest fix; callers degrade the config only after
    retries are exhausted (and must say so in the output).

    ``retries=None`` reads BENCH_BUILD_RETRIES (default 1 — fail fast):
    an OOMed partial build's memory is neither returned to the pool nor
    reusable in-process (the relay has no client-side buffer reuse —
    BENCHNOTES "in-process frees"), so an in-child retry re-allocates
    from a pool the child itself just deepened a hole in. Exit (the only
    real free) and let the parent's rung backoff pace the re-attempts
    across the reap lag. Callers with small worlds (< half the chip)
    may still pass retries>1 usefully.

    ``before``: called before EVERY attempt — the ballast hook that
    consolidates owned HBM and frees exactly this build's need."""
    if retries is None:
        retries = max(1, int(os.environ.get("BENCH_BUILD_RETRIES", "1")))
    for attempt in range(retries):
        try:
            if before is not None:
                before()
            out = builder()
            _force(out)
            return out
        except Exception as e:  # noqa: BLE001 — re-raised unless OOM
            if not _is_oom(e):
                raise
            out = None
            gc.collect()
            if attempt == retries - 1:
                raise
            log(f"  RESOURCE_EXHAUSTED building {what} (pooled chip "
                f"busy?) — retry {attempt + 1}/{retries - 1} in {wait_s}s")
            time.sleep(wait_s)


def build_naive_params(cfg):
    """Dense bf16 model: every (L, K, N) stack is ONE fused slab write
    (rand_weight — uniform bits cast to bf16). The old layer-by-layer
    python-list + jnp.stack approach held rows AND the stacked copy
    simultaneously (+7.5 GB transient on the 32L gate stack, on top of
    ~10 GB of already-built stacks — it could never build the FULL
    32-layer naive world on a 16 GB chip), and jax.random.normal would
    stage f32 temps besides."""
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 1024))
    L, D = cfg.num_layers, cfg.hidden_size

    params = {
        "embed": rand_weight(next(keys), (cfg.vocab_size, D)),
        "final_norm": jnp.ones((D,), jnp.bfloat16),
        "lm_head": rand_weight(next(keys), (D, cfg.vocab_size)),
        "layers": {
            "attn_norm": jnp.ones((L, D), jnp.bfloat16),
            "mlp_norm": jnp.ones((L, D), jnp.bfloat16),
            **{name: rand_weight(next(keys), (L, k, n))
               for name, (k, n) in proj_shapes(cfg).items()},
        },
    }
    return params


def _emit_error(stage, err):
    """One parseable JSON line even on catastrophic failure, so the
    round artifact records WHY there's no number instead of being
    empty (value 0 = no measurement, not a claim)."""
    print(json.dumps({
        "metric": "multitenant_1bit_decode_speedup_vs_naive",
        "value": 0.0,
        "unit": f"ERROR at {stage} (no measurement)",
        "vs_baseline": 0.0,
        "error": repr(err)[:500],
    }), flush=True)




# ---------------------------------------------------------------------------
# Phase bodies — each runs in its OWN subprocess.
#
# Measured round 3: in-process frees through the pooled-chip relay are
# effectively never returned to the pool (a 24-byte allocation still
# RESOURCE_EXHAUSTED 90+ s after freeing 256 MB, while a freshly started
# process could grab 14.8 GB the moment its predecessor exited; a
# ballast-and-carve strategy failed for the same reason). The only
# reliable "free" is process exit — so the bench's phases, which
# previously freed one world to build the next, now each allocate ONCE
# in a child process, measure, print one JSON line, and exit.
# ---------------------------------------------------------------------------

def phase_ours(cfg, kernel):
    """Multi-tenant serving step + engine tok/s (W8 base + W1 deltas)."""
    tenant_ids = jnp.arange(TENANTS, dtype=jnp.int32)
    log(f"[ours] building serve world: {cfg.num_layers}L x {TENANTS}T, "
        "W8 base + W1 deltas + 1-bit heads ...")
    serve_params, deltas = build_resilient(
        lambda: build_serve_world(cfg), "serve world")

    def ours_step(p, d, tokens, cache):
        return llama.decode_step(cfg, p, tokens, cache, deltas=d,
                                 tenant_ids=tenant_ids,
                                 compute_dtype=jnp.bfloat16, kernel=kernel)

    log("[ours] compiling + running the chained multi-tenant step ...")
    run_o, tok_o = make_chained(cfg, kernel, ours_step, TENANTS)
    t_ours, c1 = timed(run_o, serve_params, deltas, tok_o)
    log(f"[ours] {t_ours*1e3:.2f} ms/step = {TENANTS/t_ours:.1f} tok/s "
        f"(first call incl compile {c1:.0f}s)")
    return {"phase": "ours", "t_step": t_ours,
            **accounting(cfg, t_ours)}


def phase_ours_engine(cfg, kernel):
    """Engine-level tok/s in its OWN subprocess: the chained-step phase
    peaks at ~14.6 GB at 32L/T6 (world + chained KV cache), and the
    Engine's second KV cache (+1.6 GB, the chained one is only freed
    lazily by the relay) pushed the combined phase past the 15.9 GB
    chip — measured OOM exactly at the north-star rung. Separate
    processes each stay ~1.6 GB under the cap; an engine failure also
    no longer costs the headline chain measurement its rung."""
    log(f"[ours_engine] building serve world: {cfg.num_layers}L x "
        f"{TENANTS}T ...")
    serve_params, deltas = build_resilient(
        lambda: build_serve_world(cfg), "serve world")
    return {"phase": "ours_engine",
            **bench_engine(cfg, serve_params, deltas, kernel)}


def _naive_step_fn(cfg, kernel):
    def naive_step(p, _unused, tokens, cache):
        # same kernel policy as ours (incl. flash decode attention) —
        # the comparison isolates the multi-tenant decomposition, not
        # attention implementation differences.
        return llama.decode_step(cfg, p, tokens, cache,
                                 compute_dtype=jnp.bfloat16, kernel=kernel)
    return naive_step


def phase_naive_bf16(cfg, kernel):
    """One dense bf16 fine-tune served alone (the reference's users'
    status quo); the combiner multiplies by T."""
    log("[naive_bf16] building dense bf16 model ...")
    params = build_resilient(lambda: build_naive_params(cfg),
                             "naive bf16 model")
    log("[naive_bf16] compiling + running ...")
    run_n, tok_n = make_chained(cfg, kernel,
                                _naive_step_fn(cfg, kernel), 1)
    t, _ = timed(run_n, params, None, tok_n)
    log(f"[naive_bf16] {t*1e3:.2f} ms/model-step")
    return {"phase": "naive_bf16", "t_step": t}


def build_naive_w8_params(cfg):
    """Random W8 single model built DIRECTLY in int8 (decode timing
    depends only on shapes/dtypes; converting a bf16 model in-process
    would hold both copies — see the module notes on unreturned frees)."""
    from bitdelta_tpu.research.quantized_base import Int8Weight

    keys = iter(jax.random.split(jax.random.PRNGKey(3), 64))
    L, D, V = cfg.num_layers, cfg.hidden_size, cfg.vocab_size
    layers = {
        "attn_norm": jnp.ones((L, D), jnp.bfloat16),
        "mlp_norm": jnp.ones((L, D), jnp.bfloat16),
    }
    for name, (k, n) in proj_shapes(cfg).items():
        layers[name] = Int8Weight(
            q=rand_bits(next(keys), (L, k, n), jnp.int8),
            scale=jnp.full((L, n), 2e-4, jnp.float32))
    return {
        "layers": layers,
        "final_norm": jnp.ones((D,), jnp.bfloat16),
        "embed": rand_weight(next(keys), (V, D)),
        "lm_head": rand_weight(next(keys), (D, V)),
    }


def phase_naive_w8(cfg, kernel):
    """One int8-quantized fine-tune served alone (apples-to-apples
    weight precision with our shared base)."""
    log("[naive_w8] building int8 model ...")
    params = build_resilient(lambda: build_naive_w8_params(cfg),
                             "naive W8 model")
    log("[naive_w8] compiling + running ...")
    run_n, tok_n = make_chained(cfg, kernel,
                                _naive_step_fn(cfg, kernel), 1)
    t, _ = timed(run_n, params, None, tok_n)
    log(f"[naive_w8] {t*1e3:.2f} ms/model-step")
    return {"phase": "naive_w8", "t_step": t}


# ---------------------------------------------------------------------------
# Mixtral end-to-end decode phases (VERDICT r3 item 3: the repo's
# beyond-reference flagship claim — the reference never served Mixtral,
# bitdelta/misc.py:34-67 only explored its weights in a notebook). Full
# Mistral width (4096/14336) with a reduced expert count/layer count
# that fits the 16 GB pooled chip (per-expert and per-layer costs are
# linear: E streams scale the expert bytes, L scans the layer body).
# W8 expert+attention base (quantize_mixtral_base_projections layout)
# + routed pair-packed 1-bit expert deltas — the deploy-density config.
# ---------------------------------------------------------------------------

MIX_EXPERTS = int(os.environ.get("BENCH_MIX_EXPERTS", "4"))
MIX_TOPK = 2


def build_mix_cfg(num_layers, num_experts):
    from bitdelta_tpu.models.mixtral import MixtralConfig

    shrink = int(os.environ.get("BENCH_SHRINK", "1"))
    return MixtralConfig(
        vocab_size=32000 // shrink // 256 * 256,
        hidden_size=4096 // shrink,
        intermediate_size=14336 // shrink // 256 * 256,
        num_layers=num_layers,
        num_heads=max(32 // shrink, 1),
        num_kv_heads=max(8 // shrink, 1),
        max_seq_len=MAX_SEQ, sliding_window=4096,
        num_experts=num_experts, experts_per_token=MIX_TOPK)


def mix_attn_shapes(cfg):
    return {
        "q_proj": (cfg.hidden_size, cfg.q_dim),
        "k_proj": (cfg.hidden_size, cfg.kv_dim),
        "v_proj": (cfg.hidden_size, cfg.kv_dim),
        "o_proj": (cfg.q_dim, cfg.hidden_size),
    }


def build_mix_serve_world(cfg):
    """Multi-tenant Mixtral stack DIRECTLY in deployment layout: W8
    attn+expert base, pair-packed attn deltas, (tenant, expert)-stacked
    pair expert deltas (models/mixtral.py routed decode path), canonical
    router delta, 1-bit compressed per-tenant embeddings/lm_head."""
    from bitdelta_tpu.research.quantized_base import Int8Weight

    L, T, E = cfg.num_layers, TENANTS, cfg.num_experts
    D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    keys = iter(jax.random.split(jax.random.PRNGKey(11), 128))

    layers = {
        "attn_norm": jnp.ones((L, T, D), jnp.bfloat16),
        "mlp_norm": jnp.ones((L, T, D), jnp.bfloat16),
        "router": rand_weight(next(keys), (L, D, E)),
    }
    deltas = {}
    def pair_or_canonical(key, lead, k, n):
        if n % 256 == 0:
            return PairedBinaryDelta(
                packed_pairs=rand_bits(key, (*lead, k // 16, n // 2)),
                colsum=jnp.zeros((*lead, n), jnp.float32),
                scale=jnp.full(lead, 0.01, jnp.float32))
        return BinaryDelta(  # pair-ineligible (shrink-mode kv_dim)
            packed=rand_bits(key, (*lead, k // 32, n)),
            scale=jnp.full(lead, 0.01, jnp.float32))

    for name, (k, n) in mix_attn_shapes(cfg).items():
        layers[name] = Int8Weight(
            q=rand_bits(next(keys), (L, k, n), jnp.int8),
            scale=jnp.full((L, n), 2e-4, jnp.float32))
        deltas[name] = pair_or_canonical(next(keys), (L, T), k, n)
    for name, (k, n) in (("w1", (D, I)), ("w3", (D, I)), ("w2", (I, D))):
        layers[name] = Int8Weight(
            q=rand_bits(next(keys), (L, E, k, n), jnp.int8),
            scale=jnp.full((L, E, n), 2e-4, jnp.float32))
        deltas[name] = pair_or_canonical(next(keys), (L, T, E), k, n)
    deltas["router"] = BinaryDelta(
        packed=rand_bits(next(keys), (L, T, D // 32, E)),
        scale=jnp.full((L, T), 0.01, jnp.float32))
    params = {
        "layers": layers,
        "final_norm": jnp.ones((T, D), jnp.bfloat16),
        "embed": rand_weight(next(keys), (V, D)),
        "lm_head": rand_weight(next(keys), (D, V)),
    }
    deltas["embed"] = BinaryDelta(
        packed=rand_bits(next(keys), (T, D // 32, V)),
        scale=jnp.full((T,), 0.01, jnp.float32))
    deltas["lm_head"] = PairedBinaryDelta(
        packed_pairs=rand_bits(next(keys), (T, D // 16, V // 2)),
        colsum=jnp.zeros((T, V), jnp.float32),
        scale=jnp.full((T,), 0.01, jnp.float32))
    return params, deltas


def phase_mix_ours(cfg_unused, kernel):
    from bitdelta_tpu.models import mixtral

    cfg = build_mix_cfg(NUM_LAYERS, MIX_EXPERTS)
    tenant_ids = jnp.arange(TENANTS, dtype=jnp.int32)
    log(f"[mix_ours] building Mixtral serve world: {cfg.num_layers}L x "
        f"{cfg.num_experts}E x {TENANTS}T, W8 base + routed W1 deltas ...")
    params, deltas = build_resilient(
        lambda: build_mix_serve_world(cfg), "mixtral serve world")

    def step(p, d, tokens, cache):
        return mixtral.decode_step(cfg, p, tokens, cache, deltas=d,
                                   tenant_ids=tenant_ids,
                                   compute_dtype=jnp.bfloat16,
                                   kernel=kernel)

    log("[mix_ours] compiling + running the chained multi-tenant step ...")
    run, tok0 = make_chained(cfg, kernel, step, TENANTS)
    t, c1 = timed(run, params, deltas, tok0)
    log(f"[mix_ours] {t*1e3:.2f} ms/step = {TENANTS/t:.1f} tok/s "
        f"(first call incl compile {c1:.0f}s)")
    out = {"phase": "mix_ours", "t_step": t}
    if os.environ.get("BENCH_MIX_ENGINE", "0") == "1":
        out.update(bench_engine(cfg, params, deltas, kernel,
                                model=mixtral))
    return out


def build_mix_naive_params(cfg, dtype="bf16"):
    """Single dense Mixtral fine-tune: each (L[, E], K, N) stack is ONE
    fused ratcheting slab (rand_weight / rand_bits — no python-list
    stacking, no f32 staging; see build_naive_params)."""
    from bitdelta_tpu.research.quantized_base import Int8Weight

    keys = iter(jax.random.split(jax.random.PRNGKey(5), 4096))
    L, E = cfg.num_layers, cfg.num_experts
    D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    def stacked(*lead, kn):
        k, n = kn
        if dtype == "int8":
            return Int8Weight(
                q=rand_bits(next(keys), (*lead, k, n), jnp.int8),
                scale=jnp.full((*lead, n), 2e-4, jnp.float32))
        return rand_weight(next(keys), (*lead, k, n))

    layers = {
        "attn_norm": jnp.ones((L, D), jnp.bfloat16),
        "mlp_norm": jnp.ones((L, D), jnp.bfloat16),
        "router": rand_weight(next(keys), (L, D, E)),
        "q_proj": stacked(L, kn=(D, cfg.q_dim)),
        "k_proj": stacked(L, kn=(D, cfg.kv_dim)),
        "v_proj": stacked(L, kn=(D, cfg.kv_dim)),
        "o_proj": stacked(L, kn=(cfg.q_dim, D)),
        "w1": stacked(L, E, kn=(D, I)),
        "w3": stacked(L, E, kn=(D, I)),
        "w2": stacked(L, E, kn=(I, D)),
    }
    return {
        "layers": layers,
        "final_norm": jnp.ones((D,), jnp.bfloat16),
        "embed": rand_weight(next(keys), (V, D)),
        "lm_head": rand_weight(next(keys), (D, V)),
    }


def _phase_mix_naive(kernel, dtype, label):
    from bitdelta_tpu.models import mixtral

    cfg = build_mix_cfg(NUM_LAYERS, MIX_EXPERTS)
    log(f"[{label}] building dense {dtype} Mixtral ...")
    params = build_resilient(lambda: build_mix_naive_params(cfg, dtype),
                             f"naive {dtype} mixtral")

    def step(p, _unused, tokens, cache):
        return mixtral.decode_step(cfg, p, tokens, cache,
                                   compute_dtype=jnp.bfloat16,
                                   kernel=kernel)

    log(f"[{label}] compiling + running ...")
    run, tok0 = make_chained(cfg, kernel, step, 1)
    t, _ = timed(run, params, None, tok0)
    log(f"[{label}] {t*1e3:.2f} ms/model-step")
    return {"phase": label, "t_step": t}


def phase_mix_naive_bf16(cfg_unused, kernel):
    return _phase_mix_naive(kernel, "bf16", "mix_naive_bf16")


def phase_mix_naive_w8(cfg_unused, kernel):
    return _phase_mix_naive(kernel, "int8", "mix_naive_w8")


def phase_compiled_check(cfg_unused, kernel_unused):
    """Pre-phase: compile + numerics-check every serving Pallas kernel
    through the engine (VERDICT r3 item 5 — this used to live only in a
    manually-run experiment; now its pass/fail lands in the artifact
    every round). ~100 MB world, safe even on a crowded pooled chip."""
    from bitdelta_tpu.utils.compiled_check import serving_compiled_check

    return {"phase": "compiled_check",
            **serving_compiled_check(log=log)}


PHASES = {"ours": phase_ours, "ours_engine": phase_ours_engine,
          "naive_bf16": phase_naive_bf16,
          "naive_w8": phase_naive_w8,
          "mix_ours": phase_mix_ours,
          "mix_naive_bf16": phase_mix_naive_bf16,
          "mix_naive_w8": phase_mix_naive_w8,
          "compiled_check": phase_compiled_check}


def child_main():
    """One phase at one rung: allocate once, measure, print JSON, exit
    (the exit is what actually returns the HBM to the pool)."""
    global _FLOOR
    import threading

    phase = os.environ["BENCH_PHASE"]

    # Child wall budget: when the parent's ladder pacing gives this
    # phase a deadline, exceed it by RAISING (so ratchet sieges and
    # relay waits unwind through child_main's except -> error JSON ->
    # clean interpreter exit). A clean exit is the only path that
    # reliably returns HBM to the pool; a parent-side SIGKILL leaks
    # server-side for minutes-to-hours (CLAUDE.md lazy-alloc notes).
    def _over_budget(signum, _frame):
        raise TimeoutError(
            f"child wall budget exceeded (signal {signum})")

    child_wall = int(os.environ.get("BENCH_CHILD_WALL_S", "0"))
    signal.signal(signal.SIGTERM, _over_budget)
    if child_wall > 0:
        signal.signal(signal.SIGALRM, _over_budget)
        signal.alarm(child_wall)

    backend = jax.default_backend()
    acquire_s = int(os.environ.get("BENCH_ACQUIRE_TIMEOUT_S", "2700"))
    acquired = threading.Event()

    def _acquire_watchdog():
        if not acquired.wait(acquire_s):
            log(f"[{phase}] chip not acquired after {acquire_s}s")
            print(json.dumps({"phase": phase,
                              "error": f"chip acquire > {acquire_s}s"}),
                  flush=True)
            os._exit(3)

    threading.Thread(target=_acquire_watchdog, daemon=True).start()
    log(f"[{phase}] backend: {backend}, devices: {jax.devices()}")
    _FLOOR = measure_floor()
    acquired.set()
    log(f"[{phase}] null-call floor: {_FLOOR*1e3:.1f} ms (subtracted)")
    cfg = build_cfg()
    kernel = "pallas" if backend == "tpu" else "xla"
    try:
        out = PHASES[phase](cfg, kernel)
        out["backend"] = backend
    except Exception as e:  # noqa: BLE001
        import traceback
        traceback.print_exc()
        sys.stderr.flush()
        print(json.dumps({"phase": phase, "error": repr(e)[:500]}),
              flush=True)
        sys.exit(1)
    print(json.dumps(out), flush=True)


_CHILD = None  # current phase subprocess — the ONLY thing we ever kill


def run_phase(phase, li, ti, extra_env=None, timeout_s=None):
    """Launch one phase subprocess; return (rc, parsed record or None).
    Child stderr streams through to ours (live progress).

    ``timeout_s`` sets the child's own SIGALRM wall budget (clean
    in-child exit); the parent only escalates to terminate/kill if the
    child overruns that by a grace period (a killed child can leak its
    HBM server-side, so the in-child alarm is the primary mechanism)."""
    global _CHILD

    env = {**os.environ, "BENCH_PHASE": phase,
           "BENCH_LAYERS": str(li), "BENCH_TENANTS": str(ti),
           **(extra_env or {})}
    if timeout_s is not None and timeout_s >= 1e8:
        timeout_s = None  # _remaining()'s no-budget sentinel
    if timeout_s is not None:
        env.setdefault("BENCH_CHILD_WALL_S", str(int(max(60, timeout_s))))
        env.setdefault("BENCH_ACQUIRE_TIMEOUT_S",
                       str(int(max(120, timeout_s))))
    p = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                         env=env, stdout=subprocess.PIPE, text=True)
    _CHILD = p
    try:
        stdout, _ = p.communicate(
            timeout=None if timeout_s is None else timeout_s + 120)
    except subprocess.TimeoutExpired:
        log(f"  [{phase}] child ignored its wall budget — terminating "
            f"pid {p.pid}")
        p.terminate()
        try:
            stdout, _ = p.communicate(timeout=30)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
    finally:
        _CHILD = None
    rec = None
    for line in reversed((stdout or "").strip().splitlines()):
        try:
            rec = json.loads(line)
            break
        except ValueError:
            continue
    return p.returncode, rec


def combine(recs, li, ti, backend="tpu"):
    t_ours = recs["ours"]["t_step"]
    t_bf16 = recs["naive_bf16"]["t_step"]
    t_w8 = recs["naive_w8"]["t_step"]
    toks_ours = ti / t_ours
    speedup = t_bf16 * ti / t_ours
    speedup_w8 = t_w8 * ti / t_ours
    log(f"ours {toks_ours:.1f} tok/s/chip ({ti} full {li}L tenants); "
        f"speedup vs naive bf16 {speedup:.2f}x, vs naive W8 "
        f"{speedup_w8:.2f}x (reference ~{REFERENCE_SPEEDUP}x)")
    # "FULL Mistral-7B" only when the ladder did not degrade (r03's
    # artifact said "FULL ... 16L", contradicting itself).
    scale = ("FULL Mistral-7B 32L" if li == 32
             else f"Mistral-7B-width {li}L (degraded)")
    out = {
        "metric": "multitenant_1bit_decode_speedup_vs_naive",
        "value": round(speedup, 3),
        "unit": f"x (T={ti} {scale}, ours=W8 base+W1 pair "
                f"deltas+1-bit heads vs naive bf16 dense/tenant, "
                f"{backend})",
        "vs_baseline": round(speedup / REFERENCE_SPEEDUP, 3),
        "tok_s_per_chip": round(toks_ours, 1),
        "ms_per_step": round(t_ours * 1e3, 2),
        "speedup_vs_naive_w8": round(speedup_w8, 3),
        "naive_bf16_ms": round(t_bf16 * 1e3, 2),
        "naive_w8_ms": round(t_w8 * 1e3, 2),
    }
    for k in ("hbm_bytes_per_step", "vpu_unpacked_elems_per_step",
              "hbm_frac", "vpu_frac", "sol_frac_overlapped",
              "engine_tok_s", "engine_tok_s_best", "engine_trials",
              "engine_error"):
        if k in recs["ours"]:
            out[k] = recs["ours"][k]
    if "engine_tok_s" in out:
        out["engine_vs_raw_chain"] = round(out["engine_tok_s"]
                                           / toks_ours, 3)
    return out


def _recheck_w8(recs, w8_key, bf16_key, rerun):
    """An int8 model-step can't honestly be slower than the same bf16
    step (half the weight bytes at the same roofline) — when it
    measures >1.5x the bf16 time, a pool competitor was hammering HBM
    during that phase (observed: 85.5 ms vs a clean re-run's 4.78 ms).
    Re-run the phase once and keep the faster result."""
    if recs[w8_key]["t_step"] <= 1.5 * recs[bf16_key]["t_step"]:
        return recs
    log(f"  {w8_key} implausibly slow "
        f"({recs[w8_key]['t_step']*1e3:.1f} ms vs bf16 "
        f"{recs[bf16_key]['t_step']*1e3:.1f} ms) — pool interference? "
        f"re-running once")
    rc, rec = rerun()
    if rc == 0 and rec and "error" not in rec \
            and rec["t_step"] < recs[w8_key]["t_step"]:
        recs = {**recs, w8_key: rec}
    return recs


def run_mixtral(out, deadline=None):
    """Mixtral end-to-end decode rows (appended to the headline record;
    failures degrade down the (L, E, T) ladder and finally record
    mixtral_error instead of killing the llama result). ``deadline``
    (absolute time.time()) stops the ladder when the parent's wall
    budget is nearly spent — the already-emitted llama record stands.

    (L, E, T) ladder: the real Mixtral-8x7B expert count FIRST (E=8 at
    reduced depth, ~12 GB peak in the naive-bf16 phase) — at E=8 the
    naive side streams all 8 experts while routed deltas touch only
    top-2, so lower-E rungs UNDERSTATE the speedup (BENCHNOTES
    "Mixtral END-TO-END"). Per-layer cost is linear (scanned).

    While more than BENCH_MIX_ENDGAME_S remain, the stage CAMPS on the
    E=8 rung, banking each phase's record as it lands — phases are
    independent per-process measurements, so "ours" and "naive_bf16"
    may honestly land in different pool-competitor dips. In the endgame
    (or within a short driver reserve, where it behaves exactly like a
    plain ladder) every rung is tried with whatever phases are banked."""
    rungs = [(4, 8, 4), (8, 4, 4), (8, 2, 4), (4, 2, 2)]
    caches = {r: {} for r in rungs}
    last_err = "no mixtral rung completed"
    endgame_s = int(os.environ.get("BENCH_MIX_ENDGAME_S", "900"))
    max_camp_sweeps = int(os.environ.get("BENCH_MIX_CAMP_SWEEPS", "12"))

    def _left():
        return None if deadline is None else deadline - time.time()

    def try_rung(r):
        li, ei, ti = r
        env = {"BENCH_MIX_EXPERTS": str(ei)}
        recs = caches[r]
        for phase in ("mix_ours", "mix_naive_bf16", "mix_naive_w8"):
            if phase in recs:
                continue
            rc, rec = run_phase(phase, li, ti, extra_env=env,
                                timeout_s=_left())
            if rc != 0 or rec is None or "error" in (rec or {}):
                return None, (phase, rc,
                              (rec or {}).get("error", "no record"))
            recs[phase] = rec
        recs.update(_recheck_w8(
            recs, "mix_naive_w8", "mix_naive_bf16",
            lambda: run_phase("mix_naive_w8", li, ti, extra_env=env,
                              timeout_s=_left())))
        return recs, None

    def finish(r, recs):
        li, ei, ti = r
        t = recs["mix_ours"]["t_step"]
        out["mixtral_speedup_vs_naive_bf16"] = round(
            recs["mix_naive_bf16"]["t_step"] * ti / t, 3)
        out["mixtral_speedup_vs_naive_w8"] = round(
            recs["mix_naive_w8"]["t_step"] * ti / t, 3)
        out["mixtral_tok_s_per_chip"] = round(ti / t, 1)
        out["mixtral_ms_per_step"] = round(t * 1e3, 2)
        for k in ("engine_tok_s", "engine_tok_s_best", "engine_trials"):
            if k in recs["mix_ours"]:
                out[f"mixtral_{k}"] = recs["mix_ours"][k]
        out["mixtral_config"] = (f"{li}L x {ei}E(topk{MIX_TOPK}) x T{ti}, "
                                 f"Mistral width, W8 base + routed pair "
                                 f"deltas")
        log(f"mixtral: {out['mixtral_tok_s_per_chip']} tok/s/chip, "
            f"{out['mixtral_speedup_vs_naive_bf16']}x vs naive bf16, "
            f"{out['mixtral_speedup_vs_naive_w8']}x vs naive W8 "
            f"({out['mixtral_config']})")

    sweeps = 0
    while True:
        left = _left()
        if left is not None and left < 180:
            last_err += f"; stopped (wall budget: {left:.0f}s left)"
            break
        endgame = ((left is not None and left < endgame_s)
                   or sweeps >= max_camp_sweeps)
        targets = rungs if endgame else rungs[:1]
        completed = False
        for r in targets:
            li, ei, ti = r
            log(f"=== mixtral rung {li}L/{ei}E/T{ti} "
                f"({'endgame' if endgame else 'camp'}, banked: "
                f"{sorted(caches[r])}) ===")
            recs, failed = try_rung(r)
            if failed is None:
                finish(r, recs)
                completed = True
                break
            last_err = (f"mixtral rung {li}L/{ei}E/T{ti} phase "
                        f"{failed[0]} rc={failed[1]}: {failed[2]}")
            log(f"  {last_err} — "
                + ("degrading" if endgame else "camping (phases bank)"))
            if left is not None and _left() < 180:
                break
        if completed:
            return
        if endgame:
            break
        sweeps += 1
        time.sleep(60)
    out["mixtral_error"] = last_err


# ---------------------------------------------------------------------------
# Parent orchestration (round 5): staged ladder with incremental
# emission. The artifact convention is last-line-wins, so the parent
# prints a (monotonically improving) headline record after EVERY stage
# and a signal handler re-emits the best one at kill time — a driver
# timeout can no longer produce parsed:null (VERDICT r4 item 1).
# ---------------------------------------------------------------------------

_BEST = None              # last emitted record (re-emitted on signals)
_COMPILED_CHECK = "not run"
_T0 = None                # parent start time


def _elapsed():
    return time.time() - _T0


def _remaining():
    """Seconds left in the wall budget (a large finite number when the
    budget is disabled, so arithmetic and comparisons stay simple)."""
    return 1e9 if WALL_BUDGET_S <= 0 else WALL_BUDGET_S - _elapsed()


def emit(rec):
    """Print the current headline record as one JSON line (flushed).
    Called after every completed stage; the driver parses the LAST
    parseable line, so later emissions upgrade earlier ones."""
    global _BEST
    rec = dict(rec)
    rec["compiled_check"] = _COMPILED_CHECK
    rec["elapsed_s"] = round(_elapsed(), 1)
    _BEST = rec
    print(json.dumps(rec), flush=True)
    return rec


def _bootstrap_record(reason):
    """A parseable no-measurement record (value 0 = no claim) carrying
    WHY there's no number yet — the floor every run stands on from
    minute one."""
    return {"metric": "multitenant_1bit_decode_speedup_vs_naive",
            "value": 0.0,
            "unit": f"ERROR: {reason} (no measurement)",
            "vs_baseline": 0.0,
            "error": reason}


def _shutdown(signum, _frame):
    """SIGTERM/SIGINT/SIGALRM in the PARENT: stop the current child
    (its exact PID only — SIGTERM first so it unwinds and exits
    cleanly, which is what actually frees its HBM), re-emit the
    best-so-far record as the true last line of output, exit 0."""
    log(f"parent: signal {signum} — re-emitting best-so-far and exiting")
    child = _CHILD
    if child is not None and child.poll() is None:
        child.terminate()
        try:
            child.wait(20)
        except Exception:  # noqa: BLE001 — escalate on a wedged child
            child.kill()
    if _BEST is not None:
        print(json.dumps(_BEST), flush=True)
    else:
        rec = _bootstrap_record(
            f"killed by signal {signum} before any rung completed")
        rec["compiled_check"] = _COMPILED_CHECK
        print(json.dumps(rec), flush=True)
    os._exit(0)


def _mix_reserve():
    """Seconds to keep for the Mixtral stage — zero when it's disabled
    (no point starving the 32L camp for a stage that never runs)."""
    return (MIX_RESERVE_S if os.environ.get("BENCH_MIX", "1") == "1"
            else 0)


def _run_rung(li, ti, extra_env=None, reserve=0.0, cache=None):
    """The three decode phases + W8 plausibility recheck at one rung.
    Returns (recs, failed) where failed is None on success.

    ``reserve``: wall seconds each phase child must leave untouched
    (the Mixtral reserve — without the cap, one slow-but-compliant
    upgrade child could legally consume the whole reserve).

    ``cache``: a caller-held dict persisting completed phase records
    ACROSS attempts of the same rung. Each phase is an independent
    chained measurement in its own process, so phases may honestly land
    in DIFFERENT pool-competitor dips — without the cache, a dip that
    fits "ours" but closes before "naive_bf16" costs the whole attempt
    and the next attempt re-gambles "ours" too. The W8 plausibility
    recheck runs once, when all three phases are present."""
    budget = lambda: max(120, _remaining() - reserve)  # noqa: E731
    recs = cache if cache is not None else {}
    for phase in ("ours", "naive_bf16", "naive_w8"):
        if phase in recs:
            continue
        rc, rec = run_phase(phase, li, ti, extra_env=extra_env,
                            timeout_s=budget())
        if rc != 0 or rec is None or "error" in (rec or {}):
            return recs, (phase, rc, (rec or {}).get("error", "no record"))
        recs[phase] = rec
    rechecked = _recheck_w8(
        recs, "naive_w8", "naive_bf16",
        lambda: run_phase("naive_w8", li, ti, extra_env=extra_env,
                          timeout_s=budget()))
    recs.update(rechecked)
    return recs, None


def _attach_engine(out, li, ti, extra_env=None, reserve=0.0):
    """Engine-level tok/s in its own subprocess (see phase_ours_engine);
    a failure records engine_error instead of costing the rung."""
    rc, rec = run_phase("ours_engine", li, ti, extra_env=extra_env,
                        timeout_s=min(max(120, _remaining() - reserve),
                                      1200))
    if rc == 0 and rec and "error" not in rec:
        for k in ("engine_tok_s", "engine_tok_s_best", "engine_trials"):
            out[k] = rec[k]
        out["engine_vs_raw_chain"] = round(
            out["engine_tok_s"] / out["tok_s_per_chip"], 3)
        out.pop("engine_error", None)
    else:
        out["engine_error"] = (f"rc={rc}: "
                               f"{(rec or {}).get('error', 'no record')}")


def main():
    global _T0, _COMPILED_CHECK
    if os.environ.get("BENCH_PHASE"):
        return child_main()

    # PARENT: never touches the device (a phase child must find the
    # pool as free as possible).
    _T0 = time.time()
    signal.signal(signal.SIGTERM, _shutdown)
    signal.signal(signal.SIGINT, _shutdown)
    if WALL_BUDGET_S > 0:
        signal.signal(signal.SIGALRM, _shutdown)
        signal.alarm(WALL_BUDGET_S)
    L0, T0 = NUM_LAYERS, TENANTS

    # Stage 0: compiled-kernel numerics check (~100 MB world — safe on
    # a crowded pool). Its status lands in EVERY emitted record.
    if os.environ.get("BENCH_COMPILED_CHECK", "1") == "1":
        log("=== stage 0: compiled_check ===")
        rc, rec = run_phase("compiled_check", L0, T0,
                            timeout_s=min(900, max(240,
                                                   _remaining() * 0.2)))
        _COMPILED_CHECK = ("ok" if rc == 0 and rec
                           and rec.get("status") == "ok"
                           else f"FAILED rc={rc}: "
                                f"{(rec or {}).get('error', 'no record')}")
        log(f"  compiled_check: {_COMPILED_CHECK}")
    emit(_bootstrap_record("no rung completed yet"))

    # Stage 1: the guaranteed-fit safe rung — land a real number FAST
    # (r04 lost everything camping on 32L first). Short slab sieges so
    # a squatted pool degrades at minutes-not-hours cadence; explicit
    # BENCH_SLAB_TRIES wins over the stage defaults.
    Ls = min(SAFE_LAYERS, L0)
    safe_rungs = [(Ls, T0)] + [(Ls, t) for t in (4, 2) if t < T0]
    if Ls >= 16:
        safe_rungs += [(Ls // 2, T0), (Ls // 2, 2)]
    safe_env = ({} if "BENCH_SLAB_TRIES" in os.environ
                else {"BENCH_SLAB_TRIES": "8"})
    out = None
    srung = None
    last_err = "no safe rung completed"
    while out is None and _remaining() > 240:
        for li, ti in safe_rungs:
            if _remaining() <= 240:
                break
            log(f"=== safe rung {li}L/T{ti} "
                f"({_remaining():.0f}s left) ===")
            recs, failed = _run_rung(li, ti, extra_env=safe_env)
            if failed:
                last_err = (f"rung {li}L/T{ti} phase {failed[0]} "
                            f"rc={failed[1]}: {failed[2]}")
                log(f"  {last_err} — degrading")
                continue
            out = combine(recs, li, ti,
                          backend=recs["ours"].get("backend", "tpu"))
            out["num_layers"], out["tenants"] = li, ti
            if (li, ti) != (L0, T0):
                out["degraded_from_layers"] = L0
                out["degraded_from_tenants"] = T0
            srung = (li, ti)
            break
        if out is None and _remaining() > 360:
            log(f"safe sweep failed ({last_err}); quiet backoff ...")
            time.sleep(120)
    if out is None:
        emit(_bootstrap_record(
            f"all safe rungs failed within wall budget; last: {last_err}"))
        return
    emit(out)

    # Stage 2: engine row at the safe rung (all trials + median).
    if RUN_ENGINE:
        log(f"=== engine row at {srung[0]}L/T{srung[1]} ===")
        _attach_engine(out, *srung, extra_env=safe_env)
        emit(out)

    # Stage 3: camp on the north-star rung with the remaining budget
    # (minus the Mixtral reserve). Long slab sieges — the ratchet banks
    # pool-competitor dips; each failed attempt backs off briefly.
    up_env = ({} if "BENCH_SLAB_TRIES" in os.environ
              else {"BENCH_SLAB_TRIES": "40"})
    up_cache = {}   # completed 32L phases persist across attempts
    attempt = 0
    while (srung != (L0, T0)
           and _remaining() - _mix_reserve() > UPGRADE_MIN_S):
        attempt += 1
        log(f"=== north-star upgrade attempt {attempt}: {L0}L/T{T0} "
            f"({_remaining():.0f}s left, {_mix_reserve()}s reserved, "
            f"banked phases: {sorted(up_cache)}) ===")
        recs, failed = _run_rung(L0, T0, extra_env=up_env,
                                 reserve=_mix_reserve(), cache=up_cache)
        if failed:
            log(f"  upgrade attempt {attempt} failed at {failed[0]} "
                f"rc={failed[1]}: {failed[2]}")
            if _remaining() - _mix_reserve() > UPGRADE_MIN_S + 120:
                time.sleep(120)
            continue
        up = combine(recs, L0, T0,
                     backend=recs["ours"].get("backend", "tpu"))
        up["num_layers"], up["tenants"] = L0, T0
        # Keep the safe capture as provenance inside the upgrade.
        up["safe_rung"] = {k: out[k] for k in
                           ("num_layers", "tenants", "value",
                            "tok_s_per_chip", "engine_tok_s")
                           if k in out}
        out = up
        srung = (L0, T0)
        emit(out)
        if RUN_ENGINE:
            log(f"=== engine row at {L0}L/T{T0} ===")
            _attach_engine(out, L0, T0, extra_env=up_env,
                           reserve=_mix_reserve())
            emit(out)

    # Stage 4: Mixtral ladder (E=8 first) with whatever budget is left.
    if os.environ.get("BENCH_MIX", "1") == "1":
        deadline = (None if WALL_BUDGET_S <= 0
                    else _T0 + WALL_BUDGET_S - 60)
        run_mixtral(out, deadline=deadline)
        emit(out)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # Traceback to stderr FIRST, then the JSON record as the very
        # last line of output (r02's artifact captured a traceback tail
        # and failed to parse) — and exit non-zero without re-raising so
        # nothing prints after the JSON even with merged streams.
        import traceback
        traceback.print_exc()
        sys.stderr.flush()
        _emit_error("run", e)
        sys.exit(1)
