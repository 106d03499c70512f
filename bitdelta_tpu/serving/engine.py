"""Multi-tenant continuous-batching generation engine.

Replaces the reference's lockstep demo loop (reference
demo/demo_backend.py:190-258, where the whole batch prefills and decodes
together and batch row i is hardwired to tenant i) with a slot-based
engine:

  * ``max_slots`` decode lanes share one KV cache; each slot carries its
    own tenant id, length, sampling params and stop set;
  * requests are admitted into free slots at any time (prefill into the
    slot's cache region) and leave when finished — other slots keep
    decoding (continuous batching);
  * decode is ONE jitted step for the whole batch regardless of tenant
    mix: tenant-routed 1-bit delta matmuls (Pallas fused kernel on TPU,
    XLA elsewhere), per-tenant embeddings/norms/heads, per-slot greedy or
    temperature sampling with per-tenant vocab masking;
  * prefill uses a small set of bucketed sequence lengths so the number
    of compiled programs stays bounded (the reference's pow-2 padding,
    demo_backend.py:296-302, became a compile-budget knob).

Everything device-side is functional; the Engine object only owns host
state (slot bookkeeping) and jitted callables.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models import llama
from .stacking import TenantStack

NEG_INF = float("-inf")

# Stop-token ids checked ON DEVICE inside the chunked-decode loop (per
# slot; -1 pads). Requests with more stop ids than this still stop
# correctly — the host re-check catches the overflow ids — but their
# lanes may burn chunk steps past the stop.
DEVICE_STOPS = 4


class _CompileOnce:
    """Serialize the FIRST call of a jitted engine function — the
    trace+lower+compile — under an engine-wide lock: concurrent cold
    calls from admission threads raced JAX's lowering caches (observed
    KeyError in _lower_jaxpr_to_fun_cached and ValueError in the pallas
    CPU lowering under ThreadPoolExecutor admissions, even across TWO
    DIFFERENT programs). Once compiled, calls go straight through:
    concurrent dispatch of compiled programs is safe (measured working
    under 24-way concurrent admissions + chunked decode, BENCHNOTES
    round 3), and a slow cold compile (1-5 min remote compile for a new
    prefill bucket) must not stall already-warm decode dispatches."""

    def __init__(self, fn, lock: threading.Lock):
        self._fn = fn
        self._lock = lock
        self._done = False

    def __call__(self, *args, **kwargs):
        if self._done:
            return self._fn(*args, **kwargs)
        with self._lock:
            out = self._fn(*args, **kwargs)
            self._done = True
        return out


class EngineFullError(RuntimeError):
    """No free slot for an admission. A DISTINCT type so callers'
    retry-on-full loops don't accidentally swallow device/compile
    errors from the in-admission prefill (XlaRuntimeError is also a
    RuntimeError subclass)."""


@dataclasses.dataclass
class Request:
    prompt_ids: List[int]
    tenant_id: int
    max_new_tokens: int = 128
    temperature: float = 0.0
    top_k: int = 0          # 0 = disabled
    top_p: float = 1.0      # 1.0 = disabled
    stop_token_ids: Sequence[int] = ()
    request_id: Optional[str] = None
    # Set by the engine at admission (the prefill-logits token). Callers
    # read it from here rather than from the slot, which may already be
    # reused by the time a lock-free submit returns.
    first_token: Optional[int] = None
    # Set by the engine when cancel() consumed this request mid-prefill:
    # generate() must not re-queue it (the _cancelled rid was already
    # spent, so a re-admission would run to completion).
    cancelled: bool = False


@dataclasses.dataclass
class SlotState:
    active: bool = False
    reserved: bool = False   # claimed by an in-flight prefill
    tenant_id: int = 0
    request: Optional[Request] = None
    generated: List[int] = dataclasses.field(default_factory=list)
    prompt_len: int = 0
    # Batched admission defers the first-token readback (the token stays
    # on device and feeds the next decode chunk directly); while True,
    # ``generated`` is one shorter than the tokens actually produced and
    # finish checks are deferred to the flush (_flush_pending_firsts).
    pending_first: bool = False
    # Bumped at every admission: an in-flight chunk ticket only delivers
    # tokens to the request it was dispatched for (a slot freed and
    # re-admitted between dispatch and consume must not leak the old
    # request's speculated tokens into the new one).
    epoch: int = 0


@dataclasses.dataclass
class _ChunkTicket:
    """One dispatched-but-not-yet-consumed chunked-decode device call.
    ``toks`` is the (k, B) device array of sampled tokens (-1 where a
    lane was parked); ``active``/``epochs`` snapshot which slot-requests
    the chunk was dispatched for."""
    toks: object
    active: np.ndarray
    epochs: np.ndarray


@dataclasses.dataclass
class StepEvent:
    slot: int
    request_id: Optional[str]
    token: int
    finished: bool
    finish_reason: Optional[str] = None  # "stop" | "length" | "eos"
    # False for finish-only events whose token was already delivered
    # (a stop/limit detected before this step decoded anything new).
    new_token: bool = True


class Engine:
    def __init__(self, cfg: ModelConfig, stack: TenantStack, *,
                 max_slots: int = 8, max_seq: int = 1024,
                 prefill_buckets: Sequence[int] = (64, 128, 256, 512, 1024),
                 kernel: str = "auto", compute_dtype=None, seed: int = 0,
                 mesh=None, model=None, decode_chunk: int = 1,
                 kv_dtype: Optional[str] = None):
        """``mesh``: a ``(data, model)`` jax.sharding.Mesh — the stack
        (base weights, packed tenant deltas, per-tenant extras) and the
        KV cache are GSPMD-sharded over it (Megatron TP per
        parallel/sharding.py; the 70B-serving configuration). With
        kernel="pallas" the decode step runs as a shard_map over the
        mesh: every model-axis shard executes the single-device Pallas
        delta/attention kernels on its local slice (pair words shard
        contiguously; row-parallel colsums are per-shard) with psum at
        the Megatron reduction points; prefill stays on the GSPMD XLA
        path (large-M shapes are MXU-bound where XLA is at roofline).

        ``model``: the decoder module to serve — anything exposing
        ``forward`` / ``decode_step`` with the llama signatures (default
        :mod:`..models.llama`; pass :mod:`..models.mixtral` for
        multi-tenant MoE serving).

        ``decode_chunk``: decode steps chained inside ONE jitted call
        per host sync. Each host readback through this environment's
        device relay costs 30-140 ms — at chunk=1 that dominates decode
        entirely. Stop/length detection happens ON DEVICE inside the
        chunk (_chunk_jit): a lane that samples a stop token or
        exhausts its budget is parked (cache frozen, zero wasted
        steps), and the chunk's while_loop exits early once every lane
        is parked. The host re-checks after readback (source of truth;
        also covers stop sets larger than DEVICE_STOPS). Admission
        granularity remains ``decode_chunk`` tokens."""
        self.cfg = cfg
        self.stack = stack
        self.max_slots = max_slots
        self.max_seq = max_seq
        self.mesh = mesh
        self.model = model if model is not None else llama
        is_llama = self.model is llama
        self.prefill_buckets = sorted(b for b in prefill_buckets
                                      if b <= max_seq)
        multi_device = mesh is not None and mesh.size > 1
        if kernel == "auto":
            kernel = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.kernel = kernel
        self.tp = 1
        if mesh is not None:
            from ..parallel.mesh import MODEL_AXIS

            self.tp = mesh.shape[MODEL_AXIS]
        if kernel == "pallas":
            # Decode hot path: pair-packed delta layout (same bytes as
            # canonical; prefill un-pairs on the fly). Under TP the pair
            # conversion is shard-aware (per-K-shard colsums).
            from .stacking import to_pair_layout

            self.stack = stack = to_pair_layout(stack, tp=self.tp)
        self.compute_dtype = compute_dtype or jnp.dtype(cfg.dtype)
        if kv_dtype not in (None, "bf16", "bfloat16", "int8"):
            raise ValueError(f"unknown kv_dtype {kv_dtype!r}")
        self.kv_quant = kv_dtype == "int8"
        if self.kv_quant and not is_llama:
            raise ValueError("kv_dtype='int8' is wired for the llama "
                             "family only (mixtral keeps a bf16 cache)")
        if self.kv_quant and kernel != "pallas":
            # Capacity still doubles, but the XLA decode path reads a
            # dequantized full-cache view per step — MORE traffic than
            # bf16. Only the flash kernels stream int8 end-to-end.
            print("[engine] kv_dtype=int8 with kernel="
                  f"{kernel!r}: cache capacity doubles but decode "
                  "traffic does NOT drop (the XLA path dequantizes the "
                  "cache per step); use kernel='pallas' on TPU for the "
                  "bandwidth win", flush=True)
        if kernel == "pallas" and multi_device:
            from ..parallel.sharding import ROW_PARALLEL
            from ..research.quantized_base import INT4_GROUP, Int4Weight

            for name, w in stack.params["layers"].items():
                # Row-parallel int4 scales slice per K shard (sharding.
                # serving_param_specs) so the shard_map per-shard body
                # feeds int4_matmul purely local (packed, scale) slices
                # with aligned groups. That requires whole groups per
                # shard: K % (INT4_GROUP * tp) == 0 — true at every real
                # shape (4096/14336 K, 128-row groups, tp <= 8).
                if (isinstance(w, Int4Weight) and name in ROW_PARALLEL
                        and w.scale.shape[-2] % self.tp):
                    raise ValueError(
                        f"W4 + kernel='pallas' + tp={self.tp}: {name}'s "
                        f"K={w.scale.shape[-2] * INT4_GROUP} doesn't "
                        f"split into whole {INT4_GROUP}-row groups per "
                        f"model shard; serve with kernel='xla' or align "
                        f"K to INT4_GROUP*tp")

        self.slots = [SlotState() for _ in range(max_slots)]
        self.cache = llama.init_cache(cfg, max_slots, max_seq,
                                      self.compute_dtype, kv_dtype=kv_dtype)
        if mesh is not None:
            from ..parallel import sharding as psh
            from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

            dp, tp = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
            if max_slots % dp:
                raise ValueError(f"max_slots {max_slots} must be a "
                                 f"multiple of the data axis ({dp})")
            if cfg.num_kv_heads % tp:
                raise ValueError(f"num_kv_heads {cfg.num_kv_heads} must "
                                 f"be a multiple of the model axis ({tp})")
            if kernel == "pallas" and tp > 1:
                if cfg.num_heads % tp:
                    raise ValueError(
                        f"num_heads {cfg.num_heads} must be a multiple "
                        f"of the model axis ({tp}) for the shard_map "
                        f"Pallas decode path")
                vmax = int(stack.params["embed"].shape[-2])
                if vmax % tp:
                    raise ValueError(
                        f"padded vocab {vmax} must be a multiple of the "
                        f"model axis ({tp}); re-pad the tenant stack")
            self.stack = stack = psh.shard_stack(cfg, stack, mesh)
            self.cache = psh.shard_cache(self.cache, mesh)
        self.decode_chunk = max(1, int(decode_chunk))
        self._stop_ids = np.full((max_slots, DEVICE_STOPS), -1, np.int32)
        self.tenant_ids = np.zeros((max_slots,), np.int32)
        self.temps = np.zeros((max_slots,), np.float32)
        self.top_ks = np.zeros((max_slots,), np.int32)
        self.top_ps = np.ones((max_slots,), np.float32)
        self._last_tokens = np.zeros((max_slots,), np.int32)
        # Pipelined-decode state: (tokens, live, rem) carried ON DEVICE
        # between chunk dispatches; _dirty marks lanes whose host state
        # changed since the last dispatch (admission/finish/cancel) and
        # therefore override the device carry at the next dispatch.
        self._dirty = np.ones((max_slots,), bool)
        self._dev_tokens = None
        self._dev_live = None
        self._dev_rem = None
        # Batched admission's sampled first tokens, still ON DEVICE: the
        # next chunk dispatch consumes them device-to-device, and the
        # host readback happens at the next consume/admission —
        # OVERLAPPED with chunk compute instead of serializing the
        # admission with a 30-140 ms relay round-trip.
        self._pending_firsts = None
        # Finish events produced by a deferred-firsts flush (first token
        # was a stop / budget already spent). Queued rather than
        # returned so no call site can drop them (an _admit_batch-
        # triggered flush has no event consumer of its own); drained
        # into the next step()/pump()/_consume_chunk() return.
        self._flush_events: List[StepEvent] = []
        self._inflight: List[_ChunkTicket] = []
        self._step_mutex = threading.Lock()  # serializes dispatch/consume
        # Shared by every _CompileOnce wrapper in this engine: first
        # calls (trace+lower+compile) serialize engine-wide, compiled
        # dispatches go through lock-free (see _CompileOnce).
        self._compile_lock = threading.Lock()
        # Guards the jit-wrapper memo dicts only (construction is
        # cheap); see _chunk_jit.
        self._jit_cache_lock = threading.Lock()
        # Serializes _admit_batch's flush -> prefill -> pending-firsts
        # assignment: two concurrent batched admissions could otherwise
        # both pass the flush and overwrite _pending_firsts, making the
        # first batch's slots flush first tokens from the SECOND
        # batch's vector (dummy-row samples).
        self._batch_mutex = threading.Lock()
        self._rng = jax.random.PRNGKey(seed)
        self._lock = threading.Lock()
        self._cancelled: set = set()  # rids cancelled mid-prefill
        self._prefill_fns: Dict[int, callable] = {}
        self._prefill_batch_fns: Dict[int, callable] = {}
        self._chunk_fns: Dict[int, callable] = {}
        self.warmed: Dict[str, list] = {"prefill": [], "decode": []}
        from ..utils.profiling import StepTimer

        self.timer = StepTimer()  # decode step-time / tok/s (see /stats)
        self._build_jits()

    # ------------------------------------------------------------------
    # Jitted device functions
    # ------------------------------------------------------------------

    def _make_tp_decode(self):
        """shard_map'd decode step: each model-axis shard runs the
        single-device Pallas kernels on its local weight/delta/cache
        slice; psum at the Megatron reduction points happens inside
        llama.decode_step (tp_axis=). This is what makes Pallas decode
        compose with the TP mesh — without it, 70B-class serving fell
        back to the ~12x-slower XLA tenant-delta path."""
        import dataclasses

        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from ..parallel import sharding as psh
        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

        cfg, dtype, tp, model = self.cfg, self.compute_dtype, self.tp, \
            self.model
        cfg_local = dataclasses.replace(
            cfg, num_heads=cfg.num_heads // tp,
            num_kv_heads=cfg.num_kv_heads // tp)
        param_specs = psh.serving_param_specs(cfg, self.stack.params,
                                              tp=tp)
        delta_specs = psh.serving_delta_specs(self.stack.deltas)
        sspec = psh.cache_scale_spec() if self.kv_quant else None
        cache_specs = llama.KVCache(k=psh.cache_spec(), v=psh.cache_spec(),
                                    length=P(DATA_AXIS),
                                    k_scale=sspec, v_scale=sspec)

        def per_shard(params, deltas, cache, tokens, tenant_ids):
            return model.decode_step(
                cfg_local, params, tokens, cache, deltas=deltas,
                tenant_ids=tenant_ids, compute_dtype=dtype,
                kernel="pallas", tp_axis=MODEL_AXIS)

        return shard_map(
            per_shard, mesh=self.mesh,
            in_specs=(param_specs, delta_specs, cache_specs,
                      P(DATA_AXIS, None), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS, None, MODEL_AXIS), cache_specs),
            check_rep=False)

    def _build_jits(self):
        step_impl = None
        if (self.kernel == "pallas" and self.mesh is not None
                and self.mesh.size > 1):
            step_impl = self._make_tp_decode()
        self._step_impl = step_impl

        def insert_fn(cache, rowcache, row_len, slot):
            new = llama.KVCache(
                k=cache.k.at[:, slot].set(rowcache.k[:, 0]),
                v=cache.v.at[:, slot].set(rowcache.v[:, 0]),
                length=cache.length.at[slot].set(row_len),
                k_scale=(None if cache.k_scale is None else
                         cache.k_scale.at[:, slot].set(rowcache.k_scale[:, 0])),
                v_scale=(None if cache.v_scale is None else
                         cache.v_scale.at[:, slot].set(rowcache.v_scale[:, 0])))
            return new

        self._insert = _CompileOnce(
            jax.jit(insert_fn, donate_argnums=(0,)), self._compile_lock)

        def insert_many_fn(cache, rowcache, lengths, mask):
            # Batched admission insert: rowcache row i corresponds to
            # slot i (the batch prefill always runs all max_slots rows);
            # masked-out rows (dummies, cancelled, still-decoding slots)
            # keep the live cache contents.
            def merge(axes_mask, new, old):
                return jnp.where(axes_mask, new, old)

            m_cache = mask[None, :, None, None, None]  # (L,B,S,KV,hd)
            sc = None if cache.k_scale is None else \
                merge(mask[None, :, None, None], rowcache.k_scale,
                      cache.k_scale)
            vc = None if cache.v_scale is None else \
                merge(mask[None, :, None, None], rowcache.v_scale,
                      cache.v_scale)
            return llama.KVCache(
                k=merge(m_cache, rowcache.k, cache.k),
                v=merge(m_cache, rowcache.v, cache.v),
                length=jnp.where(mask, lengths, cache.length),
                k_scale=sc, v_scale=vc)

        self._insert_many = _CompileOnce(
            jax.jit(insert_many_fn, donate_argnums=(0,)),
            self._compile_lock)

    def _chunk_jit(self, k: int):
        """Jitted chain of up to ``k`` decode+sample steps with one host
        sync: tokens feed back step-to-step on device, all sampled
        tokens come back in one readback. The relay round-trip
        (30-140 ms) amortizes over k instead of dominating every token
        (the reference does one ``model(...)`` + host argmax per token,
        demo_backend.py:202-251).

        Stop detection is ON DEVICE: a lane that samples one of its stop
        tokens (first DEVICE_STOPS ids) or exhausts its remaining-token
        budget ``rem`` is PARKED for the rest of the chunk — its cache
        length stops advancing (no post-stop pollution; the cache state
        at readback equals stepwise decoding exactly) — and the
        while_loop exits as soon as every lane is parked, so a chunk
        whose lanes all finish at step j costs j device steps, not k.
        ``rem`` also carries each lane's max_new_tokens/max_seq budget,
        so one near-cap lane parks itself instead of dragging the whole
        batch's chunk size down.

        The per-lane decode state ``(tokens, live, rem)`` is CARRIED ON
        DEVICE call-to-call and returned, with a per-lane host override
        (``set_mask`` + ``set_tokens/set_live/set_rem``): lanes the host
        touched since the previous dispatch (admission, finish, cancel)
        take the host values, all others continue from the previous
        chunk's device outputs. That makes chunk N+1 dispatchable
        BEFORE chunk N's tokens are read back — the host readback
        (30-140 ms through the relay) overlaps chunk N+1's device
        compute instead of serializing with it (see _dispatch_chunk).

        Output token rows are -1-sentinel-filled for parked/inactive
        lanes and past the early exit, so the host consume loop can
        assert device parking agrees with its own budget/stop
        bookkeeping instead of silently emitting garbage."""
        # Memoize under a dedicated (fast) cache lock — NOT the
        # compile lock, which a cold _CompileOnce holds for its whole
        # 1-5 min remote compile and would stall warm lookups here.
        # An unlocked check-then-insert
        # let two concurrent cold callers each build (and later
        # remote-compile) their own program object for the same k.
        # Construction here is cheap; compilation happens inside
        # _CompileOnce on the first call.
        with self._jit_cache_lock:
            if k in self._chunk_fns:
                return self._chunk_fns[k]
            return self._chunk_jit_build(k)

    def _chunk_jit_build(self, k: int):
        cfg, dtype, kernel = self.cfg, self.compute_dtype, self.kernel
        model, step_impl = self.model, self._step_impl

        from .sampling import sample_tokens

        def chunk_fn(params, deltas, cache, tokens, live_in, rem_in,
                     set_mask, set_tokens, set_live, set_rem, tenant_ids,
                     temps, top_ks, top_ps, stop_ids, vocab_sizes, rng):
            bsz = tokens.shape[0]
            tokens = jnp.where(set_mask[:, None], set_tokens[:, None],
                               tokens)
            rem = jnp.where(set_mask, set_rem, rem_in)
            live0 = jnp.where(set_mask, set_live, live_in) & (rem > 0)
            toks0 = jnp.full((k, bsz), -1, jnp.int32)

            def cond(carry):
                i, tokens, cache, live, rem_c, toks = carry
                return (i < k) & jnp.any(live)

            def body(carry):
                i, tokens, cache, live, rem_c, toks = carry
                old_len = cache.length
                if step_impl is not None:
                    logits, cache = step_impl(params, deltas, cache,
                                              tokens, tenant_ids)
                else:
                    logits, cache = model.decode_step(
                        cfg, params, tokens, cache, deltas=deltas,
                        tenant_ids=tenant_ids, compute_dtype=dtype,
                        kernel=kernel)
                logits = logits[:, 0].astype(jnp.float32)  # (B, V)
                vmask = (jnp.arange(logits.shape[-1])[None, :]
                         < vocab_sizes[tenant_ids][:, None])
                logits = jnp.where(vmask, logits, NEG_INF)
                nxt = sample_tokens(jax.random.fold_in(rng, i), logits,
                                    temps, top_ks, top_ps)
                # Parked/inactive lanes don't advance (cache row frozen).
                cache = cache._replace(
                    length=jnp.where(live, cache.length, old_len))
                toks = toks.at[i].set(jnp.where(live, nxt, -1))
                rem_c = jnp.where(live, rem_c - 1, rem_c)
                hit_stop = jnp.any(nxt[:, None] == stop_ids, axis=1)
                live = live & ~hit_stop & (rem_c > 0)
                tokens = jnp.where(live[:, None], nxt[:, None], tokens)
                return (i + 1, tokens, cache, live, rem_c, toks)

            _, tokens, cache, live, rem, toks = jax.lax.while_loop(
                cond, body, (jnp.int32(0), tokens, cache, live0,
                             rem, toks0))
            # toks: (k, B), -1 where a lane was parked; the carried
            # (tokens, live, rem) seed the next chunk device-side.
            return toks, tokens, live, rem, cache

        fn = _CompileOnce(jax.jit(chunk_fn, donate_argnums=(2, 3, 4, 5)),
                          self._compile_lock)
        self._chunk_fns[k] = fn
        return fn

    def _make_tp_prefill(self):
        """shard_map'd prefill forward (the TP-serving admission path):
        every model-axis shard runs the flash prefill kernel on its
        LOCAL heads and the per-shard delta kernels on its local slices,
        with psum at the Megatron reduction points inside llama.forward
        (tp_axis=). Without this, 70B-class admission cost was O(layers
        x Sq x Sk) XLA attention per prefill — the flash kernel never
        materializes the score tensor. Batch is 1 (one admission), so
        only the model axis is mapped; the data axis replicates."""
        import dataclasses as dc

        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from ..parallel import sharding as psh
        from ..parallel.mesh import MODEL_AXIS

        cfg, dtype, tp, model = self.cfg, self.compute_dtype, self.tp, \
            self.model
        max_seq = self.max_seq
        cfg_local = dc.replace(cfg, num_heads=cfg.num_heads // tp,
                               num_kv_heads=cfg.num_kv_heads // tp)
        param_specs = psh.serving_param_specs(cfg, self.stack.params,
                                              tp=tp)
        delta_specs = psh.serving_delta_specs(self.stack.deltas)
        # Row cache (L, 1, S, KV, hd): kv heads on model, batch-of-one
        # replicated over data.
        rspec = P(None, None, None, MODEL_AXIS, None)
        sspec = (P(None, None, None, MODEL_AXIS) if self.kv_quant
                 else None)
        cache_specs = llama.KVCache(k=rspec, v=rspec, length=P(),
                                    k_scale=sspec, v_scale=sspec)
        kv_kw = {"kv_quant": True} if self.kv_quant else {}

        def per_shard(params, deltas, tokens, length, tenant_id):
            logits, rowcache = model.forward(
                cfg_local, params, tokens, lengths=length, deltas=deltas,
                tenant_ids=tenant_id, compute_dtype=dtype,
                return_cache=True, cache_max_seq=max_seq,
                kernel="pallas", tp_axis=MODEL_AXIS, **kv_kw)
            # (V_local,) — the caller's out_specs reassemble the vocab.
            last = logits[0, length[0] - 1]
            return last, rowcache

        return shard_map(
            per_shard, mesh=self.mesh,
            in_specs=(param_specs, delta_specs, P(), P(), P()),
            out_specs=(P(MODEL_AXIS), cache_specs),
            check_rep=False)

    def _prefill_jit(self, bucket: int):
        with self._jit_cache_lock:  # see _chunk_jit's memoization note
            if bucket in self._prefill_fns:
                return self._prefill_fns[bucket]
            return self._prefill_jit_build(bucket)

    def _prefill_jit_build(self, bucket: int):
        cfg, dtype, max_seq = self.cfg, self.compute_dtype, self.max_seq

        kernel = self.kernel
        tp_impl = None
        if self.mesh is not None and self.mesh.size > 1:
            if kernel == "pallas" and self.model is llama:
                # shard_map flash prefill: local heads per model shard,
                # psum at o_proj/down_proj (see _make_tp_prefill).
                tp_impl = self._make_tp_prefill()
            else:
                # GSPMD XLA path: large-M prefill shapes are MXU-bound
                # where XLA is at roofline (BENCHNOTES.md). Pair-layout
                # deltas un-pair on the fly.
                kernel = "xla"
        model = self.model

        kv_kw = {"kv_quant": True} if self.kv_quant else {}

        from .sampling import sample_tokens

        def prefill_fn(params, deltas, tokens, length, tenant_id,
                       vocab_sizes, temp, top_k, top_p, rng):
            if tp_impl is not None:
                last, rowcache = tp_impl(params, deltas, tokens, length,
                                         tenant_id)
                last = last.astype(jnp.float32)
            else:
                logits, rowcache = model.forward(
                    cfg, params, tokens, lengths=length, deltas=deltas,
                    tenant_ids=tenant_id, compute_dtype=dtype,
                    return_cache=True, cache_max_seq=max_seq,
                    kernel=kernel, **kv_kw)
                last = logits[0, length[0] - 1].astype(jnp.float32)
            vmask = jnp.arange(last.shape[-1]) < vocab_sizes[tenant_id[0]]
            last = jnp.where(vmask, last, NEG_INF)
            # First generated token sampled IN-JIT (temp 0 = greedy):
            # admission needs no separate eager sampling dispatch, just
            # one scalar readback of the result.
            first = sample_tokens(rng, last[None], temp[None],
                                  top_k[None], top_p[None])[0]
            return first, last, rowcache

        fn = _CompileOnce(jax.jit(prefill_fn), self._compile_lock)
        self._prefill_fns[bucket] = fn
        return fn

    def _prefill_batch_jit(self, bucket: int):
        """Batched admission prefill: ALL ``max_slots`` rows prefill in
        one device call (row i == slot i; dummy rows are length-1 and
        masked out of the insert). At decode-era buckets the prefill is
        weight-streaming-bound, so B rows cost barely more than one —
        admitting a burst of N requests becomes ONE dispatch + ONE
        scalar-vector readback instead of N of each (measured 95 ms
        median per serial admission at 16L, engine_bisect). Used by
        generate(); single submits keep the B=1 program. Not built for
        the shard_map TP prefill path (B=1 there) — callers fall back
        to serial admission when that path is active."""
        with self._jit_cache_lock:  # see _chunk_jit's memoization note
            if bucket in self._prefill_batch_fns:
                return self._prefill_batch_fns[bucket]
            return self._prefill_batch_jit_build(bucket)

    def _prefill_batch_jit_build(self, bucket: int):
        cfg, dtype, max_seq = self.cfg, self.compute_dtype, self.max_seq
        kernel = self.kernel
        if self.mesh is not None and self.mesh.size > 1 \
                and kernel == "pallas":
            raise RuntimeError("batched prefill not available on the "
                               "shard_map TP path")
        model = self.model
        kv_kw = {"kv_quant": True} if self.kv_quant else {}

        from .sampling import sample_tokens

        def prefill_batch_fn(params, deltas, tokens, lengths, tenant_ids,
                             vocab_sizes, temps, top_ks, top_ps, rng):
            bsz = tokens.shape[0]
            logits, rowcache = model.forward(
                cfg, params, tokens, lengths=lengths, deltas=deltas,
                tenant_ids=tenant_ids, compute_dtype=dtype,
                return_cache=True, cache_max_seq=max_seq,
                kernel=kernel, **kv_kw)
            last = logits[jnp.arange(bsz), lengths - 1] \
                .astype(jnp.float32)                       # (B, V)
            vmask = (jnp.arange(last.shape[-1])[None, :]
                     < vocab_sizes[tenant_ids][:, None])
            last = jnp.where(vmask, last, NEG_INF)
            first = sample_tokens(rng, last, temps, top_ks, top_ps)
            return first, rowcache

        fn = _CompileOnce(jax.jit(prefill_batch_fn), self._compile_lock)
        self._prefill_batch_fns[bucket] = fn
        return fn

    # ------------------------------------------------------------------
    # Warmup
    # ------------------------------------------------------------------

    def warmup(self, chunks: Sequence[int] = ()) -> Dict[str, list]:
        """Eagerly compile every prefill bucket and the decode-chunk
        programs so no live request pays a compile (reference parity:
        the demo pre-generates at prompt sizes 32-512 at startup,
        demo_backend.py:317-328 — essential here, where a cold bucket
        costs a 1-5 min remote compile inside an HTTP request).

        Runs dummy prefills (results discarded) and one dummy decode per
        chunk size against the engine cache; safe only while no requests
        are in flight. Returns {"prefill": buckets, "decode": chunks}.
        """
        with self._lock:
            if any(s.active or s.reserved for s in self.slots):
                raise RuntimeError("warmup requires an idle engine")
        rowcache = None
        for bucket in self.prefill_buckets:
            fn = self._prefill_jit(bucket)
            tokens = np.zeros((1, bucket), np.int32)
            tokens[0, 0] = 1
            _f, _l, rowcache = fn(
                self.stack.params, self.stack.deltas, jnp.asarray(tokens),
                jnp.asarray([1], jnp.int32), jnp.asarray([0], jnp.int32),
                self.stack.vocab_sizes, jnp.float32(0), jnp.int32(0),
                jnp.float32(1.0), jax.random.PRNGKey(0))
        if rowcache is not None:
            # Warm the admission-side cache insert too (row_len 0 = the
            # inserted garbage row stays dead): it compiled lazily on
            # the FIRST live admission before — measured 2.26 s on a
            # warmed 8L engine (experiments/engine_bisect.py), paid
            # inside a user-visible submit().
            with self._lock:
                self.cache = self._insert(self.cache, rowcache,
                                          jnp.int32(0), 0)
        if not self._tp_serial_admission:
            # Batched-admission programs (generate()'s burst path).
            B = self.max_slots
            rowc = None
            for bucket in self.prefill_buckets:
                fnb = self._prefill_batch_jit(bucket)
                tokens = np.zeros((B, bucket), np.int32)
                tokens[:, 0] = 1
                _f, rowc = fnb(
                    self.stack.params, self.stack.deltas,
                    jnp.asarray(tokens), jnp.ones((B,), jnp.int32),
                    jnp.zeros((B,), jnp.int32), self.stack.vocab_sizes,
                    jnp.zeros((B,), jnp.float32),
                    jnp.zeros((B,), jnp.int32),
                    jnp.ones((B,), jnp.float32), jax.random.PRNGKey(0))
            if rowc is not None:
                with self._lock:
                    self.cache = self._insert_many(
                        self.cache, rowc, jnp.zeros((B,), jnp.int32),
                        jnp.zeros((B,), bool))
        # step() always uses decode_chunk (per-lane rem budgets park
        # near-cap lanes on device instead of shrinking the chunk), so
        # ONE chunk program serves the engine's whole life; extra
        # ``chunks`` entries are only for callers that plan to rebuild
        # the engine with a different decode_chunk later.
        ks = sorted({*chunks} | {self.decode_chunk})
        B = self.max_slots
        for k in ks:
            fn = self._chunk_jit(k)
            with self._lock:
                # set_mask all-True / set_live all-False: every lane
                # parks instantly (lengths untouched) but the full chunk
                # program compiles.
                toks, _t, _l, _r, self.cache = fn(
                    self.stack.params, self.stack.deltas, self.cache,
                    jnp.zeros((B, 1), jnp.int32),
                    jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32),
                    jnp.ones((B,), bool), jnp.zeros((B,), jnp.int32),
                    jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32),
                    jnp.asarray(self.tenant_ids),
                    jnp.asarray(self.temps), jnp.asarray(self.top_ks),
                    jnp.asarray(self.top_ps), jnp.asarray(self._stop_ids),
                    self.stack.vocab_sizes, jax.random.PRNGKey(0))
                jax.block_until_ready(toks)
        self.warmed = {"prefill": list(self.prefill_buckets),
                       "decode": ks}
        return self.warmed

    # ------------------------------------------------------------------
    # Host-side scheduling
    # ------------------------------------------------------------------

    def free_slots(self) -> List[int]:
        return [i for i, s in enumerate(self.slots)
                if not s.active and not s.reserved]

    def cancel(self, request_id: Optional[str]) -> bool:
        """Stop generating for ``request_id`` and free its slot (the
        client disconnected — without this, an abandoned stream keeps
        burning decode lanes to max_new_tokens). A request whose prefill
        is still in flight is cancelled at admission completion.
        Returns True if anything was (or will be) cancelled."""
        if request_id is None:
            return False
        with self._lock:
            for i, st in enumerate(self.slots):
                if (st.active and st.request is not None
                        and st.request.request_id == request_id):
                    st.active = False
                    self._dirty[i] = True
                    return True
            for st in self.slots:
                if (st.reserved and st.request is not None
                        and st.request.request_id == request_id):
                    self._cancelled.add(request_id)
                    return True
        return False

    def submit(self, req: Request) -> int:
        """Admit a request: prefill its prompt into a free slot. Returns
        the slot index. Raises RuntimeError when full.

        The expensive part — the prefill forward on device — runs
        OUTSIDE the engine lock: the slot is only reserved under the
        lock, so concurrent decode steps (and other admissions) proceed
        while a long prompt prefills. Only the KV-cache insert and slot
        bookkeeping re-take the lock."""
        self._validate(req)
        with self._lock:
            free = self.free_slots()
            if not free:
                raise EngineFullError("engine full")
            slot = self._pick_slot(free, req.tenant_id)
            self.slots[slot].reserved = True
            # Visible to cancel() while the prefill is in flight.
            self.slots[slot].request = req
        try:
            self._admit(slot, req)
        finally:
            # One atomic cleanup under the lock. While ``reserved`` was
            # True no other thread could claim the slot (free_slots
            # excludes it), so the slot is still ours here; the old
            # UNLOCKED sequence cleared reserved first and could then
            # clobber a concurrent re-claimer's Request (losing its
            # cancel() visibility). ``st.request`` is ``req`` (normal),
            # or None (cancelled-mid-prefill path already cleared it).
            with self._lock:
                st = self.slots[slot]
                st.reserved = False
                if not st.active and st.request is req:
                    # Failed admission: leave no stale Request on the
                    # (free) slot and no leaked rid in _cancelled (the
                    # consumption point in _admit is never reached when
                    # the prefill itself raises).
                    st.request = None
                    if req.request_id is not None:
                        self._cancelled.discard(req.request_id)
        return slot

    def _validate(self, req: Request):
        if not (0 <= req.tenant_id < self.stack.num_tenants):
            raise ValueError(
                f"tenant_id {req.tenant_id} out of range "
                f"[0, {self.stack.num_tenants})")
        if not req.prompt_ids:
            raise ValueError("empty prompt")
        if req.max_new_tokens < 1:
            raise ValueError(
                f"max_new_tokens must be >= 1 (got {req.max_new_tokens};"
                f" admission always produces the prefill-sampled token)")
        if len(req.prompt_ids) > self.max_seq - 1:
            raise ValueError(f"prompt too long: {len(req.prompt_ids)} > "
                             f"{self.max_seq - 1}")

    @property
    def _tp_serial_admission(self) -> bool:
        """shard_map TP prefill is batch-1; batched admission falls back
        to serial submits there."""
        return (self.kernel == "pallas" and self.mesh is not None
                and self.mesh.size > 1)

    def _submit_batch(self, reqs: Sequence[Request]):
        """Admit up to ``len(reqs)`` requests with ONE batched prefill
        device call and ONE readback (vs one of each per request —
        measured 95 ms median per serial admission at 16L; the batched
        prefill streams the same weights once for all rows). Requests
        beyond the free-slot count are not admitted. Returns the
        ``[(slot, request), ...]`` pairs actually ACTIVATED, in request
        order."""
        for req in reqs:
            self._validate(req)
        with self._lock:
            batch = []
            for req in reqs:
                free = [i for i, s in enumerate(self.slots)
                        if not s.active and not s.reserved]
                if not free:
                    break
                slot = self._pick_slot(free, req.tenant_id)
                self.slots[slot].reserved = True
                self.slots[slot].request = req
                batch.append((slot, req))
        if not batch:
            return []
        try:
            self._admit_batch(batch)
        finally:
            with self._lock:
                for slot, req in batch:
                    st = self.slots[slot]
                    st.reserved = False
                    if not st.active:
                        st.request = None
                        if req.request_id is not None:
                            self._cancelled.discard(req.request_id)
        return [(s, r) for s, r in batch
                if self.slots[s].active and self.slots[s].request is r]

    def _admit_batch(self, batch):
        with self._batch_mutex:
            self._admit_batch_locked(batch)

    def _admit_batch_locked(self, batch):
        B = self.max_slots
        bucket = max(next((b for b in self.prefill_buckets
                           if b >= len(req.prompt_ids)), self.max_seq)
                     for _, req in batch)
        tokens = np.zeros((B, bucket), np.int32)
        tokens[:, 0] = 1                       # dummy rows: 1-token pad
        lengths = np.ones((B,), np.int32)
        tids = np.zeros((B,), np.int32)
        temps = np.zeros((B,), np.float32)
        top_ks = np.zeros((B,), np.int32)
        top_ps = np.ones((B,), np.float32)
        for slot, req in batch:
            ids = req.prompt_ids
            tokens[slot, :len(ids)] = ids
            lengths[slot] = len(ids)
            tids[slot] = req.tenant_id
            temps[slot] = req.temperature
            top_ks[slot] = req.top_k
            top_ps[slot] = req.top_p
        fn = self._prefill_batch_jit(bucket)
        # At most one deferred-firsts vector at a time: resolve any
        # previous burst's before producing a new one.
        self._flush_pending_firsts()
        with self._lock:
            self._rng, sub = jax.random.split(self._rng)
        first_dev, rowcache = fn(
            self.stack.params, self.stack.deltas, jnp.asarray(tokens),
            jnp.asarray(lengths), jnp.asarray(tids),
            self.stack.vocab_sizes, jnp.asarray(temps),
            jnp.asarray(top_ks), jnp.asarray(top_ps), sub)
        # NO host sync here: the sampled first tokens stay on device
        # (self._pending_firsts) and feed the next chunk dispatch
        # directly; _flush_pending_firsts reads them back later,
        # overlapped with that chunk's device compute. Admission cost
        # drops from (prefill + readback RTT) to dispatch-only.
        with self._lock:
            mask = np.zeros((B,), bool)
            for slot, req in batch:
                if (req.request_id is not None
                        and req.request_id in self._cancelled):
                    self._cancelled.discard(req.request_id)
                    req.cancelled = True
                    self.slots[slot].request = None
                    continue
                mask[slot] = True
            self.cache = self._insert_many(
                self.cache, rowcache, jnp.asarray(lengths),
                jnp.asarray(mask))
            for slot, req in batch:
                if not mask[slot]:
                    continue
                st = self.slots[slot]
                st.active = True
                st.tenant_id = req.tenant_id
                st.request = req
                st.generated = []
                st.pending_first = True
                st.prompt_len = len(req.prompt_ids)
                st.epoch += 1
                self.tenant_ids[slot] = req.tenant_id
                self.temps[slot] = req.temperature
                self.top_ks[slot] = req.top_k
                self.top_ps[slot] = req.top_p
                self._stop_ids[slot] = -1
                ids_dev = list(req.stop_token_ids)[:DEVICE_STOPS]
                self._stop_ids[slot, :len(ids_dev)] = ids_dev
                self._dirty[slot] = True
            self._pending_firsts = first_dev

    def _flush_pending_firsts(self) -> None:
        """Resolve a deferred batched-admission first-token vector: ONE
        host readback (outside the lock — by now it overlaps in-flight
        chunk compute), fill each pending slot's ``generated[0]`` /
        ``first_token``, and run the deferred finish checks. A first
        token that already hits a stop/length bumps the slot epoch so
        any speculated in-flight chunk tokens for that lane are
        discarded at consume (the lane burned at most one chunk of
        device steps — the rare-case price of not syncing admissions).

        Finish events are QUEUED on ``self._flush_events`` (drained by
        the next step()/pump()/_consume_chunk) so no call site — in
        particular an _admit_batch-triggered flush — can drop them.
        """
        dev = self._pending_firsts
        if dev is None:
            return
        firsts = np.asarray(dev)               # host sync, no lock held
        with self._lock:
            if self._pending_firsts is not dev:
                return                         # concurrent flush won
            self._pending_firsts = None
            # Capture INSIDE the lock: a concurrent _drain_flush_events
            # swaps the list, and events appended to a pre-swap capture
            # would never be delivered.
            events = self._flush_events
            for i, st in enumerate(self.slots):
                if not st.pending_first:
                    continue
                st.pending_first = False
                if not st.active or st.request is None:
                    continue                   # cancelled while pending
                first = int(firsts[i])
                st.request.first_token = first
                st.generated.insert(0, first)
                if len(st.generated) == 1:
                    self._last_tokens[i] = first
                reason = self._finish_checks(i)
                if reason is not None:
                    st.active = False
                    st.epoch += 1              # drop speculated tokens
                    self._dirty[i] = True
                    events.append(StepEvent(
                        slot=i, request_id=st.request.request_id,
                        token=st.generated[-1], finished=True,
                        finish_reason=reason, new_token=False))

    def _drain_flush_events(self) -> List[StepEvent]:
        with self._lock:
            evs, self._flush_events = self._flush_events, []
            return evs

    def _pick_slot(self, free: List[int], tenant_id: int) -> int:
        """Prefer a free slot adjacent to an active slot of the same
        tenant: the decode kernels walk rows in slot order, and Pallas
        skips the packed-delta block DMA when consecutive grid steps
        address the same tenant's block — measured 1.49x on delta work
        for adjacent duplicates (experiments/grouped_pair_probe.py)."""
        def score(s: int) -> int:
            return sum(
                1 for nb in (s - 1, s + 1)
                if 0 <= nb < self.max_slots and self.slots[nb].active
                and self.slots[nb].tenant_id == tenant_id)
        return max(free, key=score)  # ties resolve to the lowest slot

    def _admit(self, slot: int, req: Request):
        # Device-side prefill: pure function of the stack, runs without
        # the engine lock (decode steps proceed concurrently).
        ids = list(req.prompt_ids)
        bucket = next((b for b in self.prefill_buckets if b >= len(ids)),
                      self.max_seq)
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, :len(ids)] = ids
        fn = self._prefill_jit(bucket)
        with self._lock:
            self._rng, sub = jax.random.split(self._rng)
        first_dev, _last, rowcache = fn(
            self.stack.params, self.stack.deltas, jnp.asarray(tokens),
            jnp.asarray([len(ids)], jnp.int32),
            jnp.asarray([req.tenant_id], jnp.int32),
            self.stack.vocab_sizes,
            jnp.float32(req.temperature), jnp.int32(req.top_k),
            jnp.float32(req.top_p), sub)
        # The only admission host sync: one scalar readback (outside
        # every lock, so concurrent admissions' readbacks overlap).
        first = int(first_dev)
        req.first_token = first
        with self._lock:
            if (req.request_id is not None
                    and req.request_id in self._cancelled):
                # Client vanished while the prefill ran: never activate.
                self._cancelled.discard(req.request_id)
                req.cancelled = True
                self.slots[slot].request = None
                return
            # The insert donates the live cache buffer — must not race a
            # decode step (which also consumes/donates it). With
            # pipelined decode the donated input may be an in-flight
            # chunk's output future: the insert just enqueues behind it
            # device-side (the slot's lane is parked in that chunk, so
            # ordering is safe) — no host wait.
            self.cache = self._insert(self.cache, rowcache,
                                      jnp.int32(len(ids)), slot)
            st = self.slots[slot]
            st.active = True
            # A slot freed by cancel() while its batched-admission first
            # token was still deferred must not inherit the stale flag —
            # the flush would inject the old request's token into this
            # one's stream.
            st.pending_first = False
            st.tenant_id = req.tenant_id
            st.request = req
            st.generated = [first]
            st.prompt_len = len(ids)
            st.epoch += 1
            self.tenant_ids[slot] = req.tenant_id
            self.temps[slot] = req.temperature
            self.top_ks[slot] = req.top_k
            self.top_ps[slot] = req.top_p
            self._stop_ids[slot] = -1
            ids_dev = list(req.stop_token_ids)[:DEVICE_STOPS]
            self._stop_ids[slot, :len(ids_dev)] = ids_dev
            self._last_tokens[slot] = first
            self._dirty[slot] = True

    def _finish_checks(self, slot: int) -> Optional[str]:
        st = self.slots[slot]
        if st.pending_first:
            # The first token is still on device — every check involves
            # it (stop membership, counts), so all checks defer to
            # _flush_pending_firsts.
            return None
        req = st.request
        tok = st.generated[-1]
        if tok in req.stop_token_ids:
            return "stop"
        if len(st.generated) >= req.max_new_tokens:
            return "length"
        if st.prompt_len + len(st.generated) >= self.max_seq - 1:
            # Deliberately conservative by one slot: the final sampled
            # token is never written back to the cache, so index
            # max_seq-1 technically fits one more step — but an
            # off-by-one here scatter-clamps SILENTLY (jnp .at[].set
            # clamps OOB indices), corrupting the newest cache row.
            # One token of headroom is the cheap safe margin; mirrored
            # in _slot_budget so host and device stay consistent.
            return "length"
        return None

    def _slot_budget(self, slot: int) -> int:
        """How many more tokens this slot may accept: its
        max_new_tokens budget AND its cache-capacity room (the same two
        limits _finish_checks applies host-side). The device chunk
        parks the lane when this hits zero, so per-lane caps never
        shrink the chunk for the rest of the batch. A deferred first
        token counts as generated even though its readback is pending."""
        st = self.slots[slot]
        gen = len(st.generated) + (1 if st.pending_first else 0)
        return min(st.request.max_new_tokens - gen,
                   (self.max_seq - 1) - st.prompt_len - gen)

    def _dispatch_chunk(self):
        """Launch ONE chunked-decode device call for the current host
        state without waiting for it. Returns ``(ticket, pre_events)``:
        the ticket for :meth:`_consume_chunk` (None when no lane could
        decode) plus finish-only events for slots that had already hit a
        stop/limit before decoding. Lanes whose host state is unchanged
        since the previous dispatch continue from the DEVICE-carried
        (tokens, live, rem) state, so back-to-back dispatches chain on
        device with no host round-trip between them."""
        with self._lock:
            active = np.asarray([s.active for s in self.slots], bool)
            pre_events: List[StepEvent] = []
            for i in np.nonzero(active)[0]:
                reason = self._finish_checks(int(i))
                if reason is not None:
                    st = self.slots[int(i)]
                    pre_events.append(StepEvent(
                        slot=int(i), request_id=st.request.request_id,
                        token=st.generated[-1], finished=True,
                        finish_reason=reason, new_token=False))
                    st.active = False
                    self._dirty[int(i)] = True
                    active[i] = False
            if not active.any():
                return None, pre_events

            self._rng, sub = jax.random.split(self._rng)
            fn = self._chunk_jit(self.decode_chunk)
            first = self._dev_tokens is None
            set_mask = (np.ones((self.max_slots,), bool) if first
                        else self._dirty.copy())
            set_rem = np.zeros((self.max_slots,), np.int32)
            for i in np.nonzero(active & set_mask)[0]:
                set_rem[i] = self._slot_budget(int(i))
            if first:
                carry_tok = jnp.zeros((self.max_slots, 1), jnp.int32)
                carry_live = jnp.zeros((self.max_slots,), bool)
                carry_rem = jnp.zeros((self.max_slots,), jnp.int32)
            else:
                carry_tok = self._dev_tokens
                carry_live = self._dev_live
                carry_rem = self._dev_rem
            set_tok = jnp.asarray(self._last_tokens)
            if self._pending_firsts is not None:
                # Deferred batched-admission firsts feed the chunk
                # DEVICE-TO-DEVICE (no readback on the dispatch path).
                pend = np.asarray([s.pending_first for s in self.slots],
                                  bool)
                set_tok = jnp.where(jnp.asarray(pend),
                                    self._pending_firsts, set_tok)
            toks, self._dev_tokens, self._dev_live, self._dev_rem, \
                self.cache = fn(
                    self.stack.params, self.stack.deltas, self.cache,
                    carry_tok, carry_live, carry_rem,
                    jnp.asarray(set_mask), set_tok,
                    jnp.asarray(active), jnp.asarray(set_rem),
                    jnp.asarray(self.tenant_ids),
                    jnp.asarray(self.temps), jnp.asarray(self.top_ks),
                    jnp.asarray(self.top_ps),
                    jnp.asarray(self._stop_ids),
                    self.stack.vocab_sizes, sub)
            self._dirty[:] = False
            epochs = np.asarray([s.epoch for s in self.slots], np.int64)
            return _ChunkTicket(toks=toks, active=active,
                                epochs=epochs), pre_events

    def _consume_chunk(self, ticket: _ChunkTicket) -> List[StepEvent]:
        """Read back one dispatched chunk's tokens (the only host sync)
        and apply them to host state. Returns per-slot events in
        generation order (a slot may emit several tokens; completion
        info rides the last one)."""
        with self.timer.step(tokens=0) as tick:
            # Resolve deferred admission firsts FIRST: their tokens
            # precede this chunk's in every pending lane's stream, and
            # a first-token stop/length bumps the epoch so this ticket
            # is skipped for that lane (no desync assertion).
            self._flush_pending_firsts()
            events: List[StepEvent] = self._drain_flush_events()
            toks = np.asarray(ticket.toks)  # (k, B) — ONE host sync,
            # deliberately OUTSIDE the engine lock: admissions and
            # cancels proceed while the device chunk drains.
            with self._lock:
                for i in np.nonzero(ticket.active)[0]:
                    i = int(i)
                    st = self.slots[i]
                    if not st.active or st.epoch != ticket.epochs[i]:
                        continue  # cancelled or re-admitted mid-flight
                    for j in range(toks.shape[0]):
                        tok = int(toks[j, i])
                        if tok < 0:
                            # Device parked this lane at step j without
                            # the host having found a finish reason in
                            # the consumed tokens: the device budget/
                            # stop bookkeeping desynced from
                            # _finish_checks — fail loudly rather than
                            # emit garbage (see chunk_fn's sentinel).
                            raise RuntimeError(
                                f"slot {i}: device parked after {j} "
                                f"tokens but host found no stop/length "
                                f"(budget desync)")
                        st.generated.append(tok)
                        self._last_tokens[i] = tok
                        tick.tokens += 1
                        reason = self._finish_checks(i)
                        events.append(StepEvent(
                            slot=i, request_id=st.request.request_id,
                            token=tok, finished=reason is not None,
                            finish_reason=reason))
                        if reason is not None:
                            st.active = False
                            self._dirty[i] = True
                            break  # tokens past the stop are discarded
            return events

    def step(self) -> List[StepEvent]:
        """One decode call for all active slots: chains
        ``decode_chunk`` device steps per host sync. Returns per-slot
        events in generation order (a slot may emit several tokens per
        call; completion info rides the last one). Any chunks left in
        flight by :meth:`pump` are drained first."""
        with self._step_mutex:
            events: List[StepEvent] = self._drain_flush_events()
            while self._inflight:
                events += self._consume_chunk(self._inflight.pop(0))
            ticket, pre = self._dispatch_chunk()
            events += pre
            if ticket is not None:
                events += self._consume_chunk(ticket)
            return events

    def pump(self) -> List[StepEvent]:
        """Pipelined :meth:`step`: dispatch the NEXT chunk before
        consuming the previous one, so the 30-140 ms host readback
        overlaps the next chunk's device compute instead of serializing
        with it (measured: the serial step() loop reached only 34% of
        the raw chained-step rate, BENCH_r03). Device-side parking makes
        the speculation safe: a lane that stops mid-chunk is frozen by
        the device itself, and a chunk dispatched after every lane
        finished exits its while_loop in zero device steps.

        Call in a loop exactly like step(); the first call typically
        returns no events (its chunk is still in flight)."""
        with self._step_mutex:
            ticket, events = self._dispatch_chunk()
            events = self._drain_flush_events() + events
            if ticket is not None:
                self._inflight.append(ticket)
            if self._inflight and (ticket is None
                                   or len(self._inflight) > 1):
                events = events + self._consume_chunk(
                    self._inflight.pop(0))
            return events

    def generate(self, requests: Sequence[Request]) -> List[List[int]]:
        """Synchronous batch API: run all requests to completion, with
        continuous admission as slots free up. Returns generated ids per
        request (stop token excluded).

        Admission bursts run through the BATCHED prefill (one device
        call + one readback for every free slot's request; the prefill
        streams its weights once for all rows), and decode runs through
        the pipelined :meth:`pump` loop. On the shard_map TP path
        (batch-1 prefill) admissions fall back to serial submits."""
        pending = list(enumerate(requests))
        outputs: List[Optional[List[int]]] = [None] * len(requests)
        slot_to_req: Dict[int, int] = {}

        def admit_pending():
            while pending and self.free_slots():
                if self._tp_serial_admission:
                    idx, req = pending.pop(0)
                    try:
                        slot = self.submit(req)
                    except EngineFullError:
                        pending.insert(0, (idx, req))
                        return
                    if not req.cancelled:
                        slot_to_req[slot] = idx
                    continue
                take = min(len(pending), len(self.free_slots()))
                taken = [pending.pop(0) for _ in range(take)]
                admitted = self._submit_batch([r for _, r in taken])
                slot_by_req = {id(r): s for s, r in admitted}
                for idx, r in reversed(taken):
                    if id(r) in slot_by_req:
                        slot_to_req[slot_by_req[id(r)]] = idx
                    elif not r.cancelled:
                        # cancel() consumed mid-prefill requests stay
                        # out (re-queueing would defeat the cancel).
                        pending.insert(0, (idx, r))
                if len(admitted) < take:
                    return

        admit_pending()
        while slot_to_req:
            for ev in self.pump():
                if ev.finished and ev.slot in slot_to_req:
                    idx = slot_to_req.pop(ev.slot)
                    st = self.slots[ev.slot]
                    gen = st.generated
                    if ev.finish_reason == "stop":
                        gen = gen[:-1]  # drop the stop token itself
                    outputs[idx] = gen
            # cancel() deactivates a lane WITHOUT emitting an event —
            # reap such slots (normal finishes were popped above in the
            # same pump that deactivated them) so the loop can't spin
            # forever; tokens generated before the cancel are returned.
            for s in [s for s in slot_to_req
                      if not self.slots[s].active
                      and not self.slots[s].pending_first
                      and not self.slots[s].reserved]:
                idx = slot_to_req.pop(s)
                if outputs[idx] is None:
                    outputs[idx] = list(self.slots[s].generated)
            admit_pending()
        return outputs
