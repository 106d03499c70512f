"""Functional JAX Mixtral (sparse MoE) decoder.

Goes beyond the reference, which only explored Mixtral in a notebook and
loose helpers (reference bitdelta/misc.py:34-67,
notebooks/mixtral_weight.ipynb): a full Mixtral-family forward pass with
1-bit fine-tune delta compression over every projection *including the
expert matrices* (stacked ``(L, E, K, N)`` — the vectorized
quantize/apply in core/delta.py is rank-agnostic, so expert deltas cost
one call).

Attention is shared with :mod:`.llama` (same RoPE/GQA/sliding-window
blocks); the MLP is a top-k routed SwiGLU over E experts, evaluated
densely (every expert computes, routing masks combine) — the
static-shape formulation that maps onto TPUs without gather/scatter.

Weight layout: matrices ``(K_in, N_out)``; experts stacked on their own
axis after the layer axis.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .llama import (KVCache, _attention, _embed_lookup, _final_norm_w,
                    _lm_head_logits, _proj, apply_rope, rms_norm,
                    rope_tables)
from ..core.delta import BinaryDelta, PairedBinaryDelta, quantize_delta
from ..ops.binary_matmul import binary_matmul, tenant_binary_matmul

import dataclasses


@dataclasses.dataclass(frozen=True)
class MixtralConfig(ModelConfig):
    num_experts: int = 8
    experts_per_token: int = 2

    @staticmethod
    def from_hf_config(hf) -> "MixtralConfig":
        base = ModelConfig.from_hf_config(hf)
        # Shallow field copy (dataclasses.asdict would recurse into the
        # frozen RopeScaling and hand MixtralConfig a plain dict).
        fields = {f.name: getattr(base, f.name)
                  for f in dataclasses.fields(base)}
        return MixtralConfig(
            **fields,
            num_experts=getattr(hf, "num_local_experts", 8),
            experts_per_token=getattr(hf, "num_experts_per_tok", 2))


ATTN_PROJS = ("q_proj", "k_proj", "v_proj", "o_proj")
EXPERT_MATS = ("w1", "w3", "w2")  # gate, up, down (HF mixtral naming)
MOE_PARTS = ATTN_PROJS + EXPERT_MATS + ("router",)


def _split_deltas(deltas):
    """Layer-scanned deltas (attn/experts/router) vs the embed/lm_head
    deltas applied outside the scan (compress_embeddings mode; mirrors
    llama._split_deltas)."""
    if deltas is None:
        return None, None, None
    layer = {k: v for k, v in deltas.items() if k in MOE_PARTS}
    return (layer or None), deltas.get("embed"), deltas.get("lm_head")


def _delta_matmul(x, w, delta: Optional[BinaryDelta], compute_dtype,
                  tenant_ids=None):
    from .llama import _base_matmul

    y = _base_matmul(x, w, compute_dtype)
    if delta is not None:
        if tenant_ids is not None:
            yd = tenant_binary_matmul(x, delta.packed, delta.scale,
                                      tenant_ids, compute_dtype=compute_dtype)
        else:
            yd = binary_matmul(x, delta.packed, delta.scale,
                               compute_dtype=compute_dtype)
        y = y + yd.astype(jnp.float32)
    return y.astype(compute_dtype)


def _unpair(delta):
    """Pair-layout deltas (serving stacks, stacking.to_pair_layout) fall
    back to canonical words for the dense/prefill paths — a cheap word
    shuffle, same trick as llama._proj."""
    if isinstance(delta, PairedBinaryDelta):
        from ..ops.packing import unpair_packed

        return BinaryDelta(packed=unpair_packed(delta.packed_pairs),
                           scale=delta.scale)
    return delta


def _flatten_stack(delta, lead: int):
    """Merge the leading ``lead`` stack axes of every delta leaf into one
    (e.g. (T, E, ...) -> (T*E, ...)) so the tenant kernels' single stack
    axis can route (tenant, expert) pairs."""
    if lead == 1:
        return delta
    return jax.tree.map(
        lambda l: l.reshape((-1,) + l.shape[lead:]), delta)


def _routed_expert_delta(x_rows, delta, flat_ids, compute_dtype,
                         kernel: str = "xla"):
    """Delta matmul for routed (row, expert) pairs — the Mixtral decode
    hot path.

    Instead of materializing dense ±1 signs for every (row, expert)
    pair (the (B, E, K, N) einsum BENCHNOTES measured at ~12x the
    kernel cost), each ROUTED pair streams only its packed words
    through the same tenant-indexed kernels llama serving uses: the
    (tenant, expert) pair is flattened into the kernels' stack axis and
    selected per row by scalar prefetch (Pallas) or a packed-word
    gather (XLA). Work scales with B*top_k, not B*E.

    Args: x_rows ``(R, K)``; ``delta`` leaves lead with ONE flattened
    stack axis G; flat_ids ``(R,)`` int32 in [0, G). Returns ``(R, N)``
    fp32.
    """
    if isinstance(delta, PairedBinaryDelta):
        if kernel == "pallas":
            from ..ops.pallas_binary_gemm import \
                tenant_delta_matmul_pair_pallas

            colsum = delta.colsum
            if colsum.ndim == delta.packed_pairs.ndim:  # per-K-shard (TP)
                colsum = colsum[..., 0, :]
            return tenant_delta_matmul_pair_pallas(
                x_rows.astype(compute_dtype), delta.packed_pairs,
                colsum, delta.scale, flat_ids, out_dtype=jnp.float32)
        delta = _unpair(delta)
    if kernel == "pallas":
        from ..ops.pallas_binary_gemm import tenant_delta_matmul_pallas

        return tenant_delta_matmul_pallas(
            x_rows.astype(compute_dtype), delta.packed, delta.scale,
            flat_ids, out_dtype=jnp.float32)
    y = tenant_binary_matmul(x_rows[:, None, :], delta.packed,
                             delta.scale, flat_ids,
                             compute_dtype=compute_dtype)
    return y[:, 0].astype(jnp.float32)


def _expert_matmul(x, w, delta: Optional[BinaryDelta], compute_dtype,
                   tenant_ids=None):
    """All-experts matmul, vectorized over the expert axis.

    Two shapes, distinguished by ``x.ndim``:
      * expert input (w1/w3): x ``(B, S, D)``, w ``(E, D, I)``
        -> ``(B, S, E, I)`` — the activations fan out to every expert;
      * expert output (w2): x ``(B, S, E, I)``, w ``(E, I, D)``
        -> ``(B, S, E, D)`` — each expert consumes its own intermediate.

    The einsum-over-E formulation (vs a Python loop of per-expert dots)
    is what lets GSPMD shard the expert stacks: Megatron TP inside each
    expert (w1/w3 column-parallel on I, w2 row-parallel on I — one psum
    per MoE block, same pattern as llama gate/up/down) falls out of the
    sharding annotations in parallel/sharding.py with no code here
    changing; expert-parallel (shard E) works the same way when
    ``E % tp == 0``.

    Deltas: packed ``(E, K//32, N)`` single-tenant or ``(T, E, K//32, N)``
    tenant-stacked, routed per batch row (only *packed* words gather —
    1/16 the bytes of gathering dense weights)."""
    shared_in = x.ndim == 3
    x = x.astype(compute_dtype)

    def contract(w_e, batched):
        """Per-expert contraction in canonical leading-batch form.

        CPU XLA's mixed-precision DotThunk (bf16 x bf16 = f32) only
        supports plain GEMMs and batched GEMMs whose batch dim leads
        BOTH operands; einsum forms like "bsei,eid->bsed" lower to
        multi/middle-batch dots it rejects. Normalizing to
        ``(G, M, K) @ (G, K, N)`` (or a flat GEMM) keeps one code path
        that works everywhere — on TPU the transposes fuse into the
        surrounding ops and the MXU sees identical contractions."""
        if shared_in:
            if batched:  # x (B,S,D) . w_e (B,E,D,I) -> (B,S,E,I)
                return jnp.einsum("bsd,bedi->bsei", x, w_e,
                                  preferred_element_type=jnp.float32)
            return jnp.einsum("bsd,edi->bsei", x, w_e,
                              preferred_element_type=jnp.float32)
        b, s, e, i = x.shape
        if batched:  # x (B,S,E,I) . w_e (B,E,I,D) -> (B,S,E,D)
            n = w_e.shape[-1]
            xt = x.transpose(0, 2, 1, 3).reshape(b * e, s, i)
            y = jnp.matmul(xt, w_e.reshape(b * e, i, n),
                           preferred_element_type=jnp.float32)
            return y.reshape(b, e, s, n).transpose(0, 2, 1, 3)
        n = w_e.shape[-1]  # x (B,S,E,I) . w_e (E,I,D) -> (B,S,E,D)
        xt = x.transpose(2, 0, 1, 3).reshape(e, b * s, i)
        y = jnp.matmul(xt, w_e, preferred_element_type=jnp.float32)
        return y.reshape(e, b, s, n).transpose(1, 2, 0, 3)

    from ..research.quantized_base import Int8Weight

    if isinstance(w, Int8Weight):
        # W8 expert base (deploy-density mode, mirrors llama
        # _base_matmul): int8 stack cast lane-wise into the
        # contraction, per-output-column scale on the f32 accumulator —
        # half the expert HBM footprint/traffic, which dominates
        # Mixtral decode (BENCHNOTES: the dense base expert streams are
        # the bottleneck once deltas are routed).
        y = contract(w.q.astype(compute_dtype), batched=False)
        y = y * w.scale.astype(jnp.float32)  # (B,S,E,N) * (E,N)
    else:
        y = contract(w.astype(compute_dtype), batched=False)
    delta = _unpair(delta)
    if delta is not None:
        from ..ops.packing import unpack_to_pm1

        if tenant_ids is not None:
            packed = jnp.take(delta.packed, tenant_ids, axis=0)
            scale = jnp.take(delta.scale, tenant_ids, axis=0)  # (B, E)
            signs = unpack_to_pm1(packed, compute_dtype)  # (B,E,K,N)
            yd = contract(signs, batched=True) * scale[:, None, :, None]
        else:
            signs = unpack_to_pm1(delta.packed, compute_dtype)  # (E,K,N)
            yd = contract(signs, batched=False) * delta.scale[:, None]
        y = y + yd
    return y.astype(compute_dtype)


def _moe_ffn(cfg: MixtralConfig, compute_dtype, x, p, d, tenant_ids=None,
             kernel: str = "xla", tp_axis=None):
    """Top-k routed SwiGLU: x ``(B, S, D)``; expert weights
    ``w1/w3 (E, D, I)``, ``w2 (E, I, D)``; router ``(D, E)``. With
    ``tenant_ids``, deltas are tenant-stacked ``(T, ...)`` and routed
    per batch row.

    Evaluation is DENSE over experts (every expert computes, the routed
    combine masks to top-k) — the static-shape formulation that maps
    onto TPUs without gather/scatter. At decode this is also
    bandwidth-optimal: the step is HBM-bound and a multi-tenant batch's
    union of top-k choices touches essentially every expert anyway, so
    all E expert weights stream from HBM regardless of routing — skipping
    the (tiny-M) MXU work for unrouted experts saves no time. Prefill at
    long S is compute-bound and dense evaluation costs E/top_k x FLOPs —
    a capacity-based one-hot dispatch path is the known fix if prefill
    ever dominates (documented tradeoff, not implemented)."""
    b, s, dim = x.shape
    e, topk = cfg.num_experts, cfg.experts_per_token

    # Router delta applies like any other projection's.
    router_logits = _delta_matmul(x, p["router"], d.get("router"),
                                  jnp.float32, tenant_ids)       # (B,S,E)
    router_logits = router_logits.astype(jnp.float32)
    topv, topi = jax.lax.top_k(router_logits, topk)
    gates = jax.nn.softmax(topv, axis=-1)                        # (B,S,k)
    weight = jnp.zeros((b, s, e), jnp.float32)
    weight = weight.at[
        jnp.arange(b)[:, None, None],
        jnp.arange(s)[None, :, None], topi].set(gates)

    if s == 1 and any(d.get(m) is not None for m in EXPERT_MATS):
        # Routed delta decode path: the BASE still evaluates densely
        # over experts (decode is HBM-bound and the tenant batch's
        # top-k union touches every expert, so all E base weights
        # stream regardless), but the per-(row, expert) 1-bit deltas
        # run ONLY for the top_k ROUTED experts via the tenant kernels
        # with (tenant, expert) flattened into their stack axis —
        # B*top_k packed streams instead of a dense (B, E, K, N) sign
        # materialization. Unrouted experts' missing deltas are masked
        # by their zero routing weight in the combine.
        lead = 1 if tenant_ids is None else 2
        ti = topi[:, 0, :]                                    # (B, k)
        if tenant_ids is None:
            flat_ids = ti.reshape(-1)
        else:
            flat_ids = (tenant_ids[:, None] * e + ti).reshape(-1)
        onehot = (ti[..., None] == jnp.arange(e)).astype(jnp.float32)

        def routed(rows, name):                      # rows (B*k, K)
            dd = _flatten_stack(d[name], lead)
            yd = _routed_expert_delta(rows, dd, flat_ids, compute_dtype,
                                      kernel)
            return yd.reshape(b, topk, -1)           # (B, k, N)

        x0 = x[:, 0]                                          # (B, D)
        xrows = jnp.repeat(x0, topk, axis=0)
        h1 = _expert_matmul(x, p["w1"], None, compute_dtype,
                            tenant_ids).astype(jnp.float32)   # (B,1,E,I)
        h3 = _expert_matmul(x, p["w3"], None, compute_dtype,
                            tenant_ids).astype(jnp.float32)
        if d.get("w1") is not None:
            h1 += jnp.einsum("bke,bki->bei", onehot,
                             routed(xrows, "w1"))[:, None]
        if d.get("w3") is not None:
            h3 += jnp.einsum("bke,bki->bei", onehot,
                             routed(xrows, "w3"))[:, None]
        h = (jax.nn.silu(h1).astype(compute_dtype)
             * h3.astype(compute_dtype))                      # (B,1,E,I)
        out = _expert_matmul(h, p["w2"], None, compute_dtype,
                             tenant_ids)                      # (B,1,E,D)
        y = jnp.einsum("bsed,bse->bsd", out.astype(jnp.float32), weight)
        if d.get("w2") is not None:
            # Each routed pair's w2 input is ITS expert's intermediate.
            x2 = jnp.take_along_axis(
                h[:, 0], ti[:, :, None],
                axis=1).reshape(b * topk, -1)                 # (B*k, I)
            yd2 = routed(x2, "w2")                            # (B, k, D)
            y += jnp.einsum("bkd,bk->bd", yd2, gates[:, 0])[:, None]
        if tp_axis is not None:
            # Megatron TP inside each expert: w1/w3 produced LOCAL I
            # columns, w2 (and its routed delta) consumed them — one
            # reduction for the whole MoE block, after the combine.
            y = jax.lax.psum(y, tp_axis)
        return y.astype(compute_dtype)

    h1 = _expert_matmul(x, p["w1"], d.get("w1"), compute_dtype,
                        tenant_ids)                              # (B,S,E,I)
    h3 = _expert_matmul(x, p["w3"], d.get("w3"), compute_dtype,
                        tenant_ids)
    h = (jax.nn.silu(h1.astype(jnp.float32)).astype(compute_dtype) * h3)
    out = _expert_matmul(h, p["w2"], d.get("w2"), compute_dtype,
                         tenant_ids)                             # (B,S,E,D)
    y = jnp.einsum("bsed,bse->bsd", out.astype(jnp.float32), weight)
    if tp_axis is not None:
        y = jax.lax.psum(y, tp_axis)
    return y.astype(compute_dtype)


def _layer(cfg: MixtralConfig, compute_dtype, x, p, d,
           positions, kv_valid, cos, sin,
           cache_k=None, cache_v=None, write_pos=None, tenant_ids=None,
           kernel: str = "xla", tp_axis=None):
    """One Mixtral block. With cache_k/v given, new K/V are scattered at
    ``write_pos`` per row and attention runs over the whole cache (same
    protocol as llama._layer_fwd). Returns (x, cache_k, cache_v).

    ``kernel="pallas"``: the four ATTENTION projections dispatch through
    llama's ``_proj`` (pair-packed / bit-plane VPU delta kernels on
    decode shapes — the same hot path llama serving uses); at decode the
    EXPERT deltas run only for the routed top-k experts through the same
    tenant kernels (``_moe_ffn``'s routed branch — (tenant, expert)
    flattened into the kernels' stack axis); the router and the prefill
    expert path stay on the vectorized XLA lowering."""
    b, sq, _ = x.shape

    def norm_w(w):
        # (D,) shared, or tenant-stacked (T, D) selected per batch row.
        if tenant_ids is not None and w.ndim == 2:
            return w[tenant_ids]
        return w

    def attn_proj(xx, name):
        y = _proj(xx, p[name], d.get(name), tenant_ids, compute_dtype,
                  kernel=kernel)
        if tp_axis is not None and name == "o_proj":
            # Row-parallel: heads are model-axis-local, psum the output
            # so the residual stream stays replicated.
            y = jax.lax.psum(y.astype(jnp.float32),
                             tp_axis).astype(y.dtype)
        return y

    h = rms_norm(x, norm_w(p["attn_norm"]), cfg.rms_norm_eps)
    q = attn_proj(h, "q_proj")
    k = attn_proj(h, "k_proj")
    v = attn_proj(h, "v_proj")
    q = apply_rope(q.reshape(b, sq, cfg.num_heads, cfg.head_dim), cos, sin)
    k = apply_rope(k.reshape(b, sq, cfg.num_kv_heads, cfg.head_dim),
                   cos, sin)
    v = v.reshape(b, sq, cfg.num_kv_heads, cfg.head_dim)

    if cache_k is not None:
        rows = jnp.arange(b)
        idx = write_pos[:, None] + jnp.arange(sq)[None, :]
        cache_k = cache_k.at[rows[:, None], idx].set(k)
        cache_v = cache_v.at[rows[:, None], idx].set(v)
        k_all, v_all = cache_k, cache_v
    else:
        k_all, v_all = k, v

    if kernel == "pallas" and cache_k is not None and sq == 1:
        # Decode: the flash kernel streams only each row's live cache
        # blocks (same hot path as llama; the XLA fallback below reads
        # the whole padded cache every step).
        from ..ops.flash_decode import flash_decode_attention

        attn = flash_decode_attention(
            q[:, 0], k_all, v_all, positions[:, 0] + 1,
            window=cfg.sliding_window)[:, None].reshape(b, sq, -1)
    else:
        attn = _attention(cfg, q, k_all, v_all, positions, kv_valid)
    x = x + attn_proj(attn, "o_proj")
    h = rms_norm(x, norm_w(p["mlp_norm"]), cfg.rms_norm_eps)
    x = x + _moe_ffn(cfg, compute_dtype, h, p, d, tenant_ids,
                     kernel=kernel, tp_axis=tp_axis)
    return x, cache_k, cache_v


def forward(cfg: MixtralConfig, params: Dict[str, Any], tokens: jax.Array, *,
            lengths: Optional[jax.Array] = None,
            deltas: Optional[Dict[str, Dict[str, BinaryDelta]]] = None,
            tenant_ids: Optional[jax.Array] = None,
            compute_dtype=None,
            return_cache: bool = False,
            cache_max_seq: Optional[int] = None,
            kernel: str = "xla"):
    """Full-sequence Mixtral forward. ``deltas``: dict name -> BinaryDelta
    with leaves stacked ``(L, ...)`` (experts keep their E axis; with
    ``tenant_ids`` a tenant axis follows the layer axis, multi-tenant
    serving like llama.forward). ``return_cache``: also return a KVCache
    for generation (prefill). ``kernel``: "pallas"/"pallas_train" route
    the attention projections through llama's kernel dispatch (see
    :func:`_layer`); experts/router always use the XLA lowering."""
    compute_dtype = compute_dtype or jnp.dtype(cfg.dtype)
    b, s = tokens.shape
    if lengths is None:
        lengths = jnp.full((b,), s, jnp.int32)

    deltas, embed_delta, head_delta = _split_deltas(deltas)
    x = _embed_lookup(params, tokens, tenant_ids,
                      embed_delta).astype(compute_dtype)
    positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
    cos, sin = rope_tables(positions, cfg.head_dim, cfg.rope_theta,
                           cfg.rope_scaling)

    layer_xs = params["layers"]
    if deltas is not None:
        layer_xs = (layer_xs, deltas)

    if not return_cache:
        kv_valid = positions < lengths[:, None]

        def body(x, xs):
            p, d = xs if deltas is not None else (xs, {})
            x, _, _ = _layer(cfg, compute_dtype, x, p, d,
                             positions, kv_valid, cos, sin,
                             tenant_ids=tenant_ids, kernel=kernel)
            return x, None

        x, _ = jax.lax.scan(body, x, layer_xs)
    else:
        max_seq = cache_max_seq or s
        kv_valid = jnp.arange(max_seq)[None, :] < lengths[:, None]
        cache0 = jnp.zeros((b, max_seq, cfg.num_kv_heads, cfg.head_dim),
                           compute_dtype)

        def body_cache(x, xs):
            p, d = xs if deltas is not None else (xs, {})
            x, ck, cv = _layer(cfg, compute_dtype, x, p, d,
                               positions, kv_valid, cos, sin,
                               cache_k=cache0, cache_v=cache0,
                               write_pos=jnp.zeros((b,), jnp.int32),
                               tenant_ids=tenant_ids, kernel=kernel)
            return x, (ck, cv)

        x, (ks, vs) = jax.lax.scan(body_cache, x, layer_xs)

    x = rms_norm(x, _final_norm_w(params, tenant_ids), cfg.rms_norm_eps)
    logits = _lm_head_logits(params, x, tenant_ids, compute_dtype,
                             kernel=kernel, head_delta=head_delta,
                             embed_delta=embed_delta)
    if not return_cache:
        return logits
    return logits, KVCache(k=ks, v=vs, length=lengths)


def decode_step(cfg: MixtralConfig, params: Dict[str, Any],
                tokens: jax.Array, cache: KVCache, *,
                deltas: Optional[Dict[str, BinaryDelta]] = None,
                tenant_ids: Optional[jax.Array] = None,
                compute_dtype=None, kernel: str = "xla",
                tp_axis=None):
    """Single-token Mixtral decode: tokens ``(B, 1)`` appended at each
    row's current length. Returns ``(logits (B, 1, V), new_cache)``.
    Mirrors llama.decode_step (incl. tenant routing); MoE routing runs
    per decoded token. ``kernel="pallas"``: attention projections run
    the VPU delta kernels (llama's decode hot path) and expert deltas
    run the routed top-k path.

    ``tp_axis``: per-shard body of a ``shard_map`` (Megatron TP): cfg
    holds LOCAL head counts, attention projections and expert stacks
    arrive as local slices (w1/w3 column-parallel on I, w2 row-parallel
    — one psum per MoE block after the combine; the router replicates),
    logits return V-sharded."""
    compute_dtype = compute_dtype or jnp.dtype(cfg.dtype)
    b, sq = tokens.shape
    positions = cache.length[:, None] + jnp.arange(sq)[None, :]
    new_length = cache.length + sq
    kv_valid = jnp.arange(cache.max_seq)[None, :] < new_length[:, None]
    cos, sin = rope_tables(positions, cfg.head_dim, cfg.rope_theta,
                           cfg.rope_scaling)

    deltas, embed_delta, head_delta = _split_deltas(deltas)
    x = _embed_lookup(params, tokens, tenant_ids, embed_delta,
                      tp_axis=tp_axis).astype(compute_dtype)
    layer_xs = (params["layers"], cache.k, cache.v)
    if deltas is not None:
        layer_xs = (params["layers"], deltas, cache.k, cache.v)

    def body(x, xs):
        if deltas is not None:
            p, d, ck, cv = xs
        else:
            p, ck, cv = xs
            d = {}
        x, ck, cv = _layer(cfg, compute_dtype, x, p, d,
                           positions, kv_valid, cos, sin,
                           cache_k=ck, cache_v=cv, write_pos=cache.length,
                           tenant_ids=tenant_ids, kernel=kernel,
                           tp_axis=tp_axis)
        return x, (ck, cv)

    x, (ks, vs) = jax.lax.scan(body, x, layer_xs)
    x = rms_norm(x, _final_norm_w(params, tenant_ids), cfg.rms_norm_eps)
    logits = _lm_head_logits(params, x, tenant_ids, compute_dtype,
                             kernel=kernel, head_delta=head_delta,
                             embed_delta=embed_delta)
    return logits, KVCache(k=ks, v=vs, length=new_length)


def init_params(cfg: MixtralConfig, key: jax.Array,
                dtype=jnp.float32, scale: float = 0.02):
    """Random Mixtral pytree (tests/benches; mirrors llama.init_params).
    Expert stacks ``w1/w3 (L, E, D, I)``, ``w2 (L, E, I, D)``, router
    ``(L, D, E)``."""
    keys = iter(jax.random.split(key, 16))
    n = lambda *shape: (jax.random.normal(next(keys), shape, jnp.float32)
                        * scale).astype(dtype)
    L, D, I, E = (cfg.num_layers, cfg.hidden_size, cfg.intermediate_size,
                  cfg.num_experts)
    params = {
        "embed": n(cfg.vocab_size, D),
        "final_norm": jnp.ones((D,), dtype),
        "layers": {
            "attn_norm": jnp.ones((L, D), dtype),
            "mlp_norm": jnp.ones((L, D), dtype),
            "q_proj": n(L, D, cfg.q_dim),
            "k_proj": n(L, D, cfg.kv_dim),
            "v_proj": n(L, D, cfg.kv_dim),
            "o_proj": n(L, cfg.q_dim, D),
            "w1": n(L, E, D, I),
            "w3": n(L, E, D, I),
            "w2": n(L, E, I, D),
            "router": n(L, D, E),
        },
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = n(D, cfg.vocab_size)
    return params


def compress_mixtral(base_params, finetuned_params, *,
                     compress_embeddings: bool = False,
                     zero_sign: str = "positive"):
    """1-bit fine-tune delta for every attention proj, expert matrix and
    the router; extras = embeddings/norms/head (fine-tuned values).
    ``compress_embeddings=True``: embed/lm_head become 1-bit deltas
    against the base (packed along D), exactly like llama's
    compress_model — the per-tenant dense (V, D) tensors disappear."""
    from ..core.compress import CompressedModel

    deltas = {}
    for name in ATTN_PROJS + EXPERT_MATS + ("router",):
        deltas[name] = quantize_delta(base_params["layers"][name],
                                      finetuned_params["layers"][name],
                                      zero_sign=zero_sign)
    extras = {
        "final_norm": finetuned_params["final_norm"],
        "attn_norm": finetuned_params["layers"]["attn_norm"],
        "mlp_norm": finetuned_params["layers"]["mlp_norm"],
    }
    if compress_embeddings:
        if finetuned_params["embed"].shape != base_params["embed"].shape:
            raise ValueError(
                "compress_embeddings requires the fine-tune to share the "
                f"base vocab/hidden: {finetuned_params['embed'].shape} != "
                f"{base_params['embed'].shape}")
        if ("lm_head" in finetuned_params) != ("lm_head" in base_params):
            raise ValueError("base and fine-tune disagree on tied lm_head")
        deltas["embed"] = quantize_delta(
            jnp.swapaxes(base_params["embed"], -1, -2),
            jnp.swapaxes(finetuned_params["embed"], -1, -2),
            zero_sign=zero_sign)
        if "lm_head" in finetuned_params:
            deltas["lm_head"] = quantize_delta(base_params["lm_head"],
                                               finetuned_params["lm_head"],
                                               zero_sign=zero_sign)
    else:
        extras["embed"] = finetuned_params["embed"]
        if "lm_head" in finetuned_params:
            extras["lm_head"] = finetuned_params["lm_head"]
    return CompressedModel(deltas=deltas, extras=extras)


def mixtral_student_params(base_params, compressed):
    params = dict(base_params)
    params["layers"] = dict(base_params["layers"])
    ex = compressed.extras
    params["final_norm"] = ex["final_norm"]
    params["layers"]["attn_norm"] = ex["attn_norm"]
    params["layers"]["mlp_norm"] = ex["mlp_norm"]
    if "embed" in ex:
        params["embed"] = ex["embed"]
        if "lm_head" in ex:
            params["lm_head"] = ex["lm_head"]
        elif "lm_head" in params:
            del params["lm_head"]
    # else: compress_embeddings — base embed/lm_head stay; the deltas
    # dict's "embed"/"lm_head" entries ride on top in the forward.
    return params


def params_from_torch_mixtral(cfg: MixtralConfig, torch_model,
                              dtype=jnp.float32):
    """Convert a transformers MixtralForCausalLM to our pytree."""
    import numpy as np

    sd = {k: v.detach().to("cpu").float().numpy()
          for k, v in torch_model.state_dict().items()}
    L, E = cfg.num_layers, cfg.num_experts
    layers: Dict[str, list] = {k: [None] * L for k in MOE_PARTS
                               + ("attn_norm", "mlp_norm")}
    params: Dict[str, Any] = {}
    params["embed"] = sd["model.embed_tokens.weight"]
    params["final_norm"] = sd["model.norm.weight"]
    if "lm_head.weight" in sd:
        params["lm_head"] = sd["lm_head.weight"].T
    for l in range(L):
        pre = f"model.layers.{l}."
        for pj in ATTN_PROJS:
            layers[pj][l] = sd[pre + f"self_attn.{pj}.weight"].T
        layers["router"][l] = sd[pre + "block_sparse_moe.gate.weight"].T
        for w in EXPERT_MATS:
            layers[w][l] = np.stack([
                sd[pre + f"block_sparse_moe.experts.{i}.{w}.weight"].T
                for i in range(E)])
        layers["attn_norm"][l] = sd[pre + "input_layernorm.weight"]
        layers["mlp_norm"][l] = sd[pre + "post_attention_layernorm.weight"]
    params["layers"] = {k: jnp.asarray(np.stack(v), dtype)
                        for k, v in layers.items()}
    params["embed"] = jnp.asarray(params["embed"], dtype)
    params["final_norm"] = jnp.asarray(params["final_norm"], dtype)
    if "lm_head" in params:
        params["lm_head"] = jnp.asarray(params["lm_head"], dtype)
    return params
