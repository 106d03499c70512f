"""Functional JAX decoder for the Llama/Mistral family.

Owns the transformer forward pass that the reference delegated to
HuggingFace (reference bitdelta/utils.py:80-107, train.py:70-74). Pure
functions over a params pytree; layers are stacked on a leading axis and
iterated with ``lax.scan`` so compile time is O(1) in depth and the
weights shard naturally over a named mesh.

Supports per-projection 1-bit deltas (single-tenant stacks for
distillation/eval, tenant-routed stacks for multi-tenant serving) — the
JAX-native counterpart of the reference's ``BinaryDiff`` module swap
(diff.py:41-64) and ``DiffCompressModule`` (demo/demo_backend.py:82-98).

Compressed projections: {q,k,v,o,gate,up,down}_proj — matching the
reference's selection (diff.py:60-64). Norms are never compressed.
Beyond the reference (its stated future work, docs/index.html:352-354),
the deltas dict may also carry ``"embed"`` / ``"lm_head"`` 1-bit deltas
(packed along the hidden axis) applied outside the layer scan — see
``_embed_lookup`` / ``_lm_head_logits``.

Weight layout: every matrix is ``(K_in, N_out)`` (``y = x @ W``).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import ModelConfig
from ..core.delta import BinaryDelta, PairedBinaryDelta
from ..ops.binary_matmul import binary_matmul, tenant_binary_matmul

PROJ_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj",
              "gate_proj", "up_proj", "down_proj")

Params = Dict[str, Any]
Deltas = Dict[str, BinaryDelta]


class KVCache(NamedTuple):
    """Per-layer key/value cache. k/v: ``(L, B, S_max, KV_heads, head_dim)``;
    length: ``(B,)`` int32 — number of valid tokens per row (right-aligned,
    no left-padding anywhere in this framework).

    ``k_scale``/``v_scale``: None for a bf16 cache; for the int8 cache
    (``init_cache(kv_dtype="int8")``) they are fp32
    ``(L, B, S_max, KV_heads)`` per-stored-vector absmax scales
    (ops/kv_quant.py) — half the decode-time cache traffic, double the
    capacity; the flash decode kernel dequantizes in-VMEM."""

    k: jax.Array
    v: jax.Array
    length: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_cache(cfg: ModelConfig, batch: int, max_seq: int,
               dtype=jnp.bfloat16, kv_dtype: Optional[str] = None) -> KVCache:
    shape = (cfg.num_layers, batch, max_seq, cfg.num_kv_heads, cfg.head_dim)
    if kv_dtype in (None, "bf16", "bfloat16"):
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                       length=jnp.zeros((batch,), jnp.int32))
    if kv_dtype != "int8":
        raise ValueError(f"unknown kv_dtype {kv_dtype!r}")
    sshape = shape[:-1]
    return KVCache(k=jnp.zeros(shape, jnp.int8),
                   v=jnp.zeros(shape, jnp.int8),
                   length=jnp.zeros((batch,), jnp.int32),
                   k_scale=jnp.zeros(sshape, jnp.float32),
                   v_scale=jnp.zeros(sshape, jnp.float32))


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """weight: ``(D,)`` shared, or ``(B, D)`` per-row (multi-tenant
    serving, where each tenant keeps its own fine-tuned norms)."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    w = weight.astype(x.dtype)
    if w.ndim == 2 and x.ndim == 3:
        w = w[:, None, :]
    return normed.astype(x.dtype) * w


def rope_tables(positions: jax.Array, head_dim: int,
                theta: float, scaling=None) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables, f32, shape ``(*positions.shape, head_dim)``.

    HF "rotate_half" convention: frequencies over the first half are
    duplicated into the second half. ``scaling``: optional
    :class:`..config.RopeScaling` — "linear" position interpolation or
    the Llama-3.1 wavelength-dependent warp (matches transformers'
    ROPE_INIT_FUNCTIONS["llama3"]).
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    if scaling is not None:
        if scaling.rope_type == "linear":
            inv_freq = inv_freq / scaling.factor
        elif scaling.rope_type == "llama3":
            wavelen = 2.0 * jnp.pi / inv_freq
            orig = float(scaling.original_max_position_embeddings)
            low_wl = orig / scaling.low_freq_factor
            high_wl = orig / scaling.high_freq_factor
            smooth = ((orig / wavelen - scaling.low_freq_factor)
                      / (scaling.high_freq_factor - scaling.low_freq_factor))
            warped = ((1.0 - smooth) * inv_freq / scaling.factor
                      + smooth * inv_freq)
            inv_freq = jnp.where(wavelen > low_wl,
                                 inv_freq / scaling.factor, inv_freq)
            medium = (wavelen <= low_wl) & (wavelen >= high_wl)
            inv_freq = jnp.where(medium, warped, inv_freq)
        else:
            raise ValueError(f"unsupported rope scaling {scaling.rope_type!r}")
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: ``(B, S, H, hd)``; cos/sin: ``(B, S, hd)``."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[..., None, :]
    s = sin[..., None, :]
    out = x.astype(jnp.float32) * c + rotated.astype(jnp.float32) * s
    return out.astype(x.dtype)


def _base_matmul(x: jax.Array, w, compute_dtype, kernel: str = "xla"
                 ) -> jax.Array:
    """``x @ W_base`` in f32 accumulation. ``w`` is a dense matrix, an
    Int8Weight (W8 serving: int8 contraction, per-column scale on the
    accumulator — half the base HBM traffic/footprint) or an Int4Weight
    (W4 density mode: grouped-RTN nibbles, per-group contraction;
    research/quantized_base.py). ``kernel="pallas"`` routes decode-shaped
    Int4Weight matmuls through the Pallas W4 kernel (in-VMEM nibble
    unpack + group-scaled partial dots — the XLA grouped einsum
    materializes the unpacked operand, ~58 ms of the 32L/T8 density
    step; ops/pallas_int4.py)."""
    from ..research.quantized_base import Int4Weight, Int8Weight, int4_matmul

    if isinstance(w, Int8Weight):
        y = jnp.matmul(x.astype(compute_dtype), w.q.astype(compute_dtype),
                       preferred_element_type=jnp.float32)
        return y * w.scale[..., None, :].astype(jnp.float32)
    if isinstance(w, Int4Weight):
        if (kernel == "pallas" and x.ndim == 2 and x.shape[0] <= 64
                and x.shape[-1] % 128 == 0):
            from ..ops.pallas_int4 import w4_matmul_pallas

            return w4_matmul_pallas(x.astype(compute_dtype), w.packed,
                                    w.scale, out_dtype=jnp.float32)
        return int4_matmul(x, w, compute_dtype, out_dtype=jnp.float32)
    return jnp.matmul(x.astype(compute_dtype), w.astype(compute_dtype),
                      preferred_element_type=jnp.float32)


def _proj(x: jax.Array, w: jax.Array, delta: Optional[BinaryDelta],
          tenant_ids: Optional[jax.Array], compute_dtype,
          kernel: str = "xla") -> jax.Array:
    """Linear, optionally with a fused 1-bit delta (BinaryDiff.forward
    semantics, reference diff.py:33-39).

    kernel="pallas" routes tenant-routed decode-shaped calls through the
    fused Pallas kernel (ops/pallas_binary_gemm.py); anything else — or
    shapes the kernel doesn't cover — takes the XLA lowering.

    ``delta`` may be a ``PairedBinaryDelta`` (serving layout): decode
    goes through the pair-packed VPU kernel (1.46x the one-column
    kernel, BENCHNOTES.md); other shapes un-pair the words on the fly
    (a cheap word shuffle) and use the canonical paths.
    """
    if isinstance(delta, PairedBinaryDelta):
        if (kernel == "pallas" and tenant_ids is not None
                and x.shape[-2] == 1):
            from ..ops.pallas_binary_gemm import tenant_delta_matmul_pair_pallas

            # K-sharded (row-parallel TP) pair deltas carry a per-shard
            # colsum with a unit shard axis (stacking.to_pair_layout):
            # the full-K popcount correction is wrong for a K slice.
            colsum = delta.colsum
            if colsum.ndim == delta.packed_pairs.ndim:
                colsum = colsum[..., 0, :]
            y = _base_matmul(x[:, 0], w, compute_dtype, kernel=kernel)
            yd = tenant_delta_matmul_pair_pallas(
                x[:, 0].astype(compute_dtype), delta.packed_pairs,
                colsum, delta.scale, tenant_ids,
                out_dtype=jnp.float32)
            return (y + yd).astype(compute_dtype)[:, None, :]
        from ..ops.packing import unpair_packed

        delta = BinaryDelta(packed=unpair_packed(delta.packed_pairs),
                            scale=delta.scale)

    if (kernel == "pallas" and delta is not None and tenant_ids is not None
            and x.shape[-2] == 1):
        # Decode hot path: XLA base matmul (HBM-roofline at small M) +
        # VPU bit-plane delta kernel (ops/pallas_binary_gemm.py notes).
        from ..ops.pallas_binary_gemm import tenant_delta_matmul_pallas

        y = _base_matmul(x[:, 0], w, compute_dtype, kernel=kernel)
        yd = tenant_delta_matmul_pallas(
            x[:, 0].astype(compute_dtype), delta.packed, delta.scale,
            tenant_ids, out_dtype=jnp.float32)
        return (y + yd).astype(compute_dtype)[:, None, :]

    if (kernel == "pallas" and delta is not None and tenant_ids is not None
            and x.shape[0] == 1):
        # Single-request prefill (M = sequence length): the MXU kernel's
        # home turf — weight-load amortizes at M >= 128, and the in-VMEM
        # unpack avoids XLA's dense-mask materialization.
        from ..ops.pallas_binary_gemm import binary_matmul_pallas

        packed_t = delta.packed[tenant_ids[0]]
        scale_t = delta.scale[tenant_ids[0]]
        y = _base_matmul(x, w, compute_dtype)
        yd = binary_matmul_pallas(x[0].astype(compute_dtype), packed_t,
                                  scale_t, out_dtype=jnp.float32)
        return (y + yd[None].astype(jnp.float32)).astype(compute_dtype)

    y = _base_matmul(x, w, compute_dtype)
    if delta is not None:
        if tenant_ids is None:
            if kernel in ("pallas", "pallas_train"):
                # Training/prefill shapes (M = B*S): MXU kernel with a
                # custom VJP — gradients flow to x and scale without
                # XLA's dense-mask materialization.
                from ..ops.pallas_binary_gemm import binary_matmul_trainable

                b, s, kdim = x.shape
                yd = binary_matmul_trainable(
                    x.reshape(b * s, kdim).astype(compute_dtype),
                    delta.packed, delta.scale, False).reshape(b, s, -1)
            else:
                yd = binary_matmul(x, delta.packed, delta.scale,
                                   compute_dtype=compute_dtype)
        else:
            yd = tenant_binary_matmul(x, delta.packed, delta.scale,
                                      tenant_ids, compute_dtype=compute_dtype)
        y = y + yd.astype(jnp.float32)
    return y.astype(compute_dtype)


def _attention(cfg: ModelConfig, q, k, v, q_positions, kv_valid):
    """Grouped-query attention with arbitrary key-validity mask.

    q: ``(B, Sq, H, hd)``; k/v: ``(B, Sk, KV, hd)``.
    q_positions: ``(B, Sq)`` absolute positions of the queries.
    kv_valid: ``(B, Sk)`` bool — which cache/key slots hold real tokens.
    Causality and Mistral sliding-window (config.sliding_window) are
    applied on top of ``kv_valid`` using absolute positions.
    """
    b, sq, h, hd = q.shape
    sk = k.shape[1]
    groups = h // cfg.num_kv_heads

    q_ = q.reshape(b, sq, cfg.num_kv_heads, groups, hd).astype(jnp.float32)
    k_ = k.astype(jnp.float32)
    v_ = v.astype(jnp.float32)

    scores = jnp.einsum("bqkgd,bskd->bkgqs", q_, k_) / jnp.sqrt(hd).astype(jnp.float32)

    key_pos = jnp.arange(sk)[None, :]                       # (1, Sk)
    causal = key_pos[:, None, :] <= q_positions[..., None]   # (B, Sq, Sk)
    mask = causal & kv_valid[:, None, :]
    if cfg.sliding_window is not None:
        in_window = key_pos[:, None, :] > (q_positions[..., None]
                                           - cfg.sliding_window)
        mask = mask & in_window
    scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    # Fully-masked rows (padding queries) produce NaN from softmax(-inf);
    # zero them so garbage never propagates into the cache-free path.
    probs = jnp.where(jnp.any(mask[:, None, None, :, :], axis=-1, keepdims=True),
                      probs, 0.0)
    out = jnp.einsum("bkgqs,bskd->bqkgd", probs, v_)
    return out.reshape(b, sq, h * hd).astype(q.dtype)


def _split_deltas(deltas: Optional[Deltas]):
    """Separate layer-stacked proj deltas (scanned) from the embedding /
    lm_head deltas (applied outside the scan)."""
    if deltas is None:
        return None, None, None
    layer = {k: v for k, v in deltas.items() if k in PROJ_NAMES}
    return (layer or None), deltas.get("embed"), deltas.get("lm_head")


def _embed_lookup(params: Params, tokens: jax.Array,
                  tenant_ids: Optional[jax.Array],
                  embed_delta=None, tp_axis: Optional[str] = None) -> jax.Array:
    """Token embedding; ``embed`` may be tenant-stacked ``(T, V, D)``
    (each fine-tune keeps its own embeddings — the reference's
    DataParallelModule case, demo/demo_backend.py:62-79), or shared
    ``(V, D)`` with a 1-bit per-tenant delta (``embed_delta``; packed
    along D, so a token's sign row is one packed-word column).

    ``tp_axis``: set when running per-shard under ``shard_map`` with the
    vocab axis sharded over the model mesh axis — each shard looks up
    only its local vocab rows and the results are psum'd (exactly one
    shard contributes per token)."""
    e = params["embed"]
    if tp_axis is not None:
        vloc = e.shape[-2]
        rel = tokens - jax.lax.axis_index(tp_axis) * vloc
        valid = (rel >= 0) & (rel < vloc)
        lookup = jnp.clip(rel, 0, vloc - 1)
    else:
        valid, lookup = None, tokens
    if e.ndim == 3 and tenant_ids is not None:
        base = e[tenant_ids[:, None], lookup]
    else:
        base = e[lookup]
    if embed_delta is None:
        if tp_axis is not None:
            base = jax.lax.psum(jnp.where(valid[..., None], base, 0),
                                tp_axis)
        return base
    packed, scale = embed_delta.packed, embed_delta.scale
    if packed.ndim == 3 and tenant_ids is not None:
        # (T, D//32, V): rows (b, s) read tenant b's column tokens[b, s].
        words = packed[tenant_ids[:, None], :, lookup]      # (B, S, D//32)
        alpha = scale[tenant_ids][:, None, None]
    else:
        words = jnp.moveaxis(jnp.take(packed, lookup, axis=-1), -3, -1)
        alpha = scale
    shifts = jnp.arange(32, dtype=jnp.int32)
    bits = (words[..., None] >> shifts) & 1                 # (B, S, D//32, 32)
    pm1 = (2 * bits - 1).reshape(*tokens.shape, -1).astype(jnp.float32)
    out = base.astype(jnp.float32) + alpha * pm1
    if tp_axis is not None:
        out = jax.lax.psum(jnp.where(valid[..., None], out, 0.0), tp_axis)
    return out.astype(e.dtype)


def _head_delta_logits(x: jax.Array, head_delta,
                       tenant_ids: Optional[jax.Array],
                       compute_dtype, kernel: str) -> jax.Array:
    """1-bit delta contribution to the logits: ``alpha * (x @ sign)``
    with the head delta packed ``(D//32, V)`` (per tenant when stacked).
    Same dispatch policy as projection deltas in :func:`_proj`."""
    if isinstance(head_delta, PairedBinaryDelta):
        stacked = head_delta.packed_pairs.ndim == 3
        if (kernel == "pallas" and stacked and tenant_ids is not None
                and x.shape[1] == 1):
            from ..ops.pallas_binary_gemm import tenant_delta_matmul_pair_pallas

            yd = tenant_delta_matmul_pair_pallas(
                x[:, 0].astype(compute_dtype), head_delta.packed_pairs,
                head_delta.colsum, head_delta.scale, tenant_ids,
                out_dtype=jnp.float32)
            return yd[:, None, :]
        from ..ops.packing import unpair_packed

        head_delta = BinaryDelta(packed=unpair_packed(head_delta.packed_pairs),
                                 scale=head_delta.scale)
    stacked = head_delta.packed.ndim == 3
    if stacked and tenant_ids is not None:
        if kernel == "pallas" and x.shape[1] == 1:
            from ..ops.pallas_binary_gemm import tenant_delta_matmul_pallas

            yd = tenant_delta_matmul_pallas(
                x[:, 0].astype(compute_dtype), head_delta.packed,
                head_delta.scale, tenant_ids, out_dtype=jnp.float32)
            return yd[:, None, :]
        return tenant_binary_matmul(x, head_delta.packed, head_delta.scale,
                                    tenant_ids,
                                    compute_dtype=compute_dtype
                                    ).astype(jnp.float32)
    return binary_matmul(x, head_delta.packed, head_delta.scale,
                         compute_dtype=compute_dtype).astype(jnp.float32)


def _lm_head_logits(params: Params, x: jax.Array,
                    tenant_ids: Optional[jax.Array],
                    compute_dtype, kernel: str = "xla",
                    head_delta=None, embed_delta=None) -> jax.Array:
    lm_head = params.get("lm_head")
    if lm_head is None:  # tied embeddings
        e = params["embed"]
        lm_head = jnp.swapaxes(e, -1, -2)
        if head_delta is None:
            # Tied + compressed embeddings: the embed delta (packed along
            # D against embed.T) IS the head delta.
            head_delta = embed_delta
    if head_delta is not None:
        base = jnp.matmul(x.astype(compute_dtype),
                          lm_head.astype(compute_dtype),
                          preferred_element_type=jnp.float32)
        return base + _head_delta_logits(x, head_delta, tenant_ids,
                                         compute_dtype, kernel)
    if lm_head.ndim == 3 and tenant_ids is not None:
        # Per-tenant head. Reading each distinct tenant's (D, V) head is
        # the inherent cost of uncompressed per-tenant heads.
        if kernel == "pallas" and x.shape[1] == 1:
            # Decode: scalar-prefetch-routed kernel streams each row's
            # head directly — the XLA gather would materialize an
            # (B, D, V) copy in HBM first (~3x the traffic).
            from ..ops.pallas_binary_gemm import tenant_dense_matmul_pallas

            y = tenant_dense_matmul_pallas(
                x[:, 0].astype(compute_dtype), lm_head, tenant_ids,
                out_dtype=jnp.float32)
            return y[:, None, :]
        return jnp.einsum(
            "bsd,bdv->bsv", x.astype(compute_dtype),
            lm_head[tenant_ids].astype(compute_dtype),
            preferred_element_type=jnp.float32)
    return jnp.matmul(x.astype(compute_dtype), lm_head.astype(compute_dtype),
                      preferred_element_type=jnp.float32)


def _final_norm_w(params: Params, tenant_ids: Optional[jax.Array]):
    w = params["final_norm"]
    if w.ndim == 2 and tenant_ids is not None:
        return w[tenant_ids]
    return w


# ---------------------------------------------------------------------------
# Decoder layer + full forward
# ---------------------------------------------------------------------------

ROW_PARALLEL_PROJS = ("o_proj", "down_proj")


def _layer_fwd(cfg: ModelConfig, compute_dtype, x, layer_params,
               layer_deltas: Optional[Deltas], tenant_ids,
               q_positions, kv_valid, cos, sin,
               cache_k=None, cache_v=None, write_pos=None,
               kernel: str = "xla", lengths=None,
               flash_interpret: bool = False,
               tp_axis: Optional[str] = None,
               cache_k_scale=None, cache_v_scale=None):
    """One decoder block. If cache_k/v given (decode), new K/V are written
    at ``write_pos`` per row and attention runs over the whole cache.
    Returns (x_out, new_cache_k, new_cache_v, new_k_scale, new_v_scale)
    — the scale slots are None unless the cache is int8-quantized
    (``cache_k_scale`` given; ops/kv_quant.py): then fresh K/V quantize
    before the write, the Pallas decode attention dequantizes in-VMEM,
    and the XLA/prefill attention paths read a dequantized view.

    ``tp_axis``: Megatron-TP per-shard mode (inside ``shard_map``): cfg
    carries LOCAL head counts, column-parallel projections produce local
    N slices, and the row-parallel projections (o_proj / down_proj,
    whose K inputs are head-/channel-local) psum their partial outputs
    over the mesh axis so the residual stream stays replicated."""
    p = layer_params
    d = layer_deltas or {}
    b, sq, _ = x.shape

    def proj(name, inp):
        y = _proj(inp, p[name], d.get(name), tenant_ids, compute_dtype,
                  kernel)
        if tp_axis is not None and name in ROW_PARALLEL_PROJS:
            y = jax.lax.psum(y, tp_axis)
        return y

    def norm_w(w):
        # (D,) shared, or tenant-stacked (T, D) selected per batch row.
        if tenant_ids is not None and w.ndim == 2:
            return w[tenant_ids]
        return w

    def biased(name, y):
        # Qwen2-style attention bias: (N,) shared or (T, N) per-tenant
        # (fine-tuned biases are carried like norms — tiny, uncompressed).
        bias = p.get(name.split("_")[0] + "_bias")
        if bias is None:
            return y
        bias = norm_w(bias).astype(jnp.float32)
        if bias.ndim == 2:
            bias = bias[:, None, :]
        return (y.astype(jnp.float32) + bias).astype(y.dtype)

    h = rms_norm(x, norm_w(p["attn_norm"]), cfg.rms_norm_eps)
    q = biased("q_proj", proj("q_proj", h)).reshape(
        b, sq, cfg.num_heads, cfg.head_dim)
    k = biased("k_proj", proj("k_proj", h)).reshape(
        b, sq, cfg.num_kv_heads, cfg.head_dim)
    v = biased("v_proj", proj("v_proj", h)).reshape(
        b, sq, cfg.num_kv_heads, cfg.head_dim)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    quantized = cache_k is not None and cache_k_scale is not None
    if cache_k is not None:
        rows = jnp.arange(b)
        idx = write_pos[:, None] + jnp.arange(sq)[None, :]
        if quantized:
            from ..ops.kv_quant import quantize_kv

            k_store, ks_new = quantize_kv(k)
            v_store, vs_new = quantize_kv(v)
            cache_k_scale = cache_k_scale.at[rows[:, None], idx].set(ks_new)
            cache_v_scale = cache_v_scale.at[rows[:, None], idx].set(vs_new)
        else:
            k_store, v_store = k, v
        # write_pos: (B,) — scatter this step's K/V into each row's slot.
        cache_k = cache_k.at[rows[:, None], idx].set(k_store)
        cache_v = cache_v.at[rows[:, None], idx].set(v_store)
        k_all, v_all = cache_k, cache_v
        if quantized and not (kernel == "pallas" and sq == 1):
            # XLA / prefill attention paths read a dequantized view (one
            # cache-sized bf16 temp; prefill runs once per admission —
            # only the decode hot path must keep the 1 B/elem stream).
            from ..ops.kv_quant import dequantize_kv

            k_all = dequantize_kv(cache_k, cache_k_scale, compute_dtype)
            v_all = dequantize_kv(cache_v, cache_v_scale, compute_dtype)
    else:
        k_all, v_all = k, v

    if kernel == "pallas" and cache_k is not None and sq == 1:
        # Decode: flash kernel streams only each row's live cache blocks
        # (the XLA path below reads the whole padded cache every step).
        from ..ops.flash_decode import flash_decode_attention

        attn = flash_decode_attention(
            q[:, 0], k_all, v_all, q_positions[:, 0] + 1,
            k_scale=cache_k_scale if quantized else None,
            v_scale=cache_v_scale if quantized else None,
            window=cfg.sliding_window,
            interpret=flash_interpret)[:, None, :, :].reshape(b, sq, -1)
    elif (kernel in ("pallas", "pallas_train") and lengths is not None
          and sq > 1 and sq % 8 == 0 and k_all.shape[1] % 8 == 0):
        # Fresh-sequence prefill (queries at positions 0..sq-1): blockwise
        # online-softmax kernel — never materializes the (B,H,Sq,Sk)
        # score tensor the XLA path below builds. Differentiable (custom
        # VJP with blockwise-recompute backward), so "pallas_train"
        # distillation uses it too — at calibration lengths >= 512 the
        # XLA attention backward would materialize GB-scale scores.
        from ..ops.flash_prefill import flash_prefill_attention

        attn = flash_prefill_attention(q, k_all, v_all, lengths,
                                       window=cfg.sliding_window,
                                       interpret=flash_interpret)
    else:
        attn = _attention(cfg, q, k_all, v_all, q_positions, kv_valid)
    x = x + proj("o_proj", attn)

    h = rms_norm(x, norm_w(p["mlp_norm"]), cfg.rms_norm_eps)
    gate = proj("gate_proj", h)
    up = proj("up_proj", h)
    x = x + proj("down_proj", (jax.nn.silu(gate.astype(jnp.float32)).astype(compute_dtype) * up))
    return x, cache_k, cache_v, cache_k_scale, cache_v_scale


def forward(cfg: ModelConfig, params: Params, tokens: jax.Array, *,
            lengths: Optional[jax.Array] = None,
            deltas: Optional[Deltas] = None,
            tenant_ids: Optional[jax.Array] = None,
            compute_dtype=None,
            return_cache: bool = False,
            cache_max_seq: Optional[int] = None,
            kernel: str = "xla",
            kv_quant: bool = False,
            tp_axis: Optional[str] = None,
            _flash_interpret: bool = False):
    """Full-sequence forward (training / eval / prefill).

    Args:
      tokens: ``(B, S)`` int32, right-padded.
      lengths: ``(B,)`` valid token counts (defaults to S for all rows).
      deltas: optional dict proj_name -> BinaryDelta with leaves stacked
        ``(L, ...)`` (single tenant) or ``(L, T, ...)`` with ``tenant_ids``.
      return_cache: also return a KVCache holding this sequence's K/V
        (for serving prefill). ``cache_max_seq`` pads the cache.
      kv_quant: with return_cache, store the cache int8-quantized
        (ops/kv_quant.py; the serving engine's kv_dtype="int8" mode).

    Returns ``logits (B, S, V)`` [, KVCache].
    """
    compute_dtype = compute_dtype or jnp.dtype(cfg.dtype)
    b, s = tokens.shape
    if lengths is None:
        lengths = jnp.full((b,), s, jnp.int32)

    deltas, embed_delta, head_delta = _split_deltas(deltas)
    x = _embed_lookup(params, tokens, tenant_ids, embed_delta,
                      tp_axis=tp_axis).astype(compute_dtype)
    positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
    cos, sin = rope_tables(positions, cfg.head_dim, cfg.rope_theta,
                           cfg.rope_scaling)

    layer_xs = params["layers"]
    if deltas is not None:
        layer_xs = (layer_xs, deltas)

    if not return_cache:
        kv_valid = positions < lengths[:, None]

        def body(x, xs):
            if deltas is not None:
                lp, ld = xs
            else:
                lp, ld = xs, None
            x, _, _, _, _ = _layer_fwd(cfg, compute_dtype, x, lp, ld, tenant_ids,
                                 positions, kv_valid, cos, sin,
                                 kernel=kernel, lengths=lengths,
                                 tp_axis=tp_axis,
                                 flash_interpret=_flash_interpret)
            return x, None

        x, _ = jax.lax.scan(body, x, layer_xs)
    else:
        # Prefill: K/V land in slots [0, s) of a cache padded to
        # cache_max_seq; validity covers the whole cache so attention
        # shapes match the decode path.
        max_seq = cache_max_seq or s
        kv_valid = jnp.arange(max_seq)[None, :] < lengths[:, None]
        cache_k0 = jnp.zeros((b, max_seq, cfg.num_kv_heads, cfg.head_dim),
                             jnp.int8 if kv_quant else compute_dtype)
        scale0 = (jnp.zeros((b, max_seq, cfg.num_kv_heads), jnp.float32)
                  if kv_quant else None)

        def body_cache(x, xs):
            if deltas is not None:
                lp, ld = xs
            else:
                lp, ld = xs, None
            x, ck, cv, cks, cvs = _layer_fwd(
                cfg, compute_dtype, x, lp, ld, tenant_ids,
                positions, kv_valid, cos, sin,
                cache_k=cache_k0, cache_v=cache_k0,
                write_pos=jnp.zeros((b,), jnp.int32), kernel=kernel,
                lengths=lengths, tp_axis=tp_axis,
                flash_interpret=_flash_interpret,
                cache_k_scale=scale0, cache_v_scale=scale0)
            return x, ((ck, cv, cks, cvs) if kv_quant else (ck, cv))

        if kv_quant:
            x, (ks, vs, kss, vss) = jax.lax.scan(body_cache, x, layer_xs)
        else:
            x, (ks, vs) = jax.lax.scan(body_cache, x, layer_xs)
            kss = vss = None

    x = rms_norm(x, _final_norm_w(params, tenant_ids), cfg.rms_norm_eps)
    logits = _lm_head_logits(params, x, tenant_ids, compute_dtype,
                             kernel=kernel, head_delta=head_delta,
                             embed_delta=embed_delta)

    if not return_cache:
        return logits
    cache = KVCache(k=ks, v=vs, length=lengths, k_scale=kss, v_scale=vss)
    return logits, cache


def decode_step(cfg: ModelConfig, params: Params, tokens: jax.Array,
                cache: KVCache, *,
                deltas: Optional[Deltas] = None,
                tenant_ids: Optional[jax.Array] = None,
                compute_dtype=None, kernel: str = "xla",
                tp_axis: Optional[str] = None,
                _flash_interpret: bool = False):
    """Single-token decode: tokens ``(B, 1)`` appended at each row's
    current length. Returns ``(logits (B, 1, V), new_cache)``.

    kernel="pallas": route the tenant-routed projections through the
    fused Pallas kernel (TPU serving hot path).

    ``tp_axis``: run as the per-shard body of a ``shard_map`` over a
    mesh whose ``tp_axis`` carries Megatron TP — cfg must hold LOCAL
    head counts, params/deltas/cache arrive as local shards, and the
    logits return V-sharded (the caller's out_specs reassemble). This is
    what lets the single-device Pallas decode kernels serve TP-sharded
    (70B-class) models."""
    compute_dtype = compute_dtype or jnp.dtype(cfg.dtype)
    b, sq = tokens.shape
    positions = cache.length[:, None] + jnp.arange(sq)[None, :]
    new_length = cache.length + sq
    slot = jnp.arange(cache.max_seq)[None, :]
    kv_valid = slot < new_length[:, None]
    cos, sin = rope_tables(positions, cfg.head_dim, cfg.rope_theta,
                           cfg.rope_scaling)

    deltas, embed_delta, head_delta = _split_deltas(deltas)
    x = _embed_lookup(params, tokens, tenant_ids, embed_delta,
                      tp_axis=tp_axis).astype(compute_dtype)

    quantized = cache.quantized
    caches = ((cache.k, cache.v, cache.k_scale, cache.v_scale)
              if quantized else (cache.k, cache.v))
    layer_xs = (params["layers"],) + caches
    if deltas is not None:
        layer_xs = (params["layers"], deltas) + caches

    def body(x, xs):
        if deltas is not None:
            lp, ld, *cs = xs
        else:
            lp, *cs = xs
            ld = None
        ck, cv = cs[0], cs[1]
        cks, cvs = (cs[2], cs[3]) if quantized else (None, None)
        x, ck, cv, cks, cvs = _layer_fwd(
            cfg, compute_dtype, x, lp, ld, tenant_ids,
            positions, kv_valid, cos, sin,
            cache_k=ck, cache_v=cv,
            write_pos=cache.length, kernel=kernel,
            tp_axis=tp_axis, flash_interpret=_flash_interpret,
            cache_k_scale=cks, cache_v_scale=cvs)
        return x, ((ck, cv, cks, cvs) if quantized else (ck, cv))

    if quantized:
        x, (ks, vs, kss, vss) = jax.lax.scan(body, x, layer_xs)
    else:
        x, (ks, vs) = jax.lax.scan(body, x, layer_xs)
        kss = vss = None

    x = rms_norm(x, _final_norm_w(params, tenant_ids), cfg.rms_norm_eps)
    logits = _lm_head_logits(params, x, tenant_ids, compute_dtype,
                             kernel=kernel, head_delta=head_delta,
                             embed_delta=embed_delta)
    return logits, KVCache(k=ks, v=vs, length=new_length,
                           k_scale=kss, v_scale=vss)


# ---------------------------------------------------------------------------
# Parameter init (tests / benchmarks)
# ---------------------------------------------------------------------------

def init_params(cfg: ModelConfig, key: jax.Array,
                dtype=jnp.float32, scale: float = 0.02) -> Params:
    keys = iter(jax.random.split(key, 16))
    n = lambda *shape: (jax.random.normal(next(keys), shape, jnp.float32)
                        * scale).astype(dtype)
    L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
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
            "gate_proj": n(L, D, I),
            "up_proj": n(L, D, I),
            "down_proj": n(L, I, D),
        },
    }
    if cfg.attention_bias:
        params["layers"]["q_bias"] = n(L, cfg.q_dim)
        params["layers"]["k_bias"] = n(L, cfg.kv_dim)
        params["layers"]["v_bias"] = n(L, cfg.kv_dim)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = n(D, cfg.vocab_size)
    return params


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
