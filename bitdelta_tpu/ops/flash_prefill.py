"""Flash prefill attention: blockwise causal attention without
materializing the score matrix.

The XLA prefill path (models/llama.py::_attention) materializes
``(B, KV, G, Sq, Sk)`` f32 scores — at PPL-eval shapes (B=4, H=32,
S=1536) that is >1 GB of HBM workspace *per layer*; at serving prefill
it is the dominant non-matmul traffic. This kernel computes attention
blockwise with online softmax so nothing bigger than an ``(H*bq, bk)``
tile ever exists, and — like ops/flash_decode.py — walks only the key
blocks each query block can actually see:

  * causal: key blocks after the query block are never fetched;
  * per-row ``lengths``: key blocks past a row's live length are never
    fetched (right-padding only, framework-wide convention), and padding
    query rows emit exact zeros;
  * Mistral sliding window: key blocks before ``q_start - window`` are
    never fetched, so long-context prefill reads O(S * window) keys,
    not O(S^2).

Grid: one step per (batch row, query block). K/V live in HBM as
``(B, S, KV*hd)`` (the cache layout viewed 3-D, same trick as
flash_decode) and each ``(bk, KV*hd)`` block is DMA'd once for ALL
heads, double-buffered. Inside, a per-KV-head Python loop slices the
head's columns out of the VMEM block; the G query heads sharing a KV
head stack on the sublane axis, so softmax state is one ``(H*bq, ...)``
tile and every update is fully vectorized.

Differentiable: a custom VJP pairs the Pallas forward with a blockwise-
*recompute* backward (below) — the backward walks query blocks, rebuilds
each block's softmax rows from (q, k, v) and accumulates dq/dk/dv, so
nothing bigger than a ``(B, H, bq, Sk)`` tile exists at once and no
softmax state is saved from the forward. This is what lets
``kernel="pallas"`` distillation run at calibration lengths where the
XLA attention backward materializes multi-GB score tensors
(models/llama.py::_layer_fwd, train/distill.py).

The reference has no attention kernel (HF eager attention inherits the
O(S^2) materialization; SURVEY.md section 5.7).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _pick(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    raise ValueError(f"dim {dim} has no tile among {candidates}")


def _flash_prefill_kernel(len_ref, q_ref, k_hbm, v_hbm, o_ref,
                          kbuf, vbuf, ksem, vsem, *,
                          bq: int, bk: int, n_kv: int, g: int, hd: int,
                          window, sm_scale: float):
    b, qi = pl.program_id(0), pl.program_id(1)
    nheads = n_kv * g

    length = len_ref[b]
    q_start = qi * bq
    # Keys this query block can see: [lo, hi). hi clips to the row's
    # live length; fully-dead query blocks run zero inner iterations.
    hi = jnp.minimum(q_start + bq, length)
    lo = jnp.maximum(q_start + 1 - window, 0) if window is not None else 0
    lo_blk = lo // bk
    n_blocks = jnp.maximum((hi - 1) // bk - lo_blk + 1, 0)
    n_blocks = jnp.where(q_start < length, n_blocks, 0)

    def fetch(i, slot):
        start = pl.multiple_of((lo_blk + i) * bk, bk)
        kdma = pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(start, bk), :], kbuf.at[slot], ksem.at[slot])
        vdma = pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(start, bk), :], vbuf.at[slot], vsem.at[slot])
        return kdma, vdma

    @pl.when(n_blocks > 0)
    def _():
        k0, v0 = fetch(0, 0)
        k0.start()
        v0.start()

    q = q_ref[0].astype(jnp.float32)                 # (KV, G, bq, hd)
    # (KV*G*bq, hd): head-major stacking on the sublane axis (explicit
    # concatenate — a rank-collapsing reshape would relayout sublanes).
    qs = [q[h, i] for h in range(n_kv) for i in range(g)]
    q2 = jnp.concatenate(qs, axis=0) if nheads > 1 else qs[0]
    qpos = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)

    def body(i, carry):
        m, l, acc = carry
        slot = i % 2

        @pl.when(i + 1 < n_blocks)
        def _():
            kn, vn = fetch(i + 1, (i + 1) % 2)
            kn.start()
            vn.start()

        kw, vw = fetch(i, slot)
        kw.wait()
        vw.wait()

        start = (lo_blk + i) * bk
        kpos = start + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        # qpos < length: padding query rows become fully masked -> l == 0
        # -> exact zero output (dead whole blocks already skip the loop).
        valid = (kpos <= qpos) & (kpos < length) & (qpos < length)
        if window is not None:
            valid &= kpos > qpos - window
        vmask = jnp.concatenate([valid] * nheads, axis=0) \
            if nheads > 1 else valid                 # (H*bq, bk)

        kblk = kbuf[slot]                            # (bk, KV*hd)
        rows = []
        for h in range(n_kv):
            kh = kblk[:, h * hd:(h + 1) * hd].astype(jnp.float32)
            qh = q2[h * g * bq:(h + 1) * g * bq]     # (G*bq, hd)
            rows.append(jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        scores = jnp.concatenate(rows, axis=0) if n_kv > 1 else rows[0]
        scores = jnp.where(vmask, scores * sm_scale, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        # Explicit mask on p: fully-masked rows have scores == m_new ==
        # _NEG_INF, where exp(scores - m_new) would be 1, not 0.
        p = jnp.where(vmask, jnp.exp(scores - m_new), 0.0)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)

        vblk = vbuf[slot]
        outs = []
        for h in range(n_kv):
            vh = vblk[:, h * hd:(h + 1) * hd].astype(jnp.float32)
            outs.append(jnp.dot(p[h * g * bq:(h + 1) * g * bq], vh,
                                preferred_element_type=jnp.float32))
        pv = jnp.concatenate(outs, axis=0) if n_kv > 1 else outs[0]
        return m_new, l_new, acc * alpha + pv

    m0 = jnp.full((nheads * bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((nheads * bq, 1), jnp.float32)
    acc0 = jnp.zeros((nheads * bq, hd), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    # Padding query rows (and fully-masked rows) have l == 0: emit 0 so
    # garbage never propagates (same zeroing as the XLA path).
    out = jnp.where(l > 0, acc / jnp.where(l > 0, l, 1.0), 0.0)
    for h in range(n_kv):
        for i in range(g):
            j = h * g + i
            o_ref[0, h, i] = out[j * bq:(j + 1) * bq].astype(o_ref.dtype)


def _flash_prefill_impl(q: jax.Array, k: jax.Array, v: jax.Array,
                        lengths: jax.Array, window, block_q, block_k,
                        interpret) -> jax.Array:
    """The Pallas forward (see :func:`flash_prefill_attention`)."""
    bsz, sq, nheads, hd = q.shape
    _, sk, n_kv, hdk = k.shape
    assert hdk == hd and k.shape == v.shape and sk >= sq
    assert nheads % n_kv == 0
    g = nheads // n_kv
    # Cap H*bq at 1024 sublanes: the (H*bq, bk) f32 score/p tiles plus
    # the double-buffered K/V blocks must fit the ~16 MB scoped-VMEM
    # limit (measured OOM at 2048 sublanes x bk=512).
    max_bq = max(1024 // nheads, 8)
    bq = block_q or _pick(sq, [c for c in (256, 128, 64, 32, 16, 8)
                               if c <= max_bq])
    bk = block_k or _pick(sk, (512, 256, 128, 64, 32, 16, 8))
    sm_scale = 1.0 / math.sqrt(hd)

    # (B, Sq, H, hd) -> (B, KV, G, Sq, hd): G heads sharing a KV head
    # become adjacent sublane groups for the kernel.
    qr = q.reshape(bsz, sq, n_kv, g, hd).transpose(0, 2, 3, 1, 4)
    # Cache layout viewed 3-D so block DMAs slice only the S axis
    # (slicing the KV axis to 1 breaks (8,128) tiling; flash_decode.py
    # uses the same trick).
    kr = k.reshape(bsz, sk, n_kv * hd)
    vr = v.reshape(bsz, sk, n_kv * hd)
    lengths = jnp.asarray(lengths, jnp.int32)

    kernel = functools.partial(
        _flash_prefill_kernel, bq=bq, bk=bk, n_kv=n_kv, g=g, hd=hd,
        window=window, sm_scale=sm_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, sq // bq),
        in_specs=[
            pl.BlockSpec((1, n_kv, g, bq, hd),
                         lambda b, qi, ids: (b, 0, 0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),    # K stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),    # V stays in HBM
        ],
        out_specs=pl.BlockSpec((1, n_kv, g, bq, hd),
                               lambda b, qi, ids: (b, 0, 0, qi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bk, n_kv * hd), k.dtype),  # K double buffer
            pltpu.VMEM((2, bk, n_kv * hd), v.dtype),  # V double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n_kv, g, sq, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * nheads * sq * sk * hd // 2,
            bytes_accessed=(bsz * sq * nheads * hd * 2
                            + 2 * bsz * sk * n_kv * hd * k.dtype.itemsize),
            transcendentals=bsz * nheads * sq * sk // 2,
        ),
        interpret=interpret,
    )(lengths, qr, kr, vr)
    # (B, KV, G, Sq, hd) -> (B, Sq, H*hd)
    return out.transpose(0, 3, 1, 2, 4).reshape(bsz, sq, nheads * hd)


def _blockwise_backward(q, k, v, lengths, g, window, bq):
    """Attention backward by query-block recompute (pure XLA).

    Rebuilds each query block's masked softmax rows from (q, k, v) —
    nothing from the forward is saved but the primals — and applies the
    standard attention backward per block:

      dv += p^T g;  dp = g v^T;  ds = p (dp - rowsum(dp p));
      dq = ds k * scale;  dk += ds^T q * scale.

    Peak intermediate is one ``(B, H, bq, Sk)`` f32 tile (p/ds); dk/dv
    accumulate across blocks in the scan carry. Masked positions have
    p == 0 => ds == 0, so padding/causal/window grads are exactly zero.
    """
    bsz, sq, nh, hd = q.shape
    _, sk, n_kv, _ = k.shape
    gq = nh // n_kv
    sm_scale = 1.0 / math.sqrt(hd)
    nq = sq // bq

    qf = q.astype(jnp.float32).reshape(bsz, nq, bq, n_kv, gq, hd)
    gf = g.astype(jnp.float32).reshape(bsz, nq, bq, n_kv, gq, hd)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    kpos = jnp.arange(sk)[None, :]                        # (1, Sk)
    klive = kpos < lengths[:, None]                       # (B, Sk)

    def step(carry, inp):
        dk, dv = carry
        xq, xg, qi = inp          # (B, bq, KV, G, hd) x2, block index
        qpos = qi * bq + jnp.arange(bq)                   # (bq,)
        valid = (kpos[:, None, :] <= qpos[None, :, None]) \
            & klive[:, None, :] \
            & (qpos[None, :, None] < lengths[:, None, None])
        if window is not None:
            valid &= kpos[:, None, :] > qpos[None, :, None] - window
        vmask = valid[:, None, None]                      # (B,1,1,bq,Sk)

        scores = jnp.einsum("bqkgd,bskd->bkgqs", xq, kf,
                            preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(vmask, scores, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.where(vmask, jnp.exp(s - jnp.maximum(m, _NEG_INF)), 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / jnp.where(l > 0, l, 1.0)                  # (B,KV,G,bq,Sk)

        xg_t = xg.transpose(0, 2, 3, 1, 4)                # (B,KV,G,bq,hd)
        dv = dv + jnp.einsum("bkgqs,bkgqd->bskd", p, xg_t,
                             preferred_element_type=jnp.float32)
        dp = jnp.einsum("bkgqd,bskd->bkgqs", xg_t, vf,
                        preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_blk = jnp.einsum("bkgqs,bskd->bkgqd", ds, kf,
                            preferred_element_type=jnp.float32) * sm_scale
        dk = dk + jnp.einsum("bkgqs,bqkgd->bskd", ds, xq,
                             preferred_element_type=jnp.float32) * sm_scale
        return (dk, dv), dq_blk.transpose(0, 3, 1, 2, 4)  # (B,bq,KV,G,hd)

    zeros_kv = jnp.zeros((bsz, sk, n_kv, hd), jnp.float32)
    (dk, dv), dq = jax.lax.scan(
        step, (zeros_kv, zeros_kv),
        (qf.transpose(1, 0, 2, 3, 4, 5), gf.transpose(1, 0, 2, 3, 4, 5),
         jnp.arange(nq)))
    dq = dq.transpose(1, 0, 2, 3, 4, 5).reshape(bsz, sq, nh, hd)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_prefill(q, k, v, lengths, window, block_q, block_k, interpret):
    return _flash_prefill_impl(q, k, v, lengths, window, block_q,
                               block_k, interpret)


def _flash_prefill_fwd(q, k, v, lengths, window, block_q, block_k,
                       interpret):
    out = _flash_prefill_impl(q, k, v, lengths, window, block_q,
                              block_k, interpret)
    return out, (q, k, v, lengths)


def _flash_prefill_bwd(window, block_q, block_k, interpret, res, g):
    import numpy as np

    q, k, v, lengths = res
    sq = q.shape[1]
    bq = block_q or _pick(sq, (128, 64, 32, 16, 8, sq))
    gr = g.reshape(q.shape)
    dq, dk, dv = _blockwise_backward(q, k, v, lengths, gr, window, bq)
    # lengths is integral: its cotangent is float0 by JAX convention.
    return dq, dk, dv, np.zeros(lengths.shape, jax.dtypes.float0)


_flash_prefill.defvjp(_flash_prefill_fwd, _flash_prefill_bwd)


@functools.partial(jax.jit,
                   static_argnames=("window", "block_q", "block_k",
                                    "interpret"))
def flash_prefill_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                            lengths: jax.Array, *,
                            window: int | None = None,
                            block_q: int | None = None,
                            block_k: int | None = None,
                            interpret: bool = False) -> jax.Array:
    """Causal attention for a fresh right-padded sequence batch.

    Args:
      q: ``(B, Sq, H, hd)`` queries at positions ``0..Sq-1`` (RoPE done).
      k, v: ``(B, Sk, KV, hd)`` with ``Sk >= Sq`` (the serving prefill
        writes into a cache padded to ``max_seq``); keys live at
        positions ``0..lengths[b]-1``.
      lengths: ``(B,)`` int32 valid token counts.
      window: Mistral sliding-window size.

    Differentiable w.r.t. q/k/v via the blockwise-recompute backward
    (:func:`_blockwise_backward`).

    Returns ``(B, Sq, H * hd)`` in q's dtype.
    """
    return _flash_prefill(q, k, v, lengths, window, block_q, block_k,
                          interpret)
