"""Flash-decode attention: length-aware single-token attention over the
KV cache.

The XLA decode-attention path (models/llama.py::_attention) computes
scores over the *whole padded cache* — it streams ``S_max`` K/V slots per
row regardless of how many tokens each sequence actually holds, and at
4k+ contexts that stream becomes the decode bottleneck (BENCHNOTES.md).
This kernel makes attention cost proportional to each row's *live*
length instead:

  * the grid has one step per batch row; inside it, a ``fori_loop`` with
    a **dynamic bound** walks only that row's valid cache blocks
    (``[len-window, len)`` for Mistral sliding-window, ``[0, len)``
    otherwise). Dead blocks cost nothing — no DMA, no grid-step
    overhead (a grid-per-block variant measured ~1 us per *idle* step);
  * K/V stay in HBM (``memory_space=ANY``) and each block is copied
    into a two-slot VMEM scratch by explicit double-buffered async DMA,
    so the next block's fetch overlaps the current block's math
    (pallas_guide.md double-buffering pattern);
  * softmax is the standard online (flash) accumulation in f32: running
    max, running denominator, rescaled accumulator, carried through the
    loop as values.

Shapes follow the serving cache layout (models/llama.py::KVCache):
K/V ``(B, S, KV_heads, head_dim)`` viewed as ``(B, S, KV*hd)`` so each
block DMA is one contiguous ``(block_s, KV*hd)`` tile; queries are
``(B, H, hd)`` (one decode token per row). GQA: query head ``i`` attends
through KV head ``i // (H // KV)``.

The reference has no attention kernel at all (it inherits HuggingFace's
eager attention; SURVEY.md section 5.7) — this is TPU-native new ground
required to make multi-tenant decode hold up at long contexts.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _pick_block_s(s: int) -> int:
    for c in (512, 256, 128, 64, 32, 16, 8):
        if s % c == 0:
            return c
    raise ValueError(f"cache length {s} not divisible by a tile size >= 8")


def _flash_decode_kernel(len_ref, q_ref, k_hbm, v_hbm, *rest,
                         block_s: int, n_kv: int, g: int, hd: int,
                         window, sm_scale: float, quantized: bool):
    if quantized:
        # int8 cache: per-(position, kv_head) scales ride alongside and
        # dequantize in-VMEM (the HBM stream stays 1 B/elem).
        (ks_hbm, vs_hbm, o_ref, kbuf, vbuf, ksbuf, vsbuf,
         ksem, vsem, kssem, vssem) = rest
    else:
        o_ref, kbuf, vbuf, ksem, vsem = rest
    b = pl.program_id(0)
    nheads = n_kv * g

    hi = len_ref[b]
    lo = jnp.maximum(hi - window, 0) if window is not None else 0
    lo_blk = lo // block_s
    n_blocks = (hi - 1) // block_s - lo_blk + 1

    def fetch(i, slot):
        start = pl.multiple_of((lo_blk + i) * block_s, block_s)
        dmas = [pltpu.make_async_copy(
                    k_hbm.at[b, pl.ds(start, block_s), :], kbuf.at[slot],
                    ksem.at[slot]),
                pltpu.make_async_copy(
                    v_hbm.at[b, pl.ds(start, block_s), :], vbuf.at[slot],
                    vsem.at[slot])]
        if quantized:
            dmas.append(pltpu.make_async_copy(
                ks_hbm.at[b, pl.ds(start, block_s), :], ksbuf.at[slot],
                kssem.at[slot]))
            dmas.append(pltpu.make_async_copy(
                vs_hbm.at[b, pl.ds(start, block_s), :], vsbuf.at[slot],
                vssem.at[slot]))
        return dmas

    for dma in fetch(0, 0):
        dma.start()

    q = q_ref[0].astype(jnp.float32)                 # (H, hd)

    def body(i, carry):
        m, l, acc = carry
        slot = i % 2

        @pl.when(i + 1 < n_blocks)
        def _():
            for dma in fetch(i + 1, (i + 1) % 2):
                dma.start()

        for dma in fetch(i, slot):
            dma.wait()

        start = (lo_blk + i) * block_s
        pos = start + jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
        valid = pos < hi
        if window is not None:
            valid &= pos >= lo

        # Per-KV-head scores; query heads are grouped g-per-KV-head on
        # the sublane axis, so the per-head pieces concatenate back into
        # one (H, BS) tile and the softmax update stays fully vectorized.
        kblk = kbuf[slot]                            # (BS, KV*hd)
        rows = []
        for h in range(n_kv):
            kh = kblk[:, h * hd:(h + 1) * hd].astype(jnp.float32)
            qh = q[h * g:(h + 1) * g]
            sc = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if quantized:
                # q . (k8 * s) == (q . k8) * s — the scale is constant
                # along the contracted hd axis.
                sc = sc * ksbuf[slot][:, h][None, :]
            rows.append(sc)
        scores = (jnp.concatenate(rows, axis=0) if n_kv > 1 else rows[0])
        scores = jnp.where(valid, scores * sm_scale, _NEG_INF)  # (H, BS)

        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new)                  # (H, BS)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)

        vblk = vbuf[slot]
        outs = []
        for h in range(n_kv):
            vh = vblk[:, h * hd:(h + 1) * hd].astype(jnp.float32)
            ph = p[h * g:(h + 1) * g]
            if quantized:
                # p @ (v8 * s) == (p * s) @ v8 — fold the per-position
                # scale into p before the dot.
                ph = ph * vsbuf[slot][:, h][None, :]
            outs.append(jnp.dot(ph, vh,
                                preferred_element_type=jnp.float32))
        pv = jnp.concatenate(outs, axis=0) if n_kv > 1 else outs[0]
        return m_new, l_new, acc * alpha + pv

    m0 = jnp.full((nheads, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((nheads, 1), jnp.float32)
    acc0 = jnp.zeros((nheads, hd), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("window", "block_s", "interpret"))
def flash_decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           lengths: jax.Array, *,
                           k_scale: jax.Array | None = None,
                           v_scale: jax.Array | None = None,
                           window: int | None = None,
                           block_s: int | None = None,
                           interpret: bool = False) -> jax.Array:
    """Single-token attention over a right-aligned KV cache.

    Args:
      q: ``(B, H, hd)`` — this step's queries (RoPE already applied).
      k, v: ``(B, S, KV, hd)`` cache including this step's K/V. May be
        int8 (ops/kv_quant.py) — then ``k_scale``/``v_scale``
        ``(B, S, KV)`` fp32 must be given and dequantization happens
        in-VMEM (HBM streams 1 B per cache element: half the traffic,
        double the capacity of a bf16 cache).
      lengths: ``(B,)`` int32 — valid slots per row (including the token
        just written); slot ``lengths[b] - 1`` is the query's position.
      window: Mistral sliding-window size (keys at positions
        ``> q_pos - window`` attend; matches models/llama.py::_attention).
      block_s: cache tile length per DMA block (defaults to the largest
        of 512/256/... dividing S; 512 measured best at S=4096).

    Returns ``(B, H, hd)`` in q's dtype.
    """
    bsz, nheads, hd = q.shape
    _, s, n_kv, hdk = k.shape
    assert hdk == hd and k.shape == v.shape, (q.shape, k.shape, v.shape)
    assert nheads % n_kv == 0
    quantized = k_scale is not None
    assert quantized == (v_scale is not None)
    g = nheads // n_kv
    bs = block_s or _pick_block_s(s)
    assert s % bs == 0, (s, bs)
    sm_scale = 1.0 / math.sqrt(hd)

    kr = k.reshape(bsz, s, n_kv * hd)
    vr = v.reshape(bsz, s, n_kv * hd)
    lengths = jnp.asarray(lengths, jnp.int32)

    kernel = functools.partial(
        _flash_decode_kernel, block_s=bs, n_kv=n_kv, g=g, hd=hd,
        window=window, sm_scale=sm_scale, quantized=quantized)
    in_specs = [
        pl.BlockSpec((1, nheads, hd), lambda b, ids: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),    # K stays in HBM
        pl.BlockSpec(memory_space=pltpu.ANY),    # V stays in HBM
    ]
    scratch = [
        pltpu.VMEM((2, bs, n_kv * hd), k.dtype),  # K double buffer
        pltpu.VMEM((2, bs, n_kv * hd), v.dtype),  # V double buffer
    ]
    operands = [lengths, q, kr, vr]
    if quantized:
        in_specs += [pl.BlockSpec(memory_space=pltpu.ANY)] * 2  # scales
        scratch += [pltpu.VMEM((2, bs, n_kv), jnp.float32)] * 2
        operands += [k_scale.astype(jnp.float32),
                     v_scale.astype(jnp.float32)]
    scratch += [pltpu.SemaphoreType.DMA((2,))] * (4 if quantized else 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nheads, hd), lambda b, ids: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, nheads, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * nheads * s * hd,
            bytes_accessed=2 * bsz * s * n_kv * hd * k.dtype.itemsize,
            transcendentals=bsz * nheads * s,
        ),
        interpret=interpret,
    )(*operands)
