"""Mixtral MoE expert compression: experts as 1-bit deltas off the mean
expert.

Counterpart of the reference's experimental Mixtral support (reference
bitdelta/misc.py:34-67: ``compress_mixtral_moe_diff`` compresses every
expert's w1/w2/w3 as a BinaryDiff against the *mean expert* of its
layer; ``MixtralBinaryDiff`` is the 3-matmul SwiGLU expert;
exploration in notebooks/mixtral_weight.ipynb — not wired to any CLI in
the reference either).

Memory story: an 8-expert Mixtral FFN stores 1 mean expert in bf16 +
8 one-bit expert deltas ~= (1 + 8/16) x one expert instead of 8x.

TPU shape: experts live in a stacked ``(E, K, N)`` pytree; routed
evaluation computes every expert's 1-bit delta matmul via the same
batched binary GEMM as multi-tenant serving (an expert IS a tenant of
the mean expert) and combines with router weights.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.delta import BinaryDelta, quantize_delta
from ..ops.binary_matmul import binary_bmm


class MoEExpertDelta(NamedTuple):
    """One FFN matrix family across experts: mean weights + per-expert
    1-bit deltas (packed ``(E, K//32, N)``, scale ``(E,)``)."""

    mean_w: jax.Array
    delta: BinaryDelta


def compress_experts(expert_w: jax.Array) -> MoEExpertDelta:
    """expert_w: ``(E, K, N)`` -> mean expert + per-expert deltas
    (reference misc.py:47-67 semantics: delta vs the layer's mean
    expert)."""
    mean_w = jnp.mean(expert_w.astype(jnp.float32), axis=0).astype(
        expert_w.dtype)
    delta = quantize_delta(jnp.broadcast_to(mean_w, expert_w.shape),
                           expert_w)
    return MoEExpertDelta(mean_w=mean_w, delta=delta)


class MoEDeltaFFN(NamedTuple):
    """Compressed SwiGLU expert family (Mixtral w1=gate, w3=up, w2=down;
    reference MixtralBinaryDiff, misc.py:34-45)."""

    w1: MoEExpertDelta
    w3: MoEExpertDelta
    w2: MoEExpertDelta


def compress_moe_ffn(w1: jax.Array, w3: jax.Array,
                     w2: jax.Array) -> MoEDeltaFFN:
    return MoEDeltaFFN(w1=compress_experts(w1), w3=compress_experts(w3),
                       w2=compress_experts(w2))


def _expert_matmul(x: jax.Array, fam: MoEExpertDelta,
                   compute_dtype) -> jax.Array:
    """All-experts matmul of ``x (E, M, K)`` against mean + delta:
    shared mean GEMM + batched 1-bit delta GEMM (the multi-tenant
    decomposition applied to experts)."""
    y_mean = jnp.matmul(x.astype(compute_dtype),
                        fam.mean_w.astype(compute_dtype),
                        preferred_element_type=jnp.float32)
    y_delta = binary_bmm(x, fam.delta.packed, fam.delta.scale,
                         compute_dtype=compute_dtype).astype(jnp.float32)
    return (y_mean + y_delta).astype(compute_dtype)


def moe_ffn_apply(x: jax.Array, ffn: MoEDeltaFFN, router_logits: jax.Array,
                  top_k: int = 2, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Dense-evaluated top-k routed SwiGLU over compressed experts.

    x: ``(M, K)``; router_logits: ``(M, E)``. Evaluates every expert (the
    TPU-friendly static-shape formulation) and masks to the top-k with
    renormalized softmax weights, matching Mixtral's routing semantics.
    """
    m, k = x.shape
    e = ffn.w1.delta.packed.shape[0]
    topv, topi = jax.lax.top_k(router_logits, top_k)           # (M, k)
    gates = jax.nn.softmax(topv, axis=-1)
    weight = jnp.zeros((m, e), jnp.float32)
    weight = weight.at[jnp.arange(m)[:, None], topi].set(gates)

    xe = jnp.broadcast_to(x[None], (e, m, k))
    h1 = _expert_matmul(xe, ffn.w1, compute_dtype)
    h3 = _expert_matmul(xe, ffn.w3, compute_dtype)
    h = (jax.nn.silu(h1.astype(jnp.float32)).astype(compute_dtype)
         * h3)
    out = _expert_matmul(h, ffn.w2, compute_dtype)             # (E, M, N)
    return jnp.einsum("emn,me->mn", out.astype(jnp.float32),
                      weight).astype(x.dtype)


def moe_compression_ratio(w: jax.Array, fam: MoEExpertDelta) -> float:
    dense = w.size * 2
    comp = fam.mean_w.size * 2 + fam.delta.packed.size * 4 + fam.delta.scale.size * 4
    return dense / comp
