"""Tenant stacking: N compressed fine-tunes -> one serving pytree.

Generalizes the reference's ``register_diff_compress``
(reference demo/demo_backend.py:104-153): packed masks of all tenants are
stacked per projection into ``(L, T, K//32, N)`` (the reference stacks
``(T, K/32, N)`` per module), per-tenant full tensors (embed / norms /
lm_head — the reference's DataParallelModule leaves, demo_backend.py:
62-79) are stacked on a leading tenant axis, and vocabularies of
different sizes are right-padded to the largest (the reference handled
ragged vocabs with nested tensors + -inf padding; we pad weights once at
stack time and mask logits at sampling).

Unlike the reference, batch row != tenant: any row can route to any
tenant via ``tenant_ids``, so one engine serves many concurrent requests
per tenant (continuous batching).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.compress import CompressedModel
from ..core.delta import BinaryDelta
from ..models.config import ModelConfig
from ..models.llama import PROJ_NAMES, Params


class TenantStack(NamedTuple):
    params: Params          # serving params (base projs + stacked extras)
    deltas: Dict[str, BinaryDelta]  # packed (L, T, K//32, N), scale (L, T)
    vocab_sizes: jax.Array  # (T,) int32 — true vocab per tenant
    num_tenants: int


def _pad_vocab(arr: jax.Array, target: int, axis: int) -> jax.Array:
    pad = target - arr.shape[axis]
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths)


def stack_tenants(cfg: ModelConfig, base_params: Params,
                  tenants: Sequence[CompressedModel]) -> TenantStack:
    """Build the serving stack from a base model + N compressed tenants."""
    if not tenants:
        raise ValueError("need at least one tenant")
    t = len(tenants)
    delta_keys = sorted(tenants[0].deltas.keys())
    ref_shapes = {n: tenants[0].deltas[n].packed.shape for n in delta_keys}
    for i, c in enumerate(tenants):
        if sorted(c.deltas.keys()) != delta_keys:
            raise ValueError(
                f"tenant {i} delta keys {sorted(c.deltas.keys())} != "
                f"{delta_keys} — all tenants must be compressed the same "
                f"way (incl. compress_embeddings)")
        for n in delta_keys:
            if c.deltas[n].packed.shape != ref_shapes[n]:
                raise ValueError(
                    f"tenant {i} has mismatched {n} shape "
                    f"{c.deltas[n].packed.shape} != {ref_shapes[n]} — all "
                    f"tenants must share the base architecture")

    deltas = {}
    for name in delta_keys:
        # Layer-stacked deltas (projections; Mixtral expert mats keep
        # their E axis after T): tenant axis goes second -> (L, T, ...).
        # Embed/lm_head deltas have no layer axis -> (T, D//32, V).
        axis = 0 if name in ("embed", "lm_head") else 1
        packed = jnp.stack([c.deltas[name].packed for c in tenants],
                           axis=axis)
        scale = jnp.stack(
            [jnp.asarray(c.deltas[name].scale, jnp.float32) for c in tenants],
            axis=axis)
        deltas[name] = BinaryDelta(packed=packed, scale=scale)

    compressed_embeds = "embed" in deltas
    if compressed_embeds:
        # Same-vocab requirement is enforced at compress time.
        vocab_sizes = np.full((t,), base_params["embed"].shape[0], np.int32)
    else:
        vocab_sizes = np.asarray([c.extras["embed"].shape[0]
                                  for c in tenants], np.int32)
    vmax = int(vocab_sizes.max())

    from ..core.compress import LAYER_EXTRA_NAMES

    params: Params = {
        "final_norm": jnp.stack([c.extras["final_norm"] for c in tenants]),
        "layers": {
            # norms/biases: (L, X) per tenant -> (L, T, X), selected per
            # batch row in the model's norm_w / biased helpers.
            name: jnp.stack([c.extras[name] for c in tenants], axis=1)
            for name in LAYER_EXTRA_NAMES if name in tenants[0].extras
        },
    }
    # Shared base weights: every layer tensor that isn't a per-tenant
    # extra (llama projections; Mixtral attn/expert/router matrices).
    for name, w in base_params["layers"].items():
        if name not in LAYER_EXTRA_NAMES:
            params["layers"][name] = w

    if compressed_embeds:
        # Shared base embed/lm_head + per-tenant 1-bit deltas: the big
        # per-tenant dense tensors disappear (~2x tenant density for
        # 7B-class models).
        params["embed"] = base_params["embed"]
        if "lm_head" in deltas:
            params["lm_head"] = base_params["lm_head"]
    else:
        params["embed"] = jnp.stack(
            [_pad_vocab(c.extras["embed"], vmax, 0) for c in tenants])
        if all("lm_head" in c.extras for c in tenants):
            params["lm_head"] = jnp.stack(
                [_pad_vocab(c.extras["lm_head"], vmax, 1) for c in tenants])
        elif any("lm_head" in c.extras for c in tenants):
            raise ValueError("mixing tied and untied lm_head tenants")

    return TenantStack(params=params, deltas=deltas,
                       vocab_sizes=jnp.asarray(vocab_sizes),
                       num_tenants=t)


def to_pair_layout(stack: TenantStack, tp: int = 1) -> TenantStack:
    """Convert delta stacks to the pair-packed serving layout consumed by
    the pair VPU decode kernel (ops/pallas_binary_gemm.py; 1.46x the
    one-column kernel on v5e/v6e). Projections whose N isn't a multiple
    of 256 stay canonical (the model dispatch handles a mixed dict).
    Same memory as canonical — serving holds only one layout.

    ``tp``: model-axis shard count for TP serving (the shard_map'd
    Pallas decode path). Pair words of a contiguous K/N shard equal the
    shard of the full pair layout (group-major columns, 16-row word
    halves), so the packed bits never repack under TP; but the
    popcount-based affine correction must be per K-shard for
    row-parallel projections — their colsum gains a shard axis
    ``(L, T, tp, N)``. Eligibility is evaluated on LOCAL sizes: a
    projection whose local N slice isn't a multiple of 256 (e.g.
    k_proj at high tp) stays canonical."""
    from ..core.delta import PairedBinaryDelta, pair_delta
    from ..ops.packing import PAIR_BLOCK, column_popcount, repack_pairs
    from ..parallel.sharding import (COLUMN_PARALLEL,
                                     EXPERT_COLUMN_PARALLEL,
                                     EXPERT_ROW_PARALLEL, ROW_PARALLEL)

    row_par = ROW_PARALLEL + EXPERT_ROW_PARALLEL
    col_par = COLUMN_PARALLEL + EXPERT_COLUMN_PARALLEL + ("lm_head",)

    deltas = {}
    for name, d in stack.deltas.items():
        # "embed" is consumed by gather (one packed column per token),
        # not by the matmul kernels — it stays canonical. The Mixtral
        # router (N = num_experts << 256 lanes) stays canonical too.
        # Expert stacks (w1/w3/w2) pair like the llama projections:
        # mixtral's routed decode path streams them through the pair
        # VPU kernel with (tenant, expert) flattened into the kernel's
        # stack axis (models/mixtral.py::_routed_expert_delta).
        if name in ("embed", "router"):
            deltas[name] = d
            continue
        if hasattr(d, "packed_pairs"):
            # Already-paired leaves (pre-converted stacks, e.g. built
            # directly in serving layout to halve peak memory) pass
            # through — EXCEPT a row-parallel delta whose colsum lacks
            # the per-K-shard axis under TP: the full-K popcount
            # correction is wrong for a K slice, so rebuild it from the
            # packed words (cheap word shuffle, done once at setup).
            if (name in row_par and tp > 1
                    and d.colsum.ndim == d.packed_pairs.ndim - 1):
                from ..ops.packing import unpair_packed

                d = BinaryDelta(packed=unpair_packed(d.packed_pairs),
                                scale=d.scale)
                # falls through to the row-parallel pairing below
            else:
                deltas[name] = d
                continue
        k32, n = d.packed.shape[-2], d.packed.shape[-1]
        if name in row_par and tp > 1:
            if n % PAIR_BLOCK or k32 % tp:
                deltas[name] = d
                continue
            lead = d.packed.shape[:-2]
            k_local = (k32 // tp) * 32
            per_shard = d.packed.reshape(*lead, tp, k32 // tp, n)
            colsum = (2.0 * column_popcount(per_shard)
                      - k_local).astype(jnp.float32)      # (*, tp, N)
            deltas[name] = PairedBinaryDelta(
                packed_pairs=repack_pairs(d.packed), colsum=colsum,
                scale=jnp.asarray(d.scale, jnp.float32))
        else:
            # Column-parallel (incl. lm_head): the N shard must itself
            # be pair-eligible.
            n_local = n // tp if name in col_par else n
            if n_local % PAIR_BLOCK == 0:
                deltas[name] = pair_delta(d)
            else:
                deltas[name] = d
    return stack._replace(deltas=deltas)


def _delta_nbytes(d) -> int:
    if hasattr(d, "packed_pairs"):
        return (d.packed_pairs.size * 4 + d.colsum.size * 4
                + d.scale.size * 4)
    return d.packed.size * 4 + d.scale.size * 4


def _weight_nbytes(w) -> int:
    if hasattr(w, "q"):        # Int8Weight (W8 base serving mode)
        return w.q.size + w.scale.size * 4
    if hasattr(w, "packed"):   # Int4Weight (W4 density mode)
        return w.packed.size * 4 + w.scale.size * 4
    return w.size * w.dtype.itemsize


def stack_nbytes(stack: TenantStack) -> Dict[str, float]:
    """Serving memory accounting: shared base vs per-tenant increments
    (the reference's '6x Mistral-7B in <30GB' headline, README.md:18)."""
    from ..core.compress import LAYER_EXTRA_NAMES

    base = sum(_weight_nbytes(w)
               for n, w in stack.params["layers"].items()
               if n not in LAYER_EXTRA_NAMES)
    packed = sum(_delta_nbytes(d) for d in stack.deltas.values())
    extras = (stack.params["final_norm"].size
              * stack.params["final_norm"].dtype.itemsize)
    extras += sum(w.size * w.dtype.itemsize
                  for n, w in stack.params["layers"].items()
                  if n in LAYER_EXTRA_NAMES)
    for name in ("embed", "lm_head"):
        w = stack.params.get(name)
        if w is None:
            continue
        nbytes = w.size * w.dtype.itemsize
        if w.ndim == 3:      # per-tenant stacked (uncompressed extras)
            extras += nbytes
        else:                # shared base (compressed embeddings mode)
            base += nbytes
    return {"base_bytes": float(base), "deltas_bytes": float(packed),
            "tenant_extras_bytes": float(extras),
            "per_tenant_bytes": float((packed + extras) / stack.num_tenants)}
