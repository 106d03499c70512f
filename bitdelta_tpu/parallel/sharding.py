"""Sharding rules for params, deltas, optimizer state and KV caches.

Megatron-style tensor parallelism expressed as GSPMD partition specs
over the ``(data, model)`` mesh from :mod:`.mesh`:

  * column-parallel (shard N): q/k/v_proj, gate/up_proj — their outputs
    are head-/channel-sharded, consumed locally by the row-parallel
    partner;
  * row-parallel (shard K): o_proj, down_proj — XLA inserts the
    reduce-scatter/all-reduce over ICI at their outputs;
  * packed delta masks shard exactly like their base matrices. K-axis
    sharding of a packed mask is a contiguous slice of int32 words
    because packing is LSB-first along K in 32-row blocks
    (ops/packing.py; tested in tests/test_packing.py::test_k_shard_contiguity)
    — TP never needs a repack;
  * embed shards vocab rows, lm_head shards vocab cols (logits stay
    vocab-sharded until the loss/sampler reduces them);
  * KV cache shards batch over "data" and kv-heads over "model".

The reference has no counterpart — its multi-GPU story is layer-wise
model splitting via accelerate hooks (SURVEY.md section 2, P1/P2).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS
from ..models.config import ModelConfig

COLUMN_PARALLEL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
ROW_PARALLEL = ("o_proj", "down_proj")

# Mixtral expert stacks (models/mixtral.py): Megatron TP *inside* each
# expert — w1/w3 ``(L, E, D, I)`` shard the intermediate (column-
# parallel), w2 ``(L, E, I, D)`` contracts the sharded intermediate
# (row-parallel; GSPMD inserts the one psum per MoE block). This works
# for any tp <= I regardless of the expert count; the einsum-over-E
# formulation in mixtral._expert_matmul is what makes the annotations
# compose. The router ``(L, D, E)`` is tiny — replicate.
EXPERT_COLUMN_PARALLEL = ("w1", "w3")
EXPERT_ROW_PARALLEL = ("w2",)


def param_specs(cfg: ModelConfig) -> Dict[str, Any]:
    layers = {
        "attn_norm": P(),
        "mlp_norm": P(),
    }
    moe = bool(getattr(cfg, "num_experts", 0))
    for name in COLUMN_PARALLEL:
        if moe and name in ("gate_proj", "up_proj"):
            continue  # Mixtral has expert stacks instead of a dense MLP
        layers[name] = P(None, None, MODEL_AXIS)
    for name in ROW_PARALLEL:
        if moe and name == "down_proj":
            continue
        layers[name] = P(None, MODEL_AXIS, None)
    if moe:
        for name in EXPERT_COLUMN_PARALLEL:
            layers[name] = P(None, None, None, MODEL_AXIS)
        for name in EXPERT_ROW_PARALLEL:
            layers[name] = P(None, None, MODEL_AXIS, None)
        layers["router"] = P()
    specs = {
        "embed": P(MODEL_AXIS, None),
        "final_norm": P(),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, MODEL_AXIS)
    return specs


def delta_specs(cfg: ModelConfig, tenant_stacked: bool = False,
                keys=None) -> Dict[str, Any]:
    """Specs for a deltas pytree {proj: BinaryDelta}.

    Single-tenant leaves: packed ``(L, K//32, N)``, scale ``(L,)``.
    Tenant-stacked (serving): packed ``(L, T, K//32, N)``, scale ``(L, T)``.
    With ``keys`` given, returns specs exactly for those names — this is
    how the "embed"/"lm_head" delta entries (compress_embeddings mode;
    packed ``(D//32, V)``, no layer axis, vocab sharded like the dense
    extras) are included without changing the default structure.
    """
    from ..core.delta import BinaryDelta

    lead = (None, None) if tenant_stacked else (None,)
    out = {}
    for name in COLUMN_PARALLEL:
        out[name] = BinaryDelta(packed=P(*lead, None, MODEL_AXIS),
                                scale=P(*lead))
    for name in ROW_PARALLEL:
        out[name] = BinaryDelta(packed=P(*lead, MODEL_AXIS, None),
                                scale=P(*lead))
    if getattr(cfg, "num_experts", 0):
        # Mixtral expert deltas carry an E axis after the layer/tenant
        # lead; packed words shard exactly like their expert matrices.
        # Router deltas (tiny) replicate; scales always replicate.
        for name in EXPERT_COLUMN_PARALLEL:
            out[name] = BinaryDelta(
                packed=P(*lead, None, None, MODEL_AXIS),
                scale=P(*lead, None))
        for name in EXPERT_ROW_PARALLEL:
            out[name] = BinaryDelta(
                packed=P(*lead, None, MODEL_AXIS, None),
                scale=P(*lead, None))
        out["router"] = BinaryDelta(packed=P(*lead, None, None),
                                    scale=P(*lead))
    elead = (None,) if tenant_stacked else ()
    for name in ("embed", "lm_head"):
        out[name] = BinaryDelta(packed=P(*elead, None, MODEL_AXIS),
                                scale=P(*elead))
    if keys is None:
        out = {k: v for k, v in out.items()
               if k not in ("embed", "lm_head")}
    else:
        out = {k: out[k] for k in keys}
    return out


def extras_specs(cfg: ModelConfig, keys=None) -> Dict[str, Any]:
    specs = {
        "embed": P(MODEL_AXIS, None),
        "final_norm": P(),
        "attn_norm": P(),
        "mlp_norm": P(),
        # Qwen2-style attention biases (tiny — replicate).
        "q_bias": P(),
        "k_bias": P(),
        "v_bias": P(),
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, MODEL_AXIS)
    if keys is not None:
        # Pass keys=extras.keys(): compress_embeddings mode drops
        # embed/lm_head, bias-less models have no q/k/v_bias.
        specs = {k: specs[k] for k in keys}
    else:
        specs = {k: v for k, v in specs.items()
                 if k not in ("q_bias", "k_bias", "v_bias")}
    return specs


def serving_delta_specs(deltas) -> Dict[str, Any]:
    """Specs for a serving deltas dict (tenant-stacked) whose leaves may
    be canonical ``BinaryDelta`` or pair-layout ``PairedBinaryDelta``
    (the shard_map'd Pallas TP decode path; stacking.to_pair_layout).

    Pair words shard exactly like their canonical counterparts — a
    contiguous K shard (multiple of 32 rows) is a contiguous slice of
    pair rows, and a contiguous N shard (multiple of 256 cols) is a
    contiguous slice of group-major pair columns — so no repack ever
    happens at shard boundaries. Row-parallel paired colsums carry a
    per-K-shard axis ``(L, T, tp, N)`` sharded on the model axis.
    """
    from ..core.delta import BinaryDelta, PairedBinaryDelta

    out = {}
    for name, d in deltas.items():
        paired = hasattr(d, "packed_pairs")
        if name == "embed":
            # (T, D//32, V): packed along hidden, vocab-sharded.
            out[name] = BinaryDelta(packed=P(None, None, MODEL_AXIS),
                                    scale=P())
        elif name == "lm_head":
            out[name] = (PairedBinaryDelta(
                packed_pairs=P(None, None, MODEL_AXIS),
                colsum=P(None, MODEL_AXIS), scale=P()) if paired
                else BinaryDelta(packed=P(None, None, MODEL_AXIS),
                                 scale=P()))
        elif name in COLUMN_PARALLEL:
            out[name] = (PairedBinaryDelta(
                packed_pairs=P(None, None, None, MODEL_AXIS),
                colsum=P(None, None, MODEL_AXIS), scale=P()) if paired
                else BinaryDelta(packed=P(None, None, None, MODEL_AXIS),
                                 scale=P()))
        elif name in ROW_PARALLEL:
            if paired:
                # colsum is per-K-shard when it has the extra axis.
                cspec = (P(None, None, MODEL_AXIS, None)
                         if d.colsum.ndim == 4 else P())
                out[name] = PairedBinaryDelta(
                    packed_pairs=P(None, None, MODEL_AXIS, None),
                    colsum=cspec, scale=P())
            else:
                out[name] = BinaryDelta(
                    packed=P(None, None, MODEL_AXIS, None), scale=P())
        # Mixtral: tenant-stacked expert deltas ``(L, T, E, K//32, N)``
        # (canonical) / ``(L, T, E, K//16, N//2)`` (pair serving layout)
        # shard like their expert matrices; the router delta
        # ``(L, T, D//32, E)`` replicates.
        elif name in EXPERT_COLUMN_PARALLEL:
            out[name] = (PairedBinaryDelta(
                packed_pairs=P(None, None, None, None, MODEL_AXIS),
                colsum=P(None, None, None, MODEL_AXIS), scale=P())
                if paired else BinaryDelta(
                    packed=P(None, None, None, None, MODEL_AXIS),
                    scale=P()))
        elif name in EXPERT_ROW_PARALLEL:
            if paired:
                cspec = (P(None, None, None, MODEL_AXIS, None)
                         if d.colsum.ndim == 5 else P())
                out[name] = PairedBinaryDelta(
                    packed_pairs=P(None, None, None, MODEL_AXIS, None),
                    colsum=cspec, scale=P())
            else:
                out[name] = BinaryDelta(
                    packed=P(None, None, None, MODEL_AXIS, None),
                    scale=P())
        elif name == "router":
            out[name] = BinaryDelta(packed=P(), scale=P())
        else:
            raise ValueError(f"no sharding rule for delta {name!r}")
    return out


def serving_param_specs(cfg: ModelConfig, params, tp: int = 1
                        ) -> Dict[str, Any]:
    """Specs for a TenantStack's serving params (serving/stacking.py):
    projections shard like :func:`param_specs`; tenant-stacked norms
    ``(L, T, D)`` / ``(T, D)`` replicate (tiny); per-tenant embeds
    ``(T, V, D)`` shard vocab rows and per-tenant heads ``(T, D, V)``
    shard vocab cols on the model axis (shared 2-D variants — the
    compress_embeddings mode — shard like the single-model specs)."""
    from ..research.quantized_base import Int4Weight, Int8Weight

    layers: Dict[str, Any] = {}
    for name, w in params["layers"].items():
        if name in COLUMN_PARALLEL:
            qspec, sspec = P(None, None, MODEL_AXIS), P(None, MODEL_AXIS)
        elif name in ROW_PARALLEL:
            qspec, sspec = P(None, MODEL_AXIS, None), P()
        elif name in EXPERT_COLUMN_PARALLEL:  # Mixtral (L, E, D, I)
            layers[name] = P(None, None, None, MODEL_AXIS)
            continue
        elif name in EXPERT_ROW_PARALLEL:     # Mixtral (L, E, I, D)
            layers[name] = P(None, None, MODEL_AXIS, None)
            continue
        else:
            # norms / attention biases / Mixtral router: replicate
            layers[name] = P()
            continue
        # Int8Weight (W8 base): q shards like the dense matrix; the
        # per-output-column scale shards with N. Int4Weight (W4 base):
        # packed nibbles shard like the dense matrix (K words are
        # contiguous K rows); the per-(K-group, column) scale shards
        # with N for column-parallel and per K-GROUP for row-parallel
        # when the group rows divide the model axis (K % (INT4_GROUP*tp)
        # == 0 — true at every real shape: 4096/14336 K, 128 groups, tp
        # <= 8). Per-shard scales are what let the shard_map Pallas
        # decode run int4_matmul on purely local slices; they also stop
        # replicating ~75 MB of row-parallel scales at 7B shapes. Pass
        # ``tp`` to enable; misaligned worlds fall back to replication
        # (GSPMD-correct; the engine rejects them for shard_map).
        if isinstance(w, Int8Weight):
            layers[name] = Int8Weight(q=qspec, scale=sspec)
        elif isinstance(w, Int4Weight):
            if name in COLUMN_PARALLEL:
                i4_sspec = P(None, None, MODEL_AXIS)
            elif tp > 1 and w.scale.shape[-2] % tp == 0:
                i4_sspec = P(None, MODEL_AXIS, None)
            else:
                i4_sspec = P()
            layers[name] = Int4Weight(packed=qspec, scale=i4_sspec)
        else:
            layers[name] = qspec
    specs: Dict[str, Any] = {"final_norm": P(), "layers": layers}
    embed = params["embed"]
    specs["embed"] = (P(None, MODEL_AXIS, None) if embed.ndim == 3
                      else P(MODEL_AXIS, None))
    if "lm_head" in params:
        lm = params["lm_head"]
        specs["lm_head"] = (P(None, None, MODEL_AXIS) if lm.ndim == 3
                            else P(None, MODEL_AXIS))
    return specs


def shard_stack(cfg: ModelConfig, stack, mesh: Mesh):
    """Shard a serving TenantStack (canonical or pair delta layout) for
    TP/DP multi-tenant serving. Packed tenant deltas shard exactly like
    their base matrices; vocab_sizes replicate."""
    params = shard_tree(stack.params,
                        serving_param_specs(cfg, stack.params,
                                            tp=mesh.shape[MODEL_AXIS]),
                        mesh)
    deltas = shard_tree(stack.deltas, serving_delta_specs(stack.deltas),
                        mesh)
    vocab_sizes = jax.device_put(stack.vocab_sizes,
                                 NamedSharding(mesh, P()))
    return stack._replace(params=params, deltas=deltas,
                          vocab_sizes=vocab_sizes)


def cache_spec() -> P:
    """KVCache k/v ``(L, B, S, KV, hd)``: batch on data, heads on model."""
    return P(None, DATA_AXIS, None, MODEL_AXIS, None)


def cache_scale_spec() -> P:
    """int8-KV scales ``(L, B, S, KV)`` shard like k/v minus head_dim."""
    return P(None, DATA_AXIS, None, MODEL_AXIS)


def shard_cache(cache, mesh: Mesh):
    """Place a KVCache with batch on data and kv-heads on model
    (int8-KV scale arrays shard alongside when present)."""
    put = lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
    return cache._replace(
        k=put(cache.k, cache_spec()),
        v=put(cache.v, cache_spec()),
        length=put(cache.length, P()),
        k_scale=(None if cache.k_scale is None
                 else put(cache.k_scale, cache_scale_spec())),
        v_scale=(None if cache.v_scale is None
                 else put(cache.v_scale, cache_scale_spec())))


def batch_spec() -> P:
    return P(DATA_AXIS, None)


def shard_tree(tree, specs, mesh: Mesh):
    """device_put every leaf with its NamedSharding (committed)."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def replicated(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def shard_model(cfg: ModelConfig, params, mesh: Mesh):
    return shard_tree(params, param_specs(cfg), mesh)


def shard_deltas(cfg: ModelConfig, deltas, mesh: Mesh,
                 tenant_stacked: bool = False):
    return shard_tree(
        deltas, delta_specs(cfg, tenant_stacked, keys=deltas.keys()), mesh)


