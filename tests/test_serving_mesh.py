"""Mesh-sharded serving engine: TP/DP multi-tenant decode on the 8
fake-CPU-device mesh must match the single-device engine exactly.

This is the 70B-serving configuration (base weights, packed tenant
deltas, per-tenant extras and the KV cache all GSPMD-sharded; see
parallel/sharding.py::shard_stack / shard_cache). The reference's only
multi-GPU story is accelerate layer maps (SURVEY.md P2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdelta_tpu.core.compress import compress_model
from bitdelta_tpu.models import config as cfgs
from bitdelta_tpu.models import llama as jl
from bitdelta_tpu.parallel import mesh as pmesh
from bitdelta_tpu.serving.engine import Engine, Request
from bitdelta_tpu.serving.stacking import stack_tenants


def _make_world(num_tenants=2, seed=0, compress_embeddings=False):
    # TP=4-shardable including the packed K axis: row-parallel deltas
    # shard K//32 int32 words, so K must be a multiple of 32*4. Sizes
    # chosen so the pallas shard_map test covers all three delta kinds:
    # gate/up pair-packed column-parallel (local N = 256), o/down
    # pair-packed row-parallel (per-shard colsums), q/k/v canonical
    # (local N = 64 < 256 is pair-ineligible).
    cfg = cfgs.tiny_test_config(vocab_size=128, hidden_size=256,
                                intermediate_size=1024, num_layers=2,
                                num_heads=4, num_kv_heads=4,
                                dtype="float32")
    base = jl.init_params(cfg, jax.random.PRNGKey(seed), jnp.float32,
                          scale=0.25)
    tenants = []
    for t in range(num_tenants):
        fine = dict(base)
        fine["layers"] = dict(base["layers"])
        key = jax.random.PRNGKey(100 + t)
        for name in jl.PROJ_NAMES:
            key, sub = jax.random.split(key)
            fine["layers"][name] = base["layers"][name] + (
                0.05 * jax.random.normal(sub, base["layers"][name].shape))
        key, sub = jax.random.split(key)
        fine["embed"] = base["embed"] + 0.02 * jax.random.normal(
            sub, base["embed"].shape)
        tenants.append(compress_model(
            base, fine, compress_embeddings=compress_embeddings))
    return cfg, stack_tenants(cfg, base, tenants)


def _run(cfg, stack, mesh, kernel="xla"):
    eng = Engine(cfg, stack, max_slots=4, max_seq=64,
                 prefill_buckets=(16,), kernel=kernel, mesh=mesh)
    reqs = [Request(prompt_ids=[3, 5, 7, 9, 11], tenant_id=0,
                    max_new_tokens=6),
            Request(prompt_ids=[2, 4, 6], tenant_id=1, max_new_tokens=6),
            Request(prompt_ids=[8, 8, 8, 8], tenant_id=0,
                    max_new_tokens=4)]
    return eng.generate(reqs)


@pytest.mark.parametrize("compress_embeddings", [False, True])
def test_mesh_engine_matches_single_device(compress_embeddings):
    cfg, stack = _make_world(compress_embeddings=compress_embeddings)
    want = _run(cfg, stack, None)
    mesh = pmesh.make_mesh((2, 4), devices=jax.devices()[:8])
    got = _run(cfg, stack, mesh)
    assert got == want


@pytest.mark.parametrize("compress_embeddings", [False, True])
def test_mesh_engine_pallas_shardmap_matches_single_device(
        compress_embeddings):
    # The shard_map'd Pallas decode (70B-serving hot path): every
    # model-axis shard runs the VPU delta kernels on its local pair
    # slice with per-shard colsums. Greedy tokens must match the
    # single-device XLA engine exactly.
    from jax.experimental.pallas import tpu as pltpu

    cfg, stack = _make_world(compress_embeddings=compress_embeddings)
    want = _run(cfg, stack, None)
    mesh = pmesh.make_mesh((2, 4), devices=jax.devices()[:8])
    with pltpu.force_tpu_interpret_mode():
        got = _run(cfg, stack, mesh, kernel="pallas")
    assert got == want


def test_mesh_engine_weights_partitioned():
    cfg, stack = _make_world()
    mesh = pmesh.make_mesh((2, 4), devices=jax.devices()[:8])
    eng = Engine(cfg, stack, max_slots=4, max_seq=64,
                 prefill_buckets=(16,), kernel="xla", mesh=mesh)
    gate = eng.stack.params["layers"]["gate_proj"]
    # Column-parallel: each device holds 1/4 of N.
    shard = gate.addressable_shards[0]
    assert shard.data.shape[-1] == gate.shape[-1] // 4
    packed = eng.stack.deltas["gate_proj"].packed
    assert packed.addressable_shards[0].data.shape[-1] == \
        packed.shape[-1] // 4
    # Cache: batch over data (2), kv heads over model (4).
    kshard = eng.cache.k.addressable_shards[0]
    assert kshard.data.shape[1] == eng.cache.k.shape[1] // 2
    assert kshard.data.shape[3] == eng.cache.k.shape[3] // 4


def test_mesh_engine_validation():
    cfg, stack = _make_world()
    mesh = pmesh.make_mesh((2, 4), devices=jax.devices()[:8])
    with pytest.raises(ValueError, match="max_slots"):
        Engine(cfg, stack, max_slots=3, max_seq=64, kernel="xla",
               mesh=mesh)


def test_mesh_engine_pallas_int8_kv_matches_single_device():
    """TP shard_map pallas decode over a SHARDED int8 KV cache (scales
    shard with the kv heads): greedy == single-device int8 engine."""
    from jax.experimental.pallas import tpu as pltpu

    cfg, stack = _make_world()

    def run_kv(mesh, kernel):
        eng = Engine(cfg, stack, max_slots=4, max_seq=64,
                     prefill_buckets=(16,), kernel=kernel, mesh=mesh,
                     kv_dtype="int8")
        reqs = [Request(prompt_ids=[3, 5, 7, 9, 11], tenant_id=0,
                        max_new_tokens=6),
                Request(prompt_ids=[2, 4, 6], tenant_id=1,
                        max_new_tokens=6)]
        return eng.generate(reqs)

    want = run_kv(None, "xla")
    mesh = pmesh.make_mesh((2, 4), devices=jax.devices()[:8])
    with pltpu.force_tpu_interpret_mode():
        got = run_kv(mesh, "pallas")
    assert got == want
