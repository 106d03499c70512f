"""TP/DP sharding tests on the simulated 8-device CPU mesh.

Checks that (a) sharded forward/distill/decode produce the same numbers
as single-device execution, and (b) weights/deltas/caches are actually
partitioned (per-device shard shapes are smaller)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from bitdelta_tpu.core.compress import compress_model, student_params
from bitdelta_tpu.models import config as cfgs
from bitdelta_tpu.models import llama as jl
from bitdelta_tpu.parallel import mesh as pmesh
from bitdelta_tpu.parallel import sharding as psh


def _cfg():
    # dims divisible by tp=4 and K divisible by 32*tp where K-sharded.
    return cfgs.tiny_test_config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=8, num_kv_heads=4)


def _pair(cfg, seed=0):
    base = jl.init_params(cfg, jax.random.PRNGKey(seed), jnp.float32)
    fine = jax.tree.map(lambda x: x, base)
    fine["layers"] = dict(fine["layers"])
    key = jax.random.PRNGKey(seed + 50)
    for name in jl.PROJ_NAMES:
        key, sub = jax.random.split(key)
        fine["layers"][name] = base["layers"][name] + (
            0.02 * jax.random.normal(sub, base["layers"][name].shape))
    return base, fine


def test_eight_fake_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_forward_matches_single_device():
    cfg = _cfg()
    base, fine = _pair(cfg)
    comp = compress_model(base, fine)
    toks = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (4, 16), dtype=np.int64))

    ref = np.asarray(jl.forward(cfg, student_params(base, comp), toks,
                                deltas=comp.deltas,
                                compute_dtype=jnp.float32))

    mesh = pmesh.make_mesh((2, 4))
    sp = psh.shard_model(cfg, student_params(base, comp), mesh)
    sd = psh.shard_deltas(cfg, comp.deltas, mesh)
    toks_sh = jax.device_put(toks, NamedSharding(mesh, psh.batch_spec()))
    out = jax.jit(lambda p, d, t: jl.forward(cfg, p, t, deltas=d,
                                             compute_dtype=jnp.float32))(sp, sd, toks_sh)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_weights_are_actually_partitioned():
    cfg = _cfg()
    base, fine = _pair(cfg)
    mesh = pmesh.make_mesh((1, 8))
    sp = psh.shard_model(cfg, base, mesh)
    # Column-parallel: N axis split 8 ways per device.
    q = sp["layers"]["q_proj"]
    shard_shape = q.sharding.shard_shape(q.shape)
    assert shard_shape == (cfg.num_layers, cfg.hidden_size, cfg.q_dim // 8)
    # Row-parallel: K axis split.
    o = sp["layers"]["o_proj"]
    assert o.sharding.shard_shape(o.shape) == (
        cfg.num_layers, cfg.q_dim // 8, cfg.hidden_size)


def test_packed_delta_k_sharding_is_word_aligned():
    cfg = _cfg()
    base, fine = _pair(cfg)
    comp = compress_model(base, fine)
    mesh = pmesh.make_mesh((1, 4))
    sd = psh.shard_deltas(cfg, comp.deltas, mesh)
    down = sd["down_proj"]  # row-parallel: packed (L, K/32, N), K sharded
    k32 = cfg.intermediate_size // 32
    assert down.packed.sharding.shard_shape(down.packed.shape) == (
        cfg.num_layers, k32 // 4, cfg.hidden_size)
    # Shard 0's words must equal a local repack of the first K/4 rows.
    from bitdelta_tpu.ops.packing import pack_signs, unpack_signs
    full_signs = np.asarray(unpack_signs(comp.deltas["down_proj"].packed))
    local = np.asarray(
        pack_signs(jnp.asarray(full_signs[:, : cfg.intermediate_size // 4])))
    shard0 = np.asarray([s.data for s in down.packed.addressable_shards
                         if s.index[1].start in (0, None)][0])
    np.testing.assert_array_equal(shard0, local)


def test_sharded_distill_step_matches_unsharded():
    from bitdelta_tpu.train.data import synthetic_batches
    from bitdelta_tpu.train.distill import DistillConfig, distill_scales

    cfg = _cfg()
    base, fine = _pair(cfg)
    comp = compress_model(base, fine)
    batches = synthetic_batches(cfg.vocab_size, 3, 4, 16, seed=1)
    dcfg = DistillConfig(lr=1e-3, num_steps=3, compute_dtype="float32")

    cal_ref, losses_ref = distill_scales(cfg, base, fine, comp, batches, dcfg)

    mesh = pmesh.make_mesh((2, 4))
    base_sh = psh.shard_model(cfg, base, mesh)
    fine_sh = psh.shard_model(cfg, fine, mesh)
    comp_sh = comp._replace(deltas=psh.shard_deltas(cfg, comp.deltas, mesh),
                            extras=psh.shard_tree(comp.extras,
                                                  psh.extras_specs(cfg), mesh))
    cal_sh, losses_sh = distill_scales(cfg, base_sh, fine_sh, comp_sh,
                                       batches, dcfg, mesh=mesh)
    np.testing.assert_allclose(losses_sh, losses_ref, rtol=1e-4)
    for name in cal_ref.deltas:
        np.testing.assert_allclose(np.asarray(cal_sh.deltas[name].scale),
                                   np.asarray(cal_ref.deltas[name].scale),
                                   rtol=1e-5)


def test_sharded_decode_matches_single_device():
    cfg = _cfg()
    base, _ = _pair(cfg)
    toks = jnp.asarray(np.random.default_rng(2).integers(
        0, cfg.vocab_size, (2, 6), dtype=np.int64))

    _, cache_ref = jl.forward(cfg, base, toks, compute_dtype=jnp.float32,
                              return_cache=True, cache_max_seq=16)
    nxt = jnp.asarray([[5], [9]], jnp.int32)
    step_ref, _ = jl.decode_step(cfg, base, nxt, cache_ref,
                                 compute_dtype=jnp.float32)

    mesh = pmesh.make_mesh((2, 4))
    sp = psh.shard_model(cfg, base, mesh)
    toks_sh = jax.device_put(toks, NamedSharding(mesh, psh.batch_spec()))
    _, cache = jax.jit(lambda p, t: jl.forward(
        cfg, p, t, compute_dtype=jnp.float32, return_cache=True,
        cache_max_seq=16))(sp, toks_sh)
    step, _ = jax.jit(lambda p, t, c: jl.decode_step(
        cfg, p, t, c, compute_dtype=jnp.float32))(sp, nxt, cache)
    np.testing.assert_allclose(np.asarray(step), np.asarray(step_ref),
                               rtol=2e-4, atol=2e-4)


def test_mesh_shape_validation():
    with pytest.raises(ValueError):
        pmesh.make_mesh((3, 3))
