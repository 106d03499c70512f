"""Pallas kernel correctness vs the XLA lowering (interpret mode on CPU;
the same tests run compiled on real TPU via bench/verify drives).

Mirrors the reference's kernel validation strategy (notebook cell
comparing Triton vs torch.matmul(a, 2b-1); SURVEY.md section 4) but as
actual pytest property tests.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdelta_tpu.ops.packing import pack_signs
from bitdelta_tpu.ops.binary_matmul import binary_matmul, tenant_binary_matmul
from bitdelta_tpu.ops.pallas_binary_gemm import (
    binary_matmul_pallas,
    fused_tenant_matmul_pallas,
)

INTERP = jax.default_backend() != "tpu"


@pytest.mark.parametrize("m,k,n", [(8, 64, 128), (16, 512, 256), (1, 128, 128)])
def test_binary_matmul_pallas_matches_xla(m, k, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    signs = rng.integers(0, 2, (k, n)).astype(bool)
    packed = pack_signs(jnp.asarray(signs))
    got = np.asarray(binary_matmul_pallas(x, packed, 0.7, interpret=INTERP))
    want = np.asarray(binary_matmul(x, packed, 0.7, compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_binary_matmul_pallas_bf16():
    rng = np.random.default_rng(1)
    m, k, n = 8, 256, 128
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    packed = pack_signs(jnp.asarray(rng.integers(0, 2, (k, n)).astype(bool)))
    got = np.asarray(binary_matmul_pallas(x, packed, 1.3,
                                          interpret=INTERP).astype(jnp.float32))
    want = np.asarray(binary_matmul(x, packed, 1.3).astype(jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("bsz,t,k,n", [(4, 3, 64, 128), (8, 6, 512, 256),
                                       (2, 2, 128, 512)])
def test_fused_tenant_matmul_matches_xla(bsz, t, k, n):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((bsz, k)), jnp.float32)
    w = jnp.asarray(0.1 * rng.standard_normal((k, n)), jnp.float32)
    signs = rng.integers(0, 2, (t, k, n)).astype(bool)
    packed = pack_signs(jnp.asarray(signs))
    scales = jnp.asarray(rng.uniform(0.1, 2.0, (t,)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, t, (bsz,)), jnp.int32)

    got = np.asarray(fused_tenant_matmul_pallas(x, w, packed, scales, ids,
                                                interpret=INTERP))
    base = np.asarray(x) @ np.asarray(w)
    delta = np.asarray(tenant_binary_matmul(x[:, None, :], packed, scales, ids,
                                            compute_dtype=jnp.float32))[:, 0]
    np.testing.assert_allclose(got, base + delta, rtol=1e-4, atol=1e-4)


def test_fused_tenant_repeated_ids_share_mask():
    # Multiple batch rows on the same tenant must all use that tenant's
    # mask (the continuous-batching case the reference demo can't do —
    # its batch row i is hardwired to tenant i, demo_backend.py:127-150).
    rng = np.random.default_rng(3)
    bsz, t, k, n = 6, 2, 64, 128
    x = jnp.asarray(rng.standard_normal((bsz, k)), jnp.float32)
    w = jnp.zeros((k, n), jnp.float32)
    signs = rng.integers(0, 2, (t, k, n)).astype(bool)
    packed = pack_signs(jnp.asarray(signs))
    scales = jnp.ones((t,), jnp.float32)
    ids = jnp.asarray([0, 0, 1, 1, 0, 1], jnp.int32)
    got = np.asarray(fused_tenant_matmul_pallas(x, w, packed, scales, ids,
                                                interpret=INTERP))
    for b in range(bsz):
        want = np.asarray(x)[b] @ np.where(signs[int(ids[b])], 1.0, -1.0)
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bsz,t,k,n", [(4, 3, 64, 128), (6, 6, 1024, 256)])
def test_tenant_delta_vpu_kernel_matches_xla(bsz, t, k, n):
    from bitdelta_tpu.ops.pallas_binary_gemm import tenant_delta_matmul_pallas

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((bsz, k)), jnp.float32)
    signs = rng.integers(0, 2, (t, k, n)).astype(bool)
    packed = pack_signs(jnp.asarray(signs))
    scales = jnp.asarray(rng.uniform(0.1, 2.0, (t,)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, t, (bsz,)), jnp.int32)
    got = np.asarray(tenant_delta_matmul_pallas(x, packed, scales, ids,
                                                interpret=INTERP))
    want = np.asarray(tenant_binary_matmul(x[:, None, :], packed, scales, ids,
                                           compute_dtype=jnp.float32))[:, 0]
    # x is quantized to a 14-bit grid inside the kernel.
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3 * np.abs(want).max())


def test_tenant_delta_vpu_kernel_bf16_inputs():
    from bitdelta_tpu.ops.pallas_binary_gemm import tenant_delta_matmul_pallas

    rng = np.random.default_rng(5)
    bsz, t, k, n = 2, 2, 256, 128
    x = jnp.asarray(rng.standard_normal((bsz, k)), jnp.bfloat16)
    packed = pack_signs(jnp.asarray(rng.integers(0, 2, (t, k, n)).astype(bool)))
    scales = jnp.ones((t,), jnp.float32)
    ids = jnp.asarray([0, 1], jnp.int32)
    got = np.asarray(tenant_delta_matmul_pallas(
        x, packed, scales, ids, interpret=INTERP).astype(jnp.float32))
    want = np.asarray(tenant_binary_matmul(
        x[:, None, :], packed, scales, ids,
        compute_dtype=jnp.float32))[:, 0].astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * np.abs(want).max())


def test_model_pallas_dispatch_interpret_mode():
    # forward/decode with kernel="pallas" (forced-interpret on CPU) must
    # match the XLA kernel path — covers both the prefill (MXU) and
    # decode (VPU) dispatch branches in models/llama._proj.
    from jax.experimental.pallas import tpu as pltpu
    from bitdelta_tpu.models import config as cfgs, llama as jl
    from bitdelta_tpu.core.delta import BinaryDelta

    cfg = cfgs.tiny_test_config(hidden_size=64, intermediate_size=128,
                                vocab_size=64, num_layers=2)
    params = jl.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.default_rng(7)
    t = 3
    deltas = {}
    shapes = {"q_proj": (64, cfg.q_dim), "k_proj": (64, cfg.kv_dim),
              "v_proj": (64, cfg.kv_dim), "o_proj": (cfg.q_dim, 64),
              "gate_proj": (64, 128), "up_proj": (64, 128),
              "down_proj": (128, 64)}
    for name, (k, n) in shapes.items():
        signs = rng.integers(0, 2, (cfg.num_layers, t, k, n)).astype(bool)
        deltas[name] = BinaryDelta(
            packed=pack_signs(jnp.asarray(signs)),
            scale=jnp.full((cfg.num_layers, t), 0.02, jnp.float32))

    toks = jnp.asarray(rng.integers(0, 64, (1, 8), dtype=np.int64))
    tid = jnp.asarray([1], jnp.int32)

    ref_logits, ref_cache = jl.forward(
        cfg, params, toks, deltas=deltas, tenant_ids=tid,
        compute_dtype=jnp.float32, return_cache=True, cache_max_seq=16)
    with pltpu.force_tpu_interpret_mode():
        got_logits, got_cache = jl.forward(
            cfg, params, toks, deltas=deltas, tenant_ids=tid,
            compute_dtype=jnp.float32, return_cache=True, cache_max_seq=16,
            kernel="pallas")
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=2e-3, atol=2e-3)

    nxt = jnp.asarray([[5]], jnp.int32)
    ref_step, _ = jl.decode_step(cfg, params, nxt, ref_cache, deltas=deltas,
                                 tenant_ids=tid, compute_dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got_step, _ = jl.decode_step(cfg, params, nxt, got_cache,
                                     deltas=deltas, tenant_ids=tid,
                                     compute_dtype=jnp.float32,
                                     kernel="pallas")
    np.testing.assert_allclose(np.asarray(got_step), np.asarray(ref_step),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("bsz,t,k,n", [(4, 3, 64, 256), (6, 6, 1024, 512),
                                       (3, 2, 128, 256)])
def test_tenant_delta_pair_kernel_matches_xla(bsz, t, k, n):
    from bitdelta_tpu.core.delta import BinaryDelta, pair_delta
    from bitdelta_tpu.ops.pallas_binary_gemm import (
        tenant_delta_matmul_pair_pallas)

    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((bsz, k)), jnp.float32)
    signs = rng.integers(0, 2, (t, k, n)).astype(bool)
    packed = pack_signs(jnp.asarray(signs))
    scales = jnp.asarray(rng.uniform(0.1, 2.0, (t,)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, t, (bsz,)), jnp.int32)
    pd = pair_delta(BinaryDelta(packed=packed, scale=scales))
    got = np.asarray(tenant_delta_matmul_pair_pallas(
        x, pd.packed_pairs, pd.colsum, scales, ids, interpret=INTERP))
    want = np.asarray(tenant_binary_matmul(x[:, None, :], packed, scales, ids,
                                           compute_dtype=jnp.float32))[:, 0]
    # x is quantized to a 12-bit affine grid inside the kernel.
    np.testing.assert_allclose(got, want, rtol=3e-3,
                               atol=3e-3 * np.abs(want).max())


def test_tenant_delta_pair_kernel_exact_on_grid():
    # When x already sits exactly on the kernel's 12-bit affine grid the
    # pair formulation is exact (integer accumulation + affine identity):
    # validates the popcount correction and the no-carry packing claim.
    from bitdelta_tpu.core.delta import BinaryDelta, pair_delta
    from bitdelta_tpu.ops.pallas_binary_gemm import (
        PAIR_Q_LEVELS, tenant_delta_matmul_pair_pallas)

    rng = np.random.default_rng(22)
    bsz, t, k, n = 4, 2, 256, 256
    xq = rng.integers(0, PAIR_Q_LEVELS + 1, (bsz, k)).astype(np.float64)
    xq[:, 0], xq[:, 1] = 0, PAIR_Q_LEVELS      # pin the min/max per row
    step, xmin = 0.003, -1.7
    x = jnp.asarray(xq * step + xmin, jnp.float32)
    signs = rng.integers(0, 2, (t, k, n)).astype(bool)
    packed = pack_signs(jnp.asarray(signs))
    scales = jnp.asarray([0.7, 1.3], jnp.float32)
    ids = jnp.asarray([0, 1, 1, 0], jnp.int32)
    pd = pair_delta(BinaryDelta(packed=packed, scale=scales))
    got = np.asarray(tenant_delta_matmul_pair_pallas(
        x, pd.packed_pairs, pd.colsum, scales, ids, interpret=INTERP))
    pm1 = np.where(signs, 1.0, -1.0)
    want = np.stack([float(scales[i]) * (np.asarray(x, np.float64)[b]
                                         @ pm1[int(i)])
                     for b, i in enumerate(np.asarray(ids))])
    np.testing.assert_allclose(got, want, rtol=1e-5,
                               atol=1e-5 * np.abs(want).max())


def test_model_pallas_dispatch_paired_deltas():
    # Same dispatch test with the serving pair layout: decode goes via
    # the pair VPU kernel; prefill un-pairs on the fly.
    from jax.experimental.pallas import tpu as pltpu
    from bitdelta_tpu.models import config as cfgs, llama as jl
    from bitdelta_tpu.core.delta import BinaryDelta, pair_delta

    cfg = cfgs.tiny_test_config(hidden_size=256, intermediate_size=512,
                                vocab_size=64, num_layers=2)
    params = jl.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.default_rng(23)
    t = 2
    deltas, paired = {}, {}
    shapes = {"q_proj": (256, cfg.q_dim), "k_proj": (256, cfg.kv_dim),
              "v_proj": (256, cfg.kv_dim), "o_proj": (cfg.q_dim, 256),
              "gate_proj": (256, 512), "up_proj": (256, 512),
              "down_proj": (512, 256)}
    for name, (k, n) in shapes.items():
        signs = rng.integers(0, 2, (cfg.num_layers, t, k, n)).astype(bool)
        d = BinaryDelta(packed=pack_signs(jnp.asarray(signs)),
                        scale=jnp.full((cfg.num_layers, t), 0.02,
                                       jnp.float32))
        deltas[name] = d
        paired[name] = pair_delta(d) if n % 256 == 0 else d

    toks = jnp.asarray(rng.integers(0, 64, (2, 8), dtype=np.int64))
    tid = jnp.asarray([1, 0], jnp.int32)

    ref_logits, cache = jl.forward(
        cfg, params, toks, deltas=deltas, tenant_ids=tid,
        compute_dtype=jnp.float32, return_cache=True, cache_max_seq=16)
    with pltpu.force_tpu_interpret_mode():
        got_logits, _ = jl.forward(
            cfg, params, toks, deltas=paired, tenant_ids=tid,
            compute_dtype=jnp.float32, return_cache=True, cache_max_seq=16,
            kernel="pallas")
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=2e-3, atol=2e-3)

    nxt = jnp.asarray([[5], [7]], jnp.int32)
    ref_step, _ = jl.decode_step(cfg, params, nxt, cache, deltas=deltas,
                                 tenant_ids=tid, compute_dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got_step, _ = jl.decode_step(cfg, params, nxt, cache,
                                     deltas=paired, tenant_ids=tid,
                                     compute_dtype=jnp.float32,
                                     kernel="pallas")
    np.testing.assert_allclose(np.asarray(got_step), np.asarray(ref_step),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("bsz,t,k,n", [(1, 2, 64, 256), (3, 3, 6144, 256),
                                       (8, 4, 128, 512), (4, 2, 256, 1024)])
def test_fused_base_pair_kernel_matches_serial(bsz, t, k, n):
    # Fused base+delta kernel vs the serial composition (XLA base matmul
    # + standalone pair kernel) — covers nk>1 grids (k=6144 -> bk=2048)
    # and multi-group lane blocks (n=512/1024 -> bnh=256/512 spans 2/4
    # pair groups, exercising the in-kernel base de-interleave).
    from bitdelta_tpu.core.delta import BinaryDelta, pair_delta
    from bitdelta_tpu.ops.pallas_binary_gemm import (
        fused_base_pair_matmul_pallas, tenant_delta_matmul_pair_pallas)

    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal((bsz, k)), jnp.float32)
    w = jnp.asarray(0.05 * rng.standard_normal((k, n)), jnp.float32)
    signs = rng.integers(0, 2, (t, k, n)).astype(bool)
    packed = pack_signs(jnp.asarray(signs))
    scales = jnp.asarray(rng.uniform(0.1, 2.0, (t,)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, t, (bsz,)), jnp.int32)
    pd = pair_delta(BinaryDelta(packed=packed, scale=scales))

    got = np.asarray(fused_base_pair_matmul_pallas(
        x, w, pd.packed_pairs, pd.colsum, scales, ids, interpret=INTERP))
    want = (np.asarray(x) @ np.asarray(w)
            + np.asarray(tenant_delta_matmul_pair_pallas(
                x, pd.packed_pairs, pd.colsum, scales, ids,
                interpret=INTERP)))
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-4 * max(np.abs(want).max(), 1.0))


def test_fused_base_pair_lane_block_invariance():
    # lane_block is a pure performance knob: every width must give the
    # same numbers (the ADVICE-flagged narrow-block DMA tradeoff is
    # measured on chip; experiments/fused_base_bench.py).
    from bitdelta_tpu.core.delta import BinaryDelta, pair_delta
    from bitdelta_tpu.ops.pallas_binary_gemm import (
        fused_base_pair_matmul_pallas)

    rng = np.random.default_rng(32)
    bsz, t, k, n = 3, 2, 128, 1024
    x = jnp.asarray(rng.standard_normal((bsz, k)), jnp.float32)
    w = jnp.asarray(0.05 * rng.standard_normal((k, n)), jnp.float32)
    packed = pack_signs(jnp.asarray(rng.integers(0, 2, (t, k, n)).astype(bool)))
    scales = jnp.asarray([0.5, 1.5], jnp.float32)
    ids = jnp.asarray([1, 0, 1], jnp.int32)
    pd = pair_delta(BinaryDelta(packed=packed, scale=scales))
    outs = [np.asarray(fused_base_pair_matmul_pallas(
        x, w, pd.packed_pairs, pd.colsum, scales, ids, interpret=INTERP,
        lane_block=lb)) for lb in (128, 256, 512)]
    # f32 base-dot reduction order differs with block width — tiny noise.
    atol = 1e-5 * max(np.abs(outs[0]).max(), 1.0)
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=atol)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5, atol=atol)


def test_tenant_dense_matmul_matches_gather():
    from bitdelta_tpu.ops.pallas_binary_gemm import tenant_dense_matmul_pallas

    rng = np.random.default_rng(12)
    bsz, t, k, n = 5, 3, 64, 128
    x = jnp.asarray(rng.standard_normal((bsz, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((t, k, n)) * 0.1, jnp.float32)
    ids = jnp.asarray(rng.integers(0, t, (bsz,)), jnp.int32)
    got = np.asarray(tenant_dense_matmul_pallas(x, w, ids, interpret=INTERP))
    want = np.einsum("bk,bkn->bn", np.asarray(x), np.asarray(w)[np.asarray(ids)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_binary_matmul_t_matches_transpose():
    from bitdelta_tpu.ops.pallas_binary_gemm import binary_matmul_t_pallas

    rng = np.random.default_rng(8)
    m, k, n = 8, 64, 128
    g = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    signs = rng.integers(0, 2, (k, n)).astype(bool)
    packed = pack_signs(jnp.asarray(signs))
    got = np.asarray(binary_matmul_t_pallas(g, packed, 0.5, interpret=INTERP))
    want = 0.5 * (np.asarray(g) @ np.where(signs, 1.0, -1.0).T)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_trainable_binary_matmul_gradients():
    from bitdelta_tpu.ops.pallas_binary_gemm import binary_matmul_trainable

    rng = np.random.default_rng(9)
    m, k, n = 4, 64, 128
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    signs = rng.integers(0, 2, (k, n)).astype(bool)
    packed = pack_signs(jnp.asarray(signs))
    tgt = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)

    def loss_pallas(x, scale):
        y = binary_matmul_trainable(x, packed, scale, INTERP)
        return jnp.mean((y - tgt) ** 2)

    def loss_ref(x, scale):
        y = binary_matmul(x, packed, scale, compute_dtype=jnp.float32)
        return jnp.mean((y - tgt) ** 2)

    scale = jnp.float32(0.3)
    (lp, (gx_p, gs_p)) = jax.value_and_grad(loss_pallas, argnums=(0, 1))(x, scale)
    (lr, (gx_r, gs_r)) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, scale)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(gs_p), float(gs_r), rtol=1e-4)


def test_pick_block_rejects_bad_dims():
    from bitdelta_tpu.ops.pallas_binary_gemm import _pick_block
    with pytest.raises(ValueError):
        _pick_block(100, (512, 256, 128))


def test_to_pair_layout_rebuilds_full_k_colsum_under_tp():
    """A pre-paired row-parallel delta carrying a full-K colsum must be
    re-derived with per-K-shard colsums when converted for TP serving
    (the full-K popcount correction is wrong for a K slice)."""
    import jax

    from bitdelta_tpu.core.compress import compress_model
    from bitdelta_tpu.models import config as cfgs
    from bitdelta_tpu.models import llama as jl
    from bitdelta_tpu.serving.stacking import stack_tenants, to_pair_layout

    cfg = cfgs.tiny_test_config(vocab_size=128, hidden_size=256,
                                intermediate_size=1024, num_layers=2,
                                num_heads=4, num_kv_heads=4,
                                dtype="float32")
    base = jl.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    fine = dict(base)
    fine["layers"] = dict(base["layers"])
    for i, name in enumerate(jl.PROJ_NAMES):
        fine["layers"][name] = base["layers"][name] + 0.05*jax.random.normal(
            jax.random.PRNGKey(i), base["layers"][name].shape)
    stack = stack_tenants(cfg, base, [compress_model(base, fine)])

    want = to_pair_layout(stack, tp=2)          # canonical -> TP pair
    pre = to_pair_layout(stack, tp=1)           # pre-paired, full-K colsum
    assert pre.deltas["down_proj"].colsum.ndim == 3   # (L, T, N)
    got = to_pair_layout(pre, tp=2)             # must rebuild
    for name in ("o_proj", "down_proj"):
        g, w = got.deltas[name], want.deltas[name]
        assert g.colsum.ndim == 4                # (L, T, tp, N)
        np.testing.assert_array_equal(np.asarray(g.packed_pairs),
                                      np.asarray(w.packed_pairs))
        np.testing.assert_allclose(np.asarray(g.colsum),
                                   np.asarray(w.colsum))


# ---------------------------------------------------------------------------
# W4 base-matmul kernel (ops/pallas_int4.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("m,k,n", [(8, 256, 256), (1, 128, 128),
                                   (6, 512, 384), (8, 384, 128),
                                   # K=2048: bk=1024, 2 k-grid steps —
                                   # covers the cross-step accumulator
                                   # (real shapes run this path).
                                   (4, 2048, 256)])
def test_w4_matmul_pallas_matches_int4_matmul(m, k, n):
    from bitdelta_tpu.ops.pallas_int4 import w4_matmul_pallas
    from bitdelta_tpu.research.quantized_base import (dequantize_int4,
                                                      int4_matmul,
                                                      quantize_int4)

    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)
    q = quantize_int4(w)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    got = np.asarray(w4_matmul_pallas(x, q.packed, q.scale,
                                      interpret=INTERP,
                                      out_dtype=jnp.float32))
    want_xla = np.asarray(int4_matmul(x, q, compute_dtype=jnp.float32))
    want_dense = np.asarray(x) @ np.asarray(dequantize_int4(q, jnp.float32))
    np.testing.assert_allclose(got, want_xla, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got, want_dense, rtol=1e-4, atol=1e-4)


def test_w4_matmul_pallas_bf16_inputs():
    from bitdelta_tpu.ops.pallas_int4 import w4_matmul_pallas
    from bitdelta_tpu.research.quantized_base import (dequantize_int4,
                                                      quantize_int4)

    rng = np.random.default_rng(3)
    k, n = 256, 256
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)
    q = quantize_int4(w)
    x = jnp.asarray(rng.standard_normal((4, k)), jnp.bfloat16)
    got = np.asarray(w4_matmul_pallas(x, q.packed, q.scale,
                                      interpret=INTERP,
                                      out_dtype=jnp.float32))
    # CPU's dot thunk lacks bf16 x bf16 -> f32, so the reference is the
    # f32 dense fusion (bf16 rounding of x bounds the tolerance).
    want = (np.asarray(x.astype(jnp.float32))
            @ np.asarray(dequantize_int4(q, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_base_matmul_pallas_dispatches_w4_kernel():
    """llama._base_matmul(kernel='pallas') on a decode-shaped Int4Weight
    must route through the Pallas kernel and agree with the XLA einsum
    (the serving engine reaches it via the pair-delta decode branch)."""
    from jax.experimental.pallas import tpu as pltpu

    from bitdelta_tpu.models.llama import _base_matmul
    from bitdelta_tpu.research.quantized_base import quantize_int4

    rng = np.random.default_rng(4)
    k, n = 256, 128
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)
    q = quantize_int4(w)
    x = jnp.asarray(rng.standard_normal((8, k)), jnp.float32)
    want = np.asarray(_base_matmul(x, q, jnp.float32, kernel="xla"))
    ctx = (pltpu.force_tpu_interpret_mode() if INTERP
           else __import__("contextlib").nullcontext())
    with ctx:
        got = np.asarray(_base_matmul(x, q, jnp.float32, kernel="pallas"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
