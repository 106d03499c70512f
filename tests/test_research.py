"""Tests for research-sidecar variants (LoRA / ternary / quantized base /
Mixtral MoE deltas)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bitdelta_tpu.research.variants import (
    apply_lora, apply_ternary, dequantize_ternary, lora_nbytes,
    quantize_lora, quantize_ternary)
from bitdelta_tpu.research.quantized_base import (
    dequantize_int8, int8_delta_linear, int8_matmul, quantize_base_with_delta,
    quantize_int8)
from bitdelta_tpu.research.mixtral_moe import (
    compress_experts, compress_moe_ffn, moe_compression_ratio, moe_ffn_apply)


def _pair(k=64, n=48, seed=0, eps=0.05):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((k, n)).astype(np.float32)
    fine = base + eps * rng.standard_normal((k, n)).astype(np.float32)
    return jnp.asarray(base), jnp.asarray(fine)


def test_lora_recovers_low_rank_delta_exactly():
    rng = np.random.default_rng(1)
    base = jnp.asarray(rng.standard_normal((64, 48)), jnp.float32)
    a = rng.standard_normal((64, 4)).astype(np.float32)
    b = rng.standard_normal((4, 48)).astype(np.float32)
    fine = base + jnp.asarray(a @ b)
    d = quantize_lora(base, fine, rank=8)
    np.testing.assert_allclose(np.asarray(apply_lora(base, d)),
                               np.asarray(fine), rtol=1e-4, atol=1e-4)
    assert lora_nbytes(d) < 64 * 48 * 4


def test_lora_beats_rank_truncation_floor():
    base, fine = _pair(seed=2)
    d = quantize_lora(base, fine, rank=16)
    err = np.abs(np.asarray(apply_lora(base, d)) - np.asarray(fine)).mean()
    base_err = np.abs(np.asarray(base) - np.asarray(fine)).mean()
    assert err < base_err


def test_ternary_sparsity_and_reconstruction():
    base, fine = _pair(seed=3)
    d = quantize_ternary(base, fine, fraction=0.5)
    dense = np.asarray(dequantize_ternary(d))
    nonzero = (dense != 0).mean()
    assert 0.4 < nonzero < 0.6  # ~half kept
    err = np.abs(np.asarray(apply_ternary(base, d)) - np.asarray(fine)).mean()
    assert err < np.abs(np.asarray(base) - np.asarray(fine)).mean()


def test_ternary_binary_median_has_no_zeros():
    base, fine = _pair(seed=4)
    d = quantize_ternary(base, fine, binary_median=True)
    dense = np.asarray(dequantize_ternary(d))
    assert (dense != 0).all()
    # median scale, not mean
    diff = np.asarray(fine) - np.asarray(base)
    np.testing.assert_allclose(float(d.scale), np.median(np.abs(diff)),
                               rtol=1e-5)


def test_int8_quantization_roundtrip_error_small():
    base, _ = _pair(seed=5)
    q = quantize_int8(base)
    deq = np.asarray(dequantize_int8(q))
    assert q.q.dtype == jnp.int8
    err = np.abs(deq - np.asarray(base)).max()
    assert err <= np.abs(np.asarray(base)).max() / 127.0 + 1e-6


def test_int8_matmul_matches_dequantized_dense():
    base, _ = _pair(seed=6)
    q = quantize_int8(base)
    x = jnp.asarray(np.random.default_rng(6).standard_normal((4, 64)),
                    jnp.float32)
    got = np.asarray(int8_matmul(x, q, compute_dtype=jnp.float32))
    want = np.asarray(x) @ np.asarray(dequantize_int8(q))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_w8_plus_w1_beats_w8_alone():
    base, fine = _pair(seed=7, eps=0.1)
    qbase, delta = quantize_base_with_delta(base, fine)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((8, 64)),
                    jnp.float32)
    y_fine = np.asarray(x @ fine)
    y_q = np.asarray(int8_matmul(x, qbase, compute_dtype=jnp.float32))
    y_qd = np.asarray(int8_delta_linear(x, qbase, delta,
                                        compute_dtype=jnp.float32))
    assert np.abs(y_qd - y_fine).mean() < np.abs(y_q - y_fine).mean()


def test_moe_expert_compression():
    rng = np.random.default_rng(8)
    mean = rng.standard_normal((64, 32)).astype(np.float32)
    experts = jnp.asarray(mean[None] + 0.05 * rng.standard_normal(
        (4, 64, 32)).astype(np.float32))
    fam = compress_experts(experts)
    assert fam.delta.packed.shape == (4, 2, 32)
    # Each compressed expert approximates its original better than the
    # mean expert does.
    from bitdelta_tpu.core.delta import apply_delta, BinaryDelta
    for e in range(4):
        d = BinaryDelta(packed=fam.delta.packed[e], scale=fam.delta.scale[e])
        rec = np.asarray(apply_delta(fam.mean_w, d))
        err = np.abs(rec - np.asarray(experts[e])).mean()
        mean_err = np.abs(np.asarray(fam.mean_w) - np.asarray(experts[e])).mean()
        assert err < mean_err
    assert moe_compression_ratio(experts, fam) > 2.5


def test_moe_ffn_routing_matches_dense_experts():
    rng = np.random.default_rng(9)
    e, k, i, m = 4, 64, 96, 5
    mean1 = rng.standard_normal((k, i)).astype(np.float32) * 0.1
    w1 = jnp.asarray(mean1[None] + 0.01 * rng.standard_normal((e, k, i)).astype(np.float32))
    mean3 = rng.standard_normal((k, i)).astype(np.float32) * 0.1
    w3 = jnp.asarray(mean3[None] + 0.01 * rng.standard_normal((e, k, i)).astype(np.float32))
    mean2 = rng.standard_normal((i, k)).astype(np.float32) * 0.1
    w2 = jnp.asarray(mean2[None] + 0.01 * rng.standard_normal((e, i, k)).astype(np.float32))
    ffn = compress_moe_ffn(w1, w3, w2)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((m, e)).astype(np.float32))
    out = moe_ffn_apply(x, ffn, logits, top_k=2, compute_dtype=jnp.float32)
    assert out.shape == (m, k)

    # Reference: dense experts reconstructed from the compressed family.
    from bitdelta_tpu.core.delta import apply_delta, BinaryDelta
    def rec(fam):
        return np.stack([np.asarray(apply_delta(
            fam.mean_w, BinaryDelta(fam.delta.packed[j], fam.delta.scale[j])))
            for j in range(e)])
    r1, r3, r2 = rec(ffn.w1), rec(ffn.w3), rec(ffn.w2)
    import scipy.special  # noqa: F401  (not needed; manual softmax below)
    topv, topi = jax.lax.top_k(logits, 2)
    gates = np.asarray(jax.nn.softmax(topv, -1))
    want = np.zeros((m, k), np.float32)
    for mi in range(m):
        for j in range(2):
            ei = int(topi[mi, j])
            h = (np.asarray(x)[mi] @ r1[ei])
            h = h / (1 + np.exp(-h)) * (np.asarray(x)[mi] @ r3[ei])
            want[mi] += gates[mi, j] * (h @ r2[ei])
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=2e-3)


def test_w8_base_serving_matches_dequantized_dense():
    """W8 serving mode end-to-end: an Engine over int8 base projections
    greedy-matches the same model with the dequantized dense base (the
    deltas were taken against the dequantized values, so these are the
    same function up to matmul rounding)."""
    import jax
    import jax.numpy as jnp

    from bitdelta_tpu.core.compress import compress_model
    from bitdelta_tpu.models import config as cfgs
    from bitdelta_tpu.models import llama as jl
    from bitdelta_tpu.research.quantized_base import (
        dequantize_base_projections, quantize_base_projections)
    from bitdelta_tpu.serving.engine import Engine, Request
    from bitdelta_tpu.serving.stacking import stack_nbytes, stack_tenants

    cfg = cfgs.tiny_test_config(vocab_size=64, hidden_size=32,
                                intermediate_size=64, num_layers=2,
                                num_heads=2, num_kv_heads=2,
                                dtype="float32")
    dense = jl.init_params(cfg, jax.random.PRNGKey(0), jnp.float32,
                           scale=0.25)
    qbase = quantize_base_projections(dense)
    deq = dequantize_base_projections(qbase, jnp.float32)

    tenants = []
    for t in range(2):
        fine = dict(dense)
        fine["layers"] = dict(dense["layers"])
        key = jax.random.PRNGKey(400 + t)
        for name in jl.PROJ_NAMES:
            key, sub = jax.random.split(key)
            fine["layers"][name] = dense["layers"][name] + (
                0.05 * jax.random.normal(sub, dense["layers"][name].shape))
        # Deltas against the dequantized base — the W8+W1 recipe.
        tenants.append(compress_model(deq, fine))

    outs = {}
    for name, b in (("dense", deq), ("int8", qbase)):
        stack = stack_tenants(cfg, b, tenants)
        eng = Engine(cfg, stack, max_slots=2, max_seq=64,
                     prefill_buckets=(16,), kernel="xla")
        outs[name] = eng.generate(
            [Request(prompt_ids=[3, 9, 4], tenant_id=t, max_new_tokens=6)
             for t in range(2)])
    assert outs["dense"] == outs["int8"]

    # Memory accounting: int8 base ~half the dense base bytes.
    nb_dense = stack_nbytes(stack_tenants(cfg, deq, tenants))
    nb_int8 = stack_nbytes(stack_tenants(cfg, qbase, tenants))
    assert nb_int8["base_bytes"] < 0.6 * nb_dense["base_bytes"]


# ---------------------------------------------------------------------------
# W4 base (grouped int4 RTN) — the reference's GPTQ+delta ablation row
# ---------------------------------------------------------------------------

def test_int4_pack_unpack_roundtrip():
    from bitdelta_tpu.research.quantized_base import (_pack_nibbles,
                                                      _unpack_nibbles)
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.integers(-7, 8, (64, 32)), jnp.int32)
    got = np.asarray(_unpack_nibbles(_pack_nibbles(q)))
    np.testing.assert_array_equal(got, np.asarray(q))


def test_int4_quantization_roundtrip_error_bounded():
    from bitdelta_tpu.research.quantized_base import (dequantize_int4,
                                                      quantize_int4)
    rng = np.random.default_rng(12)
    base = jnp.asarray(0.02 * rng.standard_normal((256, 64)), jnp.float32)
    q = quantize_int4(base)
    assert q.packed.shape == (32, 64) and q.scale.shape == (2, 64)
    deq = np.asarray(dequantize_int4(q))
    # RTN error bounded by half a step: |err| <= scale/2 per group/col.
    step = np.asarray(q.scale)
    err = np.abs(deq - np.asarray(base))
    assert (err <= np.repeat(step, 128, axis=0) / 2 + 1e-7).all()
    # int4 grouped must be coarser than int8 per-column, but same order.
    from bitdelta_tpu.research.quantized_base import (dequantize_int8,
                                                      quantize_int8)
    err8 = np.abs(np.asarray(dequantize_int8(quantize_int8(base)))
                  - np.asarray(base)).mean()
    assert err8 < err.mean() < 32 * err8


def test_int4_matmul_matches_dequantized_dense():
    from bitdelta_tpu.research.quantized_base import (dequantize_int4,
                                                      int4_matmul,
                                                      quantize_int4)
    rng = np.random.default_rng(13)
    base = jnp.asarray(0.05 * rng.standard_normal((256, 48)), jnp.float32)
    q = quantize_int4(base)
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
    got = np.asarray(int4_matmul(x, q, compute_dtype=jnp.float32))
    want = np.asarray(x) @ np.asarray(dequantize_int4(q))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_w4_plus_w1_beats_w4_alone():
    from bitdelta_tpu.research.quantized_base import (
        int4_matmul, quantize_int4_base_with_delta)
    from bitdelta_tpu.core.delta import delta_linear
    from bitdelta_tpu.research.quantized_base import dequantize_int4

    rng = np.random.default_rng(14)
    base = jnp.asarray(0.05 * rng.standard_normal((128, 64)), jnp.float32)
    fine = base + jnp.asarray(0.1 * rng.standard_normal((128, 64)),
                              jnp.float32)
    qbase, delta = quantize_int4_base_with_delta(base, fine)
    x = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    y_fine = np.asarray(x @ fine)
    y_q = np.asarray(int4_matmul(x, qbase, compute_dtype=jnp.float32))
    deq = dequantize_int4(qbase, jnp.float32)
    y_qd = np.asarray(delta_linear(x, deq, delta,
                                   compute_dtype=jnp.float32))
    assert np.abs(y_qd - y_fine).mean() < np.abs(y_q - y_fine).mean()


def _w4_world(hidden_size=128, intermediate_size=256):
    import jax

    from bitdelta_tpu.core.compress import compress_model
    from bitdelta_tpu.models import config as cfgs
    from bitdelta_tpu.models import llama as jl
    from bitdelta_tpu.research.quantized_base import (quantize_base,
                                                      roundtrip_base)

    # hidden/intermediate must divide the 128-row int4 groups.
    cfg = cfgs.tiny_test_config(vocab_size=64, hidden_size=hidden_size,
                                intermediate_size=intermediate_size,
                                num_layers=2,
                                num_heads=2, num_kv_heads=2,
                                dtype="float32")
    dense = jl.init_params(cfg, jax.random.PRNGKey(0), jnp.float32,
                           scale=0.25)
    qbase = quantize_base(dense, "int4")
    deq = roundtrip_base(dense, "int4", jnp.float32)
    tenants = []
    for t in range(2):
        fine = dict(dense)
        fine["layers"] = dict(dense["layers"])
        key = jax.random.PRNGKey(500 + t)
        for name in jl.PROJ_NAMES:
            key, sub = jax.random.split(key)
            fine["layers"][name] = dense["layers"][name] + (
                0.05 * jax.random.normal(sub, dense["layers"][name].shape))
        tenants.append((fine, compress_model(deq, fine)))
    return cfg, dense, qbase, deq, tenants


def test_w4_base_serving_matches_dequantized_dense():
    """W4 serving mode end-to-end: Engine over int4 base projections
    greedy-matches the dequantized dense base (deltas taken against the
    dequantized values — the same function up to matmul rounding)."""
    from bitdelta_tpu.serving.engine import Engine, Request
    from bitdelta_tpu.serving.stacking import stack_nbytes, stack_tenants

    cfg, dense, qbase, deq, tenants = _w4_world()
    comp = [c for _, c in tenants]
    outs = {}
    for name, b in (("dense", deq), ("int4", qbase)):
        stack = stack_tenants(cfg, b, comp)
        eng = Engine(cfg, stack, max_slots=2, max_seq=64,
                     prefill_buckets=(16,), kernel="xla")
        outs[name] = eng.generate(
            [Request(prompt_ids=[3, 9, 4], tenant_id=t, max_new_tokens=6)
             for t in range(2)])
    assert outs["dense"] == outs["int4"]
    # Density accounting: int4 base ~quarter the dense base bytes.
    nb_dense = stack_nbytes(stack_tenants(cfg, deq, comp))
    nb_int4 = stack_nbytes(stack_tenants(cfg, qbase, comp))
    assert nb_int4["base_bytes"] < 0.45 * nb_dense["base_bytes"]


def test_w4_plus_w1_ppl_beats_w4_alone():
    """The ablation's quality claim at the model level (reference
    docs/index.html:436-453: GPTQ 58.67 -> GPTQ+delta 59.22): perplexity
    of the fine-tune's corpus under W4+delta must beat the W4 base
    alone, and approach the dense fine-tune."""
    from bitdelta_tpu.core.compress import fuse_compressed
    from bitdelta_tpu.eval.ppl import eval_ppl

    cfg, dense, qbase, deq, tenants = _w4_world()
    fine, comp = tenants[0]
    rng = np.random.default_rng(15)
    toks = rng.integers(0, cfg.vocab_size, size=(512,))
    kw = dict(context_size=64, window_size=32, batch_windows=4)
    ppl_fine = eval_ppl(cfg, fine, toks, **kw)
    ppl_w4 = eval_ppl(cfg, deq, toks, **kw)
    ppl_w4d = eval_ppl(cfg, fuse_compressed(deq, comp), toks, **kw)
    # delta recovers most of the fine-tune's behavior on its own corpus
    assert abs(ppl_w4d - ppl_fine) < abs(ppl_w4 - ppl_fine)


def test_w4_base_mesh_serving_matches_single_device():
    """Int4Weight leaves shard over the (data, model) mesh (packed
    nibbles like the dense matrix, grouped scales alongside) — W4-base
    mesh serving must greedy-match the single-device engine."""
    from bitdelta_tpu.parallel import mesh as pmesh
    from bitdelta_tpu.serving.engine import Engine, Request
    from bitdelta_tpu.serving.stacking import stack_tenants

    cfg, dense, qbase, deq, tenants = _w4_world()
    comp = [c for _, c in tenants]
    stack = stack_tenants(cfg, qbase, comp)

    def run(mesh):
        eng = Engine(cfg, stack, max_slots=2, max_seq=64,
                     prefill_buckets=(16,), kernel="xla", mesh=mesh,
                     compute_dtype=jnp.float32)
        return eng.generate(
            [Request(prompt_ids=[3, 9, 4], tenant_id=t, max_new_tokens=6)
             for t in range(2)])

    want = run(None)
    import jax

    got = run(pmesh.make_mesh((2, 2), devices=jax.devices()[:4]))
    assert got == want


def test_w4_pallas_mesh_matches_single_device():
    """W4 + TP + kernel='pallas' (the max-density sharded-serving
    configuration): row-parallel grouped int4 scales slice per K shard
    (K % (INT4_GROUP*tp) == 0), so the shard_map decode body runs
    int4_matmul on purely local slices — greedy tokens must equal the
    single-device XLA engine exactly."""
    from jax.experimental.pallas import tpu as pltpu

    from bitdelta_tpu.parallel import mesh as pmesh
    from bitdelta_tpu.serving.engine import Engine, Request
    from bitdelta_tpu.serving.stacking import stack_tenants

    # K = 256/512 splits into whole 128-row groups across tp=2.
    cfg, dense, qbase, deq, tenants = _w4_world(hidden_size=256,
                                                intermediate_size=512)
    stack = stack_tenants(cfg, qbase, [c for _, c in tenants])

    def run(mesh, kernel):
        eng = Engine(cfg, stack, max_slots=2, max_seq=64,
                     prefill_buckets=(16,), kernel=kernel, mesh=mesh,
                     compute_dtype=jnp.float32)
        return eng.generate(
            [Request(prompt_ids=[3, 9, 4], tenant_id=t, max_new_tokens=6)
             for t in range(2)])

    want = run(None, "xla")
    mesh = pmesh.make_mesh((1, 2), devices=jax.devices()[:2])
    # per-shard scale slicing is what the shard_map body depends on
    eng = Engine(cfg, stack, max_slots=2, max_seq=64, prefill_buckets=(16,),
                 kernel="xla", mesh=mesh, compute_dtype=jnp.float32)
    oscale = eng.stack.params["layers"]["o_proj"].scale
    assert (oscale.addressable_shards[0].data.shape[-2]
            == oscale.shape[-2] // 2)
    with pltpu.force_tpu_interpret_mode():
        got = run(mesh, "pallas")
    assert got == want


def test_w4_pallas_mesh_rejects_misaligned_groups():
    """When a row-parallel K doesn't split into whole INT4_GROUP rows
    per shard (o_proj K=128 = ONE group, tp=2), shard_map slices would
    misalign the grouped scales — the engine must refuse (W4+TP still
    serves through kernel='xla'/GSPMD)."""
    import pytest

    from bitdelta_tpu.parallel import mesh as pmesh
    from bitdelta_tpu.serving.engine import Engine
    from bitdelta_tpu.serving.stacking import stack_tenants

    cfg, dense, qbase, deq, tenants = _w4_world()
    stack = stack_tenants(cfg, qbase, [c for _, c in tenants])
    mesh = pmesh.make_mesh((1, 2), devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="INT4_GROUP"):
        Engine(cfg, stack, max_slots=2, max_seq=64, prefill_buckets=(16,),
               kernel="pallas", mesh=mesh)


def test_column_scale_beats_global_scale():
    """Per-column mean|diff| is the L2-optimal 1-bit scale per column,
    so Frobenius reconstruction error must be <= the global-coeff
    BinaryDelta on ANY delta, and strictly better when column
    magnitudes vary."""
    from bitdelta_tpu.core.delta import quantize_delta, dequantize_delta
    from bitdelta_tpu.research.variants import (
        ColumnScaleDelta, apply_column, column_delta_linear,
        dequantize_column, quantize_column)

    rng = np.random.default_rng(0)
    base = rng.standard_normal((256, 128)).astype(np.float32)
    # Column-varying delta magnitude (real fine-tunes concentrate change
    # in a subset of output features).
    col_mag = (0.002 + 0.05 * rng.random(128)).astype(np.float32)
    diff = rng.standard_normal((256, 128)).astype(np.float32) * col_mag
    fine = base + diff

    d_glob = quantize_delta(jnp.asarray(base), jnp.asarray(fine))
    d_col = quantize_column(jnp.asarray(base), jnp.asarray(fine))
    assert d_col.scale.shape == (128,)
    # Same sign plane.
    np.testing.assert_array_equal(np.asarray(d_col.packed),
                                  np.asarray(d_glob.packed))

    err_glob = np.linalg.norm(np.asarray(dequantize_delta(d_glob)) - diff)
    err_col = np.linalg.norm(np.asarray(dequantize_column(d_col)) - diff)
    assert err_col < err_glob * 0.9, (err_col, err_glob)

    # Fused-dense and linear paths agree.
    fused = np.asarray(apply_column(jnp.asarray(base), d_col))
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
    y = np.asarray(column_delta_linear(x, jnp.asarray(base), d_col,
                                       compute_dtype=jnp.float32))
    np.testing.assert_allclose(y, np.asarray(x) @ fused, rtol=2e-5,
                               atol=2e-5)


def test_fuse_variant_model_ablation_ladder():
    """One-call delta-fidelity ablation (the reference's notebook
    workflow): every variant must produce a servable dense model whose
    PPL sits between the base and the fine-tune, and exact-SVD LoRA at
    full rank must reproduce the fine-tune exactly."""
    from bitdelta_tpu.eval.ppl import eval_ppl, tokenize_corpus
    from bitdelta_tpu.models import llama as jl
    from bitdelta_tpu.models import config as cfgs
    from bitdelta_tpu.research.variants import fuse_variant_model
    from bitdelta_tpu.serving.server import ByteTokenizer

    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_vocab_growth import MULTILINGUAL_TEXTS, _finetune_on_corpus

    tok = ByteTokenizer()
    ids = tokenize_corpus(tok, MULTILINGUAL_TEXTS)
    cfg = cfgs.tiny_test_config(vocab_size=tok.vocab_size + 2,
                                hidden_size=64, intermediate_size=128,
                                num_layers=2, num_heads=4, num_kv_heads=2,
                                dtype="float32")
    base = jl.init_params(cfg, jax.random.PRNGKey(1), jnp.float32,
                          scale=0.25)
    fine = _finetune_on_corpus(cfg, base, ids, steps=40, lr=1e-3)

    kw = dict(context_size=64, window_size=32, compute_dtype=jnp.float32)
    ppl_base = eval_ppl(cfg, base, ids, **kw)
    ppl_fine = eval_ppl(cfg, fine, ids, **kw)
    assert ppl_fine < ppl_base

    ppls = {}
    for kind, vkw in [("binary", {}), ("binary_median", {}),
                      ("ternary", dict(fraction=0.5)),
                      ("lora", dict(rank=8)), ("column", {})]:
        fused = fuse_variant_model(base, fine, kind, **vkw)
        ppls[kind] = eval_ppl(cfg, fused, ids, **kw)
        # Every fidelity level keeps some of the fine-tune's gain.
        assert ppls[kind] < ppl_base, (kind, ppls[kind], ppl_base)

    # Full-rank exact-SVD LoRA IS the fine-tune.
    full = fuse_variant_model(base, fine, "lora", rank=64)
    np.testing.assert_allclose(eval_ppl(cfg, full, ids, **kw), ppl_fine,
                               rtol=1e-4)
    # Per-column scales never lose to the single coeff.
    assert ppls["column"] <= ppls["binary"] * 1.02, ppls


def test_fuse_variant_model_rejects_unknown_kwargs():
    """binary_median takes no kwargs — a silently-dropped kwarg in an
    ablation tool produces wrong comparisons (ADVICE r2)."""
    from bitdelta_tpu.models import llama
    from bitdelta_tpu.models.config import ModelConfig
    from bitdelta_tpu.research.variants import fuse_variant_model

    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=1,
                      max_seq_len=32)
    base = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    fine = jax.tree.map(lambda v: v + 0.01, base)
    with pytest.raises(TypeError, match="binary_median takes no"):
        fuse_variant_model(base, fine, "binary_median", fraction=0.3)


def test_fuse_variant_model_mixtral_layout():
    """fuse_variant_model dispatches on the param layout: Mixtral expert
    stacks (L, E, K, N) and the router quantize per matrix over all
    leading axes; every variant's fusion moves the weights toward the
    fine-tune."""
    from bitdelta_tpu.models import mixtral as mx
    from bitdelta_tpu.research.variants import fuse_variant_model

    cfg = mx.MixtralConfig(vocab_size=128, hidden_size=32,
                           intermediate_size=64, num_layers=2, num_heads=2,
                           num_kv_heads=1, max_seq_len=32, num_experts=2,
                           experts_per_token=1)
    base = mx.init_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    fine = jax.tree.map(
        lambda v: v + 0.01 * jax.random.normal(jax.random.PRNGKey(2),
                                               v.shape), base)
    for kind, kw in [("binary", {}), ("binary_median", {}),
                     ("ternary", {"fraction": 0.3}), ("column", {}),
                     ("lora", {"rank": 2})]:
        fused = fuse_variant_model(base, fine, kind, **kw)
        for name in ("w1", "w2", "router", "q_proj"):
            assert fused["layers"][name].shape == base["layers"][name].shape
            err_f = float(jnp.mean(jnp.abs(fused["layers"][name]
                                           - fine["layers"][name])))
            err_b = float(jnp.mean(jnp.abs(base["layers"][name]
                                           - fine["layers"][name])))
            assert err_f < err_b, (kind, name, err_f, err_b)
