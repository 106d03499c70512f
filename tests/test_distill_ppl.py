"""End-to-end slice: compress -> distill scales -> evaluate perplexity
(BASELINE.json config 1, CPU-runnable)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdelta_tpu.core.compress import compress_model, fuse_compressed
from bitdelta_tpu.eval.ppl import eval_ppl, window_starts
from bitdelta_tpu.models import config as cfgs
from bitdelta_tpu.models import llama as jl
from bitdelta_tpu.train.data import synthetic_batches
from bitdelta_tpu.train.distill import DistillConfig, distill_scales


def _pair(seed=0):
    cfg = cfgs.tiny_test_config(num_layers=2, vocab_size=64, hidden_size=32,
                                intermediate_size=64, num_heads=2,
                                num_kv_heads=2)
    base = jl.init_params(cfg, jax.random.PRNGKey(seed), jnp.float32,
                          scale=0.2)
    fine = jax.tree.map(lambda x: x, base)
    fine["layers"] = dict(fine["layers"])
    key = jax.random.PRNGKey(seed + 7)
    for name in jl.PROJ_NAMES:
        key, sub = jax.random.split(key)
        fine["layers"][name] = base["layers"][name] + (
            0.05 * jax.random.normal(sub, base["layers"][name].shape))
    return cfg, base, fine


def test_window_starts_reference_semantics():
    starts, max_length, stride = window_starts(4096, 1024, 512)
    assert max_length == 1536 and stride == 512
    assert starts[0] == 0 and starts[-1] + max_length <= 4096
    assert all(b - a == 512 for a, b in zip(starts, starts[1:]))
    # Truncation to a stride multiple (reference eval_ppl.py:37-38).
    s2, _, _ = window_starts(4097, 1024, 512)
    assert s2 == starts


def test_ppl_uniform_model_equals_vocab_size():
    cfg = cfgs.tiny_test_config(vocab_size=64, num_layers=1)
    params = jl.init_params(cfg, jax.random.PRNGKey(0), jnp.float32,
                            scale=0.0)  # zero weights -> uniform logits
    toks = np.random.default_rng(0).integers(0, 64, 4096)
    ppl = eval_ppl(cfg, params, toks, context_size=64, window_size=32,
                   compute_dtype=jnp.float32)
    np.testing.assert_allclose(ppl, 64.0, rtol=1e-3)


def test_ppl_delta_path_matches_fused_path():
    cfg, base, fine = _pair(1)
    comp = compress_model(base, fine)
    toks = np.random.default_rng(1).integers(0, cfg.vocab_size, 2048)
    from bitdelta_tpu.core.compress import student_params
    p_fused = eval_ppl(cfg, fuse_compressed(base, comp), toks,
                       context_size=64, window_size=32,
                       compute_dtype=jnp.float32)
    p_delta = eval_ppl(cfg, student_params(base, comp), toks,
                       context_size=64, window_size=32, deltas=comp.deltas,
                       compute_dtype=jnp.float32)
    np.testing.assert_allclose(p_delta, p_fused, rtol=1e-3)


def test_ppl_batch_larger_than_window_count():
    # batch_windows > number of windows: padding must tile correctly.
    cfg, base, _ = _pair(7)
    toks = np.random.default_rng(7).integers(0, cfg.vocab_size, 160)
    p1 = eval_ppl(cfg, base, toks, context_size=64, window_size=32,
                  compute_dtype=jnp.float32, batch_windows=1)
    p8 = eval_ppl(cfg, base, toks, context_size=64, window_size=32,
                  compute_dtype=jnp.float32, batch_windows=8)
    np.testing.assert_allclose(p1, p8, rtol=1e-5)


def test_ppl_window_batching_invariant():
    cfg, base, _ = _pair(2)
    toks = np.random.default_rng(2).integers(0, cfg.vocab_size, 2048)
    p1 = eval_ppl(cfg, base, toks, context_size=64, window_size=32,
                  compute_dtype=jnp.float32, batch_windows=1)
    p4 = eval_ppl(cfg, base, toks, context_size=64, window_size=32,
                  compute_dtype=jnp.float32, batch_windows=4)
    np.testing.assert_allclose(p1, p4, rtol=1e-5)


def test_distillation_pallas_kernel_matches_xla():
    # One distill step with the custom-VJP Pallas kernels must produce
    # the same loss and scale updates as the XLA path (interpret mode).
    from jax.experimental.pallas import tpu as pltpu

    cfg, base, fine = _pair(11)
    comp = compress_model(base, fine)
    one = synthetic_batches(cfg.vocab_size, 1, 2, 32, seed=11)[0]
    batches = np.repeat(one[None], 2, axis=0)
    ref, losses_ref = distill_scales(
        cfg, base, fine, comp, batches,
        DistillConfig(lr=1e-3, num_steps=2, compute_dtype="float32"))
    with pltpu.force_tpu_interpret_mode():
        got, losses_got = distill_scales(
            cfg, base, fine, comp, batches,
            DistillConfig(lr=1e-3, num_steps=2, compute_dtype="float32",
                          kernel="pallas"))
    np.testing.assert_allclose(losses_got, losses_ref, rtol=1e-4)
    for name in ref.deltas:
        np.testing.assert_allclose(np.asarray(got.deltas[name].scale),
                                   np.asarray(ref.deltas[name].scale),
                                   rtol=1e-4)


def test_distillation_reduces_logit_mse():
    # On a fixed calibration batch the loss must converge downward
    # (the reference reports 0.41 -> 0.052 on Vicuna-7B,
    # docs/index.html:246-247; a tiny random model has far less headroom
    # since only 14 scalars are trainable, but the direction must hold).
    cfg, base, fine = _pair(3)
    comp = compress_model(base, fine)
    one = synthetic_batches(cfg.vocab_size, 1, 4, 32, seed=3)[0]
    batches = np.repeat(one[None], 40, axis=0)
    dcfg = DistillConfig(lr=1e-3, num_steps=40, compute_dtype="float32")
    calibrated, losses = distill_scales(cfg, base, fine, comp, batches, dcfg)
    assert losses[-1] < 0.99 * losses[0], (losses[0], losses[-1])
    assert losses[-1] <= min(losses) * 1.01  # settled, not oscillating
    for name, d in calibrated.deltas.items():
        assert np.isfinite(np.asarray(d.scale)).all()
        assert d.scale.shape == comp.deltas[name].scale.shape

    # Initial scales must be untouched (the jitted step donates its
    # buffers; the caller's pytree must survive).
    np.testing.assert_allclose(
        np.asarray(comp.deltas["q_proj"].scale),
        np.asarray(compress_model(base, fine).deltas["q_proj"].scale))

    # Calibrated scales track the teacher better on the trained batch.
    toks = jnp.asarray(one)
    t = jl.forward(cfg, fine, toks, compute_dtype=jnp.float32)
    from bitdelta_tpu.core.compress import student_params
    sp = student_params(base, comp)
    s0 = jl.forward(cfg, sp, toks, deltas=comp.deltas,
                    compute_dtype=jnp.float32)
    s1 = jl.forward(cfg, sp, toks, deltas=calibrated.deltas,
                    compute_dtype=jnp.float32)
    mse0 = float(jnp.mean((t - s0) ** 2))
    mse1 = float(jnp.mean((t - s1) ** 2))
    assert mse1 < mse0


def test_distillation_trains_embed_and_head_scales():
    cfg, base, fine = _pair(11)
    key = jax.random.PRNGKey(99)
    k1, k2 = jax.random.split(key)
    fine["embed"] = base["embed"] + 0.03 * jax.random.normal(
        k1, base["embed"].shape)
    fine["lm_head"] = base["lm_head"] + 0.03 * jax.random.normal(
        k2, base["lm_head"].shape)
    comp = compress_model(base, fine, compress_embeddings=True)
    s0_embed = float(comp.deltas["embed"].scale)
    s0_head = float(comp.deltas["lm_head"].scale)
    batches = synthetic_batches(cfg.vocab_size, 8, 2, 16, seed=42)
    dcfg = DistillConfig(num_steps=8, compute_dtype="float32", lr=3e-3)
    calib, losses = distill_scales(cfg, base, fine, comp, batches, dcfg)
    assert losses[-1] < losses[0]
    # The embed/head scales are trainable leaves and must have moved.
    assert float(calib.deltas["embed"].scale) != s0_embed
    assert float(calib.deltas["lm_head"].scale) != s0_head


def test_distill_checkpoint_resume_matches_uninterrupted(tmp_path):
    """Kill-and-resume must land on the identical trajectory: run 6
    steps straight vs 3 steps (checkpointed) + resume for the rest."""
    cfg, base, fine = _pair(17)
    comp = compress_model(base, fine)
    batches = np.stack(synthetic_batches(cfg.vocab_size, 6, 2, 16, seed=17))
    dcfg = DistillConfig(lr=1e-3, num_steps=6, compute_dtype="float32")

    ref, losses_ref = distill_scales(cfg, base, fine, comp, batches, dcfg)

    ckpt = str(tmp_path / "ck.npz")
    # First "run" dies after 3 steps (simulated by only feeding 3).
    distill_scales(cfg, base, fine, comp, batches[:3], dcfg,
                   checkpoint_path=ckpt, checkpoint_every=3)
    # Resume with the full batch list: steps 0-2 are skipped.
    got, losses_got = distill_scales(cfg, base, fine, comp, batches, dcfg,
                                     checkpoint_path=ckpt,
                                     checkpoint_every=3)
    assert len(losses_got) == 3
    np.testing.assert_allclose(losses_got, losses_ref[3:], rtol=1e-6)
    for name in ref.deltas:
        np.testing.assert_allclose(np.asarray(got.deltas[name].scale),
                                   np.asarray(ref.deltas[name].scale),
                                   rtol=1e-6)
