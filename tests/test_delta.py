"""Tests for the 1-bit delta core vs dense fp32 reference semantics
(reference bitdelta/diff.py:8-39)."""

import numpy as np
import jax
import jax.numpy as jnp

from bitdelta_tpu.core.delta import (
    BinaryDelta,
    apply_delta,
    compression_ratio,
    delta_linear,
    dequantize_delta,
    quantize_delta,
)


def _rand(shape, seed=0, dtype=np.float32):
    return np.random.default_rng(seed).standard_normal(shape).astype(dtype)


def test_quantize_scale_is_mean_abs():
    base = _rand((64, 32), 0)
    fine = _rand((64, 32), 1)
    d = quantize_delta(jnp.asarray(base), jnp.asarray(fine))
    np.testing.assert_allclose(
        float(d.scale), np.abs(fine - base).mean(), rtol=1e-6
    )
    assert d.scale.dtype == jnp.float32


def test_sign_of_zero_is_plus_one():
    # diff == 0 must quantize to +1 (reference: mask starts at ones and
    # only diff < 0 flips to 0, diff.py:14-15).
    base = np.zeros((32, 4), np.float32)
    fine = np.zeros((32, 4), np.float32)
    fine[0, 0] = -1.0
    d = quantize_delta(jnp.asarray(base), jnp.asarray(fine))
    dense = np.asarray(dequantize_delta(d))
    assert dense[0, 0] < 0
    assert (dense.flatten()[1:] > 0).all()


def test_dequantize_matches_dense_formula():
    base = _rand((64, 48), 2)
    fine = _rand((64, 48), 3)
    d = quantize_delta(jnp.asarray(base), jnp.asarray(fine))
    diff = fine - base
    expect = np.abs(diff).mean() * np.where(diff >= 0, 1.0, -1.0)
    np.testing.assert_allclose(np.asarray(dequantize_delta(d)), expect, rtol=1e-6)


def test_apply_delta_dense_fusion():
    base = _rand((64, 48), 4)
    fine = _rand((64, 48), 5)
    d = quantize_delta(jnp.asarray(base), jnp.asarray(fine))
    fused = np.asarray(apply_delta(jnp.asarray(base), d))
    diff = fine - base
    expect = base + np.abs(diff).mean() * np.where(diff >= 0, 1.0, -1.0)
    np.testing.assert_allclose(fused, expect, rtol=1e-5, atol=1e-6)


def test_delta_linear_matches_dense_fused_matmul():
    base = _rand((128, 64), 6)
    fine = base + 0.01 * _rand((128, 64), 7)
    x = _rand((4, 128), 8)
    d = quantize_delta(jnp.asarray(base), jnp.asarray(fine))
    y = np.asarray(
        delta_linear(jnp.asarray(x), jnp.asarray(base), d,
                     compute_dtype=jnp.float32)
    )
    w_fused = np.asarray(apply_delta(jnp.asarray(base), d))
    expect = x @ w_fused
    np.testing.assert_allclose(y, expect, rtol=2e-4, atol=2e-4)


def test_stacked_layers_quantize():
    # Scanned-layer layout: (L, K, N) stacks quantize to (L, K/32, N)
    # packed + (L,) scales in one shot.
    base = _rand((3, 64, 32), 9)
    fine = _rand((3, 64, 32), 10)
    d = quantize_delta(jnp.asarray(base), jnp.asarray(fine))
    assert d.packed.shape == (3, 2, 32)
    assert d.scale.shape == (3,)
    for l in range(3):
        dl = quantize_delta(jnp.asarray(base[l]), jnp.asarray(fine[l]))
        np.testing.assert_array_equal(np.asarray(d.packed[l]), np.asarray(dl.packed))
        np.testing.assert_allclose(float(d.scale[l]), float(dl.scale), rtol=1e-6)


def test_compression_ratio_close_to_16x():
    base = jnp.zeros((1024, 1024), jnp.bfloat16)
    fine = jnp.ones((1024, 1024), jnp.bfloat16)
    d = quantize_delta(base, fine)
    r = compression_ratio(base, d)
    assert 15.5 < r <= 16.0


def test_scale_gradient_flows():
    # Distillation trains only the scale; check d(loss)/d(scale) is the
    # analytic <g, x @ sign>.
    base = jnp.asarray(_rand((64, 32), 11))
    fine = jnp.asarray(_rand((64, 32), 12))
    x = jnp.asarray(_rand((2, 64), 13))
    d = quantize_delta(base, fine)

    def loss(scale):
        y = delta_linear(x, base, BinaryDelta(d.packed, scale),
                         compute_dtype=jnp.float32)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(d.scale)
    signs = np.where(np.asarray(dequantize_delta(d)) >= 0, 1.0, -1.0)
    y = np.asarray(x) @ (np.asarray(base) + float(d.scale) * signs)
    expect = 2.0 * np.sum(y * (np.asarray(x) @ signs))
    np.testing.assert_allclose(float(g), expect, rtol=1e-4)


def test_zero_sign_balance_removes_coherent_bias():
    """bf16 fine-tunes leave many deltas EXACTLY zero (updates below the
    local ULP round away); reference parity maps them all to +1, adding
    a coherent +scale*n_zeros bias to every output column under an
    all-ones probe. zero_sign='balance' checkerboards the tie-break and
    must (a) keep nonzero-delta bits identical and (b) shrink that bias
    by ~sqrt(n_zeros)."""
    rng = np.random.default_rng(0)
    base = rng.standard_normal((512, 256)).astype(np.float32)
    diff = rng.standard_normal((512, 256)).astype(np.float32) * 0.02
    diff[rng.random((512, 256)) < 0.3] = 0.0  # 30% untouched weights
    fine = base + diff

    d_pos = quantize_delta(jnp.asarray(base), jnp.asarray(fine))
    d_bal = quantize_delta(jnp.asarray(base), jnp.asarray(fine),
                           zero_sign="balance")
    np.testing.assert_allclose(float(d_pos.scale), float(d_bal.scale))

    # Nonzero entries quantize identically under both modes.
    dq_pos = np.asarray(dequantize_delta(d_pos))
    dq_bal = np.asarray(dequantize_delta(d_bal))
    nz = diff != 0
    np.testing.assert_array_equal(dq_pos[nz], dq_bal[nz])

    # Column bias of the quantized delta restricted to zero positions:
    # all +scale under reference parity, ~zero-mean under balance.
    x = np.ones((1, 512), np.float32)
    err_pos = np.abs(x @ (dq_pos - diff)).mean()
    err_bal = np.abs(x @ (dq_bal - diff)).mean()
    n_zero_col = (~nz).sum(axis=0).mean()
    assert err_pos > float(d_pos.scale) * n_zero_col * 0.5  # coherent
    assert err_bal < err_pos * 0.35, (err_bal, err_pos)


def test_zero_sign_default_is_reference_parity():
    base = jnp.zeros((32, 32), jnp.float32)
    fine = jnp.zeros((32, 32), jnp.float32)  # all-zero diff
    d = quantize_delta(base, fine)
    # diff >= 0 everywhere -> every packed word is all-ones (-1 int32).
    assert np.all(np.asarray(d.packed) == -1)
