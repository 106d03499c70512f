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
