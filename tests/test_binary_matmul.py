"""XLA binary matmul vs dense fp32 ground truth (the reference validated
its Triton kernel against torch.matmul(a, 2b-1) — notebook cell 7; we do
the same against jnp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bitdelta_tpu.ops.packing import pack_signs
from bitdelta_tpu.ops.binary_matmul import (
    binary_bmm,
    binary_matmul,
    tenant_binary_matmul,
)


def _case(seed, k, n, lead):
    rng = np.random.default_rng(seed)
    signs = rng.integers(0, 2, size=(k, n)).astype(bool)
    x = rng.standard_normal((*lead, k)).astype(np.float32)
    return x, signs


@pytest.mark.parametrize("k,n,lead", [(64, 32, (4,)), (128, 128, (2, 8)), (32, 8, ())])
def test_binary_matmul_matches_dense(k, n, lead):
    x, signs = _case(0, k, n, lead)
    packed = pack_signs(jnp.asarray(signs))
    y = np.asarray(binary_matmul(jnp.asarray(x), packed, 0.37,
                                 compute_dtype=jnp.float32))
    expect = 0.37 * (x @ np.where(signs, 1.0, -1.0).astype(np.float32))
    np.testing.assert_allclose(y, expect, rtol=1e-5, atol=1e-5)


def test_binary_bmm_per_batch_masks_and_scales():
    rng = np.random.default_rng(1)
    b, m, k, n = 3, 5, 64, 16
    signs = rng.integers(0, 2, size=(b, k, n)).astype(bool)
    x = rng.standard_normal((b, m, k)).astype(np.float32)
    scales = np.array([0.5, 1.0, 2.0], np.float32)
    packed = pack_signs(jnp.asarray(signs))
    y = np.asarray(binary_bmm(jnp.asarray(x), packed, jnp.asarray(scales),
                              compute_dtype=jnp.float32))
    for i in range(b):
        expect = scales[i] * (x[i] @ np.where(signs[i], 1.0, -1.0))
        np.testing.assert_allclose(y[i], expect, rtol=1e-5, atol=1e-5)


def test_tenant_routing():
    rng = np.random.default_rng(2)
    t, b, m, k, n = 4, 6, 3, 64, 16
    signs = rng.integers(0, 2, size=(t, k, n)).astype(bool)
    scales = rng.uniform(0.1, 2.0, size=(t,)).astype(np.float32)
    x = rng.standard_normal((b, m, k)).astype(np.float32)
    ids = np.array([0, 3, 1, 1, 2, 0], np.int32)
    packed = pack_signs(jnp.asarray(signs))
    y = np.asarray(tenant_binary_matmul(
        jnp.asarray(x), packed, jnp.asarray(scales), jnp.asarray(ids),
        compute_dtype=jnp.float32))
    for i in range(b):
        tid = ids[i]
        expect = scales[tid] * (x[i] @ np.where(signs[tid], 1.0, -1.0))
        np.testing.assert_allclose(y[i], expect, rtol=1e-5, atol=1e-5)
