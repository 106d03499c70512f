"""Flash-decode attention kernel vs the XLA attention path.

The reference has no attention kernel (HF eager attention); this kernel
is TPU-native new ground, so we hold it to the same standard as the
binary-GEMM kernels: interpret-mode property tests here, compiled
numerics on real TPU via the bench/verify drives.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from bitdelta_tpu.models import llama
from bitdelta_tpu.models.config import tiny_test_config
from bitdelta_tpu.ops.flash_decode import flash_decode_attention

INTERP = jax.default_backend() != "tpu"


def _rand_case(rng, b, s, h, kv, hd, window):
    cfg = tiny_test_config(num_heads=h, num_kv_heads=kv,
                           hidden_size=h * hd, sliding_window=window)
    q = jnp.asarray(rng.standard_normal((b, 1, h, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kv, hd)), jnp.float32)
    lengths = jnp.asarray(rng.integers(1, s + 1, (b,)), jnp.int32)
    valid = jnp.arange(s)[None, :] < lengths[:, None]
    # Zero invalid slots like a freshly-initialized cache.
    k = k * valid[:, :, None, None]
    v = v * valid[:, :, None, None]
    return cfg, q, k, v, lengths, valid


@pytest.mark.parametrize("b,s,h,kv,hd,window", [
    (4, 64, 4, 2, 16, None),     # GQA
    (3, 128, 8, 8, 32, None),    # MHA
    (2, 256, 8, 2, 64, 96),      # sliding window, multiple blocks
    (5, 64, 4, 4, 16, 24),       # window smaller than one block
    (1, 8, 4, 1, 16, None),      # single row, single KV head
])
def test_flash_decode_matches_xla_attention(b, s, h, kv, hd, window):
    rng = np.random.default_rng(hash((b, s, h)) % 2**31)
    cfg, q, k, v, lengths, valid = _rand_case(rng, b, s, h, kv, hd, window)
    want = llama._attention(cfg, q, k, v, (lengths - 1)[:, None], valid)
    got = flash_decode_attention(q[:, 0], k, v, lengths, window=window,
                                 interpret=INTERP).reshape(b, 1, h * hd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_decode_small_blocks():
    # Force multiple grid steps per row so block skipping + the online
    # softmax across blocks are actually exercised.
    rng = np.random.default_rng(7)
    cfg, q, k, v, lengths, valid = _rand_case(rng, 4, 128, 4, 2, 16, None)
    want = llama._attention(cfg, q, k, v, (lengths - 1)[:, None], valid)
    got = flash_decode_attention(q[:, 0], k, v, lengths, block_s=16,
                                 interpret=INTERP).reshape(4, 1, -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_decode_bf16():
    rng = np.random.default_rng(9)
    cfg, q, k, v, lengths, valid = _rand_case(rng, 3, 64, 8, 4, 32, None)
    q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    want = llama._attention(cfg, q, k, v, (lengths - 1)[:, None], valid)
    got = flash_decode_attention(q[:, 0], k, v, lengths,
                                 interpret=INTERP).reshape(3, 1, -1)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_decode_step_pallas_uses_flash_path():
    """Whole decode step, kernel='pallas' (interpret), vs kernel='xla'."""
    if not INTERP:
        pytest.skip("interpret-mode integration test")
    cfg = tiny_test_config(num_heads=4, num_kv_heads=2, hidden_size=64,
                           sliding_window=24)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    b, prompt = 3, 5
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, prompt), 0,
                                cfg.vocab_size)
    _, cache = llama.forward(cfg, params, tokens, return_cache=True,
                             cache_max_seq=32, compute_dtype=jnp.float32)
    nxt = jax.random.randint(jax.random.PRNGKey(2), (b, 1), 0, cfg.vocab_size)
    want, _ = llama.decode_step(cfg, params, nxt, cache,
                                compute_dtype=jnp.float32, kernel="xla")
    with pltpu.force_tpu_interpret_mode():
        got, _ = llama.decode_step(cfg, params, nxt, cache,
                                   compute_dtype=jnp.float32, kernel="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# int8 KV cache: in-kernel dequantization (ops/kv_quant.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("b,s,h,kv,hd,window", [
    (3, 64, 4, 2, 16, None),
    (2, 128, 8, 2, 32, 48),
])
def test_flash_decode_int8_kv_matches_dequantized(b, s, h, kv, hd, window):
    """The quantized kernel must equal attention over the explicitly
    dequantized cache EXACTLY (same math, different placement of the
    scale multiply) — quantization error itself cancels out of this
    comparison."""
    from bitdelta_tpu.ops.kv_quant import dequantize_kv, quantize_kv

    rng = np.random.default_rng(hash((b, s, h, 8)) % 2**31)
    cfg, q, k, v, lengths, valid = _rand_case(rng, b, s, h, kv, hd, window)
    k8, ks = quantize_kv(k)
    v8, vs = quantize_kv(v)

    got = flash_decode_attention(q[:, 0], k8, v8, lengths,
                                 k_scale=ks, v_scale=vs, window=window,
                                 interpret=INTERP).reshape(b, 1, h * hd)
    want = llama._attention(cfg, q, dequantize_kv(k8, ks, jnp.float32),
                            dequantize_kv(v8, vs, jnp.float32),
                            (lengths - 1)[:, None], valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # And quantization error vs the exact cache stays small.
    exact = llama._attention(cfg, q, k, v, (lengths - 1)[:, None], valid)
    err = np.abs(np.asarray(got) - np.asarray(exact)).mean()
    mag = np.abs(np.asarray(exact)).mean()
    assert err < 0.02 * mag, (err, mag)


def test_decode_step_pallas_int8_kv_matches_xla_int8_kv():
    """Whole decode step over the int8 cache: pallas (flash kernel with
    in-VMEM dequant) vs xla (dense dequant view) must agree."""
    if not INTERP:
        pytest.skip("interpret-mode integration test")
    cfg = tiny_test_config(num_heads=4, num_kv_heads=2, hidden_size=64,
                           sliding_window=24)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    b, prompt = 3, 5
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, prompt), 0,
                                cfg.vocab_size)
    _, cache = llama.forward(cfg, params, tokens, return_cache=True,
                             cache_max_seq=32, compute_dtype=jnp.float32,
                             kv_quant=True)
    assert cache.k.dtype == jnp.int8
    nxt = jax.random.randint(jax.random.PRNGKey(2), (b, 1), 0,
                             cfg.vocab_size)
    want, wc = llama.decode_step(cfg, params, nxt, cache,
                                 compute_dtype=jnp.float32, kernel="xla")
    with pltpu.force_tpu_interpret_mode():
        got, gc = llama.decode_step(cfg, params, nxt, cache,
                                    compute_dtype=jnp.float32,
                                    kernel="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # Both wrote identical quantized K/V + scales at the new position.
    np.testing.assert_array_equal(np.asarray(gc.k), np.asarray(wc.k))
    np.testing.assert_allclose(np.asarray(gc.k_scale),
                               np.asarray(wc.k_scale), rtol=1e-6)
