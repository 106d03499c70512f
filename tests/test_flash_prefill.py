"""Flash-prefill kernel vs the XLA attention reference (interpret mode).

The kernel (ops/flash_prefill.py) computes causal attention blockwise
with online softmax; it must match models/llama._attention bit-for-bit
in behavior: right-padded lengths, GQA head grouping, Mistral sliding
window, zeroed padding rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitdelta_tpu.models import llama
from bitdelta_tpu.models.config import ModelConfig
from bitdelta_tpu.ops.flash_prefill import flash_prefill_attention


def _reference(q, k, v, lengths, window):
    """XLA attention with padding query rows zeroed (the kernel zeroes
    them; _attention leaves garbage there that downstream code masks)."""
    b, sq, h, hd = q.shape
    sk = k.shape[1]
    cfg = ModelConfig(
        vocab_size=32, hidden_size=h * hd, intermediate_size=8,
        num_layers=1, num_heads=h, num_kv_heads=k.shape[2],
        head_dim=hd, sliding_window=window)
    q_positions = jnp.broadcast_to(jnp.arange(sq)[None, :], (b, sq))
    kv_valid = jnp.arange(sk)[None, :] < lengths[:, None]
    out = llama._attention(cfg, q, k, v, q_positions, kv_valid)
    live = (jnp.arange(sq)[None, :] < lengths[:, None])[..., None]
    return jnp.where(live, out, 0.0)


@pytest.mark.parametrize("window", [None, 48])
@pytest.mark.parametrize("g", [1, 4])
def test_matches_xla_attention(window, g):
    b, sq, kvh, hd = 3, 64, 2, 32
    h = kvh * g
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, hd), jnp.float32)
    k = jax.random.normal(kk, (b, sq, kvh, hd), jnp.float32)
    v = jax.random.normal(kv_, (b, sq, kvh, hd), jnp.float32)
    lengths = jnp.asarray([64, 37, 8], jnp.int32)

    got = flash_prefill_attention(q, k, v, lengths, window=window,
                                  block_q=16, block_k=16, interpret=True)
    want = _reference(q, k, v, lengths, window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_cache_padded_keys():
    """Serving prefill: K/V live in a cache padded past the query length."""
    b, sq, sk, kvh, g, hd = 2, 32, 128, 2, 2, 16
    h = kvh * g
    key = jax.random.PRNGKey(1)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, hd), jnp.float32)
    k = jnp.zeros((b, sk, kvh, hd), jnp.float32)
    v = jnp.zeros((b, sk, kvh, hd), jnp.float32)
    k = k.at[:, :sq].set(jax.random.normal(kk, (b, sq, kvh, hd)))
    v = v.at[:, :sq].set(jax.random.normal(kv_, (b, sq, kvh, hd)))
    lengths = jnp.asarray([32, 11], jnp.int32)

    got = flash_prefill_attention(q, k, v, lengths,
                                  block_q=8, block_k=16, interpret=True)
    want = _reference(q, k, v, lengths, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    # padding query rows emit exactly zero
    assert float(jnp.abs(got[1, 11:]).max()) == 0.0


def test_bf16_inputs():
    b, sq, kvh, g, hd = 2, 32, 2, 2, 32
    h = kvh * g
    key = jax.random.PRNGKey(2)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, hd)).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (b, sq, kvh, hd)).astype(jnp.bfloat16)
    v = jax.random.normal(kv_, (b, sq, kvh, hd)).astype(jnp.bfloat16)
    lengths = jnp.asarray([32, 19], jnp.int32)

    got = flash_prefill_attention(q, k, v, lengths,
                                  block_q=16, block_k=16, interpret=True)
    want = _reference(q, k, v, lengths, None)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)


def test_forward_dispatch_matches_xla():
    """forward(kernel='pallas') on CPU-interpretable shapes must equal
    the XLA path (dispatch happens inside _layer_fwd for fresh
    sequences)."""
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        max_seq_len=64)
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    tokens = jax.random.randint(jax.random.PRNGKey(4), (2, 32), 0, 64)
    lengths = jnp.asarray([32, 13], jnp.int32)

    want = llama.forward(cfg, params, tokens, lengths=lengths,
                         compute_dtype=jnp.float32)
    got = llama.forward(cfg, params, tokens, lengths=lengths,
                        compute_dtype=jnp.float32, kernel="pallas",
                        _flash_interpret=True)
    # Padding positions differ by design (flash zeroes dead query rows;
    # the XLA path computes garbage there that callers mask) — compare
    # live positions only.
    live = np.arange(32)[None, :] < np.asarray(lengths)[:, None]
    np.testing.assert_allclose(np.asarray(got)[live], np.asarray(want)[live],
                               atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Differentiability: blockwise-recompute backward vs XLA attention grads
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("window", [None, 24])
def test_grads_match_xla_attention(window):
    """jax.grad through the flash kernel (custom VJP, interpret-mode
    forward) must match grads through the XLA attention reference for
    q, k and v — including zero grads in padding/causal/window-masked
    positions."""
    b, sq, kvh, g, hd = 2, 32, 2, 2, 16
    h = kvh * g
    key = jax.random.PRNGKey(7)
    kq, kk, kv_, kw = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, sq, h, hd), jnp.float32)
    k = jax.random.normal(kk, (b, sq, kvh, hd), jnp.float32)
    v = jax.random.normal(kv_, (b, sq, kvh, hd), jnp.float32)
    lengths = jnp.asarray([32, 19], jnp.int32)
    # A fixed random cotangent direction makes the check cover every
    # output element (a plain sum would mask sign errors that cancel).
    cot = jax.random.normal(kw, (b, sq, h * hd), jnp.float32)

    def loss_flash(q, k, v):
        out = flash_prefill_attention(q, k, v, lengths, window=window,
                                      block_q=8, block_k=8,
                                      interpret=True)
        return jnp.sum(out * cot)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, lengths, window) * cot)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gg, ww, name in zip(got, want, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                   atol=3e-5, rtol=3e-5, err_msg=name)
    # Padding rows of q really get zero grad.
    assert np.all(np.asarray(got[0])[1, 19:] == 0)
