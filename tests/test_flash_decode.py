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
