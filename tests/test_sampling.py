"""Sampling tests: greedy/temperature/top-k/top-p semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from bitdelta_tpu.serving.sampling import sample_tokens


def _sample_many(logits, temps, top_ks, top_ps, n=400):
    outs = []
    for i in range(n):
        outs.append(np.asarray(sample_tokens(
            jax.random.PRNGKey(i), logits, temps, top_ks, top_ps)))
    return np.stack(outs)  # (n, B)


def test_greedy_when_temp_zero():
    logits = jnp.asarray([[0.1, 3.0, 0.2, -1.0]])
    out = _sample_many(logits, jnp.zeros(1), jnp.zeros(1, jnp.int32),
                       jnp.ones(1), n=5)
    assert (out == 1).all()


def test_top_k_restricts_support():
    logits = jnp.asarray([[5.0, 4.9, 4.8, -2.0, -3.0]])
    out = _sample_many(logits, jnp.ones(1) * 2.0,
                       jnp.asarray([2], jnp.int32), jnp.ones(1))
    assert set(np.unique(out)) <= {0, 1}


def test_top_p_restricts_support():
    # Token 0 holds ~88% of mass at temp 1; p=0.5 keeps only it.
    logits = jnp.asarray([[3.0, 1.0, 0.0, -1.0]])
    out = _sample_many(logits, jnp.ones(1), jnp.zeros(1, jnp.int32),
                       jnp.asarray([0.5]))
    assert set(np.unique(out)) == {0}


def test_top_p_keeps_at_least_argmax():
    logits = jnp.asarray([[1.0, 1.0, 1.0, 1.0]])
    out = _sample_many(logits, jnp.ones(1), jnp.zeros(1, jnp.int32),
                       jnp.asarray([1e-6]), n=20)
    assert out.shape == (20, 1)  # never NaN/crash; one token kept


def test_mixed_rows_independent_configs():
    logits = jnp.asarray([[9.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    temps = jnp.asarray([0.0, 1.5])
    out = _sample_many(logits, temps, jnp.zeros(2, jnp.int32), jnp.ones(2))
    assert (out[:, 0] == 0).all()          # greedy row
    assert len(np.unique(out[:, 1])) > 1   # sampled row varies


def test_engine_top_k_respected():
    from tests.test_serving import _make_world
    from bitdelta_tpu.serving.engine import Engine, Request

    cfg, base, tenants, stack = _make_world()
    eng = Engine(cfg, stack, max_slots=1, max_seq=64, prefill_buckets=(16,),
                 kernel="xla", seed=1)
    # top_k=1 at high temperature == greedy
    hot = eng.generate([Request(prompt_ids=[4, 5], tenant_id=0,
                                max_new_tokens=6, temperature=5.0,
                                top_k=1)])[0]
    cold = eng.generate([Request(prompt_ids=[4, 5], tenant_id=0,
                                 max_new_tokens=6)])[0]
    assert hot == cold
