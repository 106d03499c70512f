"""Sequence-dimension sharding (SURVEY.md section 5.7 stretch goal).

Long-context prefill/eval can shard the SEQUENCE axis of the token
batch over the data axis: GSPMD partitions the per-token work
(embeddings, projections, MLP) and inserts the collectives attention
needs. This proves the capability the GSPMD way — no hand-written ring
attention, the compiler owns the schedule.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bitdelta_tpu.core.compress import compress_model
from bitdelta_tpu.models import config as cfgs
from bitdelta_tpu.models import llama as jl
from bitdelta_tpu.parallel import mesh as pmesh
from bitdelta_tpu.parallel import sharding as psh


def test_sequence_sharded_forward_matches_unsharded():
    cfg = cfgs.tiny_test_config(vocab_size=128, hidden_size=64,
                                intermediate_size=128, num_layers=2,
                                num_heads=4, num_kv_heads=2,
                                max_seq_len=256, dtype="float32")
    base = jl.init_params(cfg, jax.random.PRNGKey(0), jnp.float32,
                          scale=0.25)
    fine = dict(base)
    fine["layers"] = dict(base["layers"])
    fine["layers"]["q_proj"] = base["layers"]["q_proj"] + 0.05
    comp = compress_model(base, fine)
    sp = jl.init_params(cfg, jax.random.PRNGKey(0), jnp.float32, scale=0.25)

    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 128), 0, 128)
    want = np.asarray(jl.forward(cfg, sp, tokens, deltas=comp.deltas,
                                 compute_dtype=jnp.float32))

    mesh = pmesh.make_mesh((8, 1), devices=jax.devices()[:8])
    params = psh.shard_model(cfg, sp, mesh)
    deltas = psh.shard_deltas(cfg, comp.deltas, mesh)
    # Tokens sharded along the SEQUENCE axis: 16 tokens per device.
    tok_sharded = jax.device_put(
        tokens, NamedSharding(mesh, P(None, pmesh.DATA_AXIS)))
    got = np.asarray(jl.forward(cfg, params, tok_sharded,
                                deltas=deltas, compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_sequence_sharded_ppl_matches():
    """The PPL evaluator's windows can shard their sequence axis too
    (long-context eval across the mesh)."""
    from bitdelta_tpu.eval.ppl import eval_ppl

    cfg = cfgs.tiny_test_config(vocab_size=128, hidden_size=64,
                                intermediate_size=128, num_layers=2,
                                num_heads=4, num_kv_heads=2,
                                max_seq_len=256, dtype="float32")
    params = jl.init_params(cfg, jax.random.PRNGKey(3), jnp.float32,
                            scale=0.25)
    token_ids = np.random.default_rng(0).integers(0, 128, 2048)

    want = eval_ppl(cfg, params, token_ids, context_size=96,
                    window_size=32, compute_dtype=jnp.float32)

    # (2, 4): sequence sharded over data=2 AND params TP-sharded over 4.
    mesh = pmesh.make_mesh((2, 4), devices=jax.devices()[:8])
    sharded = psh.shard_model(cfg, params, mesh)
    got = eval_ppl(cfg, sharded, token_ids, context_size=96,
                   window_size=32, compute_dtype=jnp.float32, mesh=mesh)
    np.testing.assert_allclose(got, want, rtol=1e-5)
