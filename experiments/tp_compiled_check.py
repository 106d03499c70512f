"""Compile the shard_map Pallas serving path on REAL silicon.

VERDICT r2 item 3: the TP decode (and now prefill) shard_map programs
were only ever executed in interpret mode on fake CPU devices. This
script runs them through Mosaic on the actual chip:

  phase A — a (1, 1) mesh Engine with kernel='pallas': exercises the
            shard_map lowering + every Pallas kernel COMPILED (pair
            delta, bit-plane delta, flash decode, flash prefill,
            tenant dense head), greedy tokens checked against the
            plain single-device engine (compiled-numerics parity).
  phase B — the individual per-shard KERNEL calls at tp=2 LOCAL shapes
            (the exact programs each model-axis shard runs inside the
            shard_map body): column-parallel shards must concatenate
            and row-parallel shards must SUM (the psum) back to the
            full-shape kernel's output, compiled.

A single real device can't execute a (1,2) shard_map, but phase B
compiles and checks precisely the per-shard programs + the reassembly
math the mesh relies on; phase A compiles the shard_map machinery
itself. Small world — safe on a mostly-full pooled chip (~100 MB).
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from bitdelta_tpu.core.compress import compress_model
from bitdelta_tpu.core.delta import BinaryDelta, pair_delta
from bitdelta_tpu.models import llama
from bitdelta_tpu.models.config import ModelConfig
from bitdelta_tpu.ops.packing import column_popcount, repack_pairs
from bitdelta_tpu.ops.pallas_binary_gemm import (
    tenant_delta_matmul_pair_pallas, tenant_delta_matmul_pallas)
from bitdelta_tpu.parallel import mesh as pmesh
from bitdelta_tpu.serving.engine import Engine, Request
from bitdelta_tpu.serving.stacking import stack_tenants


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_world():
    cfg = ModelConfig(vocab_size=512, hidden_size=256,
                      intermediate_size=512, num_layers=2,
                      num_heads=2, num_kv_heads=1,
                      max_seq_len=64, dtype="float32")
    base = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    tenants = []
    for t in range(2):
        fine = dict(base)
        fine["layers"] = {k: (v * (1.01 + 0.01 * t) if v.ndim == 3 else v)
                          for k, v in base["layers"].items()}
        fine["embed"] = base["embed"] * 1.01
        fine["lm_head"] = base["lm_head"] * 1.01
        tenants.append(compress_model(base, fine,
                                      compress_embeddings=True))
    return cfg, base, stack_tenants(cfg, base, tenants)


def phase_a():
    cfg, base, stack = make_world()
    reqs = [Request(prompt_ids=[3, 1, 4, 1, 5], tenant_id=0,
                    max_new_tokens=4),
            Request(prompt_ids=[2, 7, 2], tenant_id=1, max_new_tokens=4)]
    want = Engine(cfg, stack, max_slots=2, max_seq=64,
                  prefill_buckets=(16,), kernel="pallas").generate(reqs)
    mesh = pmesh.make_mesh((1, 1), devices=jax.devices()[:1])
    got = Engine(cfg, stack, max_slots=2, max_seq=64,
                 prefill_buckets=(16,), kernel="pallas",
                 mesh=mesh).generate(reqs)
    assert got == want, (got, want)
    log(f"[A] shard_map (1,1) engine COMPILED == single-device: {got}")


def _rel(a, b):
    return float(jnp.max(jnp.abs(a - b)) / jnp.maximum(
        jnp.max(jnp.abs(b)), 1e-9))


def phase_b():
    """Per-shard kernels at tp=2 local shapes, compiled + reassembled."""
    tp, T, B = 2, 3, 4
    K, N = 1024, 1024  # local column shard N/tp = 512 (pair-eligible),
    #                    local row shard K/tp = 512 (whole words/groups)
    key = iter(jax.random.split(jax.random.PRNGKey(7), 8))
    packed = jax.random.bits(next(key), (T, K // 32, N), jnp.uint32) \
        .astype(jnp.int32)
    scales = jnp.asarray([0.01, 0.02, 0.03], jnp.float32)
    ids = jnp.array([0, 2, 1, 2], jnp.int32)
    x = jax.random.normal(next(key), (B, K), jnp.bfloat16)
    d = BinaryDelta(packed=packed, scale=scales)
    pd = pair_delta(d)

    y_full = tenant_delta_matmul_pair_pallas(
        x, pd.packed_pairs, pd.colsum, pd.scale, ids,
        out_dtype=jnp.float32)

    # Column-parallel: shard packed words + colsum on N; outputs concat.
    nh = pd.packed_pairs.shape[-1]
    cols = []
    for s in range(tp):
        pp = pd.packed_pairs[..., s * nh // tp:(s + 1) * nh // tp]
        cs = pd.colsum[..., s * N // tp:(s + 1) * N // tp]
        cols.append(tenant_delta_matmul_pair_pallas(
            x, pp, cs, pd.scale, ids, out_dtype=jnp.float32))
    rel = _rel(jnp.concatenate(cols, axis=-1), y_full)
    assert rel < 1e-5, rel
    log(f"[B] column-parallel pair shards (local N={N // tp}) compiled; "
        f"concat == full (rel {rel:.1e})")

    # Row-parallel: shard packed words on K with PER-SHARD colsums;
    # shard outputs SUM (the psum) to the full result.
    kw = pd.packed_pairs.shape[-2]
    per_shard = packed.reshape(T, tp, K // 32 // tp, N)
    rows = []
    for s in range(tp):
        pp = pd.packed_pairs[..., s * kw // tp:(s + 1) * kw // tp, :]
        cs = (2.0 * column_popcount(per_shard[:, s])
              - K // tp).astype(jnp.float32)
        xs = x[:, s * K // tp:(s + 1) * K // tp]
        rows.append(tenant_delta_matmul_pair_pallas(
            xs, pp, cs, pd.scale, ids, out_dtype=jnp.float32))
    rel = _rel(rows[0] + rows[1], y_full)
    assert rel < 1e-4, rel
    log(f"[B] row-parallel pair shards (local K={K // tp}, per-shard "
        f"colsum) compiled; sum == full (rel {rel:.1e})")

    # Canonical bit-plane kernel at a local shape (the non-pair-eligible
    # fallback inside the shard body).
    y_c = tenant_delta_matmul_pallas(
        x[:, :K // tp], packed[:, :K // 32 // tp, :], scales, ids,
        out_dtype=jnp.float32)
    assert np.isfinite(np.asarray(y_c)).all()
    log(f"[B] canonical kernel at local K={K // tp} compiled")

    # Flash decode attention with LOCAL heads: head shards concatenate.
    from bitdelta_tpu.ops.flash_decode import flash_decode_attention

    H, KV, hd, S = 4, 2, 128, 64
    q = jax.random.normal(next(key), (B, H, hd), jnp.float32)
    kc = 0.1 * jax.random.normal(next(key), (B, S, KV, hd), jnp.float32)
    vc = 0.1 * jax.random.normal(next(key), (B, S, KV, hd), jnp.float32)
    lengths = jnp.array([9, 17, 33, 5], jnp.int32)
    full = flash_decode_attention(q, kc, vc, lengths)
    parts = [flash_decode_attention(
        q[:, s * H // tp:(s + 1) * H // tp],
        kc[:, :, s * KV // tp:(s + 1) * KV // tp],
        vc[:, :, s * KV // tp:(s + 1) * KV // tp], lengths)
        for s in range(tp)]
    rel = _rel(jnp.concatenate(parts, axis=1), full)
    assert rel < 1e-5, rel
    log(f"[B] flash decode local heads (H={H // tp}, KV={KV // tp}) "
        f"compiled; concat == full (rel {rel:.1e})")

    # Flash prefill with LOCAL heads.
    from bitdelta_tpu.ops.flash_prefill import flash_prefill_attention

    Sq = 32
    qp = jax.random.normal(next(key), (B, Sq, H, hd), jnp.float32)
    kp = 0.1 * jax.random.normal(next(key), (B, Sq, KV, hd), jnp.float32)
    vp = 0.1 * jax.random.normal(next(key), (B, Sq, KV, hd), jnp.float32)
    plen = jnp.array([32, 17, 9, 32], jnp.int32)
    fullp = flash_prefill_attention(qp, kp, vp, plen)
    partsp = [flash_prefill_attention(
        qp[:, :, s * H // tp:(s + 1) * H // tp],
        kp[:, :, s * KV // tp:(s + 1) * KV // tp],
        vp[:, :, s * KV // tp:(s + 1) * KV // tp], plen)
        for s in range(tp)]
    rel = _rel(jnp.concatenate(partsp, axis=-1),
               fullp.reshape(B, Sq, -1))
    assert rel < 1e-5, rel
    log(f"[B] flash prefill local heads compiled; concat == full "
        f"(rel {rel:.1e})")


def main():
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    phase_a()
    phase_b()
    log("tp_compiled_check: ALL OK")


if __name__ == "__main__":
    main()
