"""Compiled-serving-path smoke check, cheap enough to run every round.

VERDICT r3 item 5: the Mosaic compilation of the serving kernels (pair
delta, bit-plane delta, flash decode, flash prefill, tenant dense head)
plus the meshed engine lowering used to be verified only by a manually
run experiment (experiments/tp_compiled_check.py) — a regression would
go unnoticed until someone re-ran it. This module packages that
experiment's phase A as a library call; bench.py runs it as a pre-phase
so the pass/fail lands in the driver-captured artifact every round.

World is ~100 MB — safe on a mostly-full pooled chip. On a non-TPU
backend the kernels execute in interpret mode (the compile coverage is
then only the lowering, which is still worth a smoke signal in CI).
"""

from __future__ import annotations

import contextlib


def serving_compiled_check(log=print) -> dict:
    """Build a tiny 2-tenant world and greedy-decode it through BOTH the
    plain single-device pallas engine and a (1, 1)-mesh pallas engine
    (the meshed lowering). All five serving kernels compile; tokens must
    match exactly. Returns {"status": "ok", "tokens": ...} or raises.
    """
    import jax
    import jax.numpy as jnp

    from ..core.compress import compress_model
    from ..models import llama
    from ..models.config import ModelConfig
    from ..parallel import mesh as pmesh
    from ..serving.engine import Engine, Request
    from ..serving.stacking import stack_tenants

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
    stack = stack_tenants(cfg, base, tenants)

    def mk_interp():
        if jax.default_backend() == "tpu":
            return contextlib.nullcontext()
        from jax.experimental.pallas import tpu as pltpu

        return pltpu.force_tpu_interpret_mode()

    interp = mk_interp()

    reqs = [Request(prompt_ids=[3, 1, 4, 1, 5], tenant_id=0,
                    max_new_tokens=4),
            Request(prompt_ids=[2, 7, 2], tenant_id=1, max_new_tokens=4)]
    with interp:
        want = Engine(cfg, stack, max_slots=2, max_seq=64,
                      prefill_buckets=(16,),
                      kernel="pallas").generate(reqs)
        mesh = pmesh.make_mesh((1, 1), devices=jax.devices()[:1])
        got = Engine(cfg, stack, max_slots=2, max_seq=64,
                     prefill_buckets=(16,), kernel="pallas",
                     mesh=mesh).generate(reqs)
    if got != want:
        raise AssertionError(
            f"meshed pallas engine diverged from single-device: "
            f"{got} != {want}")
    log(f"[compiled_check] pallas serving path ok: {got}")

    # W4 density path (round 5): the Pallas base-matmul kernel
    # (ops/pallas_int4.py) must compile and serve greedy tokens equal
    # to the XLA grouped-einsum engine over the SAME int4 base.
    from ..research.quantized_base import quantize_base, roundtrip_base

    qbase = quantize_base(base, "int4")
    deq = roundtrip_base(base, "int4", jnp.float32)
    tenants_w4 = [compress_model(deq, deq)]  # zero delta, scale=0
    stack_w4 = stack_tenants(cfg, qbase, tenants_w4)
    req4 = [Request(prompt_ids=[3, 1, 4], tenant_id=0, max_new_tokens=4)]
    want4 = Engine(cfg, stack_w4, max_slots=1, max_seq=64,
                   prefill_buckets=(16,), kernel="xla").generate(
                       [Request(**vars(r)) for r in req4])
    with mk_interp():
        got4 = Engine(cfg, stack_w4, max_slots=1, max_seq=64,
                      prefill_buckets=(16,), kernel="pallas").generate(
                          [Request(**vars(r)) for r in req4])
    if got4 != want4:
        raise AssertionError(
            f"W4 pallas engine diverged from XLA: {got4} != {want4}")
    log(f"[compiled_check] W4 pallas base kernel ok: {got4}")
    return {"status": "ok", "tokens": [list(map(int, o)) for o in got],
            "w4_tokens": [list(map(int, o)) for o in got4]}
