"""Mixtral MoE decoder: HF parity + fine-tune delta compression."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdelta_tpu.models import mixtral as mx


@pytest.fixture(scope="module")
def hf_mixtral():
    import torch
    from transformers import MixtralConfig as HFConfig, MixtralForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFConfig(vocab_size=96, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, num_local_experts=4,
                      num_experts_per_tok=2, max_position_embeddings=64,
                      rms_norm_eps=1e-6, tie_word_embeddings=False,
                      attn_implementation="eager")
    model = MixtralForCausalLM(hf_cfg).eval().float()
    return hf_cfg, model


def test_mixtral_logits_match_transformers(hf_mixtral):
    import torch

    hf_cfg, model = hf_mixtral
    cfg = mx.MixtralConfig.from_hf_config(hf_cfg)
    assert cfg.num_experts == 4 and cfg.experts_per_token == 2
    params = mx.params_from_torch_mixtral(cfg, model, jnp.float32)
    tokens = np.random.default_rng(0).integers(0, 96, (2, 12), dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.numpy()
    ours = np.asarray(mx.forward(cfg, params, jnp.asarray(tokens),
                                 compute_dtype=jnp.float32))
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_mixtral_finetune_delta_compression(hf_mixtral):
    hf_cfg, model = hf_mixtral
    cfg = mx.MixtralConfig.from_hf_config(hf_cfg)
    base = mx.params_from_torch_mixtral(cfg, model, jnp.float32)
    fine = dict(base)
    fine["layers"] = dict(base["layers"])
    key = jax.random.PRNGKey(5)
    for name in mx.ATTN_PROJS + mx.EXPERT_MATS + ("router",):
        key, sub = jax.random.split(key)
        fine["layers"][name] = base["layers"][name] + (
            0.02 * jax.random.normal(sub, base["layers"][name].shape))

    comp = mx.compress_mixtral(base, fine)
    # Expert deltas keep the expert axis.
    assert comp.deltas["w1"].packed.shape == (
        cfg.num_layers, cfg.num_experts, cfg.hidden_size // 32,
        cfg.intermediate_size)
    assert comp.deltas["w1"].scale.shape == (cfg.num_layers, cfg.num_experts)

    toks = jnp.asarray(np.random.default_rng(1).integers(
        0, 96, (1, 8), dtype=np.int64))
    sp = mx.mixtral_student_params(base, comp)
    y_fine = mx.forward(cfg, fine, toks, compute_dtype=jnp.float32)
    y_base = mx.forward(cfg, base, toks, compute_dtype=jnp.float32)
    y_comp = mx.forward(cfg, sp, toks, deltas=comp.deltas,
                        compute_dtype=jnp.float32)
    err_comp = float(jnp.mean(jnp.abs(y_comp - y_fine)))
    err_base = float(jnp.mean(jnp.abs(y_base - y_fine)))
    assert err_comp < err_base

    # Compression accounting: packed expert deltas ~32x smaller than
    # dense fp32 experts.
    dense = sum(base["layers"][w].size * 4 for w in mx.EXPERT_MATS)
    packed = sum(comp.deltas[w].packed.size * 4 for w in mx.EXPERT_MATS)
    assert dense / packed > 30


def test_mixtral_decode_matches_full_forward(hf_mixtral):
    """Prefill (return_cache) + cached decode must reproduce the
    full-forward logits token by token, including through 1-bit deltas
    (the reference never had a Mixtral generation path at all)."""
    hf_cfg, model = hf_mixtral
    cfg = mx.MixtralConfig.from_hf_config(hf_cfg)
    base = mx.params_from_torch_mixtral(cfg, model, jnp.float32)
    fine = dict(base)
    fine["layers"] = dict(base["layers"])
    key = jax.random.PRNGKey(6)
    for name in mx.ATTN_PROJS + mx.EXPERT_MATS:
        key, sub = jax.random.split(key)
        fine["layers"][name] = base["layers"][name] + (
            0.02 * jax.random.normal(sub, base["layers"][name].shape))
    comp = mx.compress_mixtral(base, fine)
    sp = mx.mixtral_student_params(base, comp)

    rng = np.random.default_rng(2)
    full = rng.integers(0, 96, (2, 10), dtype=np.int64)
    prompt_len = 6
    lengths = jnp.asarray([prompt_len, prompt_len], jnp.int32)

    _, cache = mx.forward(cfg, sp, jnp.asarray(full[:, :prompt_len]),
                          lengths=lengths, deltas=comp.deltas,
                          compute_dtype=jnp.float32,
                          return_cache=True, cache_max_seq=16)
    want = np.asarray(mx.forward(cfg, sp, jnp.asarray(full),
                                 deltas=comp.deltas,
                                 compute_dtype=jnp.float32))
    for i in range(prompt_len, full.shape[1]):
        logits, cache = mx.decode_step(
            cfg, sp, jnp.asarray(full[:, i:i + 1]), cache,
            deltas=comp.deltas, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(logits[:, 0]), want[:, i],
                                   rtol=2e-4, atol=2e-4)


def test_mixtral_multitenant_serving(hf_mixtral):
    """Mixtral through the serving engine: 2 tenants with 1-bit deltas
    over attention + experts + router, continuous-batched greedy decode
    matches full-forward manual generation per tenant (the reference
    never served Mixtral at all)."""
    from bitdelta_tpu.serving.engine import Engine, Request
    from bitdelta_tpu.serving.stacking import stack_tenants

    hf_cfg, model = hf_mixtral
    cfg = mx.MixtralConfig.from_hf_config(hf_cfg)
    base = mx.params_from_torch_mixtral(cfg, model, jnp.float32)

    tenants = []
    for t in range(2):
        fine = dict(base)
        fine["layers"] = dict(base["layers"])
        key = jax.random.PRNGKey(700 + t)
        for name in mx.ATTN_PROJS + mx.EXPERT_MATS + ("router",):
            key, sub = jax.random.split(key)
            fine["layers"][name] = base["layers"][name] + (
                0.05 * jax.random.normal(sub, base["layers"][name].shape))
        tenants.append(mx.compress_mixtral(base, fine))

    stack = stack_tenants(cfg, base, tenants)
    # Expert deltas: (L, T, E, K//32, N).
    assert stack.deltas["w1"].packed.shape == (
        cfg.num_layers, 2, cfg.num_experts, cfg.hidden_size // 32,
        cfg.intermediate_size)

    eng = Engine(cfg, stack, max_slots=2, max_seq=64,
                 prefill_buckets=(16,), kernel="auto", model=mx)
    assert eng.kernel == "xla"
    prompt = [5, 11, 3, 7]
    n = 5
    outs = eng.generate([Request(prompt_ids=prompt, tenant_id=t,
                                 max_new_tokens=n) for t in range(2)])

    for t in range(2):
        sp = mx.mixtral_student_params(base, tenants[t])
        ids = list(prompt)
        manual = []
        for _ in range(n):
            logits = mx.forward(cfg, sp, jnp.asarray([ids]),
                                deltas=tenants[t].deltas,
                                compute_dtype=jnp.float32)
            nxt = int(jnp.argmax(logits[0, -1]))
            manual.append(nxt)
            ids.append(nxt)
        assert outs[t] == manual
    assert outs[0] != outs[1]


# ---------------------------------------------------------------------------
# TP/DP sharding: Mixtral expert stacks over the fake 8-device mesh
# (Megatron TP inside each expert — w1/w3 column-parallel on I, w2
# row-parallel; parallel/sharding.py EXPERT_{COLUMN,ROW}_PARALLEL).
# ---------------------------------------------------------------------------

def _finetune(base, seed):
    fine = dict(base)
    fine["layers"] = dict(base["layers"])
    key = jax.random.PRNGKey(seed)
    for name in mx.ATTN_PROJS + mx.EXPERT_MATS + ("router",):
        key, sub = jax.random.split(key)
        fine["layers"][name] = base["layers"][name] + (
            0.05 * jax.random.normal(sub, base["layers"][name].shape))
    return fine


def _tp_world():
    """TP=2-shardable Mixtral (every sharded axis — intermediate incl.
    its packed-word K axis, q_dim words, kv heads — divides by 2)."""
    import dataclasses

    from bitdelta_tpu.models import config as cfgs

    base_cfg = cfgs.tiny_test_config(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, dtype="float32")
    cfg = mx.MixtralConfig(
        **{f.name: getattr(base_cfg, f.name)
           for f in dataclasses.fields(base_cfg)},
        num_experts=4, experts_per_token=2)
    base = mx.init_params(cfg, jax.random.PRNGKey(9), jnp.float32,
                          scale=0.25)
    return cfg, base


def test_mixtral_sharded_forward_matches_unsharded():
    from jax.sharding import NamedSharding

    from bitdelta_tpu.parallel import mesh as pmesh
    from bitdelta_tpu.parallel import sharding as psh

    cfg, base = _tp_world()
    comp = mx.compress_mixtral(base, _finetune(base, 41))
    sp = mx.mixtral_student_params(base, comp)
    toks = jnp.asarray(np.random.default_rng(3).integers(
        0, 96, (4, 8), dtype=np.int64))
    ref = np.asarray(mx.forward(cfg, sp, toks, deltas=comp.deltas,
                                compute_dtype=jnp.float32))

    mesh = pmesh.make_mesh((2, 2), devices=jax.devices()[:4])
    spd = psh.shard_model(cfg, sp, mesh)
    sd = psh.shard_deltas(cfg, comp.deltas, mesh)
    # Expert matrices actually partition on the intermediate axis.
    w1 = spd["layers"]["w1"]
    assert w1.sharding.shard_shape(w1.shape) == (
        cfg.num_layers, cfg.num_experts, cfg.hidden_size,
        cfg.intermediate_size // 2)
    toks_sh = jax.device_put(toks, NamedSharding(mesh, psh.batch_spec()))
    out = jax.jit(lambda p, d, t: mx.forward(
        cfg, p, t, deltas=d, compute_dtype=jnp.float32))(spd, sd, toks_sh)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_mixtral_mesh_engine_matches_single_device():
    """Engine(mesh=..., model=mixtral): GSPMD-sharded multi-tenant MoE
    serving must greedy-match the single-device engine exactly."""
    from bitdelta_tpu.parallel import mesh as pmesh
    from bitdelta_tpu.serving.engine import Engine, Request
    from bitdelta_tpu.serving.stacking import stack_tenants

    cfg, base = _tp_world()
    tenants = [mx.compress_mixtral(base, _finetune(base, 700 + t))
               for t in range(2)]
    stack = stack_tenants(cfg, base, tenants)

    def run(mesh):
        eng = Engine(cfg, stack, max_slots=2, max_seq=64,
                     prefill_buckets=(16,), kernel="xla", model=mx,
                     mesh=mesh, compute_dtype=jnp.float32)
        return eng.generate(
            [Request(prompt_ids=[5, 11, 3, 7], tenant_id=t,
                     max_new_tokens=5) for t in range(2)])

    want = run(None)
    got = run(pmesh.make_mesh((2, 2), devices=jax.devices()[:4]))
    assert got == want
    assert want[0] != want[1]


def test_mixtral_pallas_engine_matches_xla(hf_mixtral):
    """Single-device kernel='pallas' Mixtral serving (attention
    projections through the VPU delta kernels, experts on XLA) must
    greedy-match the XLA engine exactly (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from bitdelta_tpu.serving.engine import Engine, Request
    from bitdelta_tpu.serving.stacking import stack_tenants

    hf_cfg, model = hf_mixtral
    cfg = mx.MixtralConfig.from_hf_config(hf_cfg)
    base = mx.params_from_torch_mixtral(cfg, model, jnp.float32)
    tenants = [mx.compress_mixtral(base, _finetune(base, 900 + t))
               for t in range(2)]
    stack = stack_tenants(cfg, base, tenants)
    reqs = lambda: [Request(prompt_ids=[5, 11, 3, 7], tenant_id=t,
                            max_new_tokens=4) for t in range(2)]

    want = Engine(cfg, stack, max_slots=2, max_seq=64,
                  prefill_buckets=(16,), kernel="xla", model=mx,
                  compute_dtype=jnp.float32).generate(reqs())
    with pltpu.force_tpu_interpret_mode():
        got = Engine(cfg, stack, max_slots=2, max_seq=64,
                     prefill_buckets=(16,), kernel="pallas", model=mx,
                     compute_dtype=jnp.float32).generate(reqs())
    assert got == want


def test_mixtral_compressed_embeddings_serving(hf_mixtral):
    """compress_embeddings for Mixtral: embed/lm_head become 1-bit
    deltas against the base (no per-tenant dense (V, D) tensors), and
    the engine's greedy decode matches manual full-forward generation
    through the same deltas."""
    from bitdelta_tpu.serving.engine import Engine, Request
    from bitdelta_tpu.serving.stacking import stack_nbytes, stack_tenants

    hf_cfg, model = hf_mixtral
    cfg = mx.MixtralConfig.from_hf_config(hf_cfg)
    base = mx.params_from_torch_mixtral(cfg, model, jnp.float32)

    tenants = []
    for t in range(2):
        fine = _finetune(base, 800 + t)
        key = jax.random.PRNGKey(850 + t)
        k1, k2 = jax.random.split(key)
        fine["embed"] = base["embed"] + 0.02 * jax.random.normal(
            k1, base["embed"].shape)
        fine["lm_head"] = base["lm_head"] + 0.02 * jax.random.normal(
            k2, base["lm_head"].shape)
        tenants.append(mx.compress_mixtral(base, fine,
                                           compress_embeddings=True))
    assert "embed" in tenants[0].deltas and "lm_head" in tenants[0].deltas
    assert "embed" not in tenants[0].extras

    stack = stack_tenants(cfg, base, tenants)
    # Shared base embed (2-D), not per-tenant stacked.
    assert stack.params["embed"].ndim == 2
    nb = stack_nbytes(stack)

    dense_tenants = [mx.compress_mixtral(
        base, dict(_finetune(base, 800 + t),
                   embed=base["embed"], lm_head=base["lm_head"]))
        for t in range(2)]
    nb_dense = stack_nbytes(stack_tenants(cfg, base, dense_tenants))
    assert nb["tenant_extras_bytes"] < 0.3 * nb_dense["tenant_extras_bytes"]

    eng = Engine(cfg, stack, max_slots=2, max_seq=64,
                 prefill_buckets=(16,), kernel="xla", model=mx,
                 compute_dtype=jnp.float32)
    prompt = [5, 11, 3, 7]
    outs = eng.generate([Request(prompt_ids=prompt, tenant_id=t,
                                 max_new_tokens=5) for t in range(2)])
    for t in range(2):
        sp = mx.mixtral_student_params(base, tenants[t])
        ids, manual = list(prompt), []
        for _ in range(5):
            logits = mx.forward(cfg, sp, jnp.asarray([ids]),
                                deltas=tenants[t].deltas,
                                compute_dtype=jnp.float32)
            nxt = int(jnp.argmax(logits[0, -1]))
            manual.append(nxt)
            ids.append(nxt)
        assert outs[t] == manual, f"tenant {t}"
    assert outs[0] != outs[1]


def test_mixtral_sliding_window_flash_decode_matches_xla(hf_mixtral):
    """The Mixtral flash-decode wiring under a real sliding window
    (reference Mistral-MoE configs ship sliding_window=4096): decode
    PAST the window so the kernel's live-block windowing actually bites,
    and logits must match the XLA masked-attention path step by step."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    hf_cfg, model = hf_mixtral
    cfg = mx.MixtralConfig.from_hf_config(hf_cfg)
    cfg = dataclasses.replace(cfg, sliding_window=4)
    base = mx.params_from_torch_mixtral(cfg, model, jnp.float32)
    comp = mx.compress_mixtral(base, _finetune(base, 77))
    sp = mx.mixtral_student_params(base, comp)

    rng = np.random.default_rng(3)
    full = rng.integers(0, 96, (2, 12), dtype=np.int64)
    prompt_len = 3
    lengths = jnp.asarray([prompt_len, prompt_len], jnp.int32)
    _, cache = mx.forward(cfg, sp, jnp.asarray(full[:, :prompt_len]),
                          lengths=lengths, deltas=comp.deltas,
                          compute_dtype=jnp.float32,
                          return_cache=True, cache_max_seq=16)
    cache_p = cache
    for i in range(prompt_len, full.shape[1]):  # crosses length > window
        tok = jnp.asarray(full[:, i:i + 1])
        want, cache = mx.decode_step(cfg, sp, tok, cache,
                                     deltas=comp.deltas,
                                     compute_dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got, cache_p = mx.decode_step(cfg, sp, tok, cache_p,
                                          deltas=comp.deltas,
                                          compute_dtype=jnp.float32,
                                          kernel="pallas")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def _synthetic_world(num_tenants=3, intermediate=256, hidden=128):
    """Random Mixtral world with shapes that make w1/w3 pair-ELIGIBLE
    (I % 256 == 0) and w2 pair-INELIGIBLE (D=128 < 256), so the routed
    decode path exercises the pair VPU kernel AND the canonical
    bit-plane kernel in one forward."""
    cfg = mx.MixtralConfig(
        vocab_size=512, hidden_size=hidden, intermediate_size=intermediate,
        num_layers=2, num_heads=4, num_kv_heads=2, max_seq_len=64,
        num_experts=4, experts_per_token=2)
    base = mx.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    tenants = []
    for t in range(num_tenants):
        fine = jax.tree.map(
            lambda v, key=jax.random.PRNGKey(100 + t): v
            + 0.01 * jax.random.normal(key, v.shape), base)
        tenants.append(mx.compress_mixtral(base, fine,
                                           compress_embeddings=True))
    return cfg, base, tenants


def _decode_inputs(cfg, batch):
    cache = mx.KVCache(
        k=jnp.zeros((cfg.num_layers, batch, 32, cfg.num_kv_heads,
                     cfg.head_dim), jnp.float32),
        v=jnp.zeros((cfg.num_layers, batch, 32, cfg.num_kv_heads,
                     cfg.head_dim), jnp.float32),
        length=jnp.full((batch,), 5, jnp.int32))
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(1, cfg.vocab_size, (batch, 1)))
    return tokens.astype(jnp.int32), cache


def test_mixtral_routed_expert_deltas_match_dense_fusion():
    """The routed expert-delta decode (top-k packed streams through the
    tenant kernels, _moe_ffn's routed branch) must equal a per-tenant
    DENSE delta fusion — the ground truth that doesn't share any routing
    code with the path under test."""
    from bitdelta_tpu.core.delta import apply_delta
    from bitdelta_tpu.serving.stacking import stack_tenants

    cfg, base, tenants = _synthetic_world()
    stack = stack_tenants(cfg, base, tenants)
    tenant_ids = jnp.array([0, 1, 2, 1], jnp.int32)
    tokens, cache = _decode_inputs(cfg, 4)
    got, _ = mx.decode_step(cfg, stack.params, tokens, cache,
                            deltas=stack.deltas, tenant_ids=tenant_ids,
                            compute_dtype=jnp.float32, kernel="xla")

    for row in range(4):
        t = int(tenant_ids[row])
        c = tenants[t]
        p = dict(base)
        p["layers"] = dict(base["layers"])
        for name in mx.MOE_PARTS:
            p["layers"][name] = apply_delta(base["layers"][name],
                                            c.deltas[name])
        p["final_norm"] = c.extras["final_norm"]
        p["layers"]["attn_norm"] = c.extras["attn_norm"]
        p["layers"]["mlp_norm"] = c.extras["mlp_norm"]
        emb_d = apply_delta(
            jnp.zeros_like(jnp.swapaxes(base["embed"], -1, -2)),
            c.deltas["embed"])
        p["embed"] = base["embed"] + jnp.swapaxes(emb_d, -1, -2)
        p["lm_head"] = apply_delta(base["lm_head"], c.deltas["lm_head"])
        cache1 = mx.KVCache(k=cache.k[:, row:row + 1],
                            v=cache.v[:, row:row + 1],
                            length=cache.length[row:row + 1])
        want, _ = mx.decode_step(cfg, p, tokens[row:row + 1], cache1,
                                 compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got[row]),
                                   np.asarray(want[0]),
                                   rtol=2e-5, atol=2e-5)


def test_mixtral_routed_pallas_pair_matches_xla():
    """Routed decode through the PAIR-packed VPU kernel (w1/w3) + the
    canonical bit-plane kernel (w2, pair-ineligible at D=128) equals the
    routed XLA lowering. Also asserts to_pair_layout now pairs the
    eligible expert stacks."""
    from jax.experimental.pallas import tpu as pltpu

    from bitdelta_tpu.core.delta import PairedBinaryDelta
    from bitdelta_tpu.serving.stacking import stack_tenants, to_pair_layout

    cfg, base, tenants = _synthetic_world()
    stack = stack_tenants(cfg, base, tenants)
    paired = to_pair_layout(stack)
    assert isinstance(paired.deltas["w1"], PairedBinaryDelta)
    assert isinstance(paired.deltas["w3"], PairedBinaryDelta)
    assert not isinstance(paired.deltas["w2"], PairedBinaryDelta)

    tenant_ids = jnp.array([0, 1, 2, 1], jnp.int32)
    tokens, cache = _decode_inputs(cfg, 4)
    ref, _ = mx.decode_step(cfg, stack.params, tokens, cache,
                            deltas=stack.deltas, tenant_ids=tenant_ids,
                            compute_dtype=jnp.float32, kernel="xla")
    with pltpu.force_tpu_interpret_mode():
        got, _ = mx.decode_step(cfg, paired.params, tokens, cache,
                                deltas=paired.deltas,
                                tenant_ids=tenant_ids,
                                compute_dtype=jnp.float32,
                                kernel="pallas")
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale,
                               rtol=0, atol=3e-4)


def test_mixtral_routed_single_tenant_decode():
    """tenant_ids=None decode also rides the routed path (stack axis =
    experts only) and must keep matching the full forward's last-token
    logits (no tenant flattening bugs in the single-tenant case)."""
    cfg, base, tenants = _synthetic_world(num_tenants=1)
    comp = tenants[0]
    sp = mx.mixtral_student_params(base, comp)
    rng = np.random.default_rng(7)
    toks = rng.integers(1, cfg.vocab_size, (2, 6))
    prompt = jnp.asarray(toks[:, :5], jnp.int32)
    lengths = jnp.full((2,), 5, jnp.int32)
    _, cache = mx.forward(cfg, sp, prompt, lengths=lengths,
                          deltas=comp.deltas, compute_dtype=jnp.float32,
                          return_cache=True, cache_max_seq=16)
    step, _ = mx.decode_step(cfg, sp, jnp.asarray(toks[:, 5:6], jnp.int32),
                             cache, deltas=comp.deltas,
                             compute_dtype=jnp.float32)
    full = mx.forward(cfg, sp, jnp.asarray(toks, jnp.int32),
                      deltas=comp.deltas, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(step[:, 0]),
                               np.asarray(full[:, -1]),
                               rtol=2e-4, atol=2e-4)


def test_mixtral_tp_pallas_shardmap_matches_single_device():
    """Mixtral TP + kernel='pallas' (previously rejected): the shard_map
    decode body runs the routed expert-delta kernels on LOCAL expert
    slices (w1/w3 column-parallel on I, w2 row-parallel with one psum
    per MoE block, router replicated) — greedy tokens must equal the
    single-device XLA engine exactly."""
    from jax.experimental.pallas import tpu as pltpu

    from bitdelta_tpu.parallel import mesh as pmesh
    from bitdelta_tpu.serving.engine import Engine, Request
    from bitdelta_tpu.serving.stacking import stack_tenants

    cfg, base = _tp_world()
    tenants = [mx.compress_mixtral(base, _finetune(base, 810 + t))
               for t in range(2)]
    stack = stack_tenants(cfg, base, tenants)
    reqs = [Request(prompt_ids=[5, 11, 3, 7], tenant_id=t,
                    max_new_tokens=5) for t in range(2)]

    want = Engine(cfg, stack, max_slots=2, max_seq=64,
                  prefill_buckets=(16,), kernel="xla", model=mx,
                  compute_dtype=jnp.float32).generate(reqs)
    mesh = pmesh.make_mesh((1, 2), devices=jax.devices()[:2])
    with pltpu.force_tpu_interpret_mode():
        eng = Engine(cfg, stack, max_slots=2, max_seq=64,
                     prefill_buckets=(16,), kernel="pallas", model=mx,
                     mesh=mesh, compute_dtype=jnp.float32)
        got = eng.generate(reqs)
    assert got == want
    assert want[0] != want[1]


def test_mixtral_w8_base_serving_matches_dequantized_dense():
    """W8 Mixtral serving (int8 attention + EXPERT stacks, dense
    router): an Engine over quantize_mixtral_base_projections
    greedy-matches the same model with the dequantized dense base —
    the deploy-density Mixtral mode (the reference never quantized or
    served Mixtral; bitdelta/misc.py:34-67 only explored its weights)."""
    from bitdelta_tpu.research.quantized_base import (
        Int8Weight, dequantize_base_projections,
        quantize_mixtral_base_projections)
    from bitdelta_tpu.serving.engine import Engine, Request
    from bitdelta_tpu.serving.stacking import stack_tenants

    cfg, dense = _tp_world()
    qbase = quantize_mixtral_base_projections(dense)
    assert isinstance(qbase["layers"]["w1"], Int8Weight)
    assert qbase["layers"]["w1"].scale.shape == (
        cfg.num_layers, cfg.num_experts, cfg.intermediate_size)
    deq = dequantize_base_projections(qbase, jnp.float32)

    # Deltas against the dequantized base — the W8+W1 recipe.
    tenants = [mx.compress_mixtral(deq, _finetune(deq, 900 + t))
               for t in range(2)]

    outs = {}
    for name, b in (("dense", deq), ("int8", qbase)):
        stack = stack_tenants(cfg, b, tenants)
        eng = Engine(cfg, stack, max_slots=2, max_seq=64,
                     prefill_buckets=(16,), kernel="xla", model=mx,
                     compute_dtype=jnp.float32)
        outs[name] = eng.generate(
            [Request(prompt_ids=[3, 9, 4], tenant_id=t, max_new_tokens=6)
             for t in range(2)])
    assert outs["dense"] == outs["int8"]
    assert outs["dense"][0] != outs["dense"][1]
