"""Vocab-extended fine-tunes and non-English evaluation (offline).

The reference handles fine-tunes whose tokenizer grew past the base
vocab by keeping the fine-tune's own embed/lm_head uncompressed
(reference bitdelta/diff.py:96-97) and evaluates multilingual
fine-tunes in notebooks/multilingual_eval.ipynb (a scenario that
usually comes with exactly such vocab growth). This environment has no
network, so both are exercised synthetically:

  * a "grown-vocab" tenant (extra embedding/head rows) serves NEXT TO a
    normal tenant in one engine — ragged-vocab padding + per-tenant
    logit masking end-to-end;
  * perplexity evaluation over a non-ASCII (Cyrillic/Greek/CJK) corpus
    through the byte-fallback tokenizer, dense-fused vs
    compressed-kernel parity, and a fine-tune constructed to favor the
    corpus's bytes must show lower PPL than the base.
"""

import numpy as np
import jax
import jax.numpy as jnp

from bitdelta_tpu.core.compress import compress_model, student_params
from bitdelta_tpu.models import config as cfgs
from bitdelta_tpu.models import llama as jl
from bitdelta_tpu.serving.engine import Engine, Request
from bitdelta_tpu.serving.stacking import stack_tenants


BASE_V, GROWN_V = 64, 96


def _world():
    cfg = cfgs.tiny_test_config(vocab_size=BASE_V, hidden_size=64,
                                intermediate_size=128, num_layers=2,
                                num_heads=4, num_kv_heads=2,
                                dtype="float32")
    base = jl.init_params(cfg, jax.random.PRNGKey(0), jnp.float32,
                          scale=0.25)

    def perturb(params, seed):
        fine = dict(params)
        fine["layers"] = dict(params["layers"])
        key = jax.random.PRNGKey(seed)
        for name in jl.PROJ_NAMES:
            key, sub = jax.random.split(key)
            fine["layers"][name] = params["layers"][name] + (
                0.05 * jax.random.normal(sub, params["layers"][name].shape))
        return fine

    # Tenant 0: normal fine-tune, base vocab.
    normal = perturb(base, 11)

    # Tenant 1: vocab grown 64 -> 96 (the fine-tune added tokens); its
    # embed/lm_head carry extra rows/cols the base never had. New-token
    # embeddings get distinct values so generation can actually reach
    # and use them.
    grown = perturb(base, 22)
    key = jax.random.PRNGKey(33)
    k1, k2 = jax.random.split(key)
    grown["embed"] = jnp.concatenate([
        grown["embed"],
        0.25 * jax.random.normal(k1, (GROWN_V - BASE_V, 64))], axis=0)
    grown["lm_head"] = jnp.concatenate([
        grown["lm_head"],
        0.25 * jax.random.normal(k2, (64, GROWN_V - BASE_V))], axis=1)

    tenants = [compress_model(base, normal), compress_model(base, grown)]
    return cfg, base, normal, grown, tenants


def test_grown_vocab_tenant_serves_next_to_normal_tenant():
    cfg, base, normal, grown, tenants = _world()
    stack = stack_tenants(cfg, base, tenants)
    # Ragged vocabs recorded and right-padded to the largest.
    assert list(np.asarray(stack.vocab_sizes)) == [BASE_V, GROWN_V]
    assert stack.params["embed"].shape == (2, GROWN_V, 64)

    eng = Engine(cfg, stack, max_slots=2, max_seq=64,
                 prefill_buckets=(16,), kernel="xla",
                 compute_dtype=jnp.float32)
    # The grown tenant's prompt uses NEW tokens (>= base vocab).
    prompts = {0: [3, 9, 4, 7], 1: [70, 88, 65, 5]}
    outs = eng.generate([Request(prompt_ids=prompts[t], tenant_id=t,
                                 max_new_tokens=6) for t in range(2)])

    # Engine output == manual full-forward greedy per tenant, through
    # each tenant's OWN (unpadded) params.
    for t, params in ((0, normal), (1, grown)):
        sp = student_params(base, tenants[t])
        # student params carry the fine-tune's own-vocab extras
        assert sp["embed"].shape[0] == (GROWN_V if t else BASE_V)
        ids = list(prompts[t])
        manual = []
        for _ in range(6):
            logits = jl.forward(cfg, sp, jnp.asarray([ids]),
                                deltas=tenants[t].deltas,
                                compute_dtype=jnp.float32)
            nxt = int(jnp.argmax(logits[0, -1]))
            manual.append(nxt)
            ids.append(nxt)
        assert outs[t] == manual, f"tenant {t}"

    # The normal tenant can never emit a grown-vocab token id.
    assert all(tok < BASE_V for tok in outs[0])


def test_grown_vocab_logit_masking_under_sampling():
    """Even at high temperature, padded vocab rows are -inf for the
    small-vocab tenant: thousands of samples never cross its vocab."""
    cfg, base, normal, grown, tenants = _world()
    stack = stack_tenants(cfg, base, tenants)
    eng = Engine(cfg, stack, max_slots=2, max_seq=64,
                 prefill_buckets=(16,), kernel="xla",
                 compute_dtype=jnp.float32, seed=123)
    reqs = [Request(prompt_ids=[3, 9, 4], tenant_id=0, max_new_tokens=40,
                    temperature=5.0),
            Request(prompt_ids=[70, 88, 65], tenant_id=1,
                    max_new_tokens=40, temperature=5.0)]
    outs = eng.generate(reqs)
    assert all(tok < BASE_V for tok in outs[0]), outs[0]
    assert all(tok < GROWN_V for tok in outs[1])
    # The grown tenant's high-temperature stream actually visits its
    # extended range (0.25 prob mass/token of being >= 64 over 40
    # draws makes a miss astronomically unlikely).
    assert any(tok >= BASE_V for tok in outs[1]), outs[1]


# ---------------------------------------------------------------------------
# Non-English (multilingual) perplexity, fully offline
# ---------------------------------------------------------------------------

MULTILINGUAL_TEXTS = [
    "Быстрая бурая лиса прыгает через ленивую собаку.",
    "Η γρήγορη καφέ αλεπού πηδά πάνω από το τεμπέλικο σκυλί.",
    "素早い茶色の狐はのろまな犬を飛び越える。",
    "빠른 갈색 여우가 게으른 개를 뛰어넘는다.",
    "Der schnelle braune Fuchs springt über den faulen Hund.",
] * 6


def _finetune_on_corpus(cfg, base, ids, steps=60, lr=3e-3):
    """A real (tiny) fine-tune: next-token CE on the corpus, all
    weights trainable — the honest version of what the reference's
    multilingual fine-tunes are."""
    import optax

    opt = optax.adam(lr)
    params = jax.tree.map(lambda x: x, base)
    state = opt.init(params)
    win = 64
    starts = np.arange(0, ids.size - win - 1, 17)

    @jax.jit
    def step(params, state, batch):
        def loss_fn(p):
            logits = jl.forward(cfg, p, batch, compute_dtype=jnp.float32)
            lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
            tgt = batch[:, 1:]
            nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state2 = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state2, loss

    rng = np.random.default_rng(0)
    first = last = None
    for i in range(steps):
        sel = rng.choice(starts, size=4)
        batch = jnp.asarray(np.stack([ids[s:s + win + 1] for s in sel]))
        params, state, loss = step(params, state, batch)
        first = float(loss) if first is None else first
        last = float(loss)
    assert last < first  # training actually moved
    return params


def test_multilingual_ppl_compressed_path_and_finetune_gain():
    from bitdelta_tpu.eval.ppl import eval_ppl, tokenize_corpus
    from bitdelta_tpu.core.compress import fuse_compressed
    from bitdelta_tpu.serving.server import ByteTokenizer

    tok = ByteTokenizer()
    ids = tokenize_corpus(tok, MULTILINGUAL_TEXTS)
    assert ids.max() > 127  # genuinely non-ASCII bytes in the corpus

    cfg = cfgs.tiny_test_config(vocab_size=tok.vocab_size + 2,
                                hidden_size=64, intermediate_size=128,
                                num_layers=2, num_heads=4, num_kv_heads=2,
                                dtype="float32")
    base = jl.init_params(cfg, jax.random.PRNGKey(1), jnp.float32,
                          scale=0.25)
    fine = _finetune_on_corpus(cfg, base, ids)
    comp = compress_model(base, fine)

    kw = dict(context_size=64, window_size=32, compute_dtype=jnp.float32)
    ppl_base = eval_ppl(cfg, base, ids, **kw)
    ppl_fine = eval_ppl(cfg, fine, ids, **kw)
    ppl_fused = eval_ppl(cfg, fuse_compressed(base, comp), ids, **kw)
    ppl_kernel = eval_ppl(cfg, student_params(base, comp), ids,
                          deltas=comp.deltas, **kw)
    # Compressed-kernel eval == dense-fused eval (same math, different
    # lowering) on a non-English corpus.
    np.testing.assert_allclose(ppl_kernel, ppl_fused, rtol=1e-3)
    # The fine-tune improves its corpus, and 1-bit compression keeps
    # (most of) the gain — the reference's multilingual claim in
    # offline miniature.
    assert ppl_fine < ppl_base
    assert ppl_fused < ppl_base
