"""Model-layer tests.

Parity anchor: a tiny random transformers LlamaForCausalLM /
MistralForCausalLM run in fp32 on CPU must produce the same logits as our
JAX forward on the imported weights. This pins RMSNorm/RoPE/GQA/SwiGLU
semantics to the HF family the reference compresses.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdelta_tpu.models import config as cfgs
from bitdelta_tpu.models import llama as jl
from bitdelta_tpu.models.hf_import import params_from_torch_model


def _tiny_hf_llama(seed=0, **kw):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    cfg_kw = dict(
        vocab_size=128, hidden_size=64, intermediate_size=144,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    cfg_kw.update(kw)
    hf_cfg = LlamaConfig(**cfg_kw)
    model = LlamaForCausalLM(hf_cfg).eval().float()
    return hf_cfg, model


def _tiny_hf_mistral(seed=1, sliding_window=8):
    import torch
    from transformers import MistralConfig, MistralForCausalLM

    torch.manual_seed(seed)
    hf_cfg = MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6,
        sliding_window=sliding_window, attn_implementation="eager",
    )
    model = MistralForCausalLM(hf_cfg).eval().float()
    return hf_cfg, model


def _logits_parity(hf_cfg, torch_model, tokens_np, sliding_window=None):
    import torch

    cfg = cfgs.ModelConfig.from_hf_config(hf_cfg)
    if sliding_window is not None:
        assert cfg.sliding_window == sliding_window
    params = params_from_torch_model(cfg, torch_model, jnp.float32)

    with torch.no_grad():
        ref = torch_model(torch.tensor(tokens_np)).logits.numpy()

    ours = np.asarray(jl.forward(cfg, params, jnp.asarray(tokens_np),
                                 compute_dtype=jnp.float32))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_llama_logits_match_transformers():
    hf_cfg, model = _tiny_hf_llama()
    tokens = np.random.default_rng(0).integers(0, 128, (2, 16), dtype=np.int64)
    _logits_parity(hf_cfg, model, tokens)


def test_mistral_logits_match_transformers_with_sliding_window():
    # seq length (24) > sliding_window (8) so the window actually bites.
    hf_cfg, model = _tiny_hf_mistral(sliding_window=8)
    tokens = np.random.default_rng(1).integers(0, 128, (1, 24), dtype=np.int64)
    _logits_parity(hf_cfg, model, tokens, sliding_window=8)


def test_gqa_grouping_matches_mha_when_kv_equals_heads():
    hf_cfg, model = _tiny_hf_llama(seed=2, num_key_value_heads=4)
    tokens = np.random.default_rng(2).integers(0, 128, (2, 8), dtype=np.int64)
    _logits_parity(hf_cfg, model, tokens)


def test_padded_rows_do_not_change_valid_logits():
    cfg = cfgs.tiny_test_config()
    params = jl.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    toks = rng.integers(0, cfg.vocab_size, (1, 8), dtype=np.int64)
    full = np.asarray(jl.forward(cfg, params, jnp.asarray(toks),
                                 compute_dtype=jnp.float32))
    padded = np.concatenate([toks, rng.integers(0, cfg.vocab_size, (1, 4))],
                            axis=1)
    out = np.asarray(jl.forward(cfg, params, jnp.asarray(padded),
                                lengths=jnp.asarray([8], jnp.int32),
                                compute_dtype=jnp.float32))
    np.testing.assert_allclose(out[:, :8], full, rtol=1e-5, atol=1e-5)


def test_decode_matches_full_forward():
    # Prefill + step-by-step decode must reproduce the full-sequence
    # forward logits at every position.
    cfg = cfgs.tiny_test_config()
    params = jl.init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(4)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 10), dtype=np.int64))

    full = np.asarray(jl.forward(cfg, params, toks, compute_dtype=jnp.float32))

    prefill_len = 6
    logits, cache = jl.forward(cfg, params, toks[:, :prefill_len],
                               compute_dtype=jnp.float32,
                               return_cache=True, cache_max_seq=16)
    np.testing.assert_allclose(np.asarray(logits), full[:, :prefill_len],
                               rtol=1e-5, atol=1e-5)
    for t in range(prefill_len, 10):
        step_logits, cache = jl.decode_step(cfg, params, toks[:, t:t + 1],
                                            cache, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(step_logits)[:, 0], full[:, t],
                                   rtol=1e-4, atol=1e-4)
    assert int(cache.length[0]) == 10


def test_decode_with_unequal_lengths():
    # Rows with different prompt lengths decode independently and match
    # their own single-row runs (continuous-batching invariant).
    cfg = cfgs.tiny_test_config()
    params = jl.init_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(5)
    t0 = rng.integers(0, cfg.vocab_size, (7,), dtype=np.int64)
    t1 = rng.integers(0, cfg.vocab_size, (4,), dtype=np.int64)

    # Batched: row1 right-padded to 7 with garbage.
    toks = np.stack([t0, np.concatenate([t1, np.full(3, 99)])])
    _, cache = jl.forward(cfg, params, jnp.asarray(toks),
                          lengths=jnp.asarray([7, 4], jnp.int32),
                          compute_dtype=jnp.float32, return_cache=True,
                          cache_max_seq=12)
    nxt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 1), dtype=np.int64))
    step, cache = jl.decode_step(cfg, params, nxt, cache,
                                 compute_dtype=jnp.float32)

    for row, prompt in ((0, t0), (1, t1)):
        _, c1 = jl.forward(cfg, params, jnp.asarray(prompt[None]),
                           compute_dtype=jnp.float32, return_cache=True,
                           cache_max_seq=12)
        s1, _ = jl.decode_step(cfg, params, nxt[row:row + 1], c1,
                               compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(step)[row, 0],
                                   np.asarray(s1)[0, 0], rtol=1e-4, atol=1e-4)


def test_sliding_window_decode_matches_full_forward():
    # Mistral-style local attention must hold during cached decode too:
    # decode positions beyond the window must ignore old cache slots.
    cfg = cfgs.tiny_test_config(sliding_window=6)
    params = jl.init_params(cfg, jax.random.PRNGKey(9))
    toks = jnp.asarray(np.random.default_rng(9).integers(
        0, cfg.vocab_size, (1, 14), dtype=np.int64))

    full = np.asarray(jl.forward(cfg, params, toks,
                                 compute_dtype=jnp.float32))
    _, cache = jl.forward(cfg, params, toks[:, :4],
                          compute_dtype=jnp.float32, return_cache=True,
                          cache_max_seq=20)
    for t in range(4, 14):
        step, cache = jl.decode_step(cfg, params, toks[:, t:t + 1], cache,
                                     compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(step)[0, 0], full[0, t],
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"position {t}")


def test_forward_with_deltas_matches_dense_fused():
    # forward(deltas=...) == forward on dense-fused params (the
    # eval-vs-serving consistency the reference never verified).
    from bitdelta_tpu.core.delta import quantize_delta, apply_delta

    cfg = cfgs.tiny_test_config()
    base = jl.init_params(cfg, jax.random.PRNGKey(3))
    fine = jl.init_params(cfg, jax.random.PRNGKey(4))
    # Fine-tune = base + small change, on proj weights only.
    fused = jax.tree.map(lambda a: a, base)
    deltas = {}
    for name in jl.PROJ_NAMES:
        wf = base["layers"][name] + 0.01 * fine["layers"][name]
        d = quantize_delta(base["layers"][name], wf)
        deltas[name] = d
        fused["layers"][name] = apply_delta(base["layers"][name], d)

    toks = jnp.asarray(np.random.default_rng(6).integers(
        0, cfg.vocab_size, (2, 8), dtype=np.int64))
    y_delta = np.asarray(jl.forward(cfg, base, toks, deltas=deltas,
                                    compute_dtype=jnp.float32))
    y_dense = np.asarray(jl.forward(cfg, fused, toks,
                                    compute_dtype=jnp.float32))
    np.testing.assert_allclose(y_delta, y_dense, rtol=5e-4, atol=5e-4)


def test_tied_embeddings():
    cfg = cfgs.tiny_test_config(tie_word_embeddings=True)
    params = jl.init_params(cfg, jax.random.PRNGKey(5))
    assert "lm_head" not in params
    toks = jnp.asarray([[1, 2, 3]])
    logits = jl.forward(cfg, params, toks, compute_dtype=jnp.float32)
    assert logits.shape == (1, 3, cfg.vocab_size)


def test_llama31_rope_scaling_matches_transformers():
    # Llama-3.1-style wavelength-warped RoPE: seq > original_max/4 so the
    # warp actually changes frequencies vs plain theta.
    hf_cfg, model = _tiny_hf_llama(
        seed=7,
        rope_scaling={"rope_type": "llama3", "factor": 4.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 16},
        max_position_embeddings=64, rope_theta=10000.0)
    tokens = np.random.default_rng(7).integers(0, 128, (1, 48),
                                               dtype=np.int64)
    cfg = cfgs.ModelConfig.from_hf_config(hf_cfg)
    assert cfg.rope_scaling is not None
    assert cfg.rope_scaling.rope_type == "llama3"
    _logits_parity(hf_cfg, model, tokens)


def test_linear_rope_scaling_matches_transformers():
    hf_cfg, model = _tiny_hf_llama(
        seed=8, rope_scaling={"rope_type": "linear", "factor": 2.0})
    tokens = np.random.default_rng(8).integers(0, 128, (1, 24),
                                               dtype=np.int64)
    cfg = cfgs.ModelConfig.from_hf_config(hf_cfg)
    assert cfg.rope_scaling.rope_type == "linear"
    _logits_parity(hf_cfg, model, tokens)


def _tiny_hf_qwen2(seed=9):
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(seed)
    hf_cfg = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager",
        sliding_window=None, use_sliding_window=False)
    model = Qwen2ForCausalLM(hf_cfg).eval().float()
    return hf_cfg, model


def test_qwen2_logits_match_transformers():
    # Qwen2 = llama arch + q/k/v biases; parity pins the bias path.
    hf_cfg, model = _tiny_hf_qwen2()
    cfg = cfgs.ModelConfig.from_hf_config(hf_cfg)
    assert cfg.attention_bias
    tokens = np.random.default_rng(9).integers(0, 128, (2, 16),
                                               dtype=np.int64)
    _logits_parity(hf_cfg, model, tokens)


def test_qwen2_compress_and_decode():
    # Fine-tune with changed weights AND biases; compression carries the
    # biases as extras, cached decode matches the full forward.
    from bitdelta_tpu.core.compress import compress_model, student_params

    hf_cfg, model = _tiny_hf_qwen2(seed=10)
    cfg = cfgs.ModelConfig.from_hf_config(hf_cfg)
    base = params_from_torch_model(cfg, model, jnp.float32)
    fine = dict(base)
    fine["layers"] = dict(base["layers"])
    key = jax.random.PRNGKey(10)
    for name in jl.PROJ_NAMES + ("q_bias", "k_bias", "v_bias"):
        key, sub = jax.random.split(key)
        fine["layers"][name] = base["layers"][name] + (
            0.03 * jax.random.normal(sub, base["layers"][name].shape))

    comp = compress_model(base, fine)
    assert "q_bias" in comp.extras
    sp = student_params(base, comp)
    # Student uses the fine-tune's biases verbatim.
    np.testing.assert_array_equal(np.asarray(sp["layers"]["q_bias"]),
                                  np.asarray(fine["layers"]["q_bias"]))

    toks = jnp.asarray(np.random.default_rng(3).integers(
        0, 128, (2, 10), dtype=np.int64))
    want = np.asarray(jl.forward(cfg, sp, toks, deltas=comp.deltas,
                                 compute_dtype=jnp.float32))
    _, cache = jl.forward(cfg, sp, toks[:, :6], deltas=comp.deltas,
                          compute_dtype=jnp.float32, return_cache=True,
                          cache_max_seq=16)
    for i in range(6, 10):
        logits, cache = jl.decode_step(cfg, sp, toks[:, i:i + 1], cache,
                                       deltas=comp.deltas,
                                       compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(logits[:, 0]), want[:, i],
                                   rtol=2e-4, atol=2e-4)
