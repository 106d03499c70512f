"""Importing pre-quantized checkpoints (AutoGPTQ int4 / bnb int8) — the
reference's ``dequantize_model`` capability (misc.py:70-126), plus the
lossless symmetric-GPTQ -> Int4Weight fast path the reference lacks."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from bitdelta_tpu.models.quant_import import (dequantize_gptq,
                                              gptq_is_symmetric,
                                              int4_from_gptq,
                                              int8_from_bnb,
                                              load_gptq_params,
                                              unpack_gptq_nibbles)


def _pack_gptq(q: np.ndarray) -> np.ndarray:
    """(K, N) unsigned nibbles -> (K//8, N) int32, LSB-first (the
    AutoGPTQ storage layout; reference misc.py:81-87 inverse)."""
    k, n = q.shape
    u = q.astype(np.uint32).reshape(k // 8, 8, n)
    shifts = np.arange(8, dtype=np.uint32) * 4
    return np.bitwise_or.reduce(u << shifts[:, None], axis=1) \
        .view(np.int32)


def _pack_gptq_zeros(z: np.ndarray, shift: bool = True) -> np.ndarray:
    """(G, N) zero nibbles -> (G, N//8). Legacy format stores
    ``zero - 1`` (shift=True); gptq_v2 stores the zero unshifted."""
    g, n = z.shape
    u = (z.astype(np.uint32) - (1 if shift else 0)).reshape(g, n // 8, 8)
    shifts = np.arange(8, dtype=np.uint32) * 4
    return np.bitwise_or.reduce(u << shifts, axis=2).view(np.int32)


def _random_gptq_layer(rng, k, n, group, sym, fmt="gptq"):
    q = rng.integers(0, 16, (k, n)).astype(np.int32)
    g = k // group
    if sym:
        zeros = np.full((g, n), 8, np.int32)
    else:
        zeros = rng.integers(1, 16, (g, n)).astype(np.int32)
    scales = (0.01 + 0.1 * rng.random((g, n))).astype(np.float16)
    dense = ((q - zeros[np.arange(k) // group]).astype(np.float32)
             * scales.astype(np.float32)[np.arange(k) // group])
    return (_pack_gptq(q), _pack_gptq_zeros(zeros, shift=fmt == "gptq"),
            scales, dense)


def test_unpack_matches_reference_loop():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 16, (32, 8)).astype(np.int32)
    packed = _pack_gptq(q)
    # reference misc.py:84-86: row r of word r//8, nibble r%8
    ref = np.zeros_like(q)
    for row in range(q.shape[0]):
        ref[row] = (packed[row // 8].view(np.uint32)
                    >> np.uint32(4 * (row % 8))) & 0xF
    np.testing.assert_array_equal(unpack_gptq_nibbles(packed, 0), ref)
    np.testing.assert_array_equal(unpack_gptq_nibbles(packed, 0), q)


def test_dequantize_gptq_matches_formula():
    rng = np.random.default_rng(1)
    for sym in (True, False):
        qw, qz, sc, dense = _random_gptq_layer(rng, 64, 16, 16, sym)
        got = dequantize_gptq(qw, qz, sc)
        np.testing.assert_allclose(got, dense, rtol=1e-6, atol=1e-6)
        assert gptq_is_symmetric(qz) == sym


def test_dequantize_gptq_act_order_g_idx():
    """Permuted g_idx (act-order): dequant honors per-row groups."""
    rng = np.random.default_rng(2)
    qw, qz, sc, _ = _random_gptq_layer(rng, 64, 16, 16, sym=False)
    g_idx = rng.permutation(np.arange(64) // 16)
    q = unpack_gptq_nibbles(qw, 0)
    z = unpack_gptq_nibbles(qz, 1) + 1
    want = (q - z[g_idx]) * sc.astype(np.float32)[g_idx]
    got = dequantize_gptq(qw, qz, sc, g_idx)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert not gptq_is_symmetric(qz, g_idx, 64)


def test_int4_from_gptq_lossless():
    """Symmetric GPTQ -> Int4Weight is bit-lossless: our dequantizer
    reproduces the GPTQ dequant exactly, and the fused W4 matmul matches
    a dense matmul on the dequantized weights."""
    from bitdelta_tpu.research.quantized_base import (dequantize_int4,
                                                      int4_matmul)

    rng = np.random.default_rng(3)
    qw, qz, sc, dense = _random_gptq_layer(rng, 128, 32, 32, sym=True)
    w4 = int4_from_gptq(qw, qz, sc)
    np.testing.assert_allclose(np.asarray(dequantize_int4(w4)), dense,
                               rtol=1e-6, atol=1e-6)
    x = rng.standard_normal((4, 128)).astype(np.float32)
    y = np.asarray(int4_matmul(jnp.asarray(x), w4, jnp.float32))
    np.testing.assert_allclose(y, x @ dense, rtol=2e-4, atol=2e-4)


def test_int4_from_gptq_rejects_asymmetric():
    import pytest

    rng = np.random.default_rng(4)
    qw, qz, sc, _ = _random_gptq_layer(rng, 64, 16, 16, sym=False)
    with pytest.raises(ValueError, match="asymmetric"):
        int4_from_gptq(qw, qz, sc)


def test_int8_from_bnb_matches_reference_formula():
    from bitdelta_tpu.research.quantized_base import dequantize_int8

    rng = np.random.default_rng(5)
    cb = rng.integers(-127, 128, (24, 16)).astype(np.int8)  # (out, in)
    scb = (0.5 + rng.random(24)).astype(np.float32)
    w8 = int8_from_bnb(cb, scb)
    # reference misc.py:74-75: (CB * SCB[:, None]) / 127, (out, in)
    want = (cb.astype(np.float32) * scb[:, None] / 127.0).T
    np.testing.assert_allclose(np.asarray(dequantize_int8(w8)), want,
                               rtol=1e-6)


def _write_gptq_checkpoint(root, cfg, sym=True, group=16, seed=0,
                           fmt="gptq"):
    """Fabricate an AutoGPTQ-layout llama checkpoint on disk
    (``fmt="gptq_v2"``: zeros stored unshifted + quantize_config.json
    declaring checkpoint_format, the gptqmodel convention)."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(seed)
    D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    kv = cfg.kv_dim
    shapes = {"self_attn.q_proj": (D, D), "self_attn.k_proj": (D, kv),
              "self_attn.v_proj": (D, kv), "self_attn.o_proj": (D, D),
              "mlp.gate_proj": (D, I), "mlp.up_proj": (D, I),
              "mlp.down_proj": (I, D)}
    tensors = {
        "model.embed_tokens.weight":
            rng.standard_normal((V, D)).astype(np.float32) * 0.02,
        "model.norm.weight": np.ones((D,), np.float32),
        "lm_head.weight":
            rng.standard_normal((V, D)).astype(np.float32) * 0.02,
    }
    dense = {}
    for l in range(cfg.num_layers):
        pre = f"model.layers.{l}."
        tensors[pre + "input_layernorm.weight"] = np.ones((D,), np.float32)
        tensors[pre + "post_attention_layernorm.weight"] = \
            np.ones((D,), np.float32)
        for sub, (k, n) in shapes.items():
            qw, qz, sc, dw = _random_gptq_layer(rng, k, n, group, sym,
                                                fmt)
            tensors[pre + sub + ".qweight"] = qw
            tensors[pre + sub + ".qzeros"] = qz
            tensors[pre + sub + ".scales"] = sc
            dense[(l, sub)] = dw
    os.makedirs(root, exist_ok=True)
    save_file(tensors, os.path.join(root, "model.safetensors"))
    if fmt != "gptq":
        with open(os.path.join(root, "quantize_config.json"), "w") as f:
            json.dump({"bits": 4, "group_size": group,
                       "checkpoint_format": fmt}, f)
    hf_cfg = {"vocab_size": V, "hidden_size": D, "intermediate_size": I,
              "num_hidden_layers": cfg.num_layers,
              "num_attention_heads": cfg.num_heads,
              "num_key_value_heads": cfg.num_kv_heads,
              "max_position_embeddings": cfg.max_seq_len,
              "rms_norm_eps": 1e-6, "tie_word_embeddings": False,
              "model_type": "llama"}
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump(hf_cfg, f)
    return dense


def test_load_gptq_checkpoint_native_and_serve(tmp_path):
    """Full checkpoint round-trip: a fabricated sym-GPTQ llama loads
    into Int4Weight projections, forwards end-to-end, and a 1-bit delta
    against the dequantized base fuses exactly like the reference's
    dequantize-then-BitDelta recipe."""
    from bitdelta_tpu.core.compress import compress_model, fuse_compressed
    from bitdelta_tpu.models import config as cfgs, llama as jl
    from bitdelta_tpu.research.quantized_base import (
        Int4Weight, dequantize_base_projections)

    cfg0 = cfgs.tiny_test_config(vocab_size=64, hidden_size=32,
                                 intermediate_size=64, num_layers=2,
                                 num_heads=2, num_kv_heads=2,
                                 dtype="float32")
    dense = _write_gptq_checkpoint(tmp_path / "ck", cfg0, sym=True,
                                   group=16)
    cfg, params = load_gptq_params(str(tmp_path / "ck"),
                                   dtype=jnp.float32)
    assert cfg.num_layers == 2
    for name in jl.PROJ_NAMES:
        assert isinstance(params["layers"][name], Int4Weight), name
    # Imported W4 == the checkpoint's own dequantized weights, exactly.
    deq = dequantize_base_projections(params, jnp.float32)
    for l in range(2):
        np.testing.assert_allclose(
            np.asarray(deq["layers"]["gate_proj"][l]),
            dense[(l, "mlp.gate_proj")], rtol=1e-6, atol=1e-6)
    # Serves directly through the W4 base path.
    logits = jl.forward(cfg, params, jnp.ones((1, 8), jnp.int32),
                        compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()
    # Reference recipe: delta against the dequantized base.
    fine = dict(deq)
    fine["layers"] = {k: (v + 0.02 if k in jl.PROJ_NAMES else v)
                      for k, v in deq["layers"].items()}
    comp = compress_model(deq, fine)
    fused = fuse_compressed(deq, comp)
    assert fused["layers"]["q_proj"].shape == deq["layers"]["q_proj"].shape


def test_load_gptq_checkpoint_asymmetric_falls_back_dense(tmp_path):
    from bitdelta_tpu.models import config as cfgs, llama as jl

    cfg0 = cfgs.tiny_test_config(vocab_size=64, hidden_size=32,
                                 intermediate_size=64, num_layers=1,
                                 num_heads=2, num_kv_heads=2,
                                 dtype="float32")
    dense = _write_gptq_checkpoint(tmp_path / "ck", cfg0, sym=False,
                                   group=16)
    cfg, params = load_gptq_params(str(tmp_path / "ck"),
                                   dtype=jnp.float32)
    w = params["layers"]["down_proj"]
    assert not hasattr(w, "packed")  # dense fallback (reference parity)
    np.testing.assert_allclose(np.asarray(w[0]),
                               dense[(0, "mlp.down_proj")],
                               rtol=1e-6, atol=1e-6)


def test_dequantize_gptq_v2_unshifted_zeros():
    """gptq_v2 stores zeros WITHOUT the legacy +1 shift: dequantizing a
    v2 layer with the right format matches the dense formula, while the
    legacy formula would be off by exactly one scale step (ADVICE r3:
    this used to happen silently)."""
    rng = np.random.default_rng(7)
    k, n, group = 64, 16, 16
    for sym in (True, False):
        qw, qz, sc, dense = _random_gptq_layer(rng, k, n, group, sym,
                                               fmt="gptq_v2")
        got = dequantize_gptq(qw, qz, sc, checkpoint_format="gptq_v2")
        np.testing.assert_allclose(got, dense, rtol=1e-6, atol=1e-6)
        assert gptq_is_symmetric(qz, checkpoint_format="gptq_v2") == sym
        # The legacy interpretation is off by one scale step everywhere.
        wrong = dequantize_gptq(qw, qz, sc)
        s = sc.astype(np.float32)[np.arange(k) // group]
        np.testing.assert_allclose(wrong, dense - s, rtol=1e-5, atol=1e-5)


def test_dequantize_gptq_rejects_indivisible_groups():
    import pytest

    rng = np.random.default_rng(8)
    qw, qz, sc, _ = _random_gptq_layer(rng, 64, 16, 16, True)
    with pytest.raises(ValueError, match="groups"):
        dequantize_gptq(qw, qz, sc[:3])  # 64 rows, 3 groups


def test_load_gptq_v2_checkpoint_roundtrip(tmp_path):
    """A gptq_v2 checkpoint (quantize_config.json checkpoint_format)
    loads natively and its dequantized weights equal the fabricated
    dense values — proving the zero-point convention was honored."""
    from bitdelta_tpu.models import config as cfgs, llama as jl
    from bitdelta_tpu.research.quantized_base import (
        Int4Weight, dequantize_base_projections)

    cfg0 = cfgs.tiny_test_config(vocab_size=64, hidden_size=32,
                                 intermediate_size=64, num_layers=1,
                                 num_heads=2, num_kv_heads=2,
                                 dtype="float32")
    dense = _write_gptq_checkpoint(tmp_path / "v2", cfg0, sym=True,
                                   group=16, fmt="gptq_v2")
    cfg, params = load_gptq_params(str(tmp_path / "v2"),
                                   dtype=jnp.float32)
    assert isinstance(params["layers"]["gate_proj"], Int4Weight)
    deq = dequantize_base_projections(params, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(deq["layers"]["gate_proj"][0]),
        dense[(0, "mlp.gate_proj")], rtol=1e-6, atol=1e-6)
