"""Conversion of reference-format diff.pt artifacts.

Builds a diff.pt exactly the way the reference's save_diff does
(reference bitdelta/diff.py:66-79: {name}.mask packed int32 +
{name}.coeff per BinaryDiff, plus every requires_grad param), then
converts and checks the result against compress_model on the same
weights — proving a fine-tune compressed with the reference repo loads
here bit-for-bit.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _reference_save_dict(base_t, fine_t, cfg):
    """Reproduce the reference's artifact semantics with torch ops:
    per proj, diff = fine - base on the (N_out, K_in) torch weight;
    coeff = mean|diff| (fp32); mask = pack(diff.T >= 0) along K."""
    import torch

    out = {}
    for i in range(cfg.num_hidden_layers):
        layer = fine_t.model.layers[i]
        base_layer = base_t.model.layers[i]
        for mod, proj in (("self_attn", ("q_proj", "k_proj", "v_proj",
                                         "o_proj")),
                          ("mlp", ("gate_proj", "up_proj", "down_proj"))):
            for p in proj:
                wf = getattr(getattr(layer, mod), p).weight.detach()
                wb = getattr(getattr(base_layer, mod), p).weight.detach()
                diff = (wf - wb).T.contiguous()          # (K, N)
                coeff = diff.float().abs().mean()
                bits = (diff >= 0).to(torch.int64)       # (K, N)
                k, n = bits.shape
                shifts = torch.arange(32).view(1, 32, 1)
                words = (bits.view(k // 32, 32, n) << shifts).sum(1)
                words = words.to(torch.int32)
                name = f"model.layers.{i}.{mod}.{p}"
                out[f"{name}.mask"] = words
                out[f"{name}.coeff"] = coeff
        out[f"model.layers.{i}.input_layernorm.weight"] = \
            layer.input_layernorm.weight.detach()
        out[f"model.layers.{i}.post_attention_layernorm.weight"] = \
            layer.post_attention_layernorm.weight.detach()
    out["model.embed_tokens.weight"] = fine_t.model.embed_tokens.weight.detach()
    out["model.norm.weight"] = fine_t.model.norm.weight.detach()
    out["lm_head.weight"] = fine_t.lm_head.weight.detach()
    return out


@pytest.fixture(scope="module")
def torch_pair():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(3)
    cfg = LlamaConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64,
                      rms_norm_eps=1e-6, tie_word_embeddings=False)
    base = LlamaForCausalLM(cfg).eval()
    import copy
    fine = copy.deepcopy(base)
    with torch.no_grad():
        for name, p in fine.named_parameters():
            if "proj" in name:
                p.add_(0.03 * torch.randn_like(p))
    return cfg, base, fine


def test_reference_artifact_converts_bit_exact(torch_pair):
    from bitdelta_tpu.core.compress import compress_model
    from bitdelta_tpu.models.config import ModelConfig
    from bitdelta_tpu.models.hf_import import params_from_torch_model
    from bitdelta_tpu.tools.convert_reference import (
        reference_dict_to_compressed)

    hf_cfg, base_t, fine_t = torch_pair
    ref_dict = _reference_save_dict(base_t, fine_t, hf_cfg)
    converted = reference_dict_to_compressed(ref_dict, dtype=jnp.float32)

    cfg = ModelConfig.from_hf_config(hf_cfg)
    base = params_from_torch_model(cfg, base_t, jnp.float32)
    fine = params_from_torch_model(cfg, fine_t, jnp.float32)
    ours = compress_model(base, fine)

    for name in ours.deltas:
        np.testing.assert_array_equal(
            np.asarray(converted.deltas[name].packed),
            np.asarray(ours.deltas[name].packed), err_msg=name)
        np.testing.assert_allclose(
            np.asarray(converted.deltas[name].scale),
            np.asarray(ours.deltas[name].scale), rtol=1e-5, err_msg=name)
    for name in ("embed", "final_norm", "attn_norm", "mlp_norm", "lm_head"):
        np.testing.assert_allclose(
            np.asarray(converted.extras[name]),
            np.asarray(ours.extras[name]), rtol=1e-6, err_msg=name)


def test_converted_artifact_roundtrips_and_serves(torch_pair, tmp_path):
    import torch
    from bitdelta_tpu.core.artifact import load_delta, save_delta
    from bitdelta_tpu.models.config import ModelConfig
    from bitdelta_tpu.models.hf_import import params_from_torch_model
    from bitdelta_tpu.tools.convert_reference import convert

    hf_cfg, base_t, fine_t = torch_pair
    ref_dict = _reference_save_dict(base_t, fine_t, hf_cfg)
    pt = tmp_path / "diff.pt"
    torch.save(ref_dict, pt)
    out = tmp_path / "diff.safetensors"
    convert(str(pt), str(out))
    comp, _ = load_delta(str(out))

    # Serve it: one-tenant engine generates.
    from bitdelta_tpu.serving.engine import Engine, Request
    from bitdelta_tpu.serving.stacking import stack_tenants
    cfg = ModelConfig.from_hf_config(hf_cfg)
    base = params_from_torch_model(cfg, base_t, jnp.float32)
    base = {k: (jax.tree.map(lambda x: x.astype(jnp.float32), v)
                if k == "layers" else v.astype(jnp.float32))
            for k, v in base.items()}
    stack = stack_tenants(cfg, base,
                          [comp._replace(extras={
                              k: v.astype(jnp.float32)
                              for k, v in comp.extras.items()})])
    eng = Engine(cfg, stack, max_slots=1, max_seq=32, prefill_buckets=(8,),
                 kernel="xla", compute_dtype=jnp.float32)
    outs = eng.generate([Request(prompt_ids=[1, 2, 3], tenant_id=0,
                                 max_new_tokens=4)])
    assert len(outs[0]) == 4


def test_unknown_entry_rejected():
    from bitdelta_tpu.tools.convert_reference import (
        reference_dict_to_compressed)

    with pytest.raises(ValueError, match="unsupported artifact entry"):
        reference_dict_to_compressed({"something.weird": np.zeros(3)})
