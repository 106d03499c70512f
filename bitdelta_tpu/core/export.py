"""Full-model export to HF format.

Counterpart of the reference's ``save_full_model`` (reference
bitdelta/diff.py:108-115): materialize the compressed model as an
ordinary HF checkpoint (safetensors + config.json + tokenizer) so
external eval harnesses can consume it (reference README.md:100-102).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import PROJ_NAMES, Params


def _to_np(x):
    if x.dtype == jnp.bfloat16:
        # safetensors-numpy can't express bf16; HF standard is to store
        # bf16 via torch — use fp32 here for portability.
        return np.ascontiguousarray(np.asarray(x.astype(jnp.float32)))
    # ascontiguousarray: serialization of transposed views must not drop
    # the transpose.
    return np.ascontiguousarray(np.asarray(x))


def hf_state_dict(cfg: ModelConfig, params: Params) -> dict:
    """Our pytree -> HF Llama/Mistral tensor names (inverse of
    models/hf_import.py)."""
    sd = {"model.embed_tokens.weight": _to_np(params["embed"]),
          "model.norm.weight": _to_np(params["final_norm"])}
    if "lm_head" in params:
        sd["lm_head.weight"] = np.ascontiguousarray(_to_np(params["lm_head"]).T)
    name_map = {
        "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
        "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
        "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
        "down_proj": "mlp.down_proj",
    }
    for l in range(cfg.num_layers):
        for ours, hf in name_map.items():
            w = _to_np(params["layers"][ours][l])
            sd[f"model.layers.{l}.{hf}.weight"] = np.ascontiguousarray(w.T)
        sd[f"model.layers.{l}.input_layernorm.weight"] = _to_np(
            params["layers"]["attn_norm"][l])
        sd[f"model.layers.{l}.post_attention_layernorm.weight"] = _to_np(
            params["layers"]["mlp_norm"][l])
    return sd


def hf_config_dict(cfg: ModelConfig, model_type: str = "llama") -> dict:
    d = {
        "architectures": ["LlamaForCausalLM" if model_type == "llama"
                          else "MistralForCausalLM"],
        "model_type": model_type,
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_norm_eps,
        "max_position_embeddings": cfg.max_seq_len,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "hidden_act": "silu",
        "torch_dtype": "float32",
    }
    if cfg.sliding_window is not None:
        d["sliding_window"] = cfg.sliding_window
        d["model_type"] = "mistral"
        d["architectures"] = ["MistralForCausalLM"]
    return d


def save_full_model(cfg: ModelConfig, params: Params, out_dir: str,
                    tokenizer_src: str | None = None) -> None:
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    save_file(hf_state_dict(cfg, params),
              os.path.join(out_dir, "model.safetensors"))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_config_dict(cfg), f, indent=2)
    if tokenizer_src is not None:
        try:
            from ..utils.tokenizer import get_tokenizer
            get_tokenizer(tokenizer_src).save_pretrained(out_dir)
        except Exception as e:
            print(f"[export] tokenizer copy failed: {e}")
