"""Import HuggingFace Llama/Mistral checkpoints into the JAX params pytree.

Replaces the reference's ``get_model``/``get_tokenizer`` HF loading
(reference bitdelta/utils.py:80-121) with a direct safetensors →
pytree path: no torch graph is built, weights stream tensor-by-tensor,
are transposed to ``(K_in, N_out)`` kernel layout, and per-layer tensors
are stacked on a leading L axis for ``lax.scan``.

Two entry points:
  * :func:`params_from_state_dict` — from an in-memory mapping of numpy
    arrays (used by tests to import tiny random transformers models).
  * :func:`load_hf_params` — from a local HF checkpoint directory
    (``*.safetensors`` shards, streamed without materializing torch).
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, Dict, Iterable, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from .config import ModelConfig

_LAYER_RE = re.compile(r"model\.layers\.(\d+)\.(.+)\.(weight|bias)")

# HF sub-name -> (our name, transpose?)
_LAYER_MAP = {
    "self_attn.q_proj": ("q_proj", True),
    "self_attn.k_proj": ("k_proj", True),
    "self_attn.v_proj": ("v_proj", True),
    "self_attn.o_proj": ("o_proj", True),
    "mlp.gate_proj": ("gate_proj", True),
    "mlp.up_proj": ("up_proj", True),
    "mlp.down_proj": ("down_proj", True),
    "input_layernorm": ("attn_norm", False),
    "post_attention_layernorm": ("mlp_norm", False),
}

# Qwen2-style attention biases (1-D, no transpose).
_BIAS_MAP = {
    "self_attn.q_proj": "q_bias",
    "self_attn.k_proj": "k_bias",
    "self_attn.v_proj": "v_bias",
}


def params_from_state_dict(cfg: ModelConfig,
                           tensors: Mapping[str, np.ndarray],
                           dtype=jnp.bfloat16):
    """Convert an HF-style state dict (numpy values) to our pytree."""
    L = cfg.num_layers
    layer_buf: Dict[str, list] = {name: [None] * L
                                  for name, _ in _LAYER_MAP.values()}
    if cfg.attention_bias:
        for name in _BIAS_MAP.values():
            layer_buf[name] = [None] * L
    params: Dict[str, object] = {"layers": {}}

    for key, val in tensors.items():
        val = np.asarray(val)
        if key == "model.embed_tokens.weight":
            params["embed"] = val  # (V, D) stays as-is (row lookup)
        elif key == "model.norm.weight":
            params["final_norm"] = val
        elif key == "lm_head.weight":
            params["lm_head"] = val.T  # (V, D) -> (D, V)
        else:
            m = _LAYER_RE.fullmatch(key)
            if not m:
                continue  # rotary inv_freq buffers etc.
            idx, sub, kind = int(m.group(1)), m.group(2), m.group(3)
            if kind == "bias":
                if sub not in _BIAS_MAP:
                    raise ValueError(f"unrecognized layer bias: {key}")
                if cfg.attention_bias:
                    layer_buf[_BIAS_MAP[sub]][idx] = val
                continue
            if sub not in _LAYER_MAP:
                raise ValueError(f"unrecognized layer tensor: {key}")
            name, transpose = _LAYER_MAP[sub]
            layer_buf[name][idx] = val.T if transpose else val

    for name, rows in layer_buf.items():
        missing = [i for i, r in enumerate(rows) if r is None]
        if missing:
            raise ValueError(f"missing {name} for layers {missing}")
        params["layers"][name] = jnp.asarray(np.stack(rows), dtype)

    params["embed"] = jnp.asarray(params["embed"], dtype)
    params["final_norm"] = jnp.asarray(params["final_norm"], dtype)
    if "lm_head" in params:
        params["lm_head"] = jnp.asarray(params["lm_head"], dtype)
    elif not cfg.tie_word_embeddings:
        raise ValueError("checkpoint has no lm_head but embeddings not tied")
    return params


def _iter_safetensors(ckpt_dir: str) -> Iterable[tuple[str, np.ndarray]]:
    from safetensors import safe_open

    files = sorted(f for f in os.listdir(ckpt_dir)
                   if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {ckpt_dir}")
    for fname in files:
        with safe_open(os.path.join(ckpt_dir, fname), framework="np") as f:
            for key in f.keys():
                yield key, f.get_tensor(key)


def load_hf_config(ckpt_dir: str) -> ModelConfig:
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        raw = json.load(f)

    class _Obj:
        def __init__(self, d):
            self.__dict__.update(d)

    if raw.get("model_type") == "mixtral":
        from .mixtral import MixtralConfig

        return MixtralConfig.from_hf_config(_Obj(raw))
    return ModelConfig.from_hf_config(_Obj(raw))


_MIXTRAL_EXPERT_RE = re.compile(
    r"model\.layers\.(\d+)\.block_sparse_moe\.experts\.(\d+)\.(w[123])\.weight")
_MIXTRAL_LAYER_MAP = {
    "self_attn.q_proj": "q_proj", "self_attn.k_proj": "k_proj",
    "self_attn.v_proj": "v_proj", "self_attn.o_proj": "o_proj",
    "block_sparse_moe.gate": "router",
    "input_layernorm": "attn_norm",
    "post_attention_layernorm": "mlp_norm",
}


def mixtral_params_from_state_dict(cfg, tensors: Mapping[str, np.ndarray],
                                   dtype=jnp.bfloat16):
    """Mixtral state dict -> our pytree (experts stacked ``(L, E, K, N)``)."""
    L, E = cfg.num_layers, cfg.num_experts
    norms = ("attn_norm", "mlp_norm")
    layer_buf: Dict[str, list] = {
        name: [None] * L for name in
        list(_MIXTRAL_LAYER_MAP.values()) + ["w1", "w2", "w3"]}
    for name in ("w1", "w2", "w3"):
        layer_buf[name] = [[None] * E for _ in range(L)]
    params: Dict[str, object] = {"layers": {}}

    for key, val in tensors.items():
        val = np.asarray(val)
        if key == "model.embed_tokens.weight":
            params["embed"] = val
        elif key == "model.norm.weight":
            params["final_norm"] = val
        elif key == "lm_head.weight":
            params["lm_head"] = val.T
        elif (m := _MIXTRAL_EXPERT_RE.fullmatch(key)):
            layer_buf[m.group(3)][int(m.group(1))][int(m.group(2))] = val.T
        elif (m := _LAYER_RE.fullmatch(key)):
            sub, kind = m.group(2), m.group(3)
            if kind != "weight" or sub not in _MIXTRAL_LAYER_MAP:
                raise ValueError(f"unrecognized mixtral tensor: {key}")
            name = _MIXTRAL_LAYER_MAP[sub]
            layer_buf[name][int(m.group(1))] = (
                val if name in norms else val.T)

    for name, rows in layer_buf.items():
        if name in ("w1", "w2", "w3"):
            rows = [np.stack(r) for r in rows]
        params["layers"][name] = jnp.asarray(np.stack(rows), dtype)
    params["embed"] = jnp.asarray(params["embed"], dtype)
    params["final_norm"] = jnp.asarray(params["final_norm"], dtype)
    if "lm_head" in params:
        params["lm_head"] = jnp.asarray(params["lm_head"], dtype)
    return params


def load_hf_params(ckpt_dir: str, cfg: Optional[ModelConfig] = None,
                   dtype=jnp.bfloat16):
    """Load a local HF checkpoint dir into (config, params). Routes by
    model_type: Llama/Mistral/Qwen2 share the llama layout; Mixtral gets
    expert-stacked MoE params."""
    cfg = cfg or load_hf_config(ckpt_dir)
    tensors = dict(_iter_safetensors(ckpt_dir))
    from .mixtral import MixtralConfig

    if isinstance(cfg, MixtralConfig):
        return cfg, mixtral_params_from_state_dict(cfg, tensors, dtype)
    return cfg, params_from_state_dict(cfg, tensors, dtype)


def params_from_torch_model(cfg: ModelConfig, torch_model, dtype=jnp.float32):
    """Convert a live transformers model (tests) to our pytree."""
    sd = {k: v.detach().to("cpu").float().numpy()
          for k, v in torch_model.state_dict().items()}
    # Tied-embedding models may omit lm_head from the state dict.
    return params_from_state_dict(cfg, sd, dtype)
