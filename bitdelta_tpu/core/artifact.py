"""Delta artifact (de)serialization.

Replaces the reference's torch-pickle ``save_diff``/``load_diff``
(reference bitdelta/diff.py:66-106) with a safetensors file — a
zero-copy, framework-neutral, mmap-able format that multi-host loaders
can read shard-wise. One file holds:

  deltas.{proj}.packed   int32  (L, K//32, N)
  deltas.{proj}.scale    fp32   (L,)
  extras.{name}          fine-tuned embed / norms / lm_head

plus a JSON metadata header with the model config and format version.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .compress import CompressedModel
from .delta import BinaryDelta
from ..models.config import ModelConfig

FORMAT_VERSION = 1


def save_delta(path: str, compressed: CompressedModel,
               cfg: Optional[ModelConfig] = None,
               base_quant: Optional[str] = None) -> None:
    """``base_quant``: record how the base must be quantized at load
    time for the deltas to be exact (e.g. "int8" — the W8+W1 recipe,
    research/quantized_base.py; deltas were taken against the
    quantize-dequantized base)."""
    from safetensors.numpy import save_file

    tensors = {}
    for name, d in compressed.deltas.items():
        tensors[f"deltas.{name}.packed"] = np.asarray(d.packed)
        tensors[f"deltas.{name}.scale"] = np.asarray(d.scale, np.float32)
    for name, t in compressed.extras.items():
        arr = np.asarray(jnp.asarray(t, jnp.float32)
                         if t.dtype == jnp.bfloat16 else t)
        # bf16 round-trips via uint16 view to stay bit-exact + compact.
        if t.dtype == jnp.bfloat16:
            arr = np.asarray(jax.lax.bitcast_convert_type(
                jnp.asarray(t), jnp.uint16))
            tensors[f"extras_bf16.{name}"] = arr
        else:
            tensors[f"extras.{name}"] = np.asarray(t)

    meta = {"format_version": str(FORMAT_VERSION)}
    if cfg is not None:
        meta["model_config"] = json.dumps(dataclasses.asdict(cfg))
    if base_quant is not None:
        meta["base_quant"] = base_quant
    save_file(tensors, path, metadata=meta)


def load_delta(path: str, return_meta: bool = False):
    """Returns ``(CompressedModel, ModelConfig | None)``; with
    ``return_meta=True``, also the raw metadata dict (e.g.
    ``base_quant``)."""
    from safetensors import safe_open

    deltas_raw: dict = {}
    extras: dict = {}
    cfg = None
    with safe_open(path, framework="np") as f:
        meta = f.metadata() or {}
        if int(meta.get("format_version", "1")) > FORMAT_VERSION:
            raise ValueError("artifact written by a newer format version")
        if "model_config" in meta:
            raw = json.loads(meta["model_config"])
            if raw.get("rope_scaling") is not None:
                from ..models.config import RopeScaling

                raw["rope_scaling"] = RopeScaling(**raw["rope_scaling"])
            if "num_experts" in raw:   # Mixtral artifact
                from ..models.mixtral import MixtralConfig

                cfg = MixtralConfig(**raw)
            else:
                cfg = ModelConfig(**raw)
        for key in f.keys():
            t = f.get_tensor(key)
            if key.startswith("deltas."):
                _, proj, field = key.split(".")
                deltas_raw.setdefault(proj, {})[field] = t
            elif key.startswith("extras_bf16."):
                name = key[len("extras_bf16."):]
                extras[name] = jax.lax.bitcast_convert_type(
                    jnp.asarray(t), jnp.bfloat16)
            elif key.startswith("extras."):
                extras[key[len("extras."):]] = jnp.asarray(t)

    deltas = {
        proj: BinaryDelta(packed=jnp.asarray(fields["packed"]),
                          scale=jnp.asarray(fields["scale"], jnp.float32))
        for proj, fields in deltas_raw.items()
    }
    result = CompressedModel(deltas=deltas, extras=extras)
    if return_meta:
        return result, cfg, meta
    return result, cfg
