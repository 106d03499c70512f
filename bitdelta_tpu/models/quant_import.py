"""Import pre-quantized HF checkpoints (AutoGPTQ int4, bitsandbytes int8).

Counterpart of the reference's ``dequantize_model``
(reference bitdelta/misc.py:70-126), which unpacks bitsandbytes-int8 /
auto-gptq-int4 layers back to fp16 so BitDelta can ride on top. Same
semantics here — ``deq = (q - zero) * scale`` per K-group with the
legacy ``zeros + 1`` offset, int8 ``CB * SCB / 127`` — but TPU-native in
two ways:

  * the GPTQ nibble layout (8 4-bit values per int32, LSB-first along
    the input dimension) is IDENTICAL to our :class:`Int4Weight` word
    layout, and a symmetric checkpoint (all zero points == 8) maps to it
    LOSSLESSLY by a single XOR 0x88888888 (unsigned nibble ``q`` ->
    two's-complement ``q - 8``) — the imported base then serves through
    the fused W4 path (``int4_matmul``) without ever materializing dense
    weights;
  * asymmetric / act-order (``g_idx``-permuted) checkpoints dequantize
    to dense — exactly what the reference always does — honoring
    arbitrary group assignment per input row.

The reference transposes at the end because torch Linear wants
``(out, in)``; our kernel layout is ``(K_in, N_out)`` = the GPTQ storage
layout, so imports are transpose-free.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .config import ModelConfig

_SYM_NIBBLES = np.uint32(0x77777777)   # zero-point nibble 7 => zero == 8
_SYM_NIBBLES_V2 = np.uint32(0x88888888)  # gptq_v2 stores zeros UNSHIFTED
_SIGN_FLIP = np.uint32(0x88888888)     # unsigned nibble -> two's-complement


def unpack_gptq_nibbles(packed: np.ndarray, axis: int = 0) -> np.ndarray:
    """Unpack int32 words into unsigned 4-bit values ``[0, 15]`` along
    ``axis`` (LSB-first; reference misc.py:81-93 row/col loops,
    vectorized)."""
    u = np.ascontiguousarray(packed).view(np.uint32)
    shifts = np.arange(8, dtype=np.uint32) * 4
    nib = (u[..., None] >> shifts).astype(np.uint32) & 0xF
    # (..., W, ..., 8) -> interleave the nibble axis right after `axis`.
    nib = np.moveaxis(nib, -1, axis + 1)
    out_shape = list(packed.shape)
    out_shape[axis] *= 8
    return nib.reshape(out_shape).astype(np.int32)


def dequantize_gptq(qweight: np.ndarray, qzeros: np.ndarray,
                    scales: np.ndarray,
                    g_idx: Optional[np.ndarray] = None,
                    checkpoint_format: str = "gptq") -> np.ndarray:
    """Dense fp32 ``(K, N)`` from GPTQ arrays (reference semantics:
    ``(q - (z + 1)) * scale``, misc.py:77-106).

    qweight ``(K//8, N)`` int32; qzeros ``(G, N//8)`` int32; scales
    ``(G, N)``; g_idx ``(K,)`` optional group index per input row
    (act-order checkpoints) — defaults to contiguous groups.

    ``checkpoint_format``: ``"gptq"`` (legacy, zeros stored SHIFTED by
    -1 — the reference's only case) or ``"gptq_v2"`` (gptqmodel, zeros
    stored unshifted: no +1). Silently applying the legacy +1 to a v2
    checkpoint would dequantize every weight off by one scale step.
    """
    if checkpoint_format not in ("gptq", "gptq_v2"):
        raise ValueError(f"unknown checkpoint_format {checkpoint_format!r}")
    q = unpack_gptq_nibbles(qweight, axis=0)            # (K, N)
    z = unpack_gptq_nibbles(qzeros, axis=1)             # (G, N)
    if checkpoint_format == "gptq":
        z = z + 1                                       # legacy offset
    k = q.shape[0]
    if g_idx is None:
        if k % scales.shape[0]:
            raise ValueError(
                f"K={k} does not divide into {scales.shape[0]} groups; "
                f"an act-order checkpoint must supply g_idx explicitly")
        g_idx = np.arange(k) // (k // scales.shape[0])
    g_idx = np.asarray(g_idx, np.int64)
    s = scales.astype(np.float32)[g_idx]                # (K, N)
    return (q - z[g_idx]).astype(np.float32) * s


def gptq_is_symmetric(qzeros: np.ndarray,
                      g_idx: Optional[np.ndarray] = None,
                      k: Optional[int] = None,
                      checkpoint_format: str = "gptq") -> bool:
    """True when the checkpoint maps losslessly onto :class:`Int4Weight`:
    every zero point is 8 (stored as nibble 7 in the legacy shifted
    format, nibble 8 in gptq_v2) and group assignment is the trivial
    contiguous one."""
    want = _SYM_NIBBLES if checkpoint_format == "gptq" else _SYM_NIBBLES_V2
    if not np.all(np.ascontiguousarray(qzeros).view(np.uint32) == want):
        return False
    if g_idx is not None and k is not None:
        groups = qzeros.shape[0]
        if k % groups or not np.array_equal(
                np.asarray(g_idx), np.arange(k) // (k // groups)):
            return False
    return True


def int4_from_gptq(qweight: np.ndarray, qzeros: np.ndarray,
                   scales: np.ndarray,
                   g_idx: Optional[np.ndarray] = None,
                   checkpoint_format: str = "gptq"):
    """Lossless ``Int4Weight`` from a SYMMETRIC GPTQ layer: the nibble
    words are ours up to the unsigned->two's-complement XOR; scales pass
    through (any group size dividing K works — ``int4_matmul`` derives
    the group from the scale shape)."""
    from ..research.quantized_base import Int4Weight

    if not gptq_is_symmetric(qzeros, g_idx, qweight.shape[0] * 8,
                             checkpoint_format):
        raise ValueError(
            "asymmetric or act-order GPTQ layer: no lossless Int4Weight "
            "mapping — use dequantize_gptq (dense), as the reference "
            "does for every checkpoint")
    packed = (np.ascontiguousarray(qweight).view(np.uint32)
              ^ _SIGN_FLIP).view(np.int32)
    return Int4Weight(packed=jnp.asarray(packed),
                      scale=jnp.asarray(scales, jnp.float32))


def int8_from_bnb(cb: np.ndarray, scb: np.ndarray):
    """``Int8Weight`` from bitsandbytes ``Linear8bitLt`` state: weight
    = ``CB * SCB[:, None] / 127`` in torch's ``(out, in)`` layout
    (reference misc.py:74-75) -> our ``(K, N)`` with per-column scale."""
    from ..research.quantized_base import Int8Weight

    return Int8Weight(q=jnp.asarray(np.ascontiguousarray(cb.T)),
                      scale=jnp.asarray(scb, jnp.float32) / 127.0)


_PROJ_SUBS = {
    "self_attn.q_proj": "q_proj",
    "self_attn.k_proj": "k_proj",
    "self_attn.v_proj": "v_proj",
    "self_attn.o_proj": "o_proj",
    "mlp.gate_proj": "gate_proj",
    "mlp.up_proj": "up_proj",
    "mlp.down_proj": "down_proj",
}


def load_gptq_params(ckpt_dir: str, cfg: Optional[ModelConfig] = None,
                     dtype=jnp.bfloat16, native: bool = True
                     ) -> Tuple[ModelConfig, Dict]:
    """Load an AutoGPTQ-format llama-family checkpoint directory into
    our params pytree.

    Each projection whose layers are all symmetric (and not act-order)
    becomes a stacked :class:`Int4Weight` when ``native=True`` — served
    through the fused W4 path with zero dequantization error vs the
    GPTQ kernels. Anything else (asymmetric zeros, ``g_idx`` act-order)
    is dequantized to dense ``dtype``, which is exactly the reference's
    behavior for ALL checkpoints (misc.py:70-126). Embeddings, norms
    and lm_head load like a dense HF checkpoint.
    """
    from ..research.quantized_base import Int4Weight
    from .hf_import import _iter_safetensors, load_hf_config

    cfg = cfg or load_hf_config(ckpt_dir)
    tensors = dict(_iter_safetensors(ckpt_dir))
    L = cfg.num_layers

    # gptqmodel writes checkpoint_format="gptq_v2" (zeros UNSHIFTED);
    # the legacy AutoGPTQ format (the reference's only case) shifts
    # them by -1. Read quantize_config.json so a v2 checkpoint doesn't
    # silently dequantize off by one scale step (ADVICE r3).
    fmt = "gptq"
    import json as _json
    import os as _os
    qc_path = _os.path.join(ckpt_dir, "quantize_config.json")
    if _os.path.exists(qc_path):
        with open(qc_path) as f:
            fmt = _json.load(f).get("checkpoint_format", "gptq")
    if fmt not in ("gptq", "gptq_v2"):
        raise ValueError(f"unsupported GPTQ checkpoint_format {fmt!r} "
                         f"in {qc_path}")

    params: Dict[str, object] = {
        "embed": jnp.asarray(tensors["model.embed_tokens.weight"], dtype),
        "final_norm": jnp.asarray(tensors["model.norm.weight"], dtype),
        "layers": {},
    }
    if "lm_head.weight" in tensors:
        params["lm_head"] = jnp.asarray(tensors["lm_head.weight"], dtype).T

    layers = params["layers"]
    layers["attn_norm"] = jnp.stack([
        jnp.asarray(tensors[f"model.layers.{i}.input_layernorm.weight"],
                    dtype) for i in range(L)])
    layers["mlp_norm"] = jnp.stack([
        jnp.asarray(
            tensors[f"model.layers.{i}.post_attention_layernorm.weight"],
            dtype) for i in range(L)])

    for sub, ours in _PROJ_SUBS.items():
        qw = [np.asarray(tensors[f"model.layers.{i}.{sub}.qweight"])
              for i in range(L)]
        qz = [np.asarray(tensors[f"model.layers.{i}.{sub}.qzeros"])
              for i in range(L)]
        sc = [np.asarray(tensors[f"model.layers.{i}.{sub}.scales"])
              for i in range(L)]
        gi = [np.asarray(tensors[f"model.layers.{i}.{sub}.g_idx"])
              if f"model.layers.{i}.{sub}.g_idx" in tensors else None
              for i in range(L)]
        sym = native and all(
            gptq_is_symmetric(z, g, w.shape[0] * 8, fmt)
            for w, z, g in zip(qw, qz, gi))
        if sym:
            per = [int4_from_gptq(w, z, s, g, fmt)
                   for w, z, s, g in zip(qw, qz, sc, gi)]
            layers[ours] = Int4Weight(
                packed=jnp.stack([p.packed for p in per]),
                scale=jnp.stack([p.scale for p in per]))
        else:
            layers[ours] = jnp.stack([
                jnp.asarray(dequantize_gptq(w, z, s, g, fmt), dtype)
                for w, z, s, g in zip(qw, qz, sc, gi)])
    return cfg, params
