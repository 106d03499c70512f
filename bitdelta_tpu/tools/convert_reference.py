"""Convert a reference BitDelta ``diff.pt`` artifact to our format.

The reference saves (reference bitdelta/diff.py:66-79) a torch-pickled
dict with, per compressed linear ``model.layers.{i}.<mod>.<proj>``:

  "<name>.mask"  — int32 packed signs ``(K//32, N)`` (K-axis LSB-first,
                   packed from the transposed weight, diff.py:16 — the
                   same layout this framework uses natively), and
  "<name>.coeff" — fp32 scalar scale;

plus every ``requires_grad`` tensor of the student under its param name
(embeddings, norms, lm_head — and optionally LoRA ``A``/``B`` factors,
diff.py:99-104).

This tool maps those to a :class:`~bitdelta_tpu.core.compress.
CompressedModel` (per-projection stacked ``(L, K//32, N)`` deltas +
extras) and writes a ``.safetensors`` delta artifact, so fine-tunes
compressed with the reference repo serve directly on this framework.

Usage:
  python -m bitdelta_tpu.tools.convert_reference diff.pt out.safetensors
"""

from __future__ import annotations

import re
import sys
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core.compress import CompressedModel
from ..core.delta import BinaryDelta
from ..models.llama import PROJ_NAMES

_MASK_RE = re.compile(
    r"model\.layers\.(\d+)\.(?:self_attn|mlp)\.(\w+_proj)\.(mask|coeff)")

_EXTRA_MAP = {
    "model.embed_tokens.weight": ("embed", False),
    "model.norm.weight": ("final_norm", False),
    "lm_head.weight": ("lm_head", True),   # (V, D) -> (D, V)
}
_LAYER_EXTRA_RE = re.compile(
    r"model\.layers\.(\d+)\.(input_layernorm|post_attention_layernorm)\.weight")


def reference_dict_to_compressed(state: Dict[str, "object"],
                                 num_layers: Optional[int] = None,
                                 dtype=jnp.bfloat16) -> CompressedModel:
    """Build a CompressedModel from a reference diff.pt dict (tensors may
    be torch tensors or numpy arrays)."""
    def to_np(t):
        if hasattr(t, "detach"):
            t = t.detach().to("cpu")
            if t.dtype.is_floating_point:
                t = t.float()
            t = t.numpy()
        return np.asarray(t)

    masks: Dict[str, dict] = {n: {} for n in PROJ_NAMES}
    coeffs: Dict[str, dict] = {n: {} for n in PROJ_NAMES}
    extras_raw: Dict[str, object] = {}
    layer_norms: Dict[str, dict] = {"attn_norm": {}, "mlp_norm": {}}

    for key, val in state.items():
        m = _MASK_RE.fullmatch(key)
        if m:
            idx, proj, field = int(m.group(1)), m.group(2), m.group(3)
            if proj not in PROJ_NAMES:
                raise ValueError(f"unknown projection in artifact: {key}")
            (masks if field == "mask" else coeffs)[proj][idx] = to_np(val)
            continue
        lm = _LAYER_EXTRA_RE.fullmatch(key)
        if lm:
            idx = int(lm.group(1))
            name = ("attn_norm" if lm.group(2) == "input_layernorm"
                    else "mlp_norm")
            layer_norms[name][idx] = to_np(val)
            continue
        if key in _EXTRA_MAP:
            name, transpose = _EXTRA_MAP[key]
            arr = to_np(val)
            extras_raw[name] = arr.T if transpose else arr
            continue
        # Unrecognized entries (e.g. LoRA A/B from the reference's hybrid
        # artifacts) are not representable as 1-bit deltas; surface them.
        raise ValueError(
            f"unsupported artifact entry {key!r}; convert LoRA factors "
            f"with research.variants.apply_lora before export")

    L = num_layers or (max(max(d) for d in masks.values() if d) + 1)
    deltas = {}
    for proj in PROJ_NAMES:
        missing = [i for i in range(L) if i not in masks[proj]]
        if missing:
            raise ValueError(f"missing {proj} masks for layers {missing}")
        packed = np.stack([masks[proj][i] for i in range(L)])
        scale = np.asarray([float(coeffs[proj][i]) for i in range(L)],
                           np.float32)
        deltas[proj] = BinaryDelta(packed=jnp.asarray(packed, jnp.int32),
                                   scale=jnp.asarray(scale))

    extras = {}
    for name in ("embed", "final_norm", "lm_head"):
        if name in extras_raw:
            extras[name] = jnp.asarray(extras_raw[name], dtype)
    for name in ("attn_norm", "mlp_norm"):
        if len(layer_norms[name]) == L:
            extras[name] = jnp.asarray(
                np.stack([layer_norms[name][i] for i in range(L)]), dtype)
    required = {"embed", "final_norm", "attn_norm", "mlp_norm"}
    missing = required - set(extras)
    if missing:
        raise ValueError(
            f"artifact lacks {sorted(missing)}; the reference stores these "
            f"for every compressed student (diff.py:75-77) — pass a "
            f"complete diff.pt")
    return CompressedModel(deltas=deltas, extras=extras)


def convert(diff_pt_path: str, out_path: str) -> None:
    import torch

    state = torch.load(diff_pt_path, map_location="cpu",
                       weights_only=True)
    comp = reference_dict_to_compressed(state)
    from ..core.artifact import save_delta
    save_delta(out_path, comp)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
