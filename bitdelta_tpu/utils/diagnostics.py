"""Weight-statistics diagnostics.

Counterpart of the reference's ``find_corr_stddev``
(reference bitdelta/misc.py:6-31): per-projection correlation between
base and fine-tuned weights, plus the stddev of the delta — the paper's
"fine-tuning adds little new information" evidence, emitted under
``--debug`` (reference train.py:27-34).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..models.llama import PROJ_NAMES, Params


def weight_corr_stddev(base: Params, fine: Params) -> Dict[str, float]:
    corrs, stds = [], []
    for name in PROJ_NAMES:
        b = base["layers"][name].astype(jnp.float32)
        f = fine["layers"][name].astype(jnp.float32)
        L = b.shape[0]
        bf = b.reshape(L, -1)
        ff = f.reshape(L, -1)
        bc = bf - bf.mean(axis=1, keepdims=True)
        fc = ff - ff.mean(axis=1, keepdims=True)
        corr = jnp.sum(bc * fc, axis=1) / (
            jnp.linalg.norm(bc, axis=1) * jnp.linalg.norm(fc, axis=1) + 1e-12)
        corrs.append(corr)
        stds.append(jnp.std(ff - bf, axis=1))
    corr = float(jnp.mean(jnp.concatenate(corrs)))
    std = float(jnp.mean(jnp.concatenate(stds)))
    return {"corr": corr, "stddev": std}
