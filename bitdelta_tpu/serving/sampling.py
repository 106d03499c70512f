"""Per-slot token sampling: greedy / temperature / top-k / top-p.

The reference demo decodes greedily only (demo/demo_backend.py:203);
this engine supports per-slot temperature with nucleus and top-k
truncation, fully vectorized so one jitted decode step serves any mix of
sampling configs across the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def sample_tokens(rng: jax.Array, logits: jax.Array, temps: jax.Array,
                  top_ks: jax.Array, top_ps: jax.Array) -> jax.Array:
    """Sample one token per row.

    logits: ``(B, V)`` f32 (already vocab-masked).
    temps: ``(B,)`` — 0 selects greedy for that row.
    top_ks: ``(B,)`` int32 — 0 disables top-k for that row.
    top_ps: ``(B,)`` f32 — 1.0 disables nucleus sampling.
    """
    b, v = logits.shape
    sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]

    # Top-k: keep logits >= k-th largest.
    k = jnp.clip(top_ks, 1, v)
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=1)
    mask_k = jnp.where((top_ks > 0)[:, None], logits >= kth, True)

    # Top-p: keep the smallest prefix of the sorted distribution whose
    # mass reaches p (always at least the argmax).
    temps_safe = jnp.maximum(temps, 1e-4)[:, None]
    probs_sorted = jax.nn.softmax(sorted_desc / temps_safe, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    keep_sorted = (cum - probs_sorted) < top_ps[:, None]
    min_kept = jnp.min(jnp.where(keep_sorted, sorted_desc, jnp.inf), axis=-1)
    mask_p = jnp.where((top_ps < 1.0)[:, None],
                       logits >= min_kept[:, None], True)

    masked = jnp.where(mask_k & mask_p, logits / temps_safe, NEG_INF)
    sampled = jax.random.categorical(rng, masked, axis=-1)
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(temps > 0, sampled, greedy).astype(jnp.int32)
