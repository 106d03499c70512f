"""Strided sliding-window perplexity.

Reimplements the reference's evaluator (reference bitdelta/eval_ppl.py:
34-85) exactly:

  * the corpus is samples joined by "\\n\\n", tokenized once;
  * total length is truncated to a multiple of ``stride`` (= window_size);
  * windows of ``context_size + window_size`` tokens start at every
    multiple of stride while they still fit;
  * per window, only the last ``stride`` targets contribute (HF-style
    shifted cross-entropy, labels elsewhere = ignore);
  * ppl = exp(mean over windows of the per-window mean nll).

TPU-first: all windows have one static shape, so the whole evaluation is
a scan of one jitted window-nll function (optionally batching windows),
instead of a Python loop of eager forwards.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models import llama


def window_starts(seq_len: int, context_size: int, window_size: int):
    stride = window_size
    max_length = context_size + window_size
    seq_len = seq_len - (seq_len % stride)
    starts = []
    for begin in range(0, seq_len, stride):
        if begin + max_length > seq_len:
            break
        starts.append(begin)
    # Reference processes one final (possibly short) window then breaks;
    # with seq_len a stride multiple the last full window ends exactly at
    # seq_len, which the loop above already includes.
    return starts, max_length, stride


def _window_nll(cfg: ModelConfig, model, params, deltas, window: jax.Array,
                stride: int, compute_dtype) -> jax.Array:
    """Mean nll of the last ``stride`` targets of one ``(B, T)`` window."""
    logits = model.forward(cfg, params, window, deltas=deltas,
                           compute_dtype=compute_dtype).astype(jnp.float32)
    # Shifted CE: logits[t] predicts window[t+1].
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    targets = window[:, 1:]
    nll_tok = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    t = targets.shape[1]
    keep = jnp.arange(t) >= (t - stride)   # last `stride` targets only
    return jnp.sum(nll_tok * keep, axis=-1) / jnp.sum(keep)


def eval_ppl(cfg: ModelConfig, params, token_ids: np.ndarray, *,
             context_size: int = 1024, window_size: int = 512,
             deltas=None, compute_dtype=None,
             batch_windows: int = 1, model=None, mesh=None) -> float:
    """Perplexity of a 1-D token array under the model.

    ``deltas=None`` evaluates dense params (use
    :func:`bitdelta_tpu.core.compress.fuse_compressed` first to match the
    reference's dense-fusion eval, eval_ppl.py:49-51); passing deltas
    evaluates through the compressed kernel path instead — a capability
    the reference lacks. ``model``: decoder module (default llama;
    pass models.mixtral for MoE checkpoints). ``mesh``: shard each
    window's SEQUENCE axis over the data axis (long-context eval across
    the mesh; GSPMD inserts the attention collectives) — params/deltas
    should already be placed via parallel.sharding.
    """
    model = model if model is not None else llama
    compute_dtype = compute_dtype or jnp.dtype(cfg.dtype)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import DATA_AXIS

        win_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    token_ids = np.asarray(token_ids).reshape(-1)
    starts, max_length, stride = window_starts(
        len(token_ids), context_size, window_size)
    if not starts:
        raise ValueError(
            f"corpus too short: {len(token_ids)} tokens < window "
            f"{context_size + window_size}")

    windows = np.stack([token_ids[s:s + max_length] for s in starts]).astype(np.int32)
    # Pad the window count to a batch multiple; padded windows get weight 0.
    nwin = len(windows)
    pad = (-nwin) % batch_windows
    if pad:
        reps = np.tile(windows, (pad // nwin + 1, 1))[:pad]
        windows = np.concatenate([windows, reps], axis=0)
    weights = np.concatenate([np.ones(nwin), np.zeros(pad)])

    # params/deltas enter as jit ARGUMENTS (closing over them embeds
    # model-size constants into the lowering; see train/distill.py).
    fn = jax.jit(lambda p, d, w: _window_nll(cfg, model, p, d, w, stride,
                                             compute_dtype))
    nlls = []
    for i in range(0, len(windows), batch_windows):
        w = jnp.asarray(windows[i:i + batch_windows])
        if mesh is not None:
            w = jax.device_put(w, win_sharding)
        nlls.append(np.asarray(fn(params, deltas, w)))
    nlls = np.concatenate(nlls)
    mean_nll = float((nlls * weights).sum() / weights.sum())
    return float(np.exp(mean_nll))


def tokenize_corpus(tokenizer, texts) -> np.ndarray:
    """Join samples with \\n\\n and tokenize once (reference
    eval_ppl.py:22-31)."""
    text = "".join(t + "\n\n" for t in texts)
    return np.asarray(tokenizer(text)["input_ids"], np.int64)
