"""Calibration / evaluation data pipeline.

Replaces the reference's torch DataLoader pipeline (reference
bitdelta/data.py): fixed-length (default 128-token) padded batches from a
text corpus, default C4/en (reference bitdelta/utils.py:17-18).

TPU-first differences: batches are materialized as numpy int32 up front
(num_steps * batch_size sequences — the reference's own budget,
train.py:41) so the jitted distillation loop runs back-to-back device
steps with no host stalls; and every source degrades gracefully to an
offline-friendly path (local HF cache, a text file, or seeded synthetic
ids) since calibration only needs "representative activations", not any
particular corpus.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional

import numpy as np


def batches_from_texts(tokenizer, texts: List[str], batch_size: int,
                       max_length: int = 128) -> np.ndarray:
    """Tokenize each text to exactly ``max_length`` (pad+truncate, the
    reference's padding="max_length", data.py:6-9) and stack into
    ``(num_batches, batch_size, max_length)`` int32."""
    enc = tokenizer(texts, padding="max_length", truncation=True,
                    max_length=max_length)
    ids = np.asarray(enc["input_ids"], np.int32)
    n = (len(ids) // batch_size) * batch_size
    if n == 0:
        raise ValueError("not enough texts for a single batch")
    return ids[:n].reshape(-1, batch_size, max_length)


def synthetic_batches(vocab_size: int, num_steps: int, batch_size: int,
                      max_length: int = 128, seed: int = 0) -> np.ndarray:
    """Seeded random token ids — offline calibration for tests/CI."""
    rng = np.random.default_rng(seed)
    return rng.integers(
        1, vocab_size, (num_steps, batch_size, max_length)).astype(np.int32)


def load_calibration_texts(dataset_name: str = "c4", subset: str = "en",
                           split: str = "train", size: int = 800) -> List[str]:
    """Streaming take(size) from an HF dataset (reference data.py:12-19).

    Works offline when the dataset is in the local HF cache; raises a
    clear error otherwise so callers can fall back to synthetic/text-file
    calibration.
    """
    from datasets import load_dataset

    ds = load_dataset(dataset_name, subset, split=split, streaming=True)
    texts = []
    for sample in ds.take(size):
        texts.append(sample["text"])
    return texts


def texts_from_file(path: str, size: int, chars_per_sample: int = 2048) -> List[str]:
    """Chop a local text file into pseudo-samples."""
    with open(path) as f:
        raw = f.read()
    return [raw[i:i + chars_per_sample]
            for i in range(0, min(len(raw), size * chars_per_sample),
                           chars_per_sample)]


def get_calibration_batches(tokenizer, *, num_steps: int, batch_size: int,
                            max_length: int = 128,
                            dataset_name: str = "c4", subset: str = "en",
                            split: str = "train",
                            text_file: Optional[str] = None,
                            vocab_size: Optional[int] = None,
                            seed: int = 0) -> np.ndarray:
    """Resolve a calibration source to ``(num_steps, B, S)`` int32 batches.

    Priority: explicit text file > HF dataset (dataset_name="synthetic"
    skips it) > synthetic random ids.
    """
    size = num_steps * batch_size
    if text_file is not None:
        texts = texts_from_file(text_file, size)
        return batches_from_texts(tokenizer, texts, batch_size, max_length)[:num_steps]
    if dataset_name != "synthetic":
        try:
            texts = load_calibration_texts(dataset_name, subset, split, size)
            return batches_from_texts(tokenizer, texts, batch_size,
                                      max_length)[:num_steps]
        except Exception as e:  # zero-egress hosts, missing cache, ...
            print(f"[bitdelta_tpu] dataset '{dataset_name}' unavailable "
                  f"({type(e).__name__}: {e}); using synthetic calibration")
    if vocab_size is None:
        vocab_size = getattr(tokenizer, "vocab_size", 32000) or 32000
    return synthetic_batches(vocab_size, num_steps, batch_size, max_length,
                             seed)
