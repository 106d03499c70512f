"""Tokenizer loading with pad->eos fallback (reference
bitdelta/utils.py:110-121) and an offline byte-level fallback."""

from __future__ import annotations


def get_tokenizer(name_or_path: str, allow_fallback: bool = True):
    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(name_or_path, use_fast=True)
    except Exception as e:
        if not allow_fallback:
            raise
        print(f"[bitdelta_tpu] tokenizer for {name_or_path!r} unavailable "
              f"({type(e).__name__}); using byte-level fallback")
        from ..serving.server import ByteTokenizer

        return ByteTokenizer()
    if tok.pad_token is None:
        if tok.eos_token is not None:
            tok.pad_token = tok.eos_token
        else:
            tok.add_special_tokens({"pad_token": "[PAD]"})
    return tok
