"""Reproduce the reference's delta-compression table for our artifact.

The reference headlines 13.48 GB -> 1.24 GB (10.87x) for Llama 2-7B
etc. (reference docs/index.html:356-359). Our artifact has the same
structure — 1 bit/projection-element packed signs + fp32 scales +
full-precision extras (embed, norms, lm_head in bf16) — so the sizes
are exact arithmetic over the model shapes; a unit test pins this
arithmetic to an actually-saved artifact
(tests/test_convert_reference.py / test_compress.py round-trips).

Run: python tools/compression_table.py  (host-only, no accelerator)
"""

import sys

sys.path.insert(0, ".")

from bitdelta_tpu.models.config import ModelConfig


MODELS = {
    "Llama 2-7B": ModelConfig(vocab_size=32000, hidden_size=4096,
                              intermediate_size=11008, num_layers=32,
                              num_heads=32, num_kv_heads=32,
                              max_seq_len=4096),
    "Llama 2-13B": ModelConfig(vocab_size=32000, hidden_size=5120,
                               intermediate_size=13824, num_layers=40,
                               num_heads=40, num_kv_heads=40,
                               max_seq_len=4096),
    "Llama 2-70B": ModelConfig(vocab_size=32000, hidden_size=8192,
                               intermediate_size=28672, num_layers=80,
                               num_heads=64, num_kv_heads=8,
                               max_seq_len=4096),
    "Mistral-7B": ModelConfig(vocab_size=32000, hidden_size=4096,
                              intermediate_size=14336, num_layers=32,
                              num_heads=32, num_kv_heads=8,
                              max_seq_len=32768, sliding_window=4096),
}

# Reference-reported (GB, ratio) for the same rows (docs/index.html).
REFERENCE = {"Llama 2-7B": (13.48, 1.24), "Llama 2-13B": (26.03, 2.09),
             "Llama 2-70B": (137.95, 8.95), "Mistral-7B": (14.48, 1.30)}


def proj_elems(cfg):
    D, I = cfg.hidden_size, cfg.intermediate_size
    per = (D * cfg.q_dim + 2 * D * cfg.kv_dim + cfg.q_dim * D
           + 2 * D * I + I * D)
    return per * cfg.num_layers


def sizes(cfg, compress_embeddings=False):
    D, V, L = cfg.hidden_size, cfg.vocab_size, cfg.num_layers
    pe = proj_elems(cfg)
    dense_gb = (pe * 2 + 2 * V * D * 2 + (2 * L + 1) * D * 2) / 2**30
    packed = pe / 8 + 7 * L * 4                      # signs + scales
    if compress_embeddings:
        extras = (2 * L + 1) * D * 2                 # norms only
        packed += 2 * V * D / 8 + 2 * 4              # embed+head deltas
    else:
        extras = 2 * V * D * 2 + (2 * L + 1) * D * 2
    art_gb = (packed + extras) / 2**30
    return dense_gb, art_gb


def main():
    print(f"{'model':<12} {'dense':>9} {'artifact':>9} {'ratio':>7}"
          f" {'(+embed-compressed)':>20}   reference")
    for name, cfg in MODELS.items():
        dense, art = sizes(cfg)
        _, art_ce = sizes(cfg, compress_embeddings=True)
        ref_d, ref_a = REFERENCE[name]
        print(f"{name:<12} {dense:8.2f}G {art:8.2f}G "
              f"{dense/art:6.2f}x {art_ce:8.2f}G ({dense/art_ce:5.1f}x)"
              f"   {ref_d:.2f}G -> {ref_a:.2f}G ({ref_d/ref_a:.2f}x)")


if __name__ == "__main__":
    main()
