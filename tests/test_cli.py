"""End-to-end CLI pipeline on local tiny HF checkpoints (fully offline:
byte-tokenizer fallback + synthetic calibration)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def hf_pair(tmp_path_factory):
    """Write a tiny random HF Llama base + perturbed fine-tune to disk."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    root = tmp_path_factory.mktemp("ckpts")
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=320, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=128,
                      rms_norm_eps=1e-6, tie_word_embeddings=False)
    base = LlamaForCausalLM(cfg).eval()
    base.save_pretrained(root / "base", safe_serialization=True)

    with torch.no_grad():
        for name, p in base.named_parameters():
            if "proj" in name:
                p.add_(0.02 * torch.randn_like(p))
    base.save_pretrained(root / "fine", safe_serialization=True)
    return str(root / "base"), str(root / "fine"), str(root)


@pytest.fixture(scope="module")
def trained_out(hf_pair):
    """Run the train CLI once per module and return its artifact dir.

    A fixture (not a test side effect) so the downstream serve/eval/
    export tests stay runnable when the slow train test is deselected
    (fast lane: ``-m "not slow"``)."""
    from bitdelta_tpu.cli.train import main

    base, fine, root = hf_pair
    out = os.path.join(root, "out")
    if not os.path.exists(os.path.join(out, "diff.safetensors")):
        main(["--base_model", base, "--finetuned_model", fine,
              "--save_dir", out, "--num_steps", "3", "--batch_size", "2",
              "--max_length", "16", "--dataset_name", "synthetic",
              "--dtype", "float32", "--debug"])
    return out


def test_train_cli_end_to_end(hf_pair, trained_out):
    out = trained_out
    assert os.path.exists(os.path.join(out, "diff.safetensors"))
    assert os.path.exists(os.path.join(out, "diff_untrained.safetensors"))
    assert os.path.exists(os.path.join(out, "corr_stddev.csv"))
    losses = json.load(open(os.path.join(out, "train_loss.json")))
    assert len(losses) == 3 and all(np.isfinite(losses))


def test_artifact_feeds_eval_and_matches_hf_fusion(hf_pair, trained_out):
    # Dense-fused params from the artifact must equal directly-compressed
    # fine-tune weights fused in memory.
    import jax.numpy as jnp
    from bitdelta_tpu.core.artifact import load_delta
    from bitdelta_tpu.core.compress import fuse_compressed
    from bitdelta_tpu.models.hf_import import load_hf_params

    base, fine, root = hf_pair
    out = trained_out
    cfg, base_params = load_hf_params(base, dtype=jnp.float32)
    comp, art_cfg = load_delta(os.path.join(out, "diff_untrained.safetensors"))
    assert art_cfg.num_layers == cfg.num_layers
    fused = fuse_compressed(base_params, comp)

    from bitdelta_tpu.core.compress import compress_model
    _, fine_params = load_hf_params(fine, dtype=jnp.float32)
    want = fuse_compressed(base_params,
                           compress_model(base_params, fine_params))
    np.testing.assert_allclose(
        np.asarray(fused["layers"]["q_proj"]),
        np.asarray(want["layers"]["q_proj"]), rtol=1e-6)


def test_serve_cli_smoke(hf_pair, trained_out, capsys):
    from bitdelta_tpu.cli.serve import main

    base, fine, root = hf_pair
    out = trained_out
    main(["--base_model", base,
          "--delta", f"tuned={os.path.join(out, 'diff.safetensors')}",
          "--dtype", "float32", "--kernel", "xla", "--max_seq", "64",
          "--smoke_test"])
    captured = capsys.readouterr().out
    assert "[smoke ok]" in captured
    lines = [json.loads(l) for l in captured.splitlines()
             if l.startswith("{")]
    assert any(l["done"] for l in lines)


def test_serve_cli_mesh_smoke(hf_pair, trained_out, capsys):
    # --mesh shards the whole serving stack (data axis here; the tiny
    # checkpoint's dims don't divide a model axis — TP is covered by
    # tests/test_serving_mesh.py).
    from bitdelta_tpu.cli.serve import main

    base, fine, root = hf_pair
    out = trained_out
    main(["--base_model", base,
          "--delta", f"tuned={os.path.join(out, 'diff.safetensors')}",
          "--dtype", "float32", "--kernel", "xla", "--max_seq", "64",
          "--mesh", "2,1", "--smoke_test"])
    captured = capsys.readouterr().out
    assert "sharding stack over mesh (2, 1)" in captured
    assert "[smoke ok]" in captured


def test_eval_ppl_cli_offline(hf_pair, trained_out, tmp_path, capsys):
    from bitdelta_tpu.cli.eval_ppl import main

    base, fine, root = hf_pair
    out = trained_out
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("the quick brown fox jumps over the lazy dog. " * 400)
    main(["--base_model", base, "--model_diff",
          os.path.join(out, "diff.safetensors"),
          "--text_file", str(corpus), "--context_size", "64",
          "--window_size", "32", "--dtype", "float32",
          "--save_dir", str(tmp_path)])
    ppl = float(open(tmp_path / "ppl.txt").read())
    assert np.isfinite(ppl) and ppl > 0


def test_export_full_model_roundtrip(hf_pair, trained_out, tmp_path):
    # save_full_model output must load back through our own HF importer
    # AND through transformers.
    import jax.numpy as jnp
    from bitdelta_tpu.core.artifact import load_delta
    from bitdelta_tpu.core.compress import fuse_compressed
    from bitdelta_tpu.core.export import save_full_model
    from bitdelta_tpu.models.hf_import import load_hf_params

    base, fine, root = hf_pair
    out = trained_out
    cfg, base_params = load_hf_params(base, dtype=jnp.float32)
    comp, _ = load_delta(os.path.join(out, "diff.safetensors"))
    fused = fuse_compressed(base_params, comp)
    export_dir = str(tmp_path / "exported")
    save_full_model(cfg, fused, export_dir)

    cfg2, params2 = load_hf_params(export_dir, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(params2["layers"]["down_proj"]),
                               np.asarray(fused["layers"]["down_proj"]),
                               rtol=1e-6)

    import torch
    from transformers import AutoModelForCausalLM
    hf_model = AutoModelForCausalLM.from_pretrained(export_dir)
    w = hf_model.model.layers[0].mlp.down_proj.weight.detach().numpy()
    np.testing.assert_allclose(w.T, np.asarray(fused["layers"]["down_proj"][0]),
                               rtol=1e-5, atol=1e-6)


def test_train_serve_eval_with_compressed_embeddings(hf_pair, tmp_path,
                                                     capsys):
    """Full pipeline with --compress_embeddings: train -> artifact carries
    embed/lm_head deltas -> serve smoke -> offline ppl, all offline."""
    from bitdelta_tpu.cli.train import main as train_main
    from bitdelta_tpu.cli.serve import main as serve_main
    from bitdelta_tpu.cli.eval_ppl import main as ppl_main
    from bitdelta_tpu.core.artifact import load_delta

    base, fine, root = hf_pair
    out = os.path.join(root, "out_ce")
    train_main(["--base_model", base, "--finetuned_model", fine,
                "--save_dir", out, "--num_steps", "2", "--batch_size", "2",
                "--max_length", "16", "--dataset_name", "synthetic",
                "--dtype", "float32", "--compress_embeddings"])
    comp, _ = load_delta(os.path.join(out, "diff.safetensors"))
    assert "embed" in comp.deltas and "lm_head" in comp.deltas
    assert "embed" not in comp.extras

    serve_main(["--base_model", base,
                "--delta", f"tuned={os.path.join(out, 'diff.safetensors')}",
                "--dtype", "float32", "--kernel", "xla", "--max_seq", "64",
                "--smoke_test"])
    assert "[smoke ok]" in capsys.readouterr().out

    corpus = tmp_path / "corpus.txt"
    corpus.write_text("pack my box with five dozen liquor jugs. " * 400)
    ppl_main(["--base_model", base, "--model_diff",
              os.path.join(out, "diff.safetensors"),
              "--text_file", str(corpus), "--context_size", "64",
              "--window_size", "32", "--dtype", "float32",
              "--save_dir", str(tmp_path)])
    ppl = float(open(tmp_path / "ppl.txt").read())
    assert np.isfinite(ppl) and ppl > 0


def test_train_serve_eval_with_quantized_base(hf_pair, tmp_path, capsys):
    """W8+W1 pipeline: --quantize_base int8 at train time records
    base_quant in the artifact; serve auto-detects it and streams the
    int8 base; eval fuses against the int8 round-trip."""
    from bitdelta_tpu.cli.train import main as train_main
    from bitdelta_tpu.cli.serve import main as serve_main
    from bitdelta_tpu.cli.eval_ppl import main as ppl_main
    from bitdelta_tpu.core.artifact import load_delta

    base, fine, root = hf_pair
    out = os.path.join(root, "out_w8")
    train_main(["--base_model", base, "--finetuned_model", fine,
                "--save_dir", out, "--num_steps", "2", "--batch_size", "2",
                "--max_length", "16", "--dataset_name", "synthetic",
                "--dtype", "float32", "--quantize_base", "int8"])
    _, _, meta = load_delta(os.path.join(out, "diff.safetensors"),
                            return_meta=True)
    assert meta.get("base_quant") == "int8"

    serve_main(["--base_model", base,
                "--delta", f"w8={os.path.join(out, 'diff.safetensors')}",
                "--dtype", "float32", "--kernel", "xla", "--max_seq", "64",
                "--smoke_test"])
    captured = capsys.readouterr().out
    assert "serving the quantized base" in captured
    assert "[smoke ok]" in captured

    corpus = tmp_path / "corpus.txt"
    corpus.write_text("how vexingly quick daft zebras jump. " * 400)
    ppl_main(["--base_model", base, "--model_diff",
              os.path.join(out, "diff.safetensors"),
              "--text_file", str(corpus), "--context_size", "64",
              "--window_size", "32", "--dtype", "float32",
              "--save_dir", str(tmp_path)])
    ppl = float(open(tmp_path / "ppl.txt").read())
    assert np.isfinite(ppl) and ppl > 0


def test_mixtral_train_serve_eval_pipeline(tmp_path, capsys):
    """Mixtral family through the full CLI pipeline: compress (attn +
    experts + router) -> distill -> serve the MoE decoder -> offline ppl.
    The reference had no Mixtral pipeline at all."""
    import torch
    from transformers import MixtralConfig as HFConfig, MixtralForCausalLM
    from bitdelta_tpu.cli.train import main as train_main
    from bitdelta_tpu.cli.serve import main as serve_main
    from bitdelta_tpu.cli.eval_ppl import main as ppl_main
    from bitdelta_tpu.core.artifact import load_delta

    torch.manual_seed(1)
    hf_cfg = HFConfig(vocab_size=320, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, num_local_experts=4,
                      num_experts_per_tok=2, max_position_embeddings=64,
                      rms_norm_eps=1e-6, tie_word_embeddings=False)
    base_m = MixtralForCausalLM(hf_cfg).eval()
    base_dir = str(tmp_path / "mx_base")
    base_m.save_pretrained(base_dir, safe_serialization=True)
    with torch.no_grad():
        for name, p in base_m.named_parameters():
            if any(k in name for k in ("proj", ".w1.", ".w2.", ".w3.",
                                       "gate")):
                p.add_(0.02 * torch.randn_like(p))
    fine_dir = str(tmp_path / "mx_fine")
    base_m.save_pretrained(fine_dir, safe_serialization=True)

    out = str(tmp_path / "mx_out")
    train_main(["--base_model", base_dir, "--finetuned_model", fine_dir,
                "--save_dir", out, "--num_steps", "2", "--batch_size", "2",
                "--max_length", "16", "--dataset_name", "synthetic",
                "--dtype", "float32"])
    comp, art_cfg = load_delta(os.path.join(out, "diff.safetensors"))
    assert {"w1", "w2", "w3", "router"} <= set(comp.deltas)

    serve_main(["--base_model", base_dir,
                "--delta", f"moe={os.path.join(out, 'diff.safetensors')}",
                "--dtype", "float32", "--kernel", "auto", "--max_seq", "64",
                "--smoke_test"])
    captured = capsys.readouterr().out
    assert "mixtral checkpoint" in captured
    assert "[smoke ok]" in captured

    corpus = tmp_path / "corpus.txt"
    corpus.write_text("sphinx of black quartz judge my vow. " * 400)
    ppl_main(["--base_model", base_dir, "--model_diff",
              os.path.join(out, "diff.safetensors"),
              "--text_file", str(corpus), "--context_size", "32",
              "--window_size", "16", "--dtype", "float32",
              "--save_dir", str(tmp_path)])
    ppl = float(open(tmp_path / "ppl.txt").read())
    assert np.isfinite(ppl) and ppl > 0
