"""Tests for utility subsystems (profiling, diagnostics, tokenizer)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from bitdelta_tpu.utils.diagnostics import weight_corr_stddev
from bitdelta_tpu.utils.profiling import StepTimer, device_memory_stats


def test_step_timer():
    t = StepTimer(window=4)
    for _ in range(6):
        with t.step(tokens=10):
            time.sleep(0.002)
    s = t.summary()
    assert s["steps_measured"] == 4
    assert s["mean_step_time_s"] >= 0.002
    assert s["tokens_per_sec"] > 0


def test_device_memory_stats_does_not_raise():
    stats = device_memory_stats()
    assert stats is None or isinstance(stats, dict)


def test_weight_corr_stddev():
    from bitdelta_tpu.models import config as cfgs, llama as jl

    cfg = cfgs.tiny_test_config()
    base = jl.init_params(cfg, jax.random.PRNGKey(0))
    fine = dict(base)
    fine["layers"] = {k: (v * 1.001 if v.ndim == 3 else v)
                      for k, v in base["layers"].items()}
    stats = weight_corr_stddev(base, fine)
    # Nearly identical weights: corr ~ 1, small stddev (the paper's
    # "fine-tuning adds little information" signature).
    assert stats["corr"] > 0.999
    assert stats["stddev"] < 0.01


def test_public_api_surface():
    import bitdelta_tpu as bd

    for name in ("quantize_delta", "compress_model", "save_delta",
                 "Engine", "stack_tenants", "distill_scales", "eval_ppl"):
        assert getattr(bd, name) is not None
