"""Regression tests for bench.py's allocation/measurement helpers.

The bench is driver-facing production tooling: round 4 lost every E=2
Mixtral rung to an untested helper (rand_weight generated ZERO threefry
words for a (L, D, 2) int8 slab) and the 32L/T6 rung to an untested
memory shape (the chained run's non-donated KV-cache argument). These
tests pin the helper contracts on CPU.
"""
import importlib
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402


@pytest.mark.parametrize("last", [2, 3, 4, 6, 128])
def test_rand_weight_any_last_dim(last):
    # E=2 regression: sub-word last dims (last * 8 bits < 32) must pad,
    # not produce a zero-size bits array.
    w = bench.rand_weight(jax.random.PRNGKey(0), (3, 8, last))
    assert w.shape == (3, 8, last)
    assert w.dtype == jnp.bfloat16
    a = np.asarray(w.astype(jnp.float32))
    assert np.max(np.abs(a)) <= 0.0202
    assert np.max(np.abs(a)) > 0.001  # not all zeros


def test_rand_weight_deterministic():
    k = jax.random.PRNGKey(7)
    a = np.asarray(bench.rand_weight(k, (4, 16)).astype(jnp.float32))
    b = np.asarray(bench.rand_weight(k, (4, 16)).astype(jnp.float32))
    np.testing.assert_array_equal(a, b)


def test_rand_bits_rejects_misaligned_int8():
    with pytest.raises(AssertionError):
        bench.rand_bits(jax.random.PRNGKey(0), (4, 2), jnp.int8)


def test_ratchet_holds_through_oom(monkeypatch):
    # A transient RESOURCE_EXHAUSTED must be retried (the slab siege);
    # other errors must propagate immediately.
    monkeypatch.setenv("BENCH_SLAB_WAIT_S", "0")
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("RESOURCE_EXHAUSTED: fake pool pressure")
        return jnp.ones((4,))

    out = bench.ratchet(flaky, "test-slab")
    assert calls["n"] == 3
    assert float(out.sum()) == 4.0

    def broken():
        raise ValueError("not an oom")

    with pytest.raises(ValueError, match="not an oom"):
        bench.ratchet(broken, "test-slab")


def test_ratchet_exhausts(monkeypatch):
    monkeypatch.setenv("BENCH_SLAB_WAIT_S", "0")
    monkeypatch.setenv("BENCH_SLAB_TRIES", "3")

    def always_oom():
        raise RuntimeError("RESOURCE_EXHAUSTED: forever")

    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        bench.ratchet(always_oom, "test-slab")


def test_emit_attaches_check_and_tracks_best(capsys, monkeypatch):
    """Every emitted record must carry compiled_check + elapsed and
    become the best-so-far that _shutdown re-emits (VERDICT r4 item 1:
    the artifact must be parseable under any kill timing)."""
    import json
    import time

    monkeypatch.setattr(bench, "_T0", time.time())
    monkeypatch.setattr(bench, "_COMPILED_CHECK", "ok")
    rec = bench.emit({"metric": "m", "value": 1.5})
    out = capsys.readouterr().out.strip()
    parsed = json.loads(out)
    assert parsed["compiled_check"] == "ok"
    assert parsed["value"] == 1.5
    assert "elapsed_s" in parsed
    assert bench._BEST == rec == parsed


def test_bootstrap_record_is_driver_parseable():
    rec = bench._bootstrap_record("why not")
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in rec
    assert rec["value"] == 0.0
    assert "why not" in rec["unit"]


def test_shutdown_reemits_best_as_last_line(tmp_path):
    """SIGTERM-path contract, run in a subprocess (os._exit): the LAST
    stdout line after a shutdown must be the best-so-far JSON record."""
    import json
    import subprocess
    import sys as _sys

    code = (
        "import signal, sys, time\n"
        f"sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})\n"
        "import bench\n"
        "bench._T0 = time.time()\n"
        "bench._COMPILED_CHECK = 'ok'\n"
        "bench.emit({'metric': 'm', 'value': 2.5})\n"
        "print('stderr-ish noise after the emission')\n"
        "bench._shutdown(signal.SIGTERM, None)\n"
    )
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    p = subprocess.run([_sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=120)
    assert p.returncode == 0
    last = p.stdout.strip().splitlines()[-1]
    assert json.loads(last)["value"] == 2.5


def test_run_phase_treats_no_budget_sentinel_as_no_timeout(monkeypatch):
    """_remaining() returns 1e9 when the wall budget is disabled;
    run_phase must not turn that into an int overflow (regression:
    first staged-ladder smoke run died with OverflowError)."""
    seen = {}

    class FakeProc:
        pid = 1234
        returncode = 0

        def communicate(self, timeout=None):
            seen["timeout"] = timeout
            return '{"phase": "x"}', None

        def poll(self):
            return 0

    monkeypatch.setattr(bench.subprocess, "Popen",
                        lambda *a, **k: FakeProc())
    rc, rec = bench.run_phase("ours", 2, 2, timeout_s=1e9)
    assert rc == 0 and rec == {"phase": "x"}
    assert seen["timeout"] is None


def test_make_chained_matches_eager_scan():
    """The in-jit-cache chained runner must equal an eager step loop
    with the same (zeros, length=32) cache init — pins both the cache
    initialization contract and the token feedback chain."""
    from bitdelta_tpu.models import llama
    from bitdelta_tpu.models.config import ModelConfig

    cfg = ModelConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=1,
                      max_seq_len=64)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    B = 2
    old_steps, old_seq = bench.STEPS, bench.MAX_SEQ
    bench.STEPS, bench.MAX_SEQ = 3, 64
    try:
        def step_fn(p, _unused, tokens, cache):
            return llama.decode_step(cfg, p, tokens, cache,
                                     compute_dtype=jnp.float32,
                                     kernel="xla")

        run, tok0 = bench.make_chained(cfg, "xla", step_fn, B)
        got = float(run(params, None, tok0))

        # Eager replica of the chained program.
        cache = llama.init_cache(cfg, B, bench.MAX_SEQ, jnp.bfloat16)
        cache = cache._replace(length=jnp.full((B,), 32, jnp.int32))
        tokens = jnp.ones((B, 1), jnp.int32)
        for _ in range(bench.STEPS):
            logits, cache = step_fn(params, None, tokens, cache)
            tokens = jnp.argmax(logits[:, 0], axis=-1) \
                .astype(jnp.int32)[:, None]
            cache = cache._replace(length=cache.length - 1)
        want = float(tokens.sum() + cache.length.sum())
        assert got == want
    finally:
        bench.STEPS, bench.MAX_SEQ = old_steps, old_seq


def test_staged_parent_end_to_end_smoke():
    """The driver-facing contract, pinned: a full parent run (shrunk
    world, CPU) exits 0, emits multiple staged records (bootstrap ->
    safe rung -> upgrade), and the LAST line parses with the headline
    keys and the undegraded north-star shape."""
    import json
    import subprocess
    import sys as _sys

    env = {**os.environ, "JAX_PLATFORMS": "cpu", "BENCH_SHRINK": "32",
           "BENCH_STEPS": "2", "BENCH_TRIALS": "1", "BENCH_ENGINE": "0",
           "BENCH_MIX": "0", "BENCH_WALL_BUDGET_S": "0",
           "BENCH_COMPILED_CHECK": "1"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run([_sys.executable, os.path.join(root, "bench.py")],
                       env=env, capture_output=True, text=True,
                       timeout=900)
    assert p.returncode == 0, p.stderr[-2000:]
    lines = [l for l in p.stdout.strip().splitlines()]
    recs = [json.loads(l) for l in lines if l.startswith("{")]
    assert len(recs) >= 3          # bootstrap, safe rung, upgrade
    final = recs[-1]
    for k in ("metric", "value", "unit", "vs_baseline",
              "compiled_check", "num_layers", "tenants"):
        assert k in final, k
    assert final["compiled_check"] == "ok"
    assert final["num_layers"] == 32 and final["tenants"] == 6
    assert "degraded_from_layers" not in final
    assert final["value"] > 0
    # The safe rung emitted earlier and was a real measurement too.
    assert recs[1]["value"] > 0 and recs[1]["num_layers"] == 16
