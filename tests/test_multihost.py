"""Multi-host (multi-process) runtime: 2 CPU processes x 4 fake devices.

Exercises parallel/mesh.py::initialize_multihost — the DCN/pod
bring-up path — for real: two OS processes join a jax.distributed
cluster over localhost, build one global (2, 4) mesh spanning both,
shard a model + deltas over it and run distillation steps whose psums
cross the process boundary. The reference has no multi-host story at
all (its multi-GPU is accelerate device maps, SURVEY.md P1/P2).

Runs as subprocesses because jax.distributed can only be initialized
once per process (the main pytest process already owns 8 local fake
devices).
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

from bitdelta_tpu.parallel.mesh import initialize_multihost
initialize_multihost(coordinator_address=f"localhost:{port}",
                     num_processes=nproc, process_id=pid)

import numpy as np
import jax, jax.numpy as jnp
assert jax.process_count() == nproc
assert len(jax.devices()) == 4 * nproc           # global device view

from bitdelta_tpu.core.compress import compress_model
from bitdelta_tpu.models import config as cfgs
from bitdelta_tpu.models import llama as jl
from bitdelta_tpu.parallel import mesh as pmesh
from bitdelta_tpu.parallel import sharding as psh
from bitdelta_tpu.train.data import synthetic_batches
from bitdelta_tpu.train.distill import DistillConfig, distill_scales

cfg = cfgs.tiny_test_config(vocab_size=128, hidden_size=64,
                            intermediate_size=256, num_layers=2,
                            num_heads=4, num_kv_heads=4, dtype="float32")
# Identical PRNG on every process => identical host data (SPMD).
base = jl.init_params(cfg, jax.random.PRNGKey(0), jnp.float32, scale=0.25)
fine = dict(base); fine["layers"] = dict(base["layers"])
key = jax.random.PRNGKey(50)
for name in jl.PROJ_NAMES:
    key, sub = jax.random.split(key)
    fine["layers"][name] = base["layers"][name] + (
        0.02 * jax.random.normal(sub, base["layers"][name].shape))
comp = compress_model(base, fine)

# data axis spans the process boundary (2 local devices per process on
# it), model axis tp=2 (packed K words of the tiny shapes divide by 2).
mesh = pmesh.make_mesh((2 * nproc, 2))
base_s = psh.shard_model(cfg, base, mesh)
fine_s = psh.shard_model(cfg, fine, mesh)
comp_s = comp._replace(
    deltas=psh.shard_deltas(cfg, comp.deltas, mesh),
    extras=psh.shard_tree(comp.extras,
                          psh.extras_specs(cfg, keys=comp.extras.keys()),
                          mesh))
batches = synthetic_batches(cfg.vocab_size, 2, 2 * nproc, 32, seed=1)
assert batches.shape[1] % (2 * nproc) == 0  # batch divides the data axis
out, losses = distill_scales(cfg, base_s, fine_s, comp_s, batches,
                             DistillConfig(lr=1e-3, num_steps=2,
                                           compute_dtype="float32"),
                             mesh=mesh)
assert all(np.isfinite(losses)), losses
print(f"RESULT {pid} " + " ".join(f"{l:.9f}" for l in losses), flush=True)
"""


@pytest.mark.skipif(os.environ.get("BITDELTA_SKIP_MULTIHOST") == "1",
                    reason="multihost subprocess test disabled")
def test_two_process_distill_over_global_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    nproc, port = 2, "49763"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(nproc), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(nproc)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
    # Every process computed the SAME finite losses (one global SPMD
    # computation, not nproc disjoint ones).
    results = sorted(l for out in outs for l in out.splitlines()
                     if l.startswith("RESULT"))
    assert len(results) == nproc, outs
    assert results[0].split()[2:] == results[1].split()[2:], results
