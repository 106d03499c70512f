"""Scale-distillation quality artifact on real hardware (VERDICT r2
item 5): run the reference recipe — num_steps x batch 4 x len 128,
lr 1e-4, AdamW + cosine (reference train.py:60-88, utils.py:21-22) — on
the largest 7B-width world the chip can hold, and record the loss
trajectory initial -> distilled plus wall-clock. The repo's counterpart
of the reference's 0.41 -> 0.052 distillation evidence
(reference docs/index.html:246-247).

Memory: the teacher (fine-tune) and student base are BOTH dense bf16, so
a full 32L 7B pair (2 x 14 GB) cannot fit one 16 GB v5e — the depth
ladder starts at 12L (2 x 5.3 GB + deltas + activations) and degrades;
layers are scanned, so per-layer step cost is depth-invariant and the
steady-state ms/step extrapolates linearly (stated in the output).

Env: LAYERS (ladder start), STEPS (default 200), BATCH, SEQLEN, SHRINK.
Prints one JSON line: first/last losses, sampled curve, ms/step, wall.
"""

import gc
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import optax

from bitdelta_tpu.core.compress import compress_model, get_scales
from bitdelta_tpu.models import llama
from bitdelta_tpu.models.config import ModelConfig
from bitdelta_tpu.train.data import synthetic_batches
from bitdelta_tpu.train.distill import DistillConfig, make_distill_step

STEPS = int(os.environ.get("STEPS", "200"))
BATCH = int(os.environ.get("BATCH", "4"))
SEQLEN = int(os.environ.get("SEQLEN", "128"))
SHRINK = int(os.environ.get("SHRINK", "1"))
LAYERS0 = int(os.environ.get("LAYERS", "12"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def build_world(L):
    """Base + a HEAVY-TAILED synthetic fine-tune.

    An iid-Gaussian perturbation makes mean|diff| already L2-optimal
    per matrix, so scale distillation has nothing to learn (measured:
    1.60 -> 1.58 over 200 steps). Real fine-tunes are heavy-tailed —
    a few weights move a lot — and there the encoder's mean|diff|
    over-weights the outliers, leaving the logit-matching objective
    real headroom, which is the regime the reference's 0.41 -> 0.052
    curve demonstrates. Cubing a standard normal (kurtosis ~46 vs 3)
    reproduces that regime synthetically."""
    cfg = ModelConfig(vocab_size=32000 // SHRINK // 256 * 256,
                      hidden_size=4096 // SHRINK,
                      intermediate_size=14336 // SHRINK // 256 * 256,
                      num_layers=L, num_heads=max(32 // SHRINK, 1),
                      num_kv_heads=max(8 // SHRINK, 1),
                      max_seq_len=max(SEQLEN, 128), dtype="bfloat16")
    base = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    # 7 projection stacks x L layers of perturbation keys (+ slack).
    keys = iter(jax.random.split(jax.random.PRNGKey(1), 8 * L + 16))
    fine = dict(base)
    fine["layers"] = {}
    for k, v in base["layers"].items():
        if v.ndim == 3:
            # layer-wise to bound fp32 temps on a tight chip
            rows = []
            for l in range(v.shape[0]):
                g = jax.random.normal(next(keys), v.shape[1:],
                                      jnp.bfloat16)
                rows.append(v[l] + 0.002 * g * g * g)
                rows[-1].block_until_ready()
            fine["layers"][k] = jnp.stack(rows)
        else:
            fine["layers"][k] = v
    jax.block_until_ready(fine["layers"])
    return cfg, base, fine


def run(L):
    cfg, base, fine = build_world(L)
    log(f"world {L}L built; compressing ...")
    comp = compress_model(base, fine)
    corrupt = float(os.environ.get("DISTILL_CORRUPT", "0"))
    if corrupt:
        # Controlled-recovery mode: deliberately mis-scale the encoder
        # output by x``corrupt`` — distillation must walk the scales
        # back to the well-initialized loss floor. This isolates what
        # the reference's 0.41 -> 0.052 curve shows (initial scales far
        # from the logit-matching optimum) without needing a real
        # fine-tune, which a zero-egress environment cannot download.
        deltas = {k: d._replace(scale=d.scale * corrupt)
                  for k, d in comp.deltas.items()}
        comp = comp._replace(deltas=deltas)
    # DISTILL_LR: the r3 corrupt-recovery finding (x3-corrupted scales
    # recover only 3.29 -> 3.24 in 200 steps at the reference's 1e-4)
    # motivated an lr sweep — scale-only training tolerates much larger
    # steps than full-weight fine-tuning.
    dcfg = DistillConfig(lr=float(os.environ.get("DISTILL_LR", "1e-4")),
                         num_steps=STEPS,
                         compute_dtype="bfloat16", kernel="xla")
    optimizer = optax.adamw(optax.cosine_decay_schedule(dcfg.lr, STEPS),
                            weight_decay=dcfg.weight_decay)
    scales = jax.tree.map(jnp.array, get_scales(comp))
    opt_state = optimizer.init(scales)
    step = make_distill_step(cfg, dcfg, base, fine, comp, optimizer)
    batches = synthetic_batches(cfg.vocab_size, STEPS, BATCH, SEQLEN)
    log(f"distilling: {STEPS} steps x batch {BATCH} x len {SEQLEN} "
        f"(reference recipe, lr {dcfg.lr}) ...")
    losses = []
    t_compile = None
    t0 = time.time()
    for i, b in enumerate(batches):
        scales, opt_state, loss = step(scales, opt_state, jnp.asarray(b))
        if i == 0:
            loss_f = float(loss)  # sync: compile + first step
            t_compile = time.time() - t0
            t_steady = time.time()
            log(f"  step 0: loss {loss_f:.4f} (compile+first "
                f"{t_compile:.0f}s)")
            losses.append(loss_f)
        elif i % 10 == 0 or i == STEPS - 1:
            losses.append(float(loss))
            if i % 50 == 0:
                log(f"  step {i}: loss {losses[-1]:.4f}")
    jax.block_until_ready(loss)
    wall = time.time() - t0
    steady = (wall - t_compile) / max(STEPS - 1, 1)
    return {
        "metric": "distill_loss_final",
        "value": round(losses[-1], 5),
        "loss_initial": round(losses[0], 5),
        "reduction_x": round(losses[0] / max(losses[-1], 1e-9), 2),
        "curve_every10": [round(x, 5) for x in losses],
        "steps": STEPS, "batch": BATCH, "seqlen": SEQLEN,
        "num_layers": L, "shrink": SHRINK, "lr": dcfg.lr,
        "scale_corrupt": float(os.environ.get("DISTILL_CORRUPT", "0")),
        "ms_per_step_steady": round(steady * 1e3, 1),
        "wall_s": round(wall, 1),
        "ms_per_step_32L_extrapolated": round(steady * 1e3 * 32 / L, 1),
        "backend": jax.default_backend(),
    }


def main():
    # Depth ladder via SUBPROCESSES: in-process frees through the relay
    # never return to the pool (bench.py module notes), so a failed
    # deeper rung would poison every shallower retry in the same
    # process. Each rung allocates fresh and exits.
    if os.environ.get("DISTILL_CHILD"):
        log(f"backend={jax.default_backend()}")
        print(json.dumps(run(int(os.environ["LAYERS"]))))
        return
    import subprocess
    import sys as _sys

    for L in [l for l in (LAYERS0, 8, 4) if l <= LAYERS0]:
        log(f"=== distill rung {L}L ===")
        p = subprocess.run(
            [_sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "DISTILL_CHILD": "1", "LAYERS": str(L)},
            stdout=subprocess.PIPE, text=True)
        rec = None
        for line in reversed(p.stdout.strip().splitlines()):
            try:
                rec = json.loads(line)
                break
            except ValueError:
                continue
        if p.returncode == 0 and rec is not None:
            print(json.dumps(rec))
            return
        log(f"  {L}L rung failed (rc={p.returncode}) — degrading")
    raise RuntimeError("all distill rungs failed")


if __name__ == "__main__":
    main()
