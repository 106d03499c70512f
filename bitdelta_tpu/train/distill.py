"""Scale distillation: refine the per-matrix delta scales against the
fine-tuned teacher's logits.

Reimplements the reference's training loop (reference
bitdelta/train.py:60-88) as a single jitted step:

  * teacher = the original fine-tune (frozen), student = base weights +
    1-bit delta with trainable scales;
  * loss = MSE over the full logits;
  * AdamW (weight_decay 0.01, torch's default) with cosine-annealed lr
    (default 1e-4 over num_steps).

TPU-first differences from the reference: the *only* trainable leaves
are the scales (the paper's stated algorithm — docs/index.html:319-338 —
whereas the reference's optimizer incidentally received every
requires_grad param, train.py:60); teacher and student run in the same
jitted computation on the same mesh, so there is no device juggling or
host-side logit transfer (the reference's P1 scheme, train.py:69-78);
and both forwards share the base weights' HBM.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.compress import (CompressedModel, get_scales, student_params,
                             with_scales)
from ..models.config import ModelConfig
from ..models import llama


class DistillConfig(NamedTuple):
    lr: float = 1e-4                  # reference utils.py:21
    num_steps: int = 100              # reference utils.py:22 (200 for 7B)
    weight_decay: float = 0.01        # torch AdamW default used by train.py:60
    compute_dtype: str = "bfloat16"
    kernel: str = "xla"               # "pallas": custom-VJP MXU delta kernels


def make_distill_step(cfg: ModelConfig, dcfg: DistillConfig,
                      base_params, finetuned_params,
                      compressed: CompressedModel, optimizer,
                      mesh=None, batch_sharding=None, model=None):
    """Build the jitted (scales, opt_state, batch) -> (scales, opt_state,
    loss) step. ``finetuned_params`` is the teacher; gradients flow only
    into the scales pytree.

    The big pytrees (student/teacher weights, packed sign masks) enter
    the jit as ARGUMENTS, not captured constants — closing over them
    embeds ~2x model-size constants into the lowered program (at 7B
    that's >7 GB shipped through compilation; jax warns via
    JAX_CAPTURED_CONSTANTS_WARN_BYTES)."""
    from ..core.delta import BinaryDelta

    model = model if model is not None else llama
    compute_dtype = jnp.dtype(dcfg.compute_dtype)
    s_params = student_params(base_params, compressed)
    packed = {name: d.packed for name, d in compressed.deltas.items()}

    # "pallas_train" = differentiable subset: custom-VJP delta matmuls
    # but XLA attention (the flash attention kernels are inference-only).
    kernel = "pallas_train" if dcfg.kernel == "pallas" else dcfg.kernel

    def loss_fn(scales: Dict[str, jax.Array], sp, tp, pk,
                batch: jax.Array) -> jax.Array:
        deltas = {name: BinaryDelta(packed=pk[name], scale=scales[name])
                  for name in pk}
        student_logits = model.forward(cfg, sp, batch, deltas=deltas,
                                       compute_dtype=compute_dtype,
                                       kernel=kernel)
        teacher_logits = jax.lax.stop_gradient(
            model.forward(cfg, tp, batch, compute_dtype=compute_dtype))
        diff = (teacher_logits - student_logits).astype(jnp.float32)
        return jnp.mean(diff * diff)

    def step_inner(sp, tp, pk, scales, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(scales, sp, tp, pk, batch)
        updates, opt_state = optimizer.update(grads, opt_state, scales)
        scales = optax.apply_updates(scales, updates)
        return scales, opt_state, loss

    jitted = jax.jit(step_inner, donate_argnums=(3, 4))
    if mesh is not None:
        from jax.sharding import NamedSharding
        from ..parallel.sharding import batch_spec

        bspec = NamedSharding(mesh, batch_sharding or batch_spec())

    def step(scales, opt_state, batch):
        if mesh is not None:
            batch = jax.device_put(batch, bspec)
        return jitted(s_params, finetuned_params, packed,
                      scales, opt_state, batch)

    return step


def save_distill_checkpoint(path: str, step: int, scales, opt_state):
    """Mid-run training state (scales + AdamW moments + step) as npz —
    crash recovery the reference lacks (its only artifact is the
    pre-training diff_untrained.pt, train.py:58)."""
    leaves = jax.tree.leaves((scales, opt_state))
    np.savez(path, __step=np.int64(step),
             **{f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_distill_checkpoint(path: str, scales_like, opt_state_like):
    z = np.load(path)
    structure = jax.tree.structure((scales_like, opt_state_like))
    leaves = [jnp.asarray(z[f"leaf{i}"])
              for i in range(structure.num_leaves)]
    scales, opt_state = jax.tree.unflatten(structure, leaves)
    return int(z["__step"]), scales, opt_state


def distill_scales(cfg: ModelConfig, base_params, finetuned_params,
                   compressed: CompressedModel, batches,
                   dcfg: DistillConfig = DistillConfig(),
                   mesh=None, progress: bool = False, model=None,
                   checkpoint_path: str = None, checkpoint_every: int = 0,
                   ) -> Tuple[CompressedModel, List[float]]:
    """Run scale distillation; returns (calibrated model, loss history).

    ``batches``: array/iterable of ``(B, S)`` int32 token batches; the lr
    schedule spans ``dcfg.num_steps`` regardless of how many batches are
    supplied (extra batches cycle the cosine floor, matching torch's
    CosineAnnealingLR behavior past T_max only approximately — supply
    exactly num_steps batches for reference semantics).

    ``checkpoint_path`` + ``checkpoint_every``: periodically save
    (scales, optimizer state, step); when the file already exists, resume
    from it (same batches => identical trajectory as an uninterrupted
    run, since the optimizer state carries the schedule step).
    """
    import os

    schedule = optax.cosine_decay_schedule(dcfg.lr, dcfg.num_steps)
    optimizer = optax.adamw(schedule, weight_decay=dcfg.weight_decay)
    # Copy: the jitted step donates its scales argument, and the first
    # call must not consume the caller's arrays inside ``compressed``.
    scales = jax.tree.map(jnp.array, get_scales(compressed))
    opt_state = optimizer.init(scales)

    start = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        start, scales, opt_state = load_distill_checkpoint(
            checkpoint_path, scales, opt_state)
        if progress:
            print(f"[distill] resuming from {checkpoint_path} at step "
                  f"{start}", flush=True)

    step = make_distill_step(cfg, dcfg, base_params, finetuned_params,
                             compressed, optimizer, mesh=mesh, model=model)

    losses: List[float] = []
    for i, batch in enumerate(batches):
        if i < start:
            continue
        scales, opt_state, loss = step(scales, opt_state,
                                       jnp.asarray(batch, jnp.int32))
        losses.append(float(loss))
        if progress and (i % 10 == 0 or i + 1 == len(batches)):
            print(f"[distill] step {i}: loss {losses[-1]:.6f}", flush=True)
        if (checkpoint_path and checkpoint_every
                and (i + 1) % checkpoint_every == 0):
            save_distill_checkpoint(checkpoint_path, i + 1, scales,
                                    opt_state)
    return with_scales(compressed, scales), losses
