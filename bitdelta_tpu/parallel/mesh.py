"""Device mesh construction.

Replaces the reference's entire "parallelism strategy" — accelerate
device maps + host-driven `.to()` transfers (reference
bitdelta/utils.py:80-107, train.py:69-78; SURVEY.md P1/P2) — with a
named JAX mesh: axis "data" for batch sharding, axis "model" for tensor
parallelism. XLA GSPMD inserts the ICI collectives; nothing in this
framework moves activations by hand.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ``(data, model)`` mesh.

    Default: all devices on the model axis (TP) — the right default for
    serving one sharded base model; pass ``shape=(d, m)`` to split.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (1, n)
    needed = shape[0] * shape[1]
    if needed > n:
        raise ValueError(f"mesh shape {shape} needs {needed} devices, "
                         f"have {n}")
    arr = np.asarray(devices[:needed]).reshape(shape)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh((1, 1), devices=jax.devices()[:1])


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host runtime bring-up (``jax.distributed.initialize``).

    On TPU pods the arguments are auto-detected from the environment; on
    CPU/GPU fleets pass them explicitly. Safe to call once per process
    before any computation.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
