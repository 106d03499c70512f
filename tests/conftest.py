"""Test configuration: run everything on a simulated 8-device CPU mesh.

The reference has no test suite (SURVEY.md section 4); we design our own.
Sharding/collective tests need multiple devices, which we fake with XLA's
host-platform device splitting so the suite runs anywhere (CI, dev boxes,
TPU hosts) without a pod.
"""

import os

# Must be set before jax initializes its backends. Force-override: the
# host environment may pin JAX_PLATFORMS to a real accelerator tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
