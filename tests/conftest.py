"""Test configuration: force CPU backend with a virtual 8-device mesh so
sharding tests run without TPU hardware; Pallas kernels run in interpreter
mode on CPU (handled inside the ops via backend detection).

Note: the env var JAX_PLATFORMS is pinned to the TPU plugin by the
environment's sitecustomize, so the config must be forced post-import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
