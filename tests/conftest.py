"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-device sharding tests run on a fake 8-device CPU mesh
(xla_force_host_platform_device_count), per SURVEY.md §4. Must run before
jax initializes a backend, hence the env mutation at import time.
"""

import os

# Force-set (not setdefault): the environment may pre-select a TPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
