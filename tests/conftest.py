"""Test configuration: CPU backend, 8 virtual devices, float64 parity mode.

The reference library is double precision on CPU; parity tests run the same
way (SURVEY.md §7).  Sharding tests use the 8-device host platform
(--xla_force_host_platform_device_count, SURVEY.md §4 multi-node testing).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# The axon sitecustomize registers the TPU-tunnel backend regardless of
# JAX_PLATFORMS; force the CPU platform for the test suite explicitly.
jax.config.update("jax_platforms", "cpu")
