"""Test configuration: CPU backend with 8 virtual devices.

This is the TPU-native answer to "test distributed without a cluster"
(SURVEY.md §4): all sharding paths run on a simulated 8-device CPU mesh.
"""

import os

# NOTE: this environment force-prepends the "axon" (tunneled TPU) platform to
# JAX_PLATFORMS; setting the env var is not enough — override the config.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
