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

# Persistent executable cache: identical test programs (the big
# scan-under-mesh Trainer compiles dominate suite wall time) become disk
# loads on re-runs. Keyed by (HLO, options, backend) so it can never mask
# a code change; HAET_COMPILE_CACHE=0 disables. Best-effort on read-only
# checkouts.
from haet_tpu.utils.env import enable_compilation_cache  # noqa: E402

enable_compilation_cache(
    os.environ.get("HAET_COMPILE_CACHE")
    or os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    ".xla_cache"))
