"""Environment helpers.

This machine's profile force-prepends a tunneled-TPU platform ("axon") to
``JAX_PLATFORMS``; setting the env var to "cpu" is silently overridden. The
``HAET_PLATFORM`` variable gives drivers/tests an authoritative override via
``jax.config``.
"""

from __future__ import annotations

import os


def apply_platform_override():
    """Honor HAET_PLATFORM=cpu|tpu|axon if set. Call before first jax use."""
    plat = os.environ.get("HAET_PLATFORM")
    if not plat:
        return
    import jax

    jax.config.update("jax_platforms", "cpu" if plat == "cpu" else plat)
