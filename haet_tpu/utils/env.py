"""Environment helpers.

This machine's profile force-prepends a tunneled-TPU platform ("axon") to
``JAX_PLATFORMS``; setting the env var to "cpu" is silently overridden. The
``HAET_PLATFORM`` variable gives drivers/tests an authoritative override via
``jax.config``.
"""

from __future__ import annotations

import os


def apply_platform_override():
    """Honor HAET_PLATFORM=cpu|tpu|axon if set. Call before first jax use.

    Also arms the persistent compilation cache when ``HAET_COMPILE_CACHE``
    is set (see :func:`enable_compilation_cache`) so every driver gets it
    from the one call they already make.
    """
    plat = os.environ.get("HAET_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", "cpu" if plat == "cpu" else plat)
    enable_compilation_cache()


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_time_secs: float = 1.0):
    """Enable JAX's persistent (on-disk) XLA compilation cache.

    The reference pays its warm-up (CUDA context + any ``torch.compile``)
    on every process start; on TPU the analogous cost is the XLA compile
    of the whole fused train step — ~20-40 s for the flagship car model
    through the hosted runtime, and minutes for the deep PDE configs.
    JAX keys each compiled executable by (HLO, compile options, backend
    version) and re-loads it from ``cache_dir`` on later runs, so process
    restarts, eval re-runs, and checkpoint-resumed training skip
    recompilation entirely. Works on every backend (entries are
    backend-tagged, so CPU tests and TPU runs share a directory safely).

    ``cache_dir=None`` reads ``HAET_COMPILE_CACHE``; unset/empty/"0"
    disables (no jax.config mutation at all). Returns the directory
    enabled, or None. Safe to call more than once.
    """
    if cache_dir is None:
        cache_dir = os.environ.get("HAET_COMPILE_CACHE")
    if not cache_dir or cache_dir == "0":
        return None
    import jax

    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError as e:
        # Best-effort: the cache is an optimization. A read-only checkout
        # (CI/grader mounts) must not turn bench/entry into a hard failure.
        import warnings

        warnings.warn(f"compilation cache disabled ({cache_dir}: {e})")
        return None
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Default threshold (1 s) skips the tiny eager-op programs that would
    # bloat the cache; the programs worth caching (whole train/eval steps)
    # are orders of magnitude past it. Tests pass 0 to cache everything.
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
