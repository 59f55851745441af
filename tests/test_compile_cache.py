"""Persistent XLA compilation cache (``HAET_COMPILE_CACHE``).

The reference re-pays its startup warm-up every process launch; on TPU the
analogous cost is the whole-train-step XLA compile (~20-40 s flagship
through the hosted runtime). ``haet_tpu.utils.env.enable_compilation_cache``
persists compiled executables to disk so restarts / eval re-runs / resumes
skip it. These tests run the round trip in real subprocesses (the cache
config must be set before the first compile, so it can't be toggled inside
the already-initialized pytest process).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# min_compile_time_secs=0: cache even this tiny program (the production
# default 1 s skips trivial programs; thresholds are config, not mechanism).
SCRIPT = r"""
import json, time
from haet_tpu.utils.env import apply_platform_override, enable_compilation_cache

apply_platform_override()
enabled = enable_compilation_cache(min_compile_time_secs=0.0)
assert enabled, "HAET_COMPILE_CACHE was set; cache must arm"

import jax
import jax.numpy as jnp


@jax.jit
def f(x):
    return (x @ x.T).sum()


v = float(f(jnp.arange(64.0).reshape(8, 8)))
print(json.dumps({"value": v}))
"""


def _run(cache_dir):
    env = dict(os.environ, HAET_PLATFORM="cpu",
               HAET_COMPILE_CACHE=str(cache_dir))
    out = subprocess.run([sys.executable, "-c", SCRIPT], capture_output=True,
                         text=True, env=env, cwd=REPO, timeout=300)
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def _cache_files(cache_dir):
    return sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(cache_dir) for f in fs
    )


def test_cache_round_trip_across_processes(tmp_path):
    cache = tmp_path / "xla_cache"
    r1 = _run(cache)
    files = _cache_files(cache)
    assert files, "first run must write at least one cache entry"

    r2 = _run(cache)
    # sum(x@x.T) = sum_k (col_k sum)^2 = sum_k (8k+224)^2 for x=arange(64)
    assert r2["value"] == r1["value"] == 510720.0
    # Second process must HIT: an identical program that missed would have
    # serialized a new entry and grown the file set.
    assert _cache_files(cache) == files


def test_unset_env_is_a_no_op(tmp_path):
    env = dict(os.environ, HAET_PLATFORM="cpu")
    env.pop("HAET_COMPILE_CACHE", None)
    probe = (
        "from haet_tpu.utils.env import enable_compilation_cache;"
        "import jax;"
        "assert enable_compilation_cache() is None;"
        "assert jax.config.jax_compilation_cache_dir in (None, '')"
    )
    out = subprocess.run([sys.executable, "-c", probe], capture_output=True,
                         text=True, env=env, cwd=REPO, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
