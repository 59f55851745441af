#!/usr/bin/env python
"""Scale probe: forward latency + device memory vs point count.

Mirrors ``benchmarks/00-VelocityMemMocker/velocity-mem-checker.py``:
1-layer irregular model (slice_num=32), N in {1e3 ... 3e6}, OOM-guarded.
Reports points/sec and per-device peak memory (jax memory_stats).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from haet_tpu.utils.env import apply_platform_override  # noqa: E402

apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np


def benchmark_model(num_points: int, bf16: bool = True):
    from haet_tpu.models import HAETransolverIrregularMesh

    model = HAETransolverIrregularMesh(
        space_dim=3, fun_dim=1, out_dim=1, n_layers=1, n_hidden=256,
        n_head=8, slice_num=32, mlp_ratio=2, rotate=45,
        dtype=jnp.bfloat16 if bf16 else None,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, num_points, 3).astype(np.float32))
    fx = jnp.asarray(rng.rand(1, num_points, 1).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)

    # Data-dependent forwards inside ONE jit (single dispatch), with
    # DIFFERENTIAL lo/hi iteration counts: (t_hi - t_lo)/(hi - lo) cancels
    # the dispatch/fetch RTT exactly. Windows are interleaved and the min
    # of each taken, so both come from the same regime of the drifting,
    # time-shared chip (docs/benchmarks.md "Timing methodology, revisited").
    n_lo = 2
    n_hi = max(16, min(256, 4_000_000 // num_points))  # window >> RTT jitter

    def make_chain(n_iters):
        @jax.jit
        def chain(variables, x, fx):
            def body(_, cur):
                out = model.apply(variables, x, cur)
                return cur + 0.0 * out
            return jax.lax.fori_loop(0, n_iters, body, fx)
        return chain

    chains = {n: make_chain(n) for n in (n_lo, n_hi)}

    # forced host fetches: block_until_ready is a no-op under the tunneled
    # runtime, so end timing with a scalar transfer
    def window(n):
        t0 = time.perf_counter()
        float(jnp.sum(chains[n](variables, x, fx)))
        return time.perf_counter() - t0

    window(n_lo)  # compile + warmup
    window(n_hi)
    best_lo = best_hi = float("inf")
    for _ in range(4):
        best_lo = min(best_lo, window(n_lo))
        best_hi = min(best_hi, window(n_hi))
    diff = best_hi - best_lo
    upper_bound = diff <= 0
    dt = best_hi / n_hi if upper_bound else diff / (n_hi - n_lo)

    mem = None
    stats = getattr(jax.devices()[0], "memory_stats", lambda: None)()
    if stats:
        mem = stats.get("peak_bytes_in_use", stats.get("bytes_in_use"))
    return {
        "num_points": num_points,
        "forward_seconds": dt,
        "points_per_sec": num_points / dt,
        "peak_memory_mb": (mem / 2**20) if mem else None,
        **({"is_upper_bound": True} if upper_bound else {}),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max_points", type=int, default=3_000_000)
    p.add_argument("--bf16", type=int, default=1)
    args = p.parse_args()
    sweep = [1_000, 10_000, 100_000, 1_000_000, 2_000_000, 3_000_000]
    results = []
    for n in sweep:
        if n > args.max_points:
            break
        try:
            r = benchmark_model(n, bool(args.bf16))
            results.append(r)
            print(json.dumps(r))
        except Exception as e:  # OOM guard (velocity-mem-checker.py:102-106)
            print(json.dumps({"num_points": n, "error": str(e)[:200]}))
            break
    return results


if __name__ == "__main__":
    main()
