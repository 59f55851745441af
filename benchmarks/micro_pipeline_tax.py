#!/usr/bin/env python
"""Single-chip "pipeline tax": plain apply vs PipelinedModel on a 1-device
(dp1, pp1) mesh at the flagship bench config.

Quantifies the pure execution-structure overhead of the pipeline
machinery (shard_map body + tick lax.scan + self-ppermute + per-block
remat) with zero communication and zero bubble — the floor a multi-chip
pp deployment pays per stage. Variants' timing windows are INTERLEAVED
(the hosted chip's throughput drifts 3-10x between moments; sequential
A/Bs are not comparable — docs/benchmarks.md "Timing methodology,
revisited") and use lo/hi differential windows so the dispatch RTT
cancels.

    python benchmarks/micro_pipeline_tax.py [--points 32768 --micro 1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from haet_tpu.utils.env import apply_platform_override  # noqa: E402

apply_platform_override()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench_flags import make_runs  # noqa: E402


def main():
    from haet_tpu.models import HAETransolverIrregularMesh
    from haet_tpu.parallel import PipelinedModel, make_pp_mesh

    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--n_layers", type=int, default=2)
    ap.add_argument("--n_hidden", type=int, default=256)
    ap.add_argument("--micro", type=int, default=1,
                    help="microbatches (at batch 1, 1 is the only choice "
                         "without padding)")
    ap.add_argument("--rounds", type=int, default=8)
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform != "cpu"
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, args.points, 7).astype(np.float32))
    y = jnp.asarray(rng.randn(1, args.points, 4).astype(np.float32))

    model = HAETransolverIrregularMesh(
        space_dim=7, fun_dim=0, out_dim=4, n_layers=args.n_layers,
        n_hidden=args.n_hidden, n_head=8, slice_num=32, mlp_ratio=2,
        rotate=45, dtype=jnp.bfloat16 if on_tpu else None)
    mesh = make_pp_mesh(n_dp=1, n_pp=1, devices=jax.devices()[:1])

    model_remat = HAETransolverIrregularMesh(
        space_dim=7, fun_dim=0, out_dim=4, n_layers=args.n_layers,
        n_hidden=args.n_hidden, n_head=8, slice_num=32, mlp_ratio=2,
        rotate=45, use_checkpoint=True,
        dtype=jnp.bfloat16 if on_tpu else None)

    runs = {}
    with mesh:
        runs["plain"] = make_runs(model, x, y)
        print("compiled plain", flush=True)
        # fair baseline for the remat'd pipeline: the plain model with
        # per-block remat (use_checkpoint) pays the same recompute
        runs["plain-remat"] = make_runs(model_remat, x, y)
        print("compiled plain-remat", flush=True)
        for remat in (True, False):
            pm = PipelinedModel(model, mesh, num_microbatches=args.micro,
                                dp_axis="dp", remat=remat)
            runs[f"pp1-remat={remat}"] = make_runs(pm, x, y)
            print(f"compiled pp1-remat={remat}", flush=True)

        import time  # noqa: F401  (make_runs closures time internally)

        best = {name: [float("inf"), float("inf")] for name in runs}
        for _ in range(args.rounds):
            for name, (once, lo, hi, _, _) in runs.items():
                best[name][0] = min(best[name][0], once(lo))
                best[name][1] = min(best[name][1], once(hi))
    base = None
    for name, (once, lo, hi, k_lo, k_hi) in runs.items():
        dt = max(best[name][1] - best[name][0], 1e-9) / (k_hi - k_lo)
        if base is None:
            base = dt
        print(f"{name:18s} {dt * 1e3:8.3f} ms/step "
              f"{args.points / dt / 1e6:8.2f} Mpts/s "
              f"(x{dt / base:.3f} vs plain)", flush=True)


if __name__ == "__main__":
    main()
