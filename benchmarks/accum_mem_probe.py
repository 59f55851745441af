#!/usr/bin/env python
"""Max-points-before-OOM for a REAL training step at batch B: plain vs
gradient accumulation (``TrainConfig.accum_steps``).

Quantifies the accumulation memory lever the same way
``pallas_mem_sweep.py`` quantifies the fused-kernel lever: per config,
exponentially grow then bisect the largest per-sample N for which one
full Trainer step (fwd+bwd+optimizer, the actual
``haet_tpu.train.Trainer`` code path) fits on one chip. Each probe runs
in a fresh subprocess so an OOM cannot poison the device client; failures
are classified with the hardened OOM/infra regexes from pallas_mem_sweep
(only the explicit HBM signature counts as a memory boundary).

Expectation being tested: with a mean-reduced loss, accum_steps=B at
batch B scans B microbatches of one sample each, so peak activation
memory approaches the batch-1 envelope while the optimizer still sees
the full-batch gradient — the max trainable N should move toward the
batch-1 boundary (2.25M for this 1-layer config, docs/benchmarks.md).

Usage:
    python benchmarks/accum_mem_probe.py                  # full sweep
    python benchmarks/accum_mem_probe.py --probe N --accum A --batch B
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pallas_mem_sweep import run_classified_subprocess  # noqa: E402


def run_probe(num_points: int, batch: int, accum: int, bf16: bool = True):
    """One full Trainer step at [batch, num_points]; prints a JSON line."""
    from haet_tpu.utils.env import apply_platform_override

    apply_platform_override()
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from haet_tpu.train import Trainer
    from haet_tpu.utils.config import ModelConfig, TrainConfig

    cfg = ModelConfig(variant="irregular", space_dim=3, fun_dim=1, out_dim=1,
                      n_layers=1, n_hidden=256, n_head=8, slice_num=32,
                      mlp_ratio=2, rotate=45, bf16=bf16)
    trainer = Trainer(
        model=cfg.build(),
        loss_fn=lambda out, b: (
            jnp.mean((out.astype(jnp.float32) - b["y"]) ** 2), {}),
        cfg=TrainConfig(lr=1e-3, epochs=1, batch_size=batch,
                        schedule="constant", weight_decay=0.0,
                        accum_steps=accum),
        total_steps=4,
        batch_args=lambda b: (b["x"], b["fx"]),
    )
    rng = np.random.RandomState(0)
    data = {
        "x": jnp.asarray(rng.rand(batch, num_points, 3).astype(np.float32)),
        "fx": jnp.asarray(rng.rand(batch, num_points, 1).astype(np.float32)),
        "y": jnp.asarray(rng.rand(batch, num_points, 1).astype(np.float32)),
    }
    t0 = time.perf_counter()
    state = trainer.init_state(jax.random.PRNGKey(0), data)
    state, metrics = trainer.train_step(state, data, jax.random.PRNGKey(1))
    ok = bool(np.isfinite(float(metrics["loss"])))
    dt = time.perf_counter() - t0
    stats = getattr(jax.devices()[0], "memory_stats", lambda: None)()
    peak = (stats or {}).get("peak_bytes_in_use")
    print(json.dumps({
        "num_points": num_points, "batch": batch, "accum": accum,
        "ok": ok, "first_call_seconds": round(dt, 2),
        "peak_memory_mb": round(peak / 2**20, 1) if peak else None,
    }), flush=True)
    return 0 if ok else 1


def accum_probe_subprocess(num_points: int, batch: int, accum: int,
                           infra_retries: int = 2) -> dict:
    """Fresh-process probe via this file's --probe mode, with
    pallas_mem_sweep's retry/classification policy."""
    cmd = [sys.executable, os.path.abspath(__file__),
           "--probe", str(num_points), "--batch", str(batch),
           "--accum", str(accum)]
    return run_classified_subprocess(
        cmd, {"num_points": num_points, "batch": batch, "accum": accum},
        infra_retries)


def find_max_n(batch: int, accum: int, start: int, limit: int, log):
    """Double until failure, then bisect; same contract as
    pallas_mem_sweep.find_max_n."""
    n = start
    last_ok, first_bad, bad_kind = None, None, None
    while n <= limit:
        rec = accum_probe_subprocess(n, batch, accum)
        log(rec)
        if rec.get("ok"):
            last_ok = n
            n *= 2
        else:
            first_bad = n
            bad_kind = rec.get("failure")
            break
    if first_bad is None:
        return last_ok, False, None
    # lo must only ever hold a PROBED-ok N: seeding it with start//2 when
    # the very first probe fails would let the loop converge onto (and
    # report) a boundary that was never verified and may itself OOM
    # (pallas_mem_sweep.find_max_n returns 0 there; same contract here)
    lo, hi = (last_ok or 0), first_bad
    while hi - lo > max(lo // 8, 16384):  # 12.5% resolution like the sweep
        mid = (lo + hi) // 2
        if mid == 0:
            break
        rec = accum_probe_subprocess(mid, batch, accum)
        log(rec)
        if rec.get("ok"):
            lo = mid
        else:
            hi = mid
            bad_kind = rec.get("failure")
    return lo, True, bad_kind


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--probe", type=int, default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--start", type=int, default=65536)
    p.add_argument("--limit", type=int, default=4_000_000)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--only", type=int, default=None,
                   help="sweep only this accum value (resume support)")
    args = p.parse_args()

    if args.probe is not None:
        sys.exit(run_probe(args.probe, args.batch, args.accum))

    out = open(args.out, "a") if args.out else None

    def log(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        if out:
            out.write(line + "\n")
            out.flush()

    summary = {}
    accums = (args.only,) if args.only else (1, args.batch)
    for accum in accums:
        max_n, bounded, kind = find_max_n(
            args.batch, accum, args.start, args.limit, log)
        summary[f"accum{accum}"] = {
            "max_n": max_n, "hit_boundary": bounded,
            "boundary_failure": kind,
        }
    log({"summary": summary, "batch": args.batch})


if __name__ == "__main__":
    main()
