#!/usr/bin/env python
"""Max-points-before-OOM sweep: XLA slice path vs fused Pallas kernels.

The fused Pallas slice/deslice kernels (``ops/pallas/slice_kernels.py``)
exist to remove the ``[B, H, N, G]`` rep-slice weight tensor from HBM —
a *memory* feature, not a speed win at HAET sizes (docs/benchmarks.md).
This sweep measures the claim: for each path, exponentially grow then
bisect the largest N for which a 1-layer forward (the reference's
velocity-mem-checker config, ``velocity-mem-checker.py:82-106``) fits on
one chip. Each probe runs in a fresh subprocess so an OOM cannot poison
the device client for later probes.

Output: one JSON line per probe, then a summary with the measured max-N
per path and the implied auto-dispatch threshold (see
``PhysicsAttention.use_pallas="auto"``).

Usage:
    python benchmarks/pallas_mem_sweep.py                 # full sweep
    python benchmarks/pallas_mem_sweep.py --probe N --pallas 1   # one probe
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_probe(num_points: int, use_pallas: bool, bf16: bool = True,
              grad: bool = False, slice_num: int = 32):
    """One forward (or fwd+bwd when ``grad``) at N points; prints a JSON
    line; exits 0 on success."""
    from haet_tpu.utils.env import apply_platform_override

    apply_platform_override()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from haet_tpu.models import HAETransolverIrregularMesh

    model = HAETransolverIrregularMesh(
        space_dim=3, fun_dim=1, out_dim=1, n_layers=1, n_hidden=256,
        n_head=8, slice_num=slice_num, mlp_ratio=2, rotate=45,
        use_pallas=use_pallas,
        dtype=jnp.bfloat16 if bf16 else None,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, num_points, 3).astype(np.float32))
    fx = jnp.asarray(rng.rand(1, num_points, 1).astype(np.float32))
    t0 = time.perf_counter()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    if grad:
        def loss(v, x, fx):
            out = model.apply(v, x, fx)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss))(variables, x, fx)
        total = sum(
            jnp.sum(jnp.abs(l.astype(jnp.float32)))
            for l in jax.tree_util.tree_leaves(g)
        )
        ok = bool(jnp.isfinite(total))
    else:
        out = jax.jit(lambda v, x, fx: model.apply(v, x, fx))(
            variables, x, fx)
        ok = bool(jnp.isfinite(jnp.sum(out.astype(jnp.float32))))
    dt = time.perf_counter() - t0
    stats = getattr(jax.devices()[0], "memory_stats", lambda: None)()
    peak = (stats or {}).get("peak_bytes_in_use")
    rec = {
        "num_points": num_points,
        "pallas": use_pallas,
        "grad": grad,
        "slice_num": slice_num,
        "ok": ok,
        "first_call_seconds": round(dt, 2),
        "peak_memory_mb": round(peak / 2**20, 1) if peak else None,
    }
    print(json.dumps(rec), flush=True)
    return 0 if ok else 1


import re

# Genuine device-memory exhaustion requires the HBM-specific signature
# ("Ran out of memory in memory space hbm" / the "Used X of Y hbm" usage
# breakdown) — NOT bare RESOURCE_EXHAUSTED, which gRPC also uses for
# transport/quota rejections through the tunneled compile service. A bare
# RESOURCE_EXHAUSTED without an HBM breakdown is therefore classified as
# retryable infra: if it was a real OOM it recurs on the retry with the
# breakdown; if it was a rate limit, retrying is exactly right. Everything
# else — HTTP 5xx, tunnel drops, tpu_compile_helper crashes — is an
# infrastructure failure and NOT a memory signal (VERDICT r2 weak #5).
_OOM_RE = re.compile(
    r"Ran out of memory in memory space (?:hbm|vmem)"
    r"|Used [0-9.]+[KMGT]i?B? of [0-9.]+[KMGT]i?B? (?:hbm|memory)"
    r"|Allocation .{0,80} exceeds .{0,80}\bhbm\b",
    re.IGNORECASE,
)
_INFRA_RE = re.compile(
    r"HTTP 5\d\d|tpu_compile_helper|DEADLINE_EXCEEDED|UNAVAILABLE|"
    r"Connection (reset|refused)|Socket closed|INTERNAL|"
    r"RESOURCE_EXHAUSTED",  # ambiguous without an HBM breakdown -> retry
)


def classify_failure(err: str) -> str:
    """'oom' | 'infra' | 'other' from a failing probe's stderr.

    'oom' is claimed only on the HBM-specific memory signature; checked
    FIRST so a genuine OOM wrapped in a RESOURCE_EXHAUSTED status still
    classifies as oom, while a bare RESOURCE_EXHAUSTED (gRPC quota /
    message-size) falls through to the retryable 'infra' path.
    """
    if _OOM_RE.search(err):
        return "oom"
    if _INFRA_RE.search(err):
        return "infra"
    return "other"


def run_classified_subprocess(cmd: list, tag: dict,
                              infra_retries: int = 2) -> dict:
    """Run a probe command in a fresh process; return its JSON record or a
    classified failure mark (``tag`` identifies the probe in retry logs
    and failure records). Infrastructure failures (compile-service/tunnel
    errors) and timeouts are re-probed up to ``infra_retries`` times —
    they carry no information about the memory boundary."""
    attempts = 0
    while True:
        attempts += 1
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=1800)
        except subprocess.TimeoutExpired:
            # On the time-shared chip a probe can exceed 30 min purely from
            # tenancy contention — a timeout is an infra condition, not a
            # memory signal, so it gets the same retry budget (r3: the
            # G=128 XLA boundary was once mis-set by exactly this).
            if attempts <= infra_retries:
                print(json.dumps({**tag, "retrying_timeout": attempts}),
                      flush=True)
                continue
            return {**tag, "ok": False, "failure": "timeout",
                    "timeout": True}
        for line in proc.stdout.splitlines():
            try:
                rec = json.loads(line)
                if "num_points" in rec:
                    return rec
            except json.JSONDecodeError:
                continue
        err = proc.stderr or ""
        kind = classify_failure(err)
        if kind == "infra" and attempts <= infra_retries:
            print(json.dumps({**tag, "retrying_infra_failure": attempts}),
                  flush=True)
            time.sleep(10 * attempts)
            continue
        # prefer the line that names the OOM ("Ran out of memory in memory
        # space hbm. Used X of Y hbm") over the HTTP-transport wrapper
        oom_lines = [l for l in err.splitlines() if _OOM_RE.search(l)]
        other = [l for l in err.splitlines()
                 if _INFRA_RE.search(l) or "Error" in l]
        pick = oom_lines or other
        tail = (re.sub(r"\x1b\[[0-9;]*m", "", pick[0]).strip()[:240]
                if pick else f"rc={proc.returncode}")
        return {**tag, "ok": False, "failure": kind, "oom": kind == "oom",
                "error_tail": tail}


def probe_subprocess(num_points: int, use_pallas: bool,
                     grad: bool = False, slice_num: int = 32,
                     infra_retries: int = 2) -> dict:
    """Fresh-process probe of this file's --probe mode."""
    cmd = [sys.executable, os.path.abspath(__file__),
           "--probe", str(num_points), "--pallas", str(int(use_pallas)),
           "--grad", str(int(grad)), "--slice_num", str(slice_num)]
    return run_classified_subprocess(
        cmd, {"num_points": num_points, "pallas": use_pallas},
        infra_retries)


def find_max_n(use_pallas: bool, start: int, limit: int, log, grad=False,
               slice_num=32):
    """Double until failure, then bisect. Returns
    ``(max_ok_n, hit_boundary, boundary_failure_kind)`` — the failure kind
    of the rung that set the boundary must be 'oom' for the boundary to
    mean anything (infra failures are already retried in the probe)."""
    n = start
    last_ok, first_bad, bad_kind = None, None, None
    while n <= limit:
        rec = probe_subprocess(n, use_pallas, grad, slice_num)
        log(rec)
        if rec.get("ok"):
            last_ok = n
            n *= 2
        else:
            first_bad = n
            bad_kind = rec.get("failure", "unknown")
            break
    if first_bad is None:
        return last_ok, False, None  # hit the sweep limit without OOM
    if last_ok is None:
        return 0, True, bad_kind
    lo, hi = last_ok, first_bad
    while hi - lo > max(lo // 5, 1 << 16):
        mid = (lo + hi) // 2
        rec = probe_subprocess(mid, use_pallas, grad, slice_num)
        log(rec)
        if rec.get("ok"):
            lo = mid
        else:
            hi = mid
            bad_kind = rec.get("failure", "unknown")
    return lo, True, bad_kind


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--probe", type=int, default=None)
    p.add_argument("--pallas", type=int, default=0)
    p.add_argument("--slice_num", type=int, default=32)
    p.add_argument("--grad", type=int, default=0,
                   help="probe fwd+bwd (the training memory claim) instead "
                        "of forward-only")
    p.add_argument("--start", type=int, default=1_000_000)
    p.add_argument("--limit", type=int, default=128_000_000)
    p.add_argument("--only", type=str, default=None, choices=["xla", "pallas"],
                   help="probe just one path (for targeted boundary re-runs)")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    if args.probe is not None:
        sys.exit(run_probe(args.probe, bool(args.pallas),
                           grad=bool(args.grad), slice_num=args.slice_num))

    records = []

    def log(rec):
        records.append(rec)
        print(json.dumps(rec), flush=True)

    max_xla = max_pallas = None
    xla_oomed = pallas_oomed = None
    xla_kind = pallas_kind = None
    if args.only in (None, "xla"):
        max_xla, xla_oomed, xla_kind = find_max_n(
            False, args.start, args.limit, log, grad=bool(args.grad),
            slice_num=args.slice_num)
    if args.only in (None, "pallas"):
        max_pallas, pallas_oomed, pallas_kind = find_max_n(
            True, args.start, args.limit, log, grad=bool(args.grad),
            slice_num=args.slice_num)
    summary = {
        "summary": True,
        "grad": bool(args.grad),
        "slice_num": args.slice_num,
        "max_points_xla": max_xla,
        "max_points_pallas": max_pallas,
        "xla_hit_oom": xla_oomed,
        "pallas_hit_oom": pallas_oomed,
        # 'oom' = boundary set by a genuine HBM RESOURCE_EXHAUSTED; anything
        # else means the boundary is infrastructure-limited, not memory
        "xla_boundary_failure": xla_kind,
        "pallas_boundary_failure": pallas_kind,
        "pallas_headroom_x": (round(max_pallas / max_xla, 2)
                              if max_xla and max_pallas else None),
        # auto-dispatch rule: switch to the fused path once N is beyond
        # what the XLA path can hold (with a 25% safety margin)
        "auto_threshold": int(max_xla * 0.75) if max_xla else None,
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for rec in records + [summary]:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
