#!/usr/bin/env python
"""Autoregressive rollout serving: ONE exported scan program vs the
reference's per-frame eval loop.

The reference's NS evaluation re-runs the model once per output frame in
a python loop (teacher-free rollout, `exp_ns.py` reference semantics:
predict a frame, slide the input window, repeat T_OUT times). The
TPU-native deployment form is :func:`haet_tpu.export.save_rollout_artifact`
— all T_OUT steps under ``lax.scan`` inside one AOT StableHLO program, so
a served rollout request costs ONE dispatch.

Measured here on the exact NS preset (64x64 grid, 8 layers, n_hidden=256,
T_in=10, 10 output frames), both interleaved within one process
(sequential A/Bs flip sign on the time-shared chip — docs/benchmarks.md):

* ``rollout_artifact`` — the exported scan program, weights bound.
* ``per_frame_loop`` — 10 chained dispatches of the single-step bound
  artifact (the loop's best case: frames chain on device through jax's
  async queue, no host fetch between frames; a literal reference-style
  loop that fetched each frame would add one tunnel RTT per frame).

Two numbers per variant (same convention as micro_serving_latency.py):
``e2e_latency_s`` = one request's wall time incl. dispatch+fetch;
``device_latency_s`` = steady-state device time via differential
lo/hi-window chaining.

Usage: python benchmarks/micro_rollout.py [--rounds 6] [--steps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from haet_tpu.utils.env import apply_platform_override, enable_compilation_cache  # noqa: E402

apply_platform_override()
enable_compilation_cache(
    os.environ.get("HAET_COMPILE_CACHE")
    or os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    ".xla_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

LO, HI = 3, 13


def measure(calls, x, rounds):
    """{name: (e2e_best, device_per_call_best)} — all windows of all
    variants interleaved per round (see micro_serving_latency.measure)."""

    def window(call, k):
        t0 = time.perf_counter()
        v = x
        for _ in range(k):
            v = call(v)
        float(jnp.mean(v.astype(jnp.float32)))
        return time.perf_counter() - t0

    best = {}
    for name, call in calls.items():
        window(call, 1)  # compile / warm
        best[name] = {"e2e": float("inf"), LO: float("inf"),
                      HI: float("inf")}
    for _ in range(rounds):
        for name, call in calls.items():
            best[name]["e2e"] = min(best[name]["e2e"], window(call, 1))
            best[name][LO] = min(best[name][LO], window(call, LO))
            best[name][HI] = min(best[name][HI], window(call, HI))
    out = {}
    for name, b in best.items():
        diff = b[HI] - b[LO]
        dev = diff / (HI - LO) if diff > 0 else b[HI] / HI
        out[name] = (b["e2e"], dev)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model/grid (CI plumbing check)")
    args = ap.parse_args()

    import dataclasses

    from haet_tpu import export as hexport
    from haet_tpu.utils.config import ns_config

    on_tpu = jax.devices()[0].platform != "cpu"
    mc = ns_config().model
    if args.smoke:
        mc = dataclasses.replace(mc, n_layers=1, n_hidden=32, n_head=2,
                                 slice_num=8, H=8, W=8, unified_pos=False)
    mc = dataclasses.replace(mc, bf16=on_tpu)
    model = mc.build()

    n = mc.H * mc.W
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.rand(1, n, 2).astype(np.float32))
    fx0 = jnp.asarray(rng.randn(1, n, mc.fun_dim).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pos, fx0)

    with tempfile.TemporaryDirectory() as td:
        roll_dir = os.path.join(td, "rollout")
        step_dir = os.path.join(td, "step")
        hexport.save_rollout_artifact(roll_dir, model, variables,
                                      (pos, fx0), steps=args.steps)
        hexport.save_artifact(step_dir, model, variables, (pos, fx0))
        roll = hexport.load_artifact(roll_dir).bind(variables)
        step = hexport.load_artifact(step_dir).bind(variables)
        w = int(getattr(model, "out_dim", 1))

        def rollout_call(v):
            out = roll(pos, v)
            return v + (1e-12 * jnp.mean(out)).astype(v.dtype)

        def per_frame_call(v):
            fx = v
            outs = []
            for _ in range(args.steps):
                im = step(pos, fx)
                outs.append(im)
                fx = jnp.concatenate([fx[..., w:], im.astype(fx.dtype)],
                                     axis=-1)
            out = jnp.concatenate(outs, axis=-1)
            return v + (1e-12 * jnp.mean(out)).astype(v.dtype)

        # value parity first: the artifact IS the loop
        a = np.asarray(roll(pos, fx0), np.float32)
        fx = fx0
        frames = []
        for _ in range(args.steps):
            im = step(pos, fx)
            frames.append(np.asarray(im, np.float32))
            fx = jnp.concatenate([fx[..., w:], im.astype(fx.dtype)],
                                 axis=-1)
        b = np.concatenate(frames, axis=-1)
        err = float(np.max(np.abs(a - b)))
        tol = 2e-2 if on_tpu else 1e-5  # bf16 accumulates over 10 frames
        assert err <= tol, f"rollout != per-frame loop: max abs {err}"

        res = measure({"rollout_artifact": rollout_call,
                       "per_frame_loop": per_frame_call},
                      fx0, args.rounds)

    (e2e_r, dev_r) = res["rollout_artifact"]
    (e2e_f, dev_f) = res["per_frame_loop"]
    print(json.dumps({
        "metric": "rollout_latency",
        "grid": [mc.H, mc.W],
        "steps": args.steps,
        "value_parity_max_abs": round(err, 6),
        "rollout_artifact": {"e2e_latency_s": round(e2e_r, 5),
                             "device_latency_s": round(dev_r, 5)},
        "per_frame_loop": {"e2e_latency_s": round(e2e_f, 5),
                           "device_latency_s": round(dev_f, 5)},
        "e2e_speedup": round(e2e_f / e2e_r, 2),
        "device_speedup": round(dev_f / dev_r, 2),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
