#!/usr/bin/env python
"""A/B of model flags (use_pallas tokenizer, use_pallas_erwin) on the
flagship bench config, with in-jit fori_loop + differential timing.

All variants are compiled first and their timing windows INTERLEAVED —
the hosted chip's throughput drifts 3-10x between moments, so
sequentially-timed variants are not comparable (see docs/benchmarks.md,
"Timing methodology, revisited")."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from haet_tpu.utils.env import apply_platform_override  # noqa: E402

apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np
import optax


def make_runs(model, x, y, k_lo=5, k_hi=25):
    """Return (run_lo, run_hi, k_lo, k_hi): compiled closures, ready to time."""
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, None)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def train_step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, None,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return (jnp.mean((out.astype(jnp.float32) - y) ** 2),
                    upd["batch_stats"])

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    def k_steps(k):
        @jax.jit
        def run(params, batch_stats, opt_state, loss0):
            def body(_, carry):
                params, batch_stats, opt_state, loss = carry
                xi = x + (1e-12 * loss).astype(x.dtype)
                return train_step(params, batch_stats, opt_state, xi, y)
            return jax.lax.fori_loop(
                0, k, body, (params, batch_stats, opt_state, loss0))
        return run

    params, batch_stats, opt_state, loss = jax.jit(train_step)(
        params, batch_stats, opt_state, x, y)
    float(loss)
    lo, hi = k_steps(k_lo), k_steps(k_hi)

    def once(run):
        t0 = time.perf_counter()
        out = run(params, batch_stats, opt_state, loss)
        float(out[3])
        return time.perf_counter() - t0

    once(lo)  # compile
    once(hi)
    return once, lo, hi, k_lo, k_hi


def main():
    from haet_tpu.models import HAETransolverIrregularMesh

    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--slice_num", type=int, default=32)
    ap.add_argument("--n_layers", type=int, default=2)
    ap.add_argument("--n_hidden", type=int, default=256)
    ap.add_argument("--variants", type=str, default="all",
                    help="comma list: baseline,pallas-tokenizer,pallas-erwin")
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform != "cpu"
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, args.points, 7).astype(np.float32))
    y = jnp.asarray(rng.randn(1, args.points, 4).astype(np.float32))

    variants = {
        "baseline": {},
        "pallas-tokenizer": {"use_pallas": True},
        "pallas-erwin": {"use_pallas_erwin": True},
    }
    if args.variants != "all":
        keep = set(args.variants.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}
    runs = {}
    for name, kw in variants.items():
        model = HAETransolverIrregularMesh(
            space_dim=7, fun_dim=0, out_dim=4, n_layers=args.n_layers,
            n_hidden=args.n_hidden, n_head=8, slice_num=args.slice_num,
            mlp_ratio=2, rotate=45,
            dtype=jnp.bfloat16 if on_tpu else None, **kw)
        runs[name] = make_runs(model, x, y)
        print(f"compiled {name}", flush=True)

    best = {name: [float("inf"), float("inf")] for name in runs}
    for _ in range(8):  # interleave every variant's lo/hi windows
        for name, (once, lo, hi, _, _) in runs.items():
            best[name][0] = min(best[name][0], once(lo))
            best[name][1] = min(best[name][1], once(hi))
    for name, (once, lo, hi, k_lo, k_hi) in runs.items():
        dt = max(best[name][1] - best[name][0], 1e-9) / (k_hi - k_lo)
        print(f"{name:18s} {dt * 1e3:8.3f} ms/step "
              f"{args.points / dt / 1e6:8.2f} Mpts/s", flush=True)


if __name__ == "__main__":
    main()
