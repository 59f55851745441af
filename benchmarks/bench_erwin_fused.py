#!/usr/bin/env python
"""A/B: fused Pallas Erwin-block kernel vs XLA path on the bench config.

Times the full train step (fwd+bwd+adam) of the flagship model with
``use_pallas_erwin`` off/on, same protocol as bench.py (chained steps,
best-of-k windows, forced host fetch).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build(use_fused: bool, n_points: int, on_tpu: bool):
    from haet_tpu.models import HAETransolverIrregularMesh

    return HAETransolverIrregularMesh(
        space_dim=7, fun_dim=0, out_dim=4,
        n_layers=2, n_hidden=256, n_head=8, slice_num=32, mlp_ratio=2,
        rotate=45, dtype=jnp.bfloat16 if on_tpu else None,
        use_pallas_erwin=use_fused,
    )


def time_steps(model, x, y, n_steps=40, windows=3):
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, None)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, None,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return (jnp.mean((out.astype(jnp.float32) - y) ** 2),
                    upd["batch_stats"])

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    for _ in range(3):
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, x, y)
    float(loss)
    t0 = time.perf_counter()
    float(jnp.sum(loss))
    rtt = time.perf_counter() - t0

    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, x, y)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / n_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=40)
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform != "cpu"
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, args.points, 7).astype(np.float32))
    y = jnp.asarray(rng.randn(1, args.points, 4).astype(np.float32))

    for name, fused in (("xla", False), ("fused", True)):
        dt = time_steps(build(fused, args.points, on_tpu), x, y,
                        n_steps=args.steps)
        print(f"{name:6s} {dt * 1e3:8.2f} ms/step "
              f"{args.points / dt / 1e6:8.2f} Mpts/s")


if __name__ == "__main__":
    main()
