#!/usr/bin/env python
"""Diagnose: why is an in-jit lax.fori_loop over the train step ~3x slower
per step than dispatching the same step back-to-back?

Interleaves, in one session:
  A) k dispatched steps (data-dependency chained),
  B) one jit with fori_loop(k) over the identical step (loss-tied input),
  C) same as B but with a constant input (lets XLA hoist x-only work),
for k in {5, 20, 45}, printing seconds per window so per-iteration slope
and fixed overhead can be separated.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from haet_tpu.utils.env import apply_platform_override  # noqa: E402

apply_platform_override()

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    from haet_tpu.models import HAETransolverIrregularMesh

    on_tpu = jax.devices()[0].platform != "cpu"
    N = 32768
    model = HAETransolverIrregularMesh(
        space_dim=7, fun_dim=0, out_dim=4, n_layers=2, n_hidden=256,
        n_head=8, slice_num=32, mlp_ratio=2, rotate=45,
        dtype=jnp.bfloat16 if on_tpu else None)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, N, 7).astype(np.float32))
    y = jnp.asarray(rng.randn(1, N, 4).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, None)
    params, bstats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt0 = tx.init(params)

    def train_step(params, bstats, opt, x, y):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": bstats}, x, None, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return (jnp.mean((out.astype(jnp.float32) - y) ** 2),
                    upd["batch_stats"])

        (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, nopt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), nbs, nopt, loss

    jstep = jax.jit(train_step)

    def disp(k):
        def run():
            p, b, o = params, bstats, opt0
            for _ in range(k):
                p, b, o, loss = jstep(p, b, o, x, y)
            return float(loss)
        return run

    def loop(k, tie_input):
        @jax.jit
        def fn(p, b, o, loss0):
            def body(_, carry):
                p, b, o, loss = carry
                xi = x + (1e-12 * loss).astype(x.dtype) if tie_input else x
                return train_step(p, b, o, xi, y)
            return jax.lax.fori_loop(0, k, body, (p, b, o, loss0))

        def run():
            out = fn(params, bstats, opt0, jnp.float32(0.0))
            return float(out[3])
        return run

    ks = (5, 45)
    variants = {}
    for k in ks:
        variants[f"A-dispatched k={k:2d}"] = disp(k)
        variants[f"B-loop-tied  k={k:2d}"] = loop(k, True)
        variants[f"C-loop-const k={k:2d}"] = loop(k, False)
    for name, run in variants.items():  # compile everything first
        t0 = time.perf_counter()
        run()
        print(f"compiled {name} in {time.perf_counter() - t0:6.1f} s",
              flush=True)

    best = {name: float("inf") for name in variants}
    for _ in range(4):  # interleave all variants per round
        for name, run in variants.items():
            t0 = time.perf_counter()
            run()
            best[name] = min(best[name], time.perf_counter() - t0)
    for name in variants:
        print(f"{name}: {best[name] * 1e3:9.2f} ms window", flush=True)


if __name__ == "__main__":
    main()
