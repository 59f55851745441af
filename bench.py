#!/usr/bin/env python
"""Headline benchmark: fwd+bwd training-step throughput on the flagship model.

Config matches the reference's ShapeNet-Car HAET run (irregular mesh,
n_hidden=256, 2 layers, 8 heads, slice_num=32, batch size 1, ~32k points —
reference ``benchmarks/02-.../main.py:41-67`` / ``scripts/Training.sh``).

Baseline: the reference's committed A100 run logs 0.430 s/train-batch at
~32k points (``slurm_output/transolver_erwin_training.out``,
BASELINE.md) => 32768 / 0.430 = 76,205 points/sec. ``vs_baseline`` is
our points/sec divided by that.

Methodology: 40 back-to-back dispatched steps chained through their data
dependencies (each step consumes the previous params/opt-state, so ALL
programs must execute serially on the device before the final fetched loss
can exist — the wall time cannot undercount device time), best-of-3
windows, one dispatch/fetch RTT subtracted. The hosted chip is time-shared
and its throughput drifts 3-10x between moments; an in-jit
``lax.fori_loop`` variant measures the same within that drift
(benchmarks/bench_loop_diag.py), so "best window" is the meaningful
number and this dispatched form is also how the Trainer actually runs.

Prints ONE JSON line:
    {"metric": "points_per_sec_fwd_bwd_step", "value": ..., "unit":
     "points/sec/chip", "vs_baseline": ...}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

N_POINTS = 32768
BATCH = 1
BASELINE_SEC_PER_BATCH = 0.430  # A100, reference training log
BASELINE_PPS = N_POINTS * BATCH / BASELINE_SEC_PER_BATCH


def main():
    from haet_tpu.models import HAETransolverIrregularMesh

    on_tpu = jax.devices()[0].platform != "cpu"
    model = HAETransolverIrregularMesh(
        space_dim=7, fun_dim=0, out_dim=4,
        n_layers=2, n_hidden=256, n_head=8, slice_num=32, mlp_ratio=2,
        rotate=45, dtype=jnp.bfloat16 if on_tpu else None,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BATCH, N_POINTS, 7).astype(np.float32))
    y = jnp.asarray(rng.randn(BATCH, N_POINTS, 4).astype(np.float32))

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
            return jnp.mean((out.astype(jnp.float32) - y) ** 2), upd["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    # warmup / compile (forced host fetch: under the tunneled-TPU runtime
    # block_until_ready is effectively a no-op, so timing must end with a
    # device->host transfer of a value that depends on every step)
    for _ in range(3):
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, x, y
        )
    float(loss)

    # measure the fixed dispatch/fetch round-trip to subtract it
    t0 = time.perf_counter()
    float(jnp.sum(loss))
    rtt = time.perf_counter() - t0

    # best of 3 windows: hosted-TPU throughput drifts by up to 3x between
    # moments; the fastest window is the closest to the hardware's capability
    n_steps = 40
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, x, y
            )
        float(loss)  # chained through params: forces all steps to complete
        best = min(best, time.perf_counter() - t0)
    dt = max(best - rtt, 1e-9) / n_steps

    pps = N_POINTS * BATCH / dt
    print(json.dumps({
        "metric": "points_per_sec_fwd_bwd_step",
        "value": round(pps, 1),
        "unit": "points/sec/chip",
        "vs_baseline": round(pps / BASELINE_PPS, 3),
    }))


if __name__ == "__main__":
    main()
