#!/usr/bin/env python
"""Headline benchmark: fwd+bwd training-step throughput on the flagship model.

Config matches the reference's ShapeNet-Car HAET run (irregular mesh,
n_hidden=256, 2 layers, 8 heads, slice_num=32, batch size 1, ~32k points —
reference ``benchmarks/02-.../main.py:41-67`` / ``scripts/Training.sh``).

Baseline: the reference's committed A100 run logs 0.430 s/train-batch at
~32k points (``slurm_output/transolver_erwin_training.out``,
BASELINE.md) => 32768 / 0.430 = 76,205 points/sec. ``vs_baseline`` is
our points/sec divided by that.

Methodology: steps chained through their data dependencies (each step
consumes the previous params/opt-state, so ALL step programs must execute
serially on the device before the final fetched loss can exist — wall time
cannot undercount device time), run BOTH as back-to-back dispatches and as
one jit with ``lax.fori_loop`` over the step; the better of the two is
reported (the time-shared chip drifts 3-10x between moments and which
strategy wins depends on the sharing regime — see
benchmarks/bench_loop_diag.py). Per strategy, two window sizes (5/45
steps) are sampled interleaved and the difference of minima divides out to
sec/step with the dispatch/fetch RTT cancelled exactly.

Prints ONE JSON line:
    {"metric": "points_per_sec_fwd_bwd_step", "value": ..., "unit":
     "points/sec/chip", "vs_baseline": ...}
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

N_POINTS = 32768
BATCH = 1
BASELINE_SEC_PER_BATCH = 0.430  # A100, reference training log
BASELINE_PPS = N_POINTS * BATCH / BASELINE_SEC_PER_BATCH
# bf16 matmul peak of one v5e chip (the bench target hardware); used only
# for the mfu field. ~197 TFLOP/s (public TPU v5e spec).
PEAK_BF16_FLOPS = 197e12
# --- chip-share probe (the chip is time-shared; throughput drifts 3-10x
# between moments — BASELINE.md). A fixed-FLOP bf16 matmul chain is
# interleaved with every sampling round; its achieved TFLOP/s against the
# quiet-chip calibration below estimates what fraction of the chip this
# process actually saw, so BENCH artifacts separate "code got slower"
# from "chip was busy" (docs/benchmarks.md "Chip-share probe").
PROBE_DIM = 2048
PROBE_ITERS = 128
PROBE_FLOPS = 2 * PROBE_DIM ** 3 * PROBE_ITERS  # 2.2 TFLOP
# Quiet-chip probe calibration: None -> analytic 0.8 * spec peak
# (~157.6 TFLOP/s; a chained 2048^3 bf16 matmul on an idle chip sits near
# peak). r4 measurement through the shared tunnel saw 52.4 TFLOP/s best
# (chip_share_est 0.33, consistent with the 3-10x drift in BASELINE.md
# and the r1 quiet-session MFU 0.73). If a dedicated chip ever measures
# the probe higher than the fallback, commit that figure here with its
# provenance; chip_share_est clips at 1.0 regardless.
# COMMITTED EVIDENCE (r5): docs/measurements/mfu_sweep_r5.jsonl (MFU vs
# N 32k->1M, per-row chip-share probe: share-adjusted MFU flat ~0.45 for
# N>=131k while raw MFU tracks the share) and quiet_step_r5.jsonl
# (repeated 32k samples across the round; quietest observation recorded)
# substantiate that this bench's value is chip-share-bound, not
# code-bound. Produced by benchmarks/mfu_sweep.py; table in
# docs/benchmarks.md "Chip-share evidence".
PROBE_QUIET_TFLOPS = None
# Analytic fallback if XLA cost analysis is unavailable: ~5.8 MFLOPs/point
# fwd+bwd for the flagship 1.76M-param config (VERDICT r2 accounting).
FALLBACK_FLOPS_PER_POINT = 5.8e6


def main():
    import dataclasses

    from haet_tpu.utils.config import shapenet_car_config
    from haet_tpu.utils.env import enable_compilation_cache

    # Default the persistent XLA executable cache ON for the bench (repo-
    # local dir, gitignored): the ~2-4 min of train-step/loop compiles are
    # identical run to run, so a warmed cache spends the whole wall budget
    # on measurement instead. HAET_COMPILE_CACHE=0 disables.
    enable_compilation_cache(
        os.environ.get("HAET_COMPILE_CACHE")
        or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".xla_cache"))

    on_tpu = jax.devices()[0].platform != "cpu"
    # The exact vendored car model config: 1,757,190 params
    # (reference benchmarks/02-.../models/Transolver.py:50-64; parity
    # asserted in tests/test_full_model_oracle.py).
    cfg = dataclasses.replace(shapenet_car_config().model, bf16=on_tpu)
    model = cfg.build()

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

    def disp_window(n_steps):
        """Wall time for n_steps chained dispatched steps + one fetch."""
        p, bs, opt = params, batch_stats, opt_state
        t0 = time.perf_counter()
        for _ in range(n_steps):
            p, bs, opt, loss2 = train_step(p, bs, opt, x, y)
        float(loss2)  # chained through params: forces all steps to complete
        return time.perf_counter() - t0

    def make_loop(k):
        @jax.jit
        def fn(p, bs, opt, loss0):
            def body(_, carry):
                p, bs, opt, l = carry
                # tie the input to the previous loss so x-derived work
                # cannot be hoisted out of the loop (1e-12: numerically nil)
                xi = x + (1e-12 * l).astype(x.dtype)
                return train_step(p, bs, opt, xi, y)
            return jax.lax.fori_loop(0, k, body, (p, bs, opt, loss0))
        return fn

    # -- chip-share probe: fixed-FLOP bf16 matmul chain ----------------
    pa = (jax.random.normal(jax.random.PRNGKey(7), (PROBE_DIM, PROBE_DIM),
                            jnp.bfloat16) / np.sqrt(PROBE_DIM))

    @jax.jit
    def probe_fn(x):
        def body(_, c):
            # matmul promotes bf16 -> f32; cast back to keep the carry
            # type stable and the MXU fed with bf16 operands
            return (pa @ c).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, PROBE_ITERS, body, x)

    px = jax.random.normal(jax.random.PRNGKey(8),
                           (PROBE_DIM, PROBE_DIM), jnp.bfloat16)

    def probe_window():
        t0 = time.perf_counter()
        float(probe_fn(px)[0, 0])
        return time.perf_counter() - t0

    if on_tpu:
        probe_window()  # compile
    probe_best = float("inf")

    k_lo, k_hi = 5, 45
    loops = {k: make_loop(k) for k in (k_lo, k_hi)}

    def loop_window(k):
        t0 = time.perf_counter()
        out = loops[k](params, batch_stats, opt_state, loss)
        float(out[3])
        return time.perf_counter() - t0

    loop_window(k_lo)  # compile
    loop_window(k_hi)

    # Differential lo/hi windows cancel the dispatch/fetch RTT exactly
    # (both windows pay it once; a separately-probed RTT can exceed a fast
    # window and produce nonsense). All four window kinds are interleaved
    # so their minima come from the same (fastest) regime of the drifting,
    # time-shared chip. Both execution strategies are hard measurements
    # (every step's program must run serially on the device); report the
    # better one — which one wins depends on the chip-sharing regime.
    # Sampling is time-budget-aware: the hosted chip alternates between
    # quiet and contended regimes on a seconds-to-minutes scale, so more
    # interleaved rounds = better odds one round lands in a quiet window
    # (minima are what's reported). At least 6 rounds always run; extra
    # rounds continue until HAET_BENCH_BUDGET_S (default 150 s) of
    # sampling wall time or 16 rounds, whichever first.
    budget_s = float(os.environ.get("HAET_BENCH_BUDGET_S", "150"))
    best = {k: float("inf") for k in ("d_lo", "d_hi", "l_lo", "l_hi")}
    t_start = time.perf_counter()
    for i in range(16):
        if i >= 6 and time.perf_counter() - t_start > budget_s:
            break
        if on_tpu:  # probe result is only used on TPU; ~2.2 TFLOP per
            # window would add minutes of waste to a CPU plumbing run
            probe_best = min(probe_best, probe_window())
        best["d_lo"] = min(best["d_lo"], disp_window(k_lo))
        best["d_hi"] = min(best["d_hi"], disp_window(k_hi))
        best["l_lo"] = min(best["l_lo"], loop_window(k_lo))
        best["l_hi"] = min(best["l_hi"], loop_window(k_hi))

    def per_step(hi, lo):
        diff = best[hi] - best[lo]
        # fallback: never report faster than the raw hi window allows
        return diff / (k_hi - k_lo) if diff > 0 else best[hi] / k_hi

    dt = min(per_step("d_hi", "d_lo"), per_step("l_hi", "l_lo"))

    pps = N_POINTS * BATCH / dt

    # MFU: FLOPs of ONE compiled train step (XLA cost analysis of the
    # program actually measured; analytic fallback) over achieved time,
    # vs the chip's bf16 peak. Grounds the headline in hardware terms
    # independent of the A100 baseline ratio (VERDICT r2 #5).
    flops_per_step = None
    flops_source = "xla_cost_analysis"
    try:
        ca = train_step.lower(
            params, batch_stats, opt_state, x, y).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_step = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    if flops_per_step is None:
        flops_per_step = FALLBACK_FLOPS_PER_POINT * N_POINTS * BATCH
        flops_source = "analytic_estimate"
    mfu = flops_per_step / dt / PEAK_BF16_FLOPS if on_tpu else None

    # chip share: achieved probe throughput (quietest interleaved round —
    # the same selection rule the model windows use) over the quiet-chip
    # calibration. <1 means every number above was measured on a busy
    # chip; mfu_adjusted ~ what a quiet chip would have shown.
    probe_tflops = (PROBE_FLOPS / probe_best / 1e12) if on_tpu else None
    quiet = PROBE_QUIET_TFLOPS or 0.8 * PEAK_BF16_FLOPS / 1e12
    chip_share = min(1.0, probe_tflops / quiet) if on_tpu else None
    mfu_adj = (mfu / chip_share if (mfu and chip_share) else None)

    print(json.dumps({
        "metric": "points_per_sec_fwd_bwd_step",
        "value": round(pps, 1),
        "unit": "points/sec/chip",
        "vs_baseline": round(pps / BASELINE_PPS, 3),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "step_tflops": round(flops_per_step / 1e12, 4),
        "flops_source": flops_source,
        "probe_tflops": (round(probe_tflops, 2)
                         if probe_tflops is not None else None),
        "chip_share_est": (round(chip_share, 4)
                           if chip_share is not None else None),
        "mfu_adjusted": round(mfu_adj, 4) if mfu_adj is not None else None,
    }))


if __name__ == "__main__":
    main()
