#!/usr/bin/env python
"""MFU vs point count, with a chip-share probe per N (VERDICT r4 weak #4).

The headline bench (``bench.py``) reports one 32k-point number whose value
is chip-share-bound on the time-shared tunneled chip: the builder's
quiet-chip profile measured 1.26 ms/step at 32k (~26 M pts/s, ~0.8
MFU-equivalent) while BENCH rounds under contention report ~7 M pts/s.
This driver commits the evidence as a JSONL artifact:

* per-N (32k -> 1M) fwd+bwd step time via the same interleaved
  differential lo/hi-window methodology bench.py uses, each N's rounds
  interleaved with the fixed-FLOP bf16 matmul probe so every row carries
  its own ``chip_share_est``;
* ``mfu`` (XLA cost analysis over achieved time) and ``mfu_adjusted``
  (mfu / chip_share) per row — if mfu_adjusted is roughly flat across N
  while raw mfu tracks chip_share, the headline stagnation is contention,
  not code;
* at the largest N, an interleaved A/B of the fused-Pallas slice kernels
  vs the XLA path plus the ``use_pallas="auto"`` resolution — validating
  the auto threshold's G/N interpolation
  (``physics_attention.py:_pallas_enabled``) at the 1M-point end: at
  G=32, auto must still resolve to XLA below the 2.25M OOM boundary and
  the A/B records what the fused path would have cost.

Writes one JSON line per row to ``--out`` (append) and echoes them.

Usage (on the TPU):
    python benchmarks/mfu_sweep.py --out docs/measurements/mfu_sweep_r5.jsonl
    python benchmarks/mfu_sweep.py --ns 32768 --rounds 8   # quiet-step row
"""

from __future__ import annotations

import argparse
import json
import os
import sys
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
import optax  # noqa: E402

PEAK_BF16_FLOPS = 197e12  # one v5e chip, public spec
PROBE_DIM, PROBE_ITERS = 2048, 128
PROBE_FLOPS = 2 * PROBE_DIM ** 3 * PROBE_ITERS
QUIET_TFLOPS = 0.8 * PEAK_BF16_FLOPS / 1e12  # bench.py calibration


def make_step(model, tx, n, use_x32=False):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, n, 7).astype(np.float32))
    y = jnp.asarray(rng.randn(1, n, 4).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, None)
    params, batch_stats = variables["params"], variables["batch_stats"]
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

    return train_step, (params, batch_stats, opt_state, x, y)


def measure_steps(variants, rounds, probe, k_lo=3, k_hi=13):
    """{name: sec_per_step}, probe_best_s for {name: (train_step, args0)}.

    EVERY variant's lo/hi windows are interleaved within each round (the
    chip is time-shared and drifts 3-10x between moments — sequential
    A/Bs flip sign between runs; CLAUDE.md), so all reported minima come
    from the same fastest regime.
    """
    def make_window(ts, a0):
        params, batch_stats, opt_state, x, y = a0

        def window(k):
            p, bs, opt = params, batch_stats, opt_state
            t0 = time.perf_counter()
            for _ in range(k):
                p, bs, opt, loss = ts(p, bs, opt, x, y)
            float(loss)
            return time.perf_counter() - t0

        return window

    windows = {n: make_window(ts, a0) for n, (ts, a0) in variants.items()}
    best = {n: {k_lo: float("inf"), k_hi: float("inf")} for n in windows}
    for w in windows.values():
        w(1)  # compile
    probe_best = float("inf")
    for _ in range(rounds):
        probe_best = min(probe_best, probe())
        for n, w in windows.items():
            best[n][k_lo] = min(best[n][k_lo], w(k_lo))
            best[n][k_hi] = min(best[n][k_hi], w(k_hi))
    out = {}
    for n, b in best.items():
        diff = b[k_hi] - b[k_lo]
        out[n] = diff / (k_hi - k_lo) if diff > 0 else b[k_hi] / k_hi
    return out, probe_best


def step_flops(train_step, args0):
    try:
        ca = train_step.lower(*args0).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="*",
                    default=[32768, 65536, 131072, 262144, 524288,
                             1048576])
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--out", default=None,
                    help="JSONL path to append rows to")
    ap.add_argument("--pallas_ab", type=int, default=1,
                    help="1: at the largest N, interleave an A/B of the "
                         "fused-Pallas slice kernels vs XLA and record "
                         "the use_pallas='auto' resolution")
    args = ap.parse_args()

    import dataclasses

    from haet_tpu.utils.config import shapenet_car_config

    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = dataclasses.replace(shapenet_car_config().model, bf16=on_tpu)
    tx = optax.adam(1e-3)

    pa = (jax.random.normal(jax.random.PRNGKey(7),
                            (PROBE_DIM, PROBE_DIM), jnp.bfloat16)
          / np.sqrt(PROBE_DIM))

    @jax.jit
    def probe_fn(v):
        def body(_, c):
            return (pa @ c).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, PROBE_ITERS, body, v)

    px = jax.random.normal(jax.random.PRNGKey(8),
                           (PROBE_DIM, PROBE_DIM), jnp.bfloat16)

    def probe():
        if not on_tpu:
            return float("inf")
        t0 = time.perf_counter()
        float(probe_fn(px)[0, 0])
        return time.perf_counter() - t0

    if on_tpu:
        probe()  # compile

    rows = []

    def emit(row):
        rows.append(row)
        line = json.dumps(row)
        print(line, flush=True)
        if args.out:
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            with open(args.out, "a") as f:
                f.write(line + "\n")

    for n in args.ns:
        model = cfg.build()
        step, a0 = make_step(model, tx, n)
        res, probe_best = measure_steps({"xla": (step, a0)}, args.rounds,
                                        probe)
        dt = res["xla"]
        fl = step_flops(step, a0)
        probe_tflops = (PROBE_FLOPS / probe_best / 1e12
                        if np.isfinite(probe_best) else None)
        share = (min(1.0, probe_tflops / QUIET_TFLOPS)
                 if probe_tflops else None)
        mfu = fl / dt / PEAK_BF16_FLOPS if (fl and on_tpu) else None
        emit({
            "kind": "mfu_vs_n", "n_points": n,
            "sec_per_step": round(dt, 6),
            "points_per_sec": round(n / dt, 1),
            "step_tflops": round(fl / 1e12, 4) if fl else None,
            "mfu": round(mfu, 4) if mfu else None,
            "probe_tflops": (round(probe_tflops, 2)
                             if probe_tflops else None),
            "chip_share_est": round(share, 4) if share else None,
            "mfu_adjusted": (round(mfu / share, 4)
                             if (mfu and share) else None),
            "platform": jax.devices()[0].platform,
            "ts": time.time(),
        })

    if args.pallas_ab and args.ns:
        n = max(args.ns)
        # what use_pallas="auto" ACTUALLY resolves to at this N/G: ask
        # the model's own attention module (its threshold + G-scaling,
        # physics_attention._pallas_enabled) instead of duplicating the
        # formula here — a hardcoded copy drifted once already
        m_auto = dataclasses.replace(cfg, use_pallas="auto").build()
        bk = m_auto.block_kwargs()
        attn_auto = bk["attn_cls"](dim=m_auto.n_hidden,
                                   heads=bk["num_heads"],
                                   **bk["attn_kwargs"])
        auto_resolves_pallas = bool(attn_auto._pallas_enabled(n))
        thresh_base = int(attn_auto.pallas_auto_threshold)

        m_xla = cfg.build()
        m_pal = dataclasses.replace(cfg, use_pallas=True).build()
        step_x, a0x = make_step(m_xla, tx, n)
        step_p, a0p = make_step(m_pal, tx, n)
        # both variants' windows interleaved within each round
        # (sequential A/Bs flip sign between runs on the shared chip)
        res, probe_best = measure_steps(
            {"xla": (step_x, a0x), "pallas": (step_p, a0p)},
            args.rounds, probe)
        dt_x, dt_p = res["xla"], res["pallas"]
        probe_tflops = (PROBE_FLOPS / probe_best / 1e12
                        if np.isfinite(probe_best) else None)
        emit({
            "kind": "pallas_ab_at_max_n", "n_points": n,
            "slice_num": cfg.slice_num,
            "sec_per_step_xla": round(dt_x, 6),
            "sec_per_step_pallas_fused": round(dt_p, 6),
            "pallas_over_xla": round(dt_p / dt_x, 3),
            "auto_threshold_base_points": thresh_base,
            "auto_resolves_to": ("pallas" if auto_resolves_pallas
                                 else "xla"),
            "chip_share_est": (round(min(1.0, probe_tflops / QUIET_TFLOPS),
                                     4) if probe_tflops else None),
            "platform": jax.devices()[0].platform,
            "ts": time.time(),
        })


if __name__ == "__main__":
    main()
