#!/usr/bin/env python
"""Throughput of the dynamic-batching server under concurrent load.

Companion to micro_serving_latency.py: that driver measures the latency of
ONE AOT program; this one runs the actual :class:`haet_tpu.serve.
BatchingServer` with concurrent client threads and measures end-to-end
request throughput, demonstrating what dynamic batching buys on a chip
behind a high-RTT link (the tunnel's ~30-150 ms dispatch RTT makes
sequential batch-1 serving RTT-bound, so riding b_max programs multiplies
request throughput by up to the batch factor).

Modes compared (same requests, interleaved rounds):
* ``sequential_b1`` — one client, batch-1 artifact per request (the
  reference's eval-loop serving shape).
* ``batched`` — C client threads against the BatchingServer with a small
  ``max_delay_s`` window and a {1,2,4,8} batch family.
* ``batched_pd2`` — same, with ``pipeline_depth=2`` (double-buffered
  dispatch: batch k+1 is assembled+dispatched while batch k's
  device->host fetch is on the wire). On the tunneled chip the fetch RTT
  is 10-20x the device time, so the overlap is where the win lives; the
  measured gain is what the serve.py docstring cites.

Prints one JSON line. Run on TPU; CPU works for plumbing checks.

Usage: python benchmarks/micro_serving_server.py [--n 32186]
         [--requests 48] [--clients 8] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from haet_tpu.utils.env import apply_platform_override, enable_compilation_cache  # noqa: E402

apply_platform_override()
enable_compilation_cache(
    os.environ.get("HAET_COMPILE_CACHE")
    or os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    ".xla_cache"))

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32186)
    ap.add_argument("--requests", type=int, default=48)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--max_delay_ms", type=float, default=5.0)
    args = ap.parse_args()

    import dataclasses

    from haet_tpu import serve
    from haet_tpu.export import ServingBundle
    from haet_tpu.utils.config import shapenet_car_config

    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = dataclasses.replace(shapenet_car_config().model, bf16=on_tpu)
    model = cfg.build()

    rng = np.random.RandomState(0)
    x1 = rng.randn(1, args.n, 7).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jax.numpy.asarray(x1), None)

    samples = [rng.randn(args.n, 7).astype(np.float32)
               for _ in range(args.requests)]

    with tempfile.TemporaryDirectory() as td:
        serve.export_batch_family(td, model, variables, (x1, None),
                                  batch_sizes=(1, 2, 4, 8))
        bundle = ServingBundle.load(td)

        # ONE server per mode, reused across rounds (fresh servers would
        # re-jit their bound programs each round); warmup() compiles every
        # exported batch size deterministically BEFORE any timed window.
        srv_seq = serve.BatchingServer(bundle, variables, max_delay_s=0.0,
                                       max_queue=4 * args.requests)
        srv_bat = serve.BatchingServer(
            bundle, variables, max_delay_s=args.max_delay_ms / 1e3,
            max_queue=4 * args.requests)
        srv_pd2 = serve.BatchingServer(
            bundle, variables, max_delay_s=args.max_delay_ms / 1e3,
            max_queue=4 * args.requests, pipeline_depth=2)
        srv_seq.warmup()
        srv_bat.warmup()
        srv_pd2.warmup()

        def run_sequential():
            t0 = time.perf_counter()
            for s in samples:
                srv_seq.predict(s, timeout=600)
            return time.perf_counter() - t0

        def run_batched(srv):
            per = (args.requests + args.clients - 1) // args.clients
            chunks = [samples[i * per:(i + 1) * per]
                      for i in range(args.clients)]
            futs_all = []
            lock = threading.Lock()

            def client(chunk):
                fs = [srv.submit(s) for s in chunk]
                with lock:
                    futs_all.extend(fs)

            with srv.stats.lock:
                before = dict(srv.stats.batch_histogram)
            t0 = time.perf_counter()
            threads = [threading.Thread(target=client, args=(c,))
                       for c in chunks if c]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            for f in futs_all:
                f.result(timeout=600)
            dt = time.perf_counter() - t0
            with srv.stats.lock:
                hist = {b: c - before.get(b, 0)
                        for b, c in srv.stats.batch_histogram.items()
                        if c - before.get(b, 0)}
            return dt, hist

        best_seq, best_bat, best_pd2 = (float("inf"),) * 3
        hist = {}
        for _ in range(args.rounds):
            best_seq = min(best_seq, run_sequential())
            dt, h = run_batched(srv_bat)
            if dt < best_bat:
                best_bat, hist = dt, h
            dt2, _ = run_batched(srv_pd2)
            best_pd2 = min(best_pd2, dt2)
        srv_seq.close()
        srv_bat.close()
        srv_pd2.close()

    rps_seq = args.requests / best_seq
    rps_bat = args.requests / best_bat
    rps_pd2 = args.requests / best_pd2
    print(json.dumps({
        "metric": "serving_throughput",
        "n_points": args.n,
        "requests": args.requests,
        "clients": args.clients,
        "sequential_b1_rps": round(rps_seq, 1),
        "batched_rps": round(rps_bat, 1),
        "batched_pd2_rps": round(rps_pd2, 1),
        "speedup": round(rps_bat / rps_seq, 2),
        "pd2_over_pd1": round(rps_pd2 / rps_bat, 2),
        "batch_histogram_best_round": hist,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
