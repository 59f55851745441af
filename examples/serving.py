#!/usr/bin/env python
"""Production serving tour: batch family -> dynamic batcher -> HTTP.

Where ``train_and_serve.py`` ends (one AOT artifact, one shape), this
example picks up: exporting a *batch-size family* of artifacts, serving
single-sample requests with the dynamic batcher (concurrent requests ride
the largest compiled program), and fronting it with the stdlib HTTP
server. Runnable on CPU in under a minute; identical code serves a TPU —
the artifacts themselves carry the lowering platform.

    python examples/serving.py

Covers:
- ``serve.export_batch_family``: one StableHLO program per batch size
  (batch is part of the compiled program on TPU — static shapes);
- ``serve.BatchingServer``: futures-based submit, greedy
  largest-program dispatch, warmup, batch-size histogram,
  ``pipeline_depth=2`` double-buffered dispatch;
- the checkpoint pre-bound into the executables (``ExportedModel.bind``
  — measured 2.3x faster dispatch than weight-passing on a v5e);
- ``serve_http.make_server``: concurrent HTTP POSTs co-batching
  automatically, npz in / npz out; ``POST /reload`` zero-downtime
  checkpoint swap;
- ragged point counts: ``export_point_family`` buckets + opt-in
  ``pad_to_points`` (outputs truncated back to the caller's N).
"""

import io
import os
import sys
import tempfile
import threading
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HAET_PLATFORM", "cpu")  # demo runs on CPU; drop on TPU

from haet_tpu.utils.env import apply_platform_override  # noqa: E402

apply_platform_override()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from haet_tpu import serve, serve_http  # noqa: E402
from haet_tpu.export import ServingBundle  # noqa: E402
from haet_tpu.models import HAETransolver_Irregular_Mesh  # noqa: E402

N = 256
model = HAETransolver_Irregular_Mesh(
    space_dim=3, fun_dim=1, out_dim=1,
    n_layers=1, n_hidden=32, n_head=4, slice_num=16,
)
x1 = jax.random.normal(jax.random.PRNGKey(1), (1, N, 3))
fx1 = jax.random.normal(jax.random.PRNGKey(2), (1, N, 1))
variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1, fx1)
# (a real deployment loads `variables` from an orbax checkpoint — see
# `python -m haet_tpu.serve_http --checkpoint RUN_DIR`)

with tempfile.TemporaryDirectory() as root:
    # one AOT program per (point bucket x batch size), one bundle root:
    # the N and 2N buckets let pad_to_points serve RAGGED point counts
    # (real car folds are ~29-38k points per mesh at native N)
    serve.export_point_family(root, model, variables, (x1, fx1),
                              point_buckets=(N, 2 * N),
                              batch_sizes=(1, 2, 4))
    bundle = ServingBundle.load(root)
    print(f"exported batch family: "
          f"{sorted((k[0][0], k[0][1]) for k in bundle.shapes())}")

    # pipeline_depth=2: assemble/dispatch the next batch while the
    # previous batch's device->host fetch is in flight (measured 1.35x
    # request throughput through a high-RTT link)
    with serve.BatchingServer(bundle, variables, max_delay_s=0.05,
                              pad_to_points=True,
                              pipeline_depth=2) as srv:
        srv.warmup()  # compile every program before taking traffic

        # --- direct (in-process) clients --------------------------------
        def sample(seed):
            r = np.random.RandomState(seed)
            return (r.randn(N, 3).astype(np.float32),
                    r.randn(N, 1).astype(np.float32))

        futs = [srv.submit(*sample(i)) for i in range(4)]
        outs = [f.result(timeout=120) for f in futs]
        ref = model.apply(variables, sample(0)[0][None],
                          sample(0)[1][None], train=False)
        np.testing.assert_allclose(outs[0], np.asarray(ref)[0],
                                   rtol=2e-5, atol=2e-5)
        hist = srv.stats.snapshot()["batch_histogram"]
        print(f"served 4 futures, batch histogram: {hist}")
        # every request served, none dropped; whether all 4 ride one b4
        # program depends on how fast the submits landed inside the
        # max_delay window — under load they may split into smaller
        # programs, which is correct serving behavior, not a failure
        assert sum(b * c for b, c in hist.items()) == 4, hist

        # --- over HTTP ---------------------------------------------------
        httpd = serve_http.make_server(srv, "127.0.0.1", 0)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{port}"

        sx, sf = sample(7)
        buf = io.BytesIO()
        np.savez(buf, arg0=sx, arg1=sf)
        req = urllib.request.Request(base + "/predict", data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=120) as resp:
            with np.load(io.BytesIO(resp.read())) as z:
                out_http = z["output"]
        ref7 = model.apply(variables, sx[None], sf[None], train=False)
        np.testing.assert_allclose(out_http, np.asarray(ref7)[0],
                                   rtol=2e-5, atol=2e-5)
        print("HTTP predict == direct apply")

        # --- a ragged request: no exact artifact for N-16 points --------
        r = np.random.RandomState(9)
        rx = r.randn(N - 16, 3).astype(np.float32)
        rf = r.randn(N - 16, 1).astype(np.float32)
        buf = io.BytesIO()
        np.savez(buf, arg0=rx, arg1=rf)
        req = urllib.request.Request(base + "/predict", data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=120) as resp:
            with np.load(io.BytesIO(resp.read())) as z:
                out_ragged = z["output"]
        # served via the N bucket (repeat-last-row pad), truncated back
        assert out_ragged.shape == (N - 16, 1), out_ragged.shape
        print(f"ragged {N - 16}-point request served through the "
              f"{N} bucket (padded_points="
              f"{srv.stats.snapshot()['padded_points']})")

        # --- Prometheus scrape: same counters, text exposition ----------
        with urllib.request.urlopen(base + "/metrics", timeout=30) as resp:
            metrics = resp.read().decode()
        assert "haet_requests_total" in metrics
        line = next(ln for ln in metrics.splitlines()
                    if ln.startswith("haet_requests_total "))
        print(f"GET /metrics scrape OK ({line})")
        httpd.shutdown()
        httpd.server_close()

print("serving tour OK")
