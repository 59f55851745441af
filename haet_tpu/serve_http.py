"""Minimal HTTP front-end for the dynamic-batching server (stdlib only).

Completes the deployment story: ``haet_tpu.export`` produces the AOT
artifacts, :mod:`haet_tpu.serve` batches requests on-device, and this
module exposes them over HTTP without any extra dependency —
``http.server.ThreadingHTTPServer`` gives one thread per connection, and
because every handler just blocks on ``BatchingServer.predict``,
concurrent HTTP requests co-batch onto the largest exported program
automatically.

Protocol (binary, numpy-native — JSON would 4x the payload for float
data):

* ``POST /predict`` — body is an ``.npz`` archive with the positional
  model inputs under keys ``arg0``, ``arg1``, … (single-sample shapes,
  no batch axis; omit absent optional inputs). Response is an ``.npz``
  with the model output under ``output``. Shape misses are 400 with the
  server's explanatory message; everything else is 500.
* ``GET /healthz`` — 200 ``ok`` once the server accepts requests.
* ``GET /shapes`` — JSON: the single-sample signatures served.
* ``GET /stats`` — JSON: request/dispatch counters and the batch-size
  histogram.
* ``GET /metrics`` — the same counters in the Prometheus text
  exposition format (``haet_requests_total``, dispatch/delivery
  counters, padding counters, queue-wait gauge, latency quantiles and
  the per-batch-size dispatch counter), so a scrape target needs no
  JSON adapter.

CLI::

    python -m haet_tpu.serve_http --bundle ARTIFACT_DIR \
        --checkpoint RUN_DIR [--which best] [--port 8000] \
        [--max_delay_ms 2]

The checkpoint is read with :meth:`haet_tpu.train.Checkpointer.
restore_raw`; a ``--pp`` run's stacked pipeline layout is converted
automatically (``parallel.pipeline.merge_variables``), mirroring
``benchmarks/car_eval.py``. ``--watch_checkpoint SECS`` polls the run's
sidecar and hot-reloads ``--which`` whenever it advances (hands-free
retrain→deploy through the same zero-downtime ``/reload`` path).

SIGTERM (what ``kill``, ``docker stop`` and kubernetes send) drains
gracefully: the listener stops accepting, in-flight handlers finish
(bounded by ``--request_timeout_s``), queued predictions are served,
and the process exits 0.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
from concurrent.futures import TimeoutError as FuturesTimeoutError
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .serve import BatchingServer

__all__ = ["make_server", "main", "watch_checkpoint"]


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def _prometheus_text(snap: dict) -> str:
    """Render a :meth:`haet_tpu.serve.ServerStats.snapshot` dict in the
    Prometheus text exposition format (one scrape = one snapshot; the
    snapshot is taken under the stats lock, so the exposed family is
    internally consistent)."""
    lines = []

    def metric(name, mtype, help_, samples):
        lines.append(f"# HELP {name} {help_}")
        lines.append(f"# TYPE {name} {mtype}")
        for labels, val in samples:
            lines.append(f"{name}{labels} {val}")

    metric("haet_requests_total", "counter",
           "Requests accepted by submit().",
           [("", snap["requests"])])
    metric("haet_dispatches_total", "counter",
           "Device batches dispatched.",
           [("", snap["dispatches"])])
    metric("haet_delivered_total", "counter",
           "Request results (or errors) delivered to callers.",
           [("", snap["delivered"])])
    metric("haet_padded_samples_total", "counter",
           "Samples synthesized by pad_to_batch (outputs discarded).",
           [("", snap["padded_samples"])])
    metric("haet_padded_points_total", "counter",
           "Points synthesized by pad_to_points (output rows truncated).",
           [("", snap["padded_points"])])
    metric("haet_mean_queue_wait_seconds", "gauge",
           "Mean submit->dispatch wait over dispatched requests.",
           [("", snap["mean_queue_wait_s"])])
    hist = snap["batch_histogram"]
    if hist:
        metric("haet_batch_size_dispatches_total", "counter",
               "Dispatches by device batch size.",
               [('{size="%s"}' % size, count)
                for size, count in sorted(hist.items())])
    quants = [(q, snap[k]) for q, k in (("0.5", "latency_p50_s"),
                                        ("0.95", "latency_p95_s"))
              if snap[k] is not None]
    if quants:
        metric("haet_request_latency_seconds", "summary",
               "Submit->result latency (rolling window).",
               [('{quantile="%s"}' % q, v) for q, v in quants])
    return "\n".join(lines) + "\n"


def make_server(batching_server: BatchingServer, host: str = "127.0.0.1",
                port: int = 8000, *,
                request_timeout_s: float = 300.0,
                reload_fn=None) -> ThreadingHTTPServer:
    """Wrap a running :class:`BatchingServer` in a ThreadingHTTPServer.

    Returns the (not yet started) HTTP server; call ``serve_forever()``
    (typically on a thread) and ``shutdown()``/``server_close()`` to
    stop. The caller owns the BatchingServer lifecycle.
    ``request_timeout_s`` bounds how long one POST may wait on the
    batcher before answering 504 (handler threads must not pin forever
    if a dispatch hangs).

    ``reload_fn(which: str) -> None`` enables the ``POST /reload`` admin
    endpoint (zero-downtime weight swap): it should load the named
    checkpoint and call :meth:`BatchingServer.reload`. The CLI wires it
    to its ``--checkpoint`` directory; without it /reload answers 501.
    Reloads are serialized by a lock; in-flight predictions finish on the
    old weights, later ones use the new (``BatchingServer.reload``).
    """
    reload_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        # Bound EVERY socket read (request line, headers, bodies,
        # keep-alive idle). Without it a silent client — half-open LB
        # probe, a POST whose Content-Length body never arrives — pins
        # its handler thread in rfile.read() forever, and because the
        # threads are non-daemon (see below), server_close() would then
        # join forever and the graceful SIGTERM drain never finishes.
        # socketserver applies this via connection.settimeout();
        # BaseHTTPRequestHandler maps a timed-out request-LINE read to
        # close_connection, and the body reads below answer 408 and
        # close explicitly — either way the thread exits after at most
        # one timeout, so the drain is bounded by request_timeout_s.
        timeout = request_timeout_s

        # one log line per request is noise at serving rates
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            elif self.path == "/shapes":
                sigs = sorted(batching_server._sizes_by_sig)
                self._send_json(200, {"signatures": [
                    [list(s) for s in sig] for sig in sigs]})
            elif self.path == "/stats":
                self._send_json(200, batching_server.stats.snapshot())
            elif self.path == "/metrics":
                body = _prometheus_text(batching_server.stats.snapshot())
                self._send(200, body.encode(),
                           "text/plain; version=0.0.4; charset=utf-8")
            else:
                self._send_json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path == "/reload":
                self._do_reload()
                return
            if self.path != "/predict":
                self._send_json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(length)
            except TimeoutError:
                # the promised body never arrived (half-open client):
                # answer 408 and CLOSE — a kept-alive connection would
                # make a graceful drain wait a second full timeout on
                # the next request-line read
                self.close_connection = True
                self._send_json(408, {"error": "request body timed out"})
                return
            try:
                with np.load(io.BytesIO(raw)) as z:
                    # validate the KEY SET, not a sorted list —
                    # lexicographic order puts 'arg10' before 'arg2'
                    expect = [f"arg{i}" for i in range(len(z.files))]
                    if set(z.files) != set(expect):
                        raise ValueError(
                            f"npz keys must be arg0..argN, got "
                            f"{sorted(z.files)}")
                    args = [z[k] for k in expect]
            except Exception as e:
                # anything unparseable is the CLIENT's error: zipfile.
                # BadZipFile / CRC OSError / pickle refusals are not
                # ValueError subclasses — without this breadth they would
                # crash the handler and reset the connection with no
                # status code.
                self._send_json(400, {"error": f"bad request body: {e}"})
                return
            try:
                fut = batching_server.submit(*args)
            except ValueError as e:  # unknown signature / dtype mismatch
                self._send_json(400, {"error": str(e)})
                return
            except RuntimeError as e:  # queue full / server closed
                self._send_json(503, {"error": str(e)})
                return
            try:
                out = fut.result(timeout=request_timeout_s)
            except ValueError as e:  # stranded batch
                self._send_json(400, {"error": str(e)})
                return
            except FuturesTimeoutError:
                # a hung device dispatch (or a dead dispatcher) must not
                # pin handler threads forever — fail the request, and
                # CANCEL it so the abandoned request stops holding a
                # queue slot and is never dispatched for a client that
                # already went away (the dispatcher drops cancelled
                # futures; cancel() is a no-op if dispatch already began)
                fut.cancel()
                self._send_json(504, {
                    "error": f"prediction did not complete within "
                             f"{request_timeout_s} s"})
                return
            except Exception as e:  # pragma: no cover - surfaced verbatim
                self._send_json(500, {"error": repr(e)})
                return
            self._send(200, _npz_bytes(output=np.asarray(out)),
                       "application/octet-stream")

        def _do_reload(self):
            """POST /reload — body: optional JSON ``{"which": "best"}``.
            Swaps the served checkpoint with zero downtime (new weights
            are compiled before the swap; no in-flight request fails)."""
            if reload_fn is None:
                self._send_json(501, {
                    "error": "reload is not configured (make_server "
                             "reload_fn / CLI --checkpoint)"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length) if length else b""
            except TimeoutError:
                self.close_connection = True  # see do_POST: drain bound
                self._send_json(408, {"error": "request body timed out"})
                return
            try:
                which = (json.loads(body).get("which", "best")
                         if body.strip() else "best")
            except Exception as e:
                self._send_json(400, {"error": f"bad reload body: {e}"})
                return
            try:
                with reload_lock:  # one reload at a time
                    reload_fn(which)
            except FileNotFoundError as e:
                self._send_json(404, {"error": str(e)})
                return
            except Exception as e:  # pragma: no cover - surfaced verbatim
                self._send_json(500, {"error": repr(e)})
                return
            self._send_json(200, {"reloaded": which})

    httpd = ThreadingHTTPServer((host, port), Handler)
    # Non-daemon handler threads: ``server_close()`` then JOINS any
    # in-flight handlers (each bounded by request_timeout_s), so a
    # shutdown() + server_close() sequence is a graceful drain instead of
    # killing responses mid-write. Dead threads are reaped on accept
    # (socketserver._Threads), so a long-lived server does not accumulate
    # thread objects.
    httpd.daemon_threads = False
    return httpd


def watch_checkpoint(base_url: str, checkpoint: str, which: str,
                     interval_s: float, stop) -> None:
    """Poll a training run's checkpoint sidecar and POST ``/reload``
    whenever the named checkpoint advances — hands-free
    retrain→deploy. Runs until ``stop`` (a ``threading.Event``) is set.

    The stamp is the ``epochs.json`` entry for ``which`` (every
    ``Checkpointer.save_*`` records ``{epoch, step}`` there), so an
    unrelated save (e.g. a new ``last`` while serving ``best``) does not
    trigger a pointless recompile-reload. Reload failures are logged and
    retried on the next poll: ``save_last`` finalizes asynchronously, so
    a reload can race a half-written checkpoint — the old weights keep
    serving, and the stamp only advances after a reload succeeds.
    """
    import os as _os
    import urllib.request as _rq

    def stamp():
        try:
            with open(_os.path.join(checkpoint, "epochs.json")) as f:
                ent = json.load(f).get(which)
            return json.dumps(ent, sort_keys=True) if ent else None
        except (OSError, json.JSONDecodeError):
            return None

    served = stamp()  # whatever main() loaded at startup
    while not stop.wait(interval_s):
        cur = stamp()
        if cur is None or cur == served:
            continue
        try:
            req = _rq.Request(base_url + "/reload",
                              data=json.dumps({"which": which}).encode(),
                              method="POST")
            with _rq.urlopen(req, timeout=600) as r:
                r.read()
            served = cur
            print(f"[serve_http] checkpoint '{which}' advanced -> "
                  f"reloaded ({cur})", flush=True)
        except Exception as e:  # half-written save, transient IO: retry
            print(f"[serve_http] auto-reload failed (will retry next "
                  f"poll): {e}", flush=True)


def _load_variables(checkpoint: str, which: str):
    from .train.checkpoint import Checkpointer

    raw = Checkpointer(checkpoint).restore_raw(which)
    if raw is None:
        raise FileNotFoundError(
            f"no '{which}' checkpoint under {checkpoint}")
    import jax

    params = raw.get("params", raw)  # plain variables trees work too
    if "layers" in (params or {}):
        # a --pp run's stacked pipeline layout (train/checkpoint.py
        # restore_raw docstring): convert to the plain per-block layout
        from .parallel.pipeline import merge_raw_variables

        merged = merge_raw_variables(raw)
        params, bs = merged["params"], merged.get("batch_stats")
    else:
        bs = raw.get("batch_stats")
    variables = {"params": params}
    if bs is not None and jax.tree_util.tree_leaves(bs):
        # only include a REAL batch_stats collection: the exported calling
        # convention is strict about structure, and BN-free artifacts are
        # exported without the key (an empty dict node would mismatch)
        variables["batch_stats"] = bs
    return variables


def main(argv=None):
    # honor HAET_PLATFORM before any jax use (this environment's shell
    # profile force-prepends the tunneled-TPU platform to JAX_PLATFORMS;
    # see haet_tpu.utils.env.apply_platform_override)
    from .utils.env import apply_platform_override

    apply_platform_override()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--bundle", required=True,
                    help="ServingBundle root (export_batch_family output)")
    ap.add_argument("--checkpoint", required=True,
                    help="training run dir holding orbax checkpoints")
    ap.add_argument("--which", default="best",
                    help="checkpoint name: best / last / epoch_N")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max_delay_ms", type=float, default=2.0)
    ap.add_argument("--max_queue", type=int, default=1024)
    ap.add_argument("--request_timeout_s", type=float, default=300.0,
                    help="bound one request's wait on the batcher "
                         "(504 after this)")
    ap.add_argument("--dp", type=int, default=0,
                    help="serve a MULTI-CHIP data-parallel bundle over "
                         "this many devices (artifacts exported with "
                         "mesh= and a batch data_axis; 0 = single-chip "
                         "artifacts)")
    ap.add_argument("--tp", type=int, default=0,
                    help="serve a head-TP bundle (artifacts exported "
                         "with mesh= + data_axis=None on a model with "
                         "shard_axes) over this many devices — each "
                         "request, even batch-1, spans the whole mesh. "
                         "Mutually exclusive with --dp")
    ap.add_argument("--pad_to_batch", type=int, default=-1,
                    help="1: fill aged-out partial groups by duplicating "
                         "the last sample (outputs of padded rows are "
                         "discarded); 0: fail them instead; -1 (default): "
                         "auto — on iff --dp > 1, where a b1 artifact "
                         "cannot exist and lone requests could never be "
                         "served")
    ap.add_argument("--warmup", type=int, default=1,
                    help="compile every exported program before "
                         "accepting traffic (no cold-compile on the "
                         "first requests)")
    ap.add_argument("--pad_to_points", type=int, default=0,
                    help="1: serve samples whose point count has no "
                         "exact artifact by repeat-last-row padding to "
                         "the nearest larger exported bucket (outputs "
                         "truncated back; NOT output-exact — see "
                         "BatchingServer docs); 0 (default): exact-N "
                         "signatures only")
    ap.add_argument("--watch_checkpoint", type=float, default=0.0,
                    help="poll the checkpoint's sidecar every this many "
                         "seconds and hot-reload --which when it "
                         "advances (hands-free retrain->deploy; 0 = "
                         "off). Failures keep the old weights and retry")
    ap.add_argument("--pipeline_depth", type=int, default=2,
                    help="batches in flight at once; 2 (default) "
                         "overlaps the next batch's assembly+dispatch "
                         "with the current one's device->host fetch — "
                         "on a tunneled chip the fetch RTT dominates; "
                         "1 = classic synchronous dispatch")
    args = ap.parse_args(argv)

    from .export import ServingBundle

    if args.dp and args.tp:
        raise SystemExit("--dp and --tp are mutually exclusive (one mesh "
                         "axis per serving bundle; pp x tp bundles are "
                         "not a thing at inference)")
    mesh = None
    n_mesh = args.dp or args.tp
    if n_mesh:
        import jax
        import numpy as np
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()[:n_mesh]).reshape(n_mesh),
                    ("dp",) if args.dp else ("tp",))
    bundle = ServingBundle.load(args.bundle, mesh=mesh)
    variables = _load_variables(args.checkpoint, args.which)
    # tp bundles replicate the batch axis, so b1 artifacts exist and lone
    # requests never strand — only dp>1 needs the pad consent by default
    pad = (args.dp > 1 if args.pad_to_batch < 0
           else bool(args.pad_to_batch))
    with BatchingServer(bundle, variables,
                        max_delay_s=args.max_delay_ms / 1e3,
                        max_queue=args.max_queue,
                        pad_to_batch=pad,
                        pad_to_points=bool(args.pad_to_points),
                        pipeline_depth=args.pipeline_depth) as srv:
        if args.warmup:
            print("warming up (compiling every exported program)...")
            srv.warmup()

        def reload_fn(which):
            srv.reload(_load_variables(args.checkpoint, which))

        httpd = make_server(srv, args.host, args.port,
                            request_timeout_s=args.request_timeout_s,
                            reload_fn=reload_fn)
        print(f"serving {len(bundle.shapes())} artifact(s) on "
              f"http://{args.host}:{httpd.server_address[1]} "
              f"(max_delay={args.max_delay_ms} ms)")

        # graceful SIGTERM (what `kill`, docker stop and kubernetes send):
        # take the same drain path as Ctrl-C — stop accepting, join the
        # in-flight handler threads (make_server makes them non-daemon),
        # then the BatchingServer context manager drains its queues. The
        # process exits 0 so orchestrators see a clean stop.
        def _sigterm(signum, frame):
            raise KeyboardInterrupt

        try:
            import signal

            signal.signal(signal.SIGTERM, _sigterm)
        except ValueError:
            pass  # not the main thread (embedded use): skip the handler
        watch_stop = threading.Event()
        if args.watch_checkpoint > 0:
            base = f"http://127.0.0.1:{httpd.server_address[1]}"
            threading.Thread(
                target=watch_checkpoint,
                args=(base, args.checkpoint, args.which,
                      args.watch_checkpoint, watch_stop),
                daemon=True, name="haet-ckpt-watch").start()
            print(f"watching '{args.which}' under {args.checkpoint} "
                  f"every {args.watch_checkpoint} s")
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            print("draining (signal received)...")
        finally:
            watch_stop.set()  # no reload mid-drain
            httpd.shutdown()
            httpd.server_close()


if __name__ == "__main__":
    sys.exit(main())
