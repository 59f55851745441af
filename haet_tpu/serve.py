"""Production serving: dynamic request batching over AOT artifacts.

The reference repo stops at an eval script (single-sample loop,
``benchmarks/02-Car-Design-ShapeNetCar/main.py`` eval branch); deploying it
means hand-rolling the serving loop. Here serving is first-class and
TPU-shaped:

* **Batch is part of the compiled program** (static shapes — XLA traces and
  tiles once; ``haet_tpu/export.py`` module docstring). So a server cannot
  "just batch whatever arrived": it needs one AOT program per batch size it
  intends to dispatch. :func:`export_batch_family` writes a
  :class:`~haet_tpu.export.ServingBundle` with a power-of-two family of
  batch sizes for one sample signature.

* **Dynamic batching without padding.** :class:`BatchingServer` queues
  single-sample requests, groups same-signature samples, and greedily
  dispatches the largest exported batch size that the queue can fill —
  remainder rides smaller programs (worst case batch-1). No request is ever
  padded with synthetic samples: duplicate/zero padding would change
  nothing for per-sample outputs here, but the export contract is
  explicit no-silent-padding (rep-slice statistics are batch-independent,
  yet BatchNorm in train mode and any future cross-sample op are not — the
  serving layer must not quietly create data the caller never sent).

* **Latency/throughput knob.** ``max_delay_s`` bounds how long the first
  request in a group waits for co-batchable traffic: 0 = latency-optimal
  (dispatch immediately, batch only what is already queued), larger =
  throughput-optimal. On a tunneled chip the dispatch RTT dominates
  single-request latency (docs/benchmarks.md), so batching pays for
  itself almost immediately.

The server is transport-agnostic: ``submit`` returns a
``concurrent.futures.Future``; wrap it in HTTP/gRPC as needed. By default a
single dispatcher thread keeps at most one program in flight, which is the
right shape for one uncontended chip (programs serialize on the device
anyway). ``pipeline_depth=2`` opts into double-buffered dispatch: batch k+1
is assembled and dispatched while batch k's device→host fetch is still in
flight — the device queue already serializes execution, so this changes
nothing about compute order, it only hides the host round-trip (which on a
tunneled chip is 10-20x the device time; measured gain in
docs/benchmarks.md "Serving throughput").
"""

from __future__ import annotations

import collections
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np

from . import export as hexport

__all__ = ["BatchingServer", "export_batch_family", "export_point_family",
           "ServerStats"]


def export_batch_family(
    path: str,
    model,
    variables,
    example_args: Sequence[Any],
    batch_sizes: Sequence[int] = (1, 2, 4, 8),
    *,
    platforms: Optional[Sequence[str]] = None,
    mesh=None,
    data_axis: str = "dp",
    extra_manifest: Optional[dict] = None,
    _point_bucket: Optional[int] = None,
) -> str:
    """Write one AOT artifact per batch size under ``path`` (a
    :class:`~haet_tpu.export.ServingBundle` root).

    ``example_args`` carries the SINGLE-sample signature: arrays shaped
    ``[1, ...]`` (or ``None`` for absent optional inputs, e.g. ``fx``).
    Each batch size re-exports the same program with the leading axis set
    to ``b`` — identical weights, one compile per size. Artifact subdirs
    are named by batch size AND sample signature, so several signatures
    (shape buckets) can export into the same bundle root without
    colliding.
    """
    import os

    # the tag carries shapes AND dtypes: two families with the same sample
    # shapes but different dtypes (f32 vs bf16 exports of one model) must
    # land in distinct artifact dirs, not silently overwrite each other.
    # Dtypes are the CANONICALIZED ones the traced program actually takes
    # (export._canonical_input_dtypes — f64 example data exports an f32
    # program), matching what the manifests record.
    if extra_manifest:
        # these two are the family's integrity/marker fields: batch_size
        # is measured per artifact below, and point_bucket is the
        # pad_to_points validity marker only export_point_family may
        # stamp (via the private _point_bucket channel) — letting extras
        # set either would mark arbitrary families as pad targets or
        # mislabel their true batch size
        reserved = {"batch_size", "point_bucket"} & set(extra_manifest)
        if reserved:
            raise ValueError(
                f"extra_manifest keys {sorted(reserved)} are reserved "
                "(measured/marker fields of the family itself)")
    dts = hexport._canonical_input_dtypes(example_args)
    sig_tag = "_".join(
        "x".join(str(d) for d in np.shape(a)[1:]) + "-" + dt
        for a, dt in zip(
            [a for a in example_args if a is not None], dts))
    sizes = sorted(set(int(b) for b in batch_sizes))
    for b in sizes:
        if b < 1:
            raise ValueError(f"batch sizes must be >= 1, got {b}")
    if mesh is not None and data_axis is not None:
        # validate EVERY size before writing anything: failing midway
        # would leave a half-written family on disk that ServingBundle
        # later serves silently missing sizes (and the default sizes
        # include b1, which can never divide dp>1)
        n_dp = int(mesh.shape[data_axis])
        bad = [b for b in sizes if b % n_dp]
        if bad:
            raise ValueError(
                f"batch sizes {bad} do not divide the '{data_axis}' "
                f"mesh axis ({n_dp}); pass multiples of the "
                f"data-parallel degree (e.g. batch_sizes="
                f"{tuple(n_dp * m for m in (1, 2, 4))}), or "
                "data_axis=None for replicated inputs (head-TP)")
    for b in sizes:
        ex_b = tuple(
            None if a is None else np.broadcast_to(
                np.asarray(a), (b,) + np.shape(a)[1:]).copy()
            for a in example_args
        )
        extra = dict(extra_manifest or {})
        extra["batch_size"] = b  # measured: always wins over extras
        if _point_bucket is not None:
            extra["point_bucket"] = int(_point_bucket)
        hexport.save_artifact(
            os.path.join(path, f"b{b}_{sig_tag}"), model, variables, ex_b,
            platforms=platforms, mesh=mesh, data_axis=data_axis,
            extra_manifest=extra,
        )
    return path


def export_point_family(
    path: str,
    model,
    variables,
    example_args: Sequence[Any],
    point_buckets: Sequence[int],
    batch_sizes: Sequence[int] = (1, 2, 4, 8),
    *,
    platforms: Optional[Sequence[str]] = None,
    mesh=None,
    data_axis: str = "dp",
    extra_manifest: Optional[dict] = None,
) -> str:
    """:func:`export_batch_family` over POINT-COUNT buckets: one batch
    family per N in ``point_buckets``, all under one bundle root.

    This is how a ragged point-cloud fold (e.g. ShapeNet-Car meshes at
    ~29-38k points, reference ``main_evaluation.py`` per-sample native N)
    is served with static-shape artifacts: export buckets covering the
    fold's N range (``benchmarks/car_train.py`` uses 2048-multiples) and
    run the server with ``pad_to_points=True`` — each request rides the
    smallest bucket that fits and its output is truncated back to its
    true N.

    ``example_args`` carries the single-sample signature at ANY point
    count; each bucket resizes axis 1 (the point axis of the ``[1, N,
    ...]`` sample) by repeat-last-row extension or truncation — only
    shapes/dtypes matter for export. Every array arg must share the same
    axis-1 point count.
    """
    for i, a in enumerate(example_args):
        if a is not None and np.ndim(a) < 2:
            raise ValueError(
                f"point families need every array arg shaped [1, N, ...] "
                f"(a shared point axis 1) — arg {i} has shape "
                f"{np.shape(a)}; per-sample scalars/vectors cannot ride "
                "point buckets")
    ns = {np.shape(a)[1] for a in example_args if a is not None}
    if len(ns) != 1:
        raise ValueError(
            f"example args disagree on the point axis (axis 1): {ns}")
    n0 = ns.pop()
    if extra_manifest and "point_bucket" in extra_manifest:
        raise ValueError(
            "extra_manifest key 'point_bucket' is reserved (it is the "
            "marker pad_to_points keys on)")
    for n in sorted(set(int(n) for n in point_buckets)):
        if n < 1:
            raise ValueError(f"point buckets must be >= 1, got {n}")
        idx = np.minimum(np.arange(n), n0 - 1)
        ex_n = tuple(None if a is None else np.take(np.asarray(a), idx,
                                                    axis=1)
                     for a in example_args)
        export_batch_family(path, model, variables, ex_n,
                            batch_sizes=batch_sizes, platforms=platforms,
                            mesh=mesh, data_axis=data_axis,
                            extra_manifest=extra_manifest,
                            # the marker pad_to_points keys on: only
                            # artifacts exported AS point buckets are
                            # valid pad targets (a structured-grid family
                            # that merely has a larger axis-1 must never
                            # receive padded point clouds)
                            _point_bucket=n)
    return path


class ServerStats:
    """Counters the dispatcher/delivery threads update.

    All mutation and :meth:`snapshot` run under ``self.lock`` — with
    ``pipeline_depth>1`` two server threads write here concurrently, and
    even single-threaded dispatch must not race a reader iterating the
    latency deque mid-append (``deque mutated during iteration``)."""

    def __init__(self, latency_window: int = 1024):
        self.lock = threading.Lock()
        self.requests = 0
        self.dispatches = 0
        # requests whose queue wait has been accumulated (denominator for
        # mean_queue_wait_s — ``requests`` would understate the mean while
        # traffic is still queued/cancelled/strand-failed)
        self.dispatched_requests = 0
        # requests whose result (or error) actually reached the caller
        self.delivered = 0
        self.batch_histogram = collections.Counter()
        self.queue_wait_s_total = 0.0
        # samples synthesized by pad_to_batch (duplicated rows whose
        # outputs are discarded) — visible so operators can size families
        self.padded_samples = 0
        # points synthesized by pad_to_points (repeat-last rows whose
        # output rows are truncated away) — visible so operators can size
        # point buckets
        self.padded_points = 0
        # rolling window of per-request submit->result latencies for
        # percentile reporting (bounded: serving runs are long-lived)
        self.latencies_s = collections.deque(maxlen=latency_window)

    @staticmethod
    def _pct(xs, q: float):
        if not xs:
            return None
        return xs[min(len(xs) - 1, int(q * len(xs)))]

    def snapshot(self) -> dict:
        with self.lock:
            lat = sorted(self.latencies_s)
            return {
                "requests": self.requests,
                "dispatches": self.dispatches,
                "delivered": self.delivered,
                "batch_histogram": dict(self.batch_histogram),
                "mean_queue_wait_s": (
                    self.queue_wait_s_total / self.dispatched_requests
                    if self.dispatched_requests else 0.0),
                "latency_p50_s": self._pct(lat, 0.50),
                "latency_p95_s": self._pct(lat, 0.95),
                "padded_samples": self.padded_samples,
                "padded_points": self.padded_points,
            }


class _Request:
    __slots__ = ("args", "key", "future", "t_enqueued", "orig_n",
                 "n_padded")

    def __init__(self, args, key, orig_n=None, n_padded=None):
        self.args = args
        self.key = key
        self.future: Future = Future()
        self.t_enqueued = time.perf_counter()
        # pad_to_points bookkeeping: the caller's true point count and the
        # bucket it was padded to — delivery truncates output rows back
        self.orig_n = orig_n
        self.n_padded = n_padded


class BatchingServer:
    """Groups single-sample requests into the largest exported batches.

    Args:
        bundle: a :class:`~haet_tpu.export.ServingBundle` (e.g. from
            :func:`export_batch_family` + ``ServingBundle.load``), or any
            mapping-free object with ``shapes()`` and ``predict``.
        variables: the model variables passed to every artifact call.
        max_delay_s: how long the oldest queued request may wait for
            co-batchable traffic before dispatch (0 = immediately).
        max_queue: backpressure bound; ``submit`` raises when full.
        pad_to_batch: opt-in. When a group ages out below the smallest
            exported batch size, duplicate its last sample to fill that
            program instead of failing the requests. Output-identical for
            the eval-mode per-sample programs this package exports (each
            batch row is computed independently; padded rows are
            discarded) — and the ONLY way to serve low traffic on a
            multi-chip (``mesh=``) family, whose smallest exportable
            batch is the data-parallel degree (b1 artifacts are
            impossible at dp>1). Off by default: the export contract is
            no *silent* padding (module docstring of
            :mod:`haet_tpu.export`); this flag is the explicit consent.
        pad_to_points: opt-in. A sample whose POINT count N has no exact
            artifact is padded along axis 0 of every input (repeat-last
            row, the same policy training uses —
            ``data/shapenet_car.pad_sample``) up to the smallest exported
            point bucket that fits, and the output rows are truncated
            back to N. Unlike batch padding this is **not output-exact**:
            the rep-slice softmax normalizes over all N points
            (reference ``Physics_Attention`` dim=2 softmax), so padded
            rows shift the slice statistics of the real ones. The
            deviation is small and bounded in
            ``tests/test_serve.py::test_pad_to_points_deviation_bound``
            (duplicated points are valid geometry the model has seen in
            training); it shrinks as N approaches the bucket. Off by
            default — same explicit-consent contract as ``pad_to_batch``.
            Assumes axis 0 of every input AND output is the point axis
            (true for the irregular point-cloud models; do not enable for
            structured-grid artifacts).
        pipeline_depth: number of batches allowed in flight at once.
            1 (default) = classic synchronous loop. 2 = double-buffered:
            a delivery thread owns the device→host fetch + future
            delivery, so the dispatcher can assemble and dispatch batch
            k+1 while batch k's fetch is still on the wire. Compute order
            is unchanged (the device queue serializes programs); only the
            host round-trip is hidden. Depths >2 add queueing without
            more overlap for a single chip but are accepted.

    Use as a context manager or call :meth:`close`.
    """

    def __init__(self, bundle, variables, *, max_delay_s: float = 0.002,
                 max_queue: int = 1024, pad_to_batch: bool = False,
                 pad_to_points: bool = False, pipeline_depth: int = 1):
        self.bundle = bundle
        self.variables = variables
        # the server holds ONE checkpoint: bake it into the executables
        # (ExportedModel.bind — ~2x faster dispatch than re-marshalling
        # the weight tree every call) when the bundle supports it. A
        # caller-bound BoundBundle is accepted as already weight-free
        # (it matches the shapes()/predict duck type, but its predict
        # takes no variables — treating it as a raw bundle would feed
        # the weights dict in as the first input array).
        if isinstance(bundle, hexport.BoundBundle):
            # weights already baked in by the caller; the variables arg
            # is unused for dispatch. ServingBundle.bind is LAZY (each
            # signature binds on its first dispatch), so the bound
            # checkpoint has NOT been validated yet — run the same eager
            # structural check as the unbound path, or a bad tree would
            # pass construction and poison every later request.
            self._bound = bundle
            self._validate_variables(bundle._variables)
        else:
            self._bound = (bundle.bind(variables)
                           if hasattr(bundle, "bind") else None)
            self._validate_variables(variables)
        self.max_delay_s = float(max_delay_s)
        self.max_queue = int(max_queue)
        self.pad_to_batch = bool(pad_to_batch)
        self.pad_to_points = bool(pad_to_points)
        self.pipeline_depth = int(pipeline_depth)
        if self.pipeline_depth < 1:
            raise ValueError(
                f"pipeline_depth must be >= 1, got {pipeline_depth}")
        self.stats = ServerStats()

        # batch sizes available per single-sample signature:
        # sig = shapes with the leading (batch) axis stripped
        self._sizes_by_sig: dict = {}
        # expected input dtypes per signature (from artifact manifests,
        # when the bundle carries them) — wrong-dtype requests must be
        # rejected at submit, BEFORE they co-batch with valid traffic
        self._dtypes_by_sig: dict = {}
        # signatures whose artifacts were exported AS point buckets
        # (export_point_family stamps `point_bucket` in the manifest) —
        # pad_to_points only pads onto these; a structured-grid family
        # that merely has a larger axis must never receive padded clouds
        self._point_bucket_sigs: set = set()
        for key in bundle.shapes():
            if any(len(s) == 0 for s in key):
                continue  # scalar input: no batch axis to group over
            batches = {s[0] for s in key}
            if len(batches) != 1:
                continue  # mixed leading axes: not a batchable signature
            sig = tuple(tuple(s[1:]) for s in key)
            self._sizes_by_sig.setdefault(sig, []).append(
                int(batches.pop()))
            model = getattr(bundle, "_by_key", {}).get(key)
            if (model is not None and hasattr(model, "manifest")
                    and model.manifest.get("point_bucket") is not None):
                self._point_bucket_sigs.add(sig)
            dts = (model.manifest.get("input_dtypes")
                   if model is not None and hasattr(model, "manifest")
                   else None)
            if dts is not None:
                prev = self._dtypes_by_sig.get(sig)
                if prev is not None and prev != tuple(dts):
                    # fail at construction, not at dispatch: a family
                    # whose batch sizes were exported with different
                    # dtypes would pass submit validation against the
                    # first-seen dtypes, then co-batch and fail EVERY
                    # request at ExportedModel._check
                    raise ValueError(
                        f"inconsistent artifact family: batch sizes of "
                        f"sample signature {sig} were exported with "
                        f"different input dtypes ({prev} vs "
                        f"{tuple(dts)}); re-export the family with one "
                        "dtype (or use separate bundle roots)")
                self._dtypes_by_sig[sig] = tuple(dts)
        for sig in self._sizes_by_sig:
            self._sizes_by_sig[sig].sort(reverse=True)

        self._lock = threading.Condition()
        self._queues: dict = collections.defaultdict(collections.deque)
        self._closed = False
        # pipeline_depth>1: dispatched-but-unfetched batches ride this
        # queue to a delivery thread. The in-flight BOUND is the
        # semaphore, acquired BEFORE a batch is dispatched and released
        # when its delivery finishes — bounding the queue alone would
        # allow pipeline_depth+1 in flight (the dispatcher would dispatch
        # batch k+2 before blocking on the full queue).
        self._fetch_q = None
        self._delivery_thread = None
        self._inflight = None
        if self.pipeline_depth > 1:
            import queue

            self._fetch_q = queue.Queue()
            self._inflight = threading.Semaphore(self.pipeline_depth)
            self._delivery_thread = threading.Thread(
                target=self._delivery_loop, daemon=True,
                name="haet-serving-delivery")
            self._delivery_thread.start()
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        daemon=True,
                                        name="haet-serving-dispatcher")
        self._thread.start()

    def _validate_variables(self, variables):
        """Fail a structurally wrong checkpoint NOW, not on first
        traffic: ServingBundle.bind is lazy (per-signature bind happens
        on first dispatch), so without this an unconverted --pp layout
        or a missing batch_stats collection would pass construction and
        reload(warmup=False), then poison EVERY later request."""
        by_key = getattr(self.bundle, "_by_key", None)
        if not by_key:
            return  # stub bundles without artifacts: nothing to check
        m = next(iter(by_key.values()))
        check = getattr(m, "_check_variables", None)
        if check is not None:
            check(variables)

    # -- client side ----------------------------------------------------

    def _point_bucket_for(self, sig):
        """Smallest exported POINT-BUCKET signature reachable from ``sig``
        by padding the point axis (axis 0 of every array arg, all sharing
        one N), or ``None``. Trailing dims must match exactly; only
        signatures whose artifacts carry the ``point_bucket`` manifest
        marker (written by :func:`export_point_family`) are candidates —
        a same-rank structured-grid family must never become a silent
        pad target."""
        if any(len(s) == 0 for s in sig):
            # a scalar arg has no point axis to pad; matching it against
            # a rank-1 bucket entry would crash in the repeat-last-row
            # padding (a[-1:] on 0-d) instead of rejecting cleanly
            return None
        n_set = {s[0] for s in sig}
        if len(n_set) != 1:
            return None
        n = n_set.pop()
        best = None
        for cand in self._point_bucket_sigs:
            if len(cand) != len(sig):
                continue
            np_set = {c[0] for c in cand if len(c)}
            if len(np_set) != 1:
                continue
            n_pad = np_set.pop()
            if n_pad < n:
                continue
            if all(c[1:] == s[1:] for c, s in zip(cand, sig)):
                if best is None or n_pad < best[0]:
                    best = (n_pad, cand)
        return best

    def submit(self, *args) -> Future:
        """Enqueue ONE sample (arrays shaped ``[...]`` without the batch
        axis, ``None`` for absent optional inputs). Returns a Future whose
        result is the model output for this sample (batch axis stripped).
        """
        arrs = tuple(None if a is None else np.asarray(a) for a in args)
        sig = tuple(tuple(np.shape(a)) for a in arrs if a is not None)
        orig_n = n_padded = None
        if sig not in self._sizes_by_sig and self.pad_to_points:
            bucket = self._point_bucket_for(sig)
            if bucket is not None:
                n_padded, target = bucket
                orig_n = sig[0][0]
                # repeat-last-row padding: the exact policy training uses
                # (data/shapenet_car.pad_sample), so padded geometry is
                # in-distribution; output rows >= orig_n are truncated
                arrs = tuple(
                    None if a is None else np.concatenate(
                        [a, np.repeat(a[-1:], n_padded - orig_n, axis=0)])
                    for a in arrs)
                sig = target
        if sig not in self._sizes_by_sig:
            if self.pad_to_points:
                hint = (" (no point-bucket artifact fits: pad_to_points "
                        "only pads onto families exported via "
                        "export_point_family — bucketed signatures "
                        f"here: {sorted(self._point_bucket_sigs)})")
            else:
                hint = (" (pad_to_points=True would serve smaller point "
                        "counts through the nearest larger "
                        "export_point_family bucket)")
            raise ValueError(
                f"no artifact family for sample signature {sig}; "
                f"available: {sorted(self._sizes_by_sig)}{hint}")
        dtypes = tuple(a.dtype.name for a in arrs if a is not None)
        want = self._dtypes_by_sig.get(sig)
        if want is not None and dtypes != want:
            # reject HERE: a wrong-dtype sample that reached a batch would
            # promote the whole np.stack and fail every co-batched request
            raise ValueError(
                f"dtype mismatch: artifact family expects {want}, got "
                f"{dtypes}. Cast the inputs explicitly (no implicit casts "
                "at the serving boundary).")
        # co-batching key: shapes AND dtypes AND the None positions — only
        # requests whose arg tuples np.stack cleanly may share a batch
        none_mask = tuple(a is None for a in arrs)
        req = _Request(arrs, (sig, dtypes, none_mask),
                       orig_n=orig_n, n_padded=n_padded)
        with self._lock:
            if self._closed:
                raise RuntimeError("server is closed")
            depth = sum(len(q) for q in self._queues.values())
            if depth >= self.max_queue:
                raise RuntimeError(
                    f"queue full ({depth} >= max_queue={self.max_queue})")
            self._queues[req.key].append(req)
            with self.stats.lock:
                self.stats.requests += 1
                if orig_n is not None:
                    self.stats.padded_points += n_padded - orig_n
            self._lock.notify()
        return req.future

    def predict(self, *args, timeout: Optional[float] = None):
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(*args).result(timeout=timeout)

    # -- dispatcher side ------------------------------------------------

    @staticmethod
    def _deliver(future: Future, fn, *args):
        """set_result/set_exception tolerant of client-cancelled futures
        (an InvalidStateError here would kill the dispatcher thread and
        hang every later request)."""
        try:
            fn(future, *args)
        except Exception:
            pass  # future was cancelled by its client: nothing to deliver

    def _take_group(self):
        """Under the lock: pick (key, [requests], pad_to) to dispatch, or
        ``(None, wait_seconds_or_None)``.

        Policy: every queue is scanned — a queue is *ready* once it can
        fill its largest exported batch, or once its oldest request has
        aged past ``max_delay_s`` (or the server is draining). Among ready
        queues the one with the oldest head dispatches first (no
        head-of-line blocking: a full batch for one signature never waits
        out another signature's delay window). The returned wait is the
        smallest remaining delay across non-ready queues. Requests whose
        futures were cancelled by their clients (e.g. an HTTP 504 abandon)
        are dropped here, before they cost a dispatch. The outer loop
        re-scans after a queue is strand-failed or emptied by cancels —
        other queues may hold dispatchable work RIGHT NOW, and returning
        ``(None, None)`` instead would park the dispatcher in an unbounded
        ``Condition.wait`` with ready requests queued.
        """
        while True:
            now = time.perf_counter()
            pick, pick_t = None, None
            wait = None
            for key, q in self._queues.items():
                # purge ALL cancelled entries before the readiness math:
                # mid-queue cancels must not inflate len(q) into a
                # premature strand-fail or padded dispatch of a live
                # request whose delay window hasn't elapsed
                if any(r.future.cancelled() for r in q):
                    alive = [r for r in q if not r.future.cancelled()]
                    q.clear()
                    q.extend(alive)
                if not q:
                    continue
                sizes = self._sizes_by_sig[key[0]]
                head_t = q[0].t_enqueued
                ready = (len(q) >= sizes[0]
                         or now - head_t >= self.max_delay_s
                         or self._closed)
                if ready:
                    if pick_t is None or head_t < pick_t:
                        pick, pick_t = key, head_t
                else:
                    remaining = self.max_delay_s - (now - head_t)
                    wait = (remaining if wait is None
                            else min(wait, remaining))
            if pick is None:
                return None, wait
            sizes = self._sizes_by_sig[pick[0]]
            q = self._queues[pick]
            alive = [r for r in q if not r.future.cancelled()]
            q.clear()
            q.extend(alive)
            if not q:
                continue  # all cancelled mid-queue: pick again
            pad_to = None
            if len(q) < sizes[-1]:
                if self.pad_to_batch:
                    # fill the smallest program with duplicated samples;
                    # padded rows are discarded after dispatch
                    take, pad_to = len(q), sizes[-1]
                else:
                    # aged out below the SMALLEST exported batch (family
                    # without a b1 artifact): no program can ever serve
                    # these alone — fail fast with a clear error instead
                    # of hanging, then re-scan for other ready queues.
                    n_stranded = len(q)
                    while q:
                        self._deliver(
                            q.popleft().future, Future.set_exception,
                            ValueError(
                                f"{n_stranded} queued request(s) for "
                                f"signature {pick[0]} cannot fill the "
                                f"smallest exported batch size "
                                f"({sizes[-1]}); export a b1 artifact "
                                "(export_batch_family includes 1 by "
                                "default), pass pad_to_batch=True "
                                "(required for multi-chip families, "
                                "where b1 cannot exist at dp>1), or "
                                "send more traffic within max_delay_s"))
                    continue
            else:
                take = next(s for s in sizes if s <= len(q))
            return (pick, [q.popleft() for _ in range(take)], pad_to), wait

    def _dispatch_loop(self):
        try:
            while True:
                with self._lock:
                    group, wait = self._take_group()
                    while group is None:
                        if self._closed and not any(
                                self._queues[s] for s in self._queues):
                            return
                        self._lock.wait(timeout=wait)
                        group, wait = self._take_group()
                _, reqs, pad_to = group
                if self._inflight is not None:
                    # cap dispatched-but-undelivered batches at
                    # pipeline_depth, BEFORE dispatching this one
                    self._inflight.acquire()
                try:
                    out = self._dispatch_batch(reqs, pad_to)
                except Exception as e:  # surface to every caller
                    if self._inflight is not None:
                        self._inflight.release()  # nothing went in flight
                    with self.stats.lock:
                        self.stats.delivered += len(reqs)
                    for r in reqs:
                        self._deliver(r.future, Future.set_exception, e)
                    continue
                t = time.perf_counter()
                with self.stats.lock:
                    self.stats.dispatches += 1
                    self.stats.batch_histogram[len(reqs)] += 1
                    self.stats.dispatched_requests += len(reqs)
                    if pad_to is not None:
                        self.stats.padded_samples += pad_to - len(reqs)
                    for r in reqs:
                        self.stats.queue_wait_s_total += t - r.t_enqueued
                if self._fetch_q is None:
                    self._finish_batch(reqs, out)
                else:
                    # double-buffering: hand the device output to the
                    # delivery thread and go pick the next batch NOW —
                    # the semaphore acquired above blocks the NEXT
                    # dispatch once pipeline_depth batches are in flight
                    # (backpressure)
                    self._fetch_q.put((reqs, out))
        finally:
            # dispatcher is exiting (drain or crash): release the
            # delivery thread after every in-flight batch lands
            if self._fetch_q is not None:
                self._fetch_q.put(None)

    def _delivery_loop(self):
        while True:
            item = self._fetch_q.get()
            if item is None:
                return
            self._finish_batch(*item)

    def _dispatch_batch(self, reqs, pad_to=None):
        """Host assembly + device dispatch; returns DEVICE arrays (the
        jit call is async — it does not wait for execution)."""
        args = []
        for j in range(len(reqs[0].args)):
            if reqs[0].args[j] is None:
                args.append(None)
            else:
                a = np.stack([r.args[j] for r in reqs])
                if pad_to is not None and pad_to > len(reqs):
                    # pad_to_batch consent: duplicate the last sample to
                    # fill the program; rows >= len(reqs) are never read
                    a = np.concatenate(
                        [a, np.repeat(a[-1:], pad_to - len(reqs), axis=0)])
                args.append(a)
        if self._bound is not None:
            return self._bound.predict(*args)
        return self.bundle.predict(self.variables, *args)

    def _finish_batch(self, reqs, out):
        """The blocking device→host fetch + per-request delivery.

        Must NEVER raise: an escaped exception here kills the dispatcher
        (or delivery) thread, stranding every queued and future request
        with forever-pending futures — any failure is delivered to this
        batch's callers instead.
        """
        try:
            try:
                # fetch once for the whole batch (one device->host copy)
                host = jax.tree_util.tree_map(np.asarray, out)
            except Exception as e:  # device-side failure surfaces here
                with self.stats.lock:
                    self.stats.delivered += len(reqs)
                for r in reqs:
                    self._deliver(r.future, Future.set_exception, e)
                return
            t = time.perf_counter()
            with self.stats.lock:
                self.stats.delivered += len(reqs)
                for r in reqs:
                    self.stats.latencies_s.append(t - r.t_enqueued)
            try:
                for i, r in enumerate(reqs):
                    res = jax.tree_util.tree_map(
                        lambda o: np.asarray(o)[i], host)
                    if r.orig_n is not None:
                        # pad_to_points: truncate the synthesized rows
                        # back. Only leaves whose axis 0 is the padded
                        # point count are point-major; others pass
                        # through untouched.
                        res = jax.tree_util.tree_map(
                            lambda o: (o[: r.orig_n]
                                       if np.ndim(o)
                                       and len(o) == r.n_padded
                                       else o), res)
                    self._deliver(r.future, Future.set_result, res)
            except Exception as e:  # per-sample split failed (e.g. an
                # output leaf without a leading batch axis): fail THIS
                # batch's remaining futures, keep the server alive
                for r in reqs:
                    self._deliver(r.future, Future.set_exception, e)
        finally:
            if self._inflight is not None:
                self._inflight.release()  # this batch left the pipeline

    def reload(self, variables, *, warmup: bool = True):
        """Hot-swap the served checkpoint without restarting the server.

        The new weights are bound into fresh executables and (by default)
        compiled for every exported program BEFORE the swap, so no live
        request stalls on a cold compile — zero-downtime weight updates
        (the torch reference has no serving story at all; its eval script
        re-imports the module per run). Requests already dispatched finish
        on the old weights; requests dispatched after `reload` returns use
        the new ones. Thread-safe: the swap is a single atomic attribute
        write read once per batch by the dispatcher.

        The new checkpoint's pytree STRUCTURE is validated eagerly (even
        with ``warmup=False`` — binding is lazy per signature, so a
        structurally wrong tree would otherwise swap in cleanly and then
        fail every subsequent request): a bad checkpoint raises HERE and
        the server keeps serving the old weights.
        """
        if isinstance(self.bundle, hexport.BoundBundle):
            raise ValueError(
                "this server was built from a caller-bound BoundBundle "
                "(weights already baked in); construct the BatchingServer "
                "from the raw ServingBundle + variables to use reload()")
        self._validate_variables(variables)
        if self._bound is None:
            self.variables = variables
            return
        new_bound = self.bundle.bind(variables)
        if warmup:
            self._warmup_into(new_bound, variables)
        self.variables = variables
        self._bound = new_bound

    def _warmup_into(self, bound, variables):
        """Dispatch a zero-filled batch through every exported program
        (all signatures x batch sizes) of ``bound`` (or the raw bundle
        when weight-binding is unsupported). Families whose manifests
        lack input dtypes are skipped and compile on first dispatch."""
        for sig, sizes in self._sizes_by_sig.items():
            dtypes = self._dtypes_by_sig.get(sig)
            if dtypes is None:
                continue
            for b in sizes:
                batch = tuple(np.zeros((b,) + shape, dtype=dt)
                              for shape, dt in zip(sig, dtypes))
                if bound is not None:
                    bound.predict(*batch)
                else:
                    self.bundle.predict(variables, *batch)

    def warmup(self):
        """Compile every exported program (all signatures x batch sizes)
        with zero-filled samples so no live request pays a cold compile.
        Requires the bundle's manifests to carry input dtypes (artifacts
        written by this package always do); families without dtype info
        are skipped and compile on first dispatch instead."""
        self._warmup_into(self._bound, self.variables)

    # -- lifecycle ------------------------------------------------------

    def close(self, drain: bool = True):
        """Stop the dispatcher. ``drain=True`` serves queued requests
        first; ``drain=False`` fails them with ``RuntimeError``."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            if not drain:
                for q in self._queues.values():
                    while q:
                        self._deliver(
                            q.popleft().future, Future.set_exception,
                            RuntimeError("server closed before dispatch"))
            self._lock.notify_all()
        self._thread.join()
        if self._delivery_thread is not None:
            # the dispatcher's exit sentinel is already queued (its
            # finally block) — wait for the last in-flight fetches
            self._delivery_thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
