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
``concurrent.futures.Future``; wrap it in HTTP/gRPC as needed. Single
dispatcher thread → at most one program in flight per server, which is the
right shape for one chip (programs serialize on the device anyway; a second
in-flight dispatch only hides tunnel RTT, which ``pipeline_depth=2`` opts
into).
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

__all__ = ["BatchingServer", "export_batch_family", "ServerStats"]


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
    # land in distinct artifact dirs, not silently overwrite each other
    sig_tag = "_".join(
        "x".join(str(d) for d in np.shape(a)[1:])
        + "-" + np.dtype(getattr(a, "dtype", None) or np.asarray(a).dtype).name
        for a in example_args if a is not None)
    for b in sorted(set(int(b) for b in batch_sizes)):
        if b < 1:
            raise ValueError(f"batch sizes must be >= 1, got {b}")
        ex_b = tuple(
            None if a is None else np.broadcast_to(
                np.asarray(a), (b,) + np.shape(a)[1:]).copy()
            for a in example_args
        )
        hexport.save_artifact(
            os.path.join(path, f"b{b}_{sig_tag}"), model, variables, ex_b,
            platforms=platforms, mesh=mesh, data_axis=data_axis,
            extra_manifest={"batch_size": b},
        )
    return path


class ServerStats:
    """Counters the dispatcher updates; read them any time."""

    def __init__(self, latency_window: int = 1024):
        self.requests = 0
        self.dispatches = 0
        self.batch_histogram = collections.Counter()
        self.queue_wait_s_total = 0.0
        # samples synthesized by pad_to_batch (duplicated rows whose
        # outputs are discarded) — visible so operators can size families
        self.padded_samples = 0
        # rolling window of per-request submit->result latencies for
        # percentile reporting (bounded: serving runs are long-lived)
        self.latencies_s = collections.deque(maxlen=latency_window)

    def _pct(self, q: float):
        if not self.latencies_s:
            return None
        xs = sorted(self.latencies_s)
        return xs[min(len(xs) - 1, int(q * len(xs)))]

    def snapshot(self) -> dict:
        return {
            "requests": self.requests,
            "dispatches": self.dispatches,
            "batch_histogram": dict(self.batch_histogram),
            "mean_queue_wait_s": (
                self.queue_wait_s_total / self.requests
                if self.requests else 0.0),
            "latency_p50_s": self._pct(0.50),
            "latency_p95_s": self._pct(0.95),
            "padded_samples": self.padded_samples,
        }


class _Request:
    __slots__ = ("args", "key", "future", "t_enqueued")

    def __init__(self, args, key):
        self.args = args
        self.key = key
        self.future: Future = Future()
        self.t_enqueued = time.perf_counter()


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

    Use as a context manager or call :meth:`close`.
    """

    def __init__(self, bundle, variables, *, max_delay_s: float = 0.002,
                 max_queue: int = 1024, pad_to_batch: bool = False):
        self.bundle = bundle
        self.variables = variables
        # the server holds ONE checkpoint: bake it into the executables
        # (ExportedModel.bind — ~2x faster dispatch than re-marshalling
        # the weight tree every call) when the bundle supports it.
        self._bound = (bundle.bind(variables)
                       if hasattr(bundle, "bind") else None)
        self.max_delay_s = float(max_delay_s)
        self.max_queue = int(max_queue)
        self.pad_to_batch = bool(pad_to_batch)
        self.stats = ServerStats()

        # batch sizes available per single-sample signature:
        # sig = shapes with the leading (batch) axis stripped
        self._sizes_by_sig: dict = {}
        # expected input dtypes per signature (from artifact manifests,
        # when the bundle carries them) — wrong-dtype requests must be
        # rejected at submit, BEFORE they co-batch with valid traffic
        self._dtypes_by_sig: dict = {}
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
            dts = (model.manifest.get("input_dtypes")
                   if model is not None and hasattr(model, "manifest")
                   else None)
            if dts is not None:
                self._dtypes_by_sig.setdefault(sig, tuple(dts))
        for sig in self._sizes_by_sig:
            self._sizes_by_sig[sig].sort(reverse=True)

        self._lock = threading.Condition()
        self._queues: dict = collections.defaultdict(collections.deque)
        self._closed = False
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        daemon=True,
                                        name="haet-serving-dispatcher")
        self._thread.start()

    # -- client side ----------------------------------------------------

    def submit(self, *args) -> Future:
        """Enqueue ONE sample (arrays shaped ``[...]`` without the batch
        axis, ``None`` for absent optional inputs). Returns a Future whose
        result is the model output for this sample (batch axis stripped).
        """
        arrs = tuple(None if a is None else np.asarray(a) for a in args)
        sig = tuple(tuple(np.shape(a)) for a in arrs if a is not None)
        if sig not in self._sizes_by_sig:
            raise ValueError(
                f"no artifact family for sample signature {sig}; "
                f"available: {sorted(self._sizes_by_sig)}")
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
        req = _Request(arrs, (sig, dtypes, none_mask))
        with self._lock:
            if self._closed:
                raise RuntimeError("server is closed")
            depth = sum(len(q) for q in self._queues.values())
            if depth >= self.max_queue:
                raise RuntimeError(
                    f"queue full ({depth} >= max_queue={self.max_queue})")
            self._queues[req.key].append(req)
            self.stats.requests += 1
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
                while q and q[0].future.cancelled():
                    q.popleft()
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
            try:
                out = self._run_batch(reqs, pad_to)
            except Exception as e:  # surface to every caller in the batch
                for r in reqs:
                    self._deliver(r.future, Future.set_exception, e)
                continue
            t = time.perf_counter()
            self.stats.dispatches += 1
            self.stats.batch_histogram[len(reqs)] += 1
            if pad_to is not None:
                self.stats.padded_samples += pad_to - len(reqs)
            for i, r in enumerate(reqs):
                self.stats.queue_wait_s_total += t - r.t_enqueued
                self.stats.latencies_s.append(t - r.t_enqueued)
                self._deliver(
                    r.future, Future.set_result,
                    jax.tree_util.tree_map(lambda o: np.asarray(o)[i], out))

    def _run_batch(self, reqs, pad_to=None):
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
            out = self._bound.predict(*args)
        else:
            out = self.bundle.predict(self.variables, *args)
        # fetch once for the whole batch (one device->host transfer)
        return jax.tree_util.tree_map(np.asarray, out)

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
        """
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

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
