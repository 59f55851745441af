"""Serving layer: dynamic request batching over AOT artifact families.

Covers haet_tpu/serve.py: export_batch_family bundle layout, batched
dispatch == per-sample direct apply, the batching policy actually batching,
signature / family error paths, and clean shutdown semantics.
"""

import sys
import threading
import time
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from haet_tpu import export as hexport
from haet_tpu import serve
from haet_tpu.models import HAETransolver_Irregular_Mesh

N_PTS = 64


@pytest.fixture(scope="module")
def bundle_env(tmp_path_factory):
    model = HAETransolver_Irregular_Mesh(
        space_dim=3, fun_dim=1, out_dim=2, n_layers=1, n_hidden=32,
        n_head=4, slice_num=8, rotate=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, N_PTS, 3))
    fx = jax.random.normal(jax.random.PRNGKey(2), (1, N_PTS, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    root = str(tmp_path_factory.mktemp("bundle"))
    serve.export_batch_family(root, model, variables, (x, fx),
                              batch_sizes=(1, 2, 4))
    bundle = hexport.ServingBundle.load(root)
    return model, variables, bundle


def _sample(seed):
    r = np.random.RandomState(seed)
    return (r.randn(N_PTS, 3).astype(np.float32),
            r.randn(N_PTS, 1).astype(np.float32))


def test_family_layout(bundle_env):
    _, _, bundle = bundle_env
    batches = sorted(key[0][0] for key in bundle.shapes())
    assert batches == [1, 2, 4]
    # every artifact shares the single-sample signature
    assert {tuple(tuple(s[1:]) for s in key)
            for key in bundle.shapes()} == {((N_PTS, 3), (N_PTS, 1))}


def test_batched_dispatch_matches_direct_apply(bundle_env):
    model, variables, bundle = bundle_env
    with serve.BatchingServer(bundle, variables,
                              max_delay_s=0.2) as srv:
        samples = [_sample(i) for i in range(5)]
        futs = [srv.submit(x, fx) for x, fx in samples]
        outs = [f.result(timeout=60) for f in futs]
    for (x, fx), out in zip(samples, outs):
        direct = model.apply(variables, x[None], fx[None], train=False)
        np.testing.assert_allclose(out, np.asarray(direct)[0],
                                   rtol=2e-5, atol=2e-5)
        assert out.shape == (N_PTS, 2)


def test_batching_actually_batches(bundle_env):
    _, variables, bundle = bundle_env
    srv = serve.BatchingServer(bundle, variables, max_delay_s=1.0)
    try:
        futs = [srv.submit(*_sample(i)) for i in range(4)]
        for f in futs:
            f.result(timeout=60)
        snap = srv.stats.snapshot()
        # 4 co-batchable requests inside a generous window ride the b4
        # program in ONE dispatch
        assert snap["batch_histogram"].get(4) == 1, snap
        assert snap["dispatches"] == 1
        assert snap["requests"] == 4
    finally:
        srv.close()


def test_remainder_rides_smaller_programs(bundle_env):
    _, variables, bundle = bundle_env
    srv = serve.BatchingServer(bundle, variables, max_delay_s=1.0)
    try:
        # 7 = 4 + 2 + 1 with the greedy largest-first policy (all queued
        # within the window)
        futs = [srv.submit(*_sample(i)) for i in range(7)]
        for f in futs:
            f.result(timeout=60)
        hist = srv.stats.snapshot()["batch_histogram"]
        assert sum(b * c for b, c in hist.items()) == 7
        assert hist.get(4) == 1, hist
    finally:
        srv.close()


def test_unknown_signature_raises(bundle_env):
    _, variables, bundle = bundle_env
    with serve.BatchingServer(bundle, variables) as srv:
        with pytest.raises(ValueError, match="no artifact family"):
            srv.submit(np.zeros((N_PTS + 1, 3), np.float32),
                       np.zeros((N_PTS + 1, 1), np.float32))


def test_family_without_b1_fails_stranded_requests(bundle_env, tmp_path):
    model, variables, _ = bundle_env
    x = jax.random.normal(jax.random.PRNGKey(1), (1, N_PTS, 3))
    fx = jax.random.normal(jax.random.PRNGKey(2), (1, N_PTS, 1))
    root = str(tmp_path / "no_b1")
    serve.export_batch_family(root, model, variables, (x, fx),
                              batch_sizes=(2,))
    bundle = hexport.ServingBundle.load(root)
    with serve.BatchingServer(bundle, variables,
                              max_delay_s=0.01) as srv:
        fut = srv.submit(*_sample(0))
        with pytest.raises(ValueError, match="smallest exported batch"):
            fut.result(timeout=60)


def test_close_drain_false_fails_queued(bundle_env):
    _, variables, bundle = bundle_env
    # huge delay so requests stay queued until close
    srv = serve.BatchingServer(bundle, variables, max_delay_s=60.0)
    futs = [srv.submit(*_sample(i)) for i in range(2)]
    srv.close(drain=False)
    for f in futs:
        with pytest.raises(RuntimeError, match="server closed"):
            f.result(timeout=10)
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(*_sample(9))


def test_close_drain_serves_queued(bundle_env):
    model, variables, bundle = bundle_env
    srv = serve.BatchingServer(bundle, variables, max_delay_s=60.0)
    futs = [srv.submit(*_sample(i)) for i in range(3)]
    srv.close(drain=True)  # drain overrides the 60 s window
    outs = [f.result(timeout=10) for f in futs]
    assert all(o.shape == (N_PTS, 2) for o in outs)


def test_concurrent_clients(bundle_env):
    model, variables, bundle = bundle_env
    srv = serve.BatchingServer(bundle, variables, max_delay_s=0.02)
    results = {}
    errs = []

    def client(i):
        try:
            results[i] = srv.predict(*_sample(i), timeout=60)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    srv.close()
    assert not errs
    for i in range(8):
        x, fx = _sample(i)
        direct = model.apply(variables, x[None], fx[None], train=False)
        np.testing.assert_allclose(results[i], np.asarray(direct)[0],
                                   rtol=2e-5, atol=2e-5)


def test_queue_backpressure(bundle_env):
    _, variables, bundle = bundle_env
    srv = serve.BatchingServer(bundle, variables, max_delay_s=60.0,
                               max_queue=2)
    f1 = srv.submit(*_sample(0))
    f2 = srv.submit(*_sample(1))
    with pytest.raises(RuntimeError, match="queue full"):
        srv.submit(*_sample(2))
    srv.close(drain=True)
    f1.result(timeout=10), f2.result(timeout=10)


def test_cancelled_future_does_not_kill_dispatcher(bundle_env):
    """A client cancelling its Future must not crash the dispatcher
    thread (set_result on a cancelled future raises InvalidStateError) —
    later requests must still be served and close() must not hang."""
    _, variables, bundle = bundle_env
    srv = serve.BatchingServer(bundle, variables, max_delay_s=0.5)
    try:
        doomed = srv.submit(*_sample(0))
        assert doomed.cancel()  # not yet dispatched: cancel succeeds
        out = srv.predict(*_sample(1), timeout=60)  # server still alive
        assert out.shape == (N_PTS, 2)
    finally:
        srv.close()  # must not deadlock
    assert not srv._thread.is_alive()


def test_wrong_dtype_rejected_at_submit(bundle_env):
    """An f64 sample with the right shape must be rejected in submit —
    if it reached a batch, np.stack would promote the co-batched f32
    requests and fail ALL of them."""
    _, variables, bundle = bundle_env
    with serve.BatchingServer(bundle, variables) as srv:
        x, fx = _sample(0)
        with pytest.raises(ValueError, match="dtype mismatch"):
            srv.submit(x.astype(np.float64), fx)


def test_no_head_of_line_blocking_across_signatures(bundle_env, tmp_path):
    """A FULL batch for one signature dispatches immediately even while
    another signature's lone request is still waiting out its delay
    window."""
    model, variables, _ = bundle_env
    import jax as _jax
    from haet_tpu import export as hexport
    root = str(tmp_path / "two_sigs")
    x1 = _jax.random.normal(_jax.random.PRNGKey(1), (1, N_PTS, 3))
    fx1 = _jax.random.normal(_jax.random.PRNGKey(2), (1, N_PTS, 1))
    x2 = _jax.random.normal(_jax.random.PRNGKey(3), (1, 2 * N_PTS, 3))
    fx2 = _jax.random.normal(_jax.random.PRNGKey(4), (1, 2 * N_PTS, 1))
    serve.export_batch_family(root, model, variables, (x1, fx1),
                              batch_sizes=(1, 2))
    serve.export_batch_family(root, model, variables, (x2, fx2),
                              batch_sizes=(1, 2))
    bundle = hexport.ServingBundle.load(root)
    srv = serve.BatchingServer(bundle, variables, max_delay_s=120.0)
    try:
        r = np.random.RandomState(0)
        # signature A (2N points): ONE request into a (1,2) family — not
        # full, not aged: waits out the 120 s window
        slow = srv.submit(r.randn(2 * N_PTS, 3).astype(np.float32),
                          r.randn(2 * N_PTS, 1).astype(np.float32))
        time.sleep(0.05)  # let the dispatcher enter A's wait first
        # signature B (N points): a FULL b2 batch — must not wait behind A
        f1 = srv.submit(*_sample(1))
        f2 = srv.submit(*_sample(2))
        f1.result(timeout=60)
        f2.result(timeout=60)
        assert not slow.done()
    finally:
        srv.close()  # drain serves the slow request too
    assert slow.result(timeout=10).shape == (2 * N_PTS, 2)


def test_warmup_compiles_every_size(bundle_env):
    _, variables, bundle = bundle_env
    with serve.BatchingServer(bundle, variables, max_delay_s=0.0) as srv:
        srv.warmup()  # compiles b1/b2/b4 from manifest dtypes; no stats
        assert srv.stats.requests == 0
        out = srv.predict(*_sample(0), timeout=60)
        assert out.shape == (N_PTS, 2)


def test_scalar_and_mixed_signatures_skipped():
    """Bundle entries whose inputs include a scalar (no batch axis) or
    mixed leading axes must be skipped, not crash the constructor."""

    class StubBundle:
        def shapes(self):
            return [((), (4,)),            # scalar input
                    ((2, 8), (4, 8)),      # mixed leading axes
                    ((1, 8), (1, 4))]      # a real b1 family

        def predict(self, variables, *args):
            return np.zeros((1, 3), np.float32)

    srv = serve.BatchingServer(StubBundle(), variables=None,
                               max_delay_s=0.0)
    try:
        assert list(srv._sizes_by_sig) == [((8,), (4,))]
        out = srv.predict(np.zeros((8,), np.float32),
                          np.zeros((4,), np.float32), timeout=30)
        assert out.shape == (3,)
    finally:
        srv.close()


def test_hot_reload_swaps_weights(bundle_env):
    """reload() serves NEW weights to later requests without restarting
    (and the stats/latency machinery keeps working across the swap)."""
    model, variables, bundle = bundle_env
    # a genuinely different checkpoint: re-init with another seed
    import jax as _jax
    x = _jax.random.normal(_jax.random.PRNGKey(1), (1, N_PTS, 3))
    fx = _jax.random.normal(_jax.random.PRNGKey(2), (1, N_PTS, 1))
    v2 = _jax.jit(model.init)(_jax.random.PRNGKey(99), x, fx)
    with serve.BatchingServer(bundle, variables, max_delay_s=0.0) as srv:
        s = _sample(0)
        out1 = srv.predict(*s, timeout=60)
        srv.reload(v2)
        out2 = srv.predict(*s, timeout=60)
        ref2 = model.apply(v2, s[0][None], s[1][None], train=False)
        np.testing.assert_allclose(out2, np.asarray(ref2)[0],
                                   rtol=2e-5, atol=2e-5)
        assert np.abs(out1 - out2).max() > 1e-3  # weights really changed
        snap = srv.stats.snapshot()
        assert snap["latency_p50_s"] is not None
        assert snap["latency_p95_s"] >= snap["latency_p50_s"]


def test_pad_to_batch_serves_partial_groups(bundle_env, tmp_path):
    """pad_to_batch=True: a lone request on a family whose smallest
    exported batch is 2 (the multi-chip dp>1 situation, where b1
    artifacts cannot exist) is served by duplicating the sample into the
    b2 program and discarding the padded row — output identical to a
    direct single-sample apply."""
    import os

    model, variables, _ = bundle_env
    x = jax.random.normal(jax.random.PRNGKey(1), (1, N_PTS, 3))
    fx = jax.random.normal(jax.random.PRNGKey(2), (1, N_PTS, 1))
    root = str(tmp_path / "b2_only")
    serve.export_batch_family(root, model, variables, (x, fx),
                              batch_sizes=(2,))
    # artifact dirs encode the input dtypes (same-shape families of
    # different dtypes must not overwrite each other on disk)
    assert all("float32" in d for d in os.listdir(root)), os.listdir(root)
    bundle = hexport.ServingBundle.load(root)
    with serve.BatchingServer(bundle, variables, max_delay_s=0.01,
                              pad_to_batch=True) as srv:
        s = _sample(3)
        out = srv.predict(*s, timeout=60)
    direct = model.apply(variables, s[0][None], s[1][None], train=False)
    np.testing.assert_allclose(out, np.asarray(direct)[0],
                               rtol=2e-5, atol=2e-5)
    snap = srv.stats.snapshot()
    assert snap["padded_samples"] == 1, snap
    assert snap["batch_histogram"] == {1: 1}, snap


def test_stranded_queue_does_not_stall_other_queues(bundle_env, tmp_path):
    """A queue that strand-fails (aged out below its family's smallest
    batch) must not park the dispatcher while ANOTHER signature holds
    dispatchable requests: after the strand failure the dispatcher
    re-scans and serves them (regression: it used to return with no
    wait bound and block in Condition.wait until an unrelated event)."""
    model, variables, _ = bundle_env
    n2 = N_PTS * 2
    x1 = jax.random.normal(jax.random.PRNGKey(1), (1, N_PTS, 3))
    f1 = jax.random.normal(jax.random.PRNGKey(2), (1, N_PTS, 1))
    x2 = jax.random.normal(jax.random.PRNGKey(3), (1, n2, 3))
    f2 = jax.random.normal(jax.random.PRNGKey(4), (1, n2, 1))
    root = str(tmp_path / "two_sigs")
    serve.export_batch_family(root, model, variables, (x1, f1),
                              batch_sizes=(1,))
    serve.export_batch_family(root, model, variables, (x2, f2),
                              batch_sizes=(2,))  # no b1: loners strand
    bundle = hexport.ServingBundle.load(root)
    r = np.random.RandomState(0)
    with serve.BatchingServer(bundle, variables,
                              max_delay_s=0.01) as srv:
        doomed = srv.submit(r.randn(n2, 3).astype(np.float32),
                            r.randn(n2, 1).astype(np.float32))
        fut = srv.submit(*_sample(5))
        with pytest.raises(ValueError, match="smallest exported batch"):
            doomed.result(timeout=30)
        out = fut.result(timeout=30)  # hung forever before the fix
    assert out.shape == (N_PTS, 2)


def test_ambiguous_bundle_same_shapes_different_dtypes_raises():
    class Stub:
        def __init__(self, dts):
            self.input_shapes = [[1, 4, 3]]
            self.manifest = {"input_dtypes": dts}

    hexport.ServingBundle([Stub(["float32"])])  # unambiguous: fine
    with pytest.raises(ValueError, match="ambiguous bundle"):
        hexport.ServingBundle([Stub(["float32"]), Stub(["bfloat16"])])


def test_cancelled_requests_are_dropped_not_dispatched(bundle_env):
    """Requests whose futures were cancelled (e.g. an HTTP handler
    answering 504 and abandoning them) are purged from the queue without
    ever reaching the device."""
    _, variables, bundle = bundle_env
    srv = serve.BatchingServer(bundle, variables, max_delay_s=60.0)
    f1 = srv.submit(*_sample(0))
    f2 = srv.submit(*_sample(1))
    assert f1.cancel() and f2.cancel()
    srv.close(drain=True)  # drain finds only cancelled requests
    assert srv.stats.snapshot()["dispatches"] == 0


# -- point-bucket families / pad_to_points (ragged point clouds) ---------


@pytest.fixture(scope="module")
def point_family_env(tmp_path_factory):
    """A two-bucket point family (N=64 and N=128) for the ragged-fold
    serving path — the reference eval consumes every car sample at its
    NATIVE point count (main_evaluation.py per-sample loop); static-shape
    artifacts serve that via buckets + opt-in padding."""
    model = HAETransolver_Irregular_Mesh(
        space_dim=3, fun_dim=1, out_dim=2, n_layers=1, n_hidden=32,
        n_head=4, slice_num=8, rotate=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, N_PTS, 3))
    fx = jax.random.normal(jax.random.PRNGKey(2), (1, N_PTS, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    root = str(tmp_path_factory.mktemp("point_family"))
    serve.export_point_family(root, model, variables, (x, fx),
                              point_buckets=(N_PTS, 2 * N_PTS),
                              batch_sizes=(1, 2))
    bundle = hexport.ServingBundle.load(root)
    return model, variables, bundle


def _ragged_sample(seed, n):
    r = np.random.RandomState(seed)
    return (r.randn(n, 3).astype(np.float32),
            r.randn(n, 1).astype(np.float32))


def test_export_point_family_layout(point_family_env):
    _, _, bundle = point_family_env
    sigs = {(key[0][0], key[0][1]) for key in bundle.shapes()}
    # (batch, points) grid: 2 buckets x 2 batch sizes
    assert sigs == {(1, N_PTS), (2, N_PTS), (1, 2 * N_PTS),
                    (2, 2 * N_PTS)}


def test_export_point_family_mismatched_point_axes_raises(bundle_env):
    model, variables, _ = bundle_env
    x = np.zeros((1, N_PTS, 3), np.float32)
    fx = np.zeros((1, N_PTS + 1, 1), np.float32)
    with pytest.raises(ValueError, match="disagree on the point axis"):
        serve.export_point_family("/nonexistent", model, variables,
                                  (x, fx), point_buckets=(N_PTS,))


def test_pad_to_points_off_by_default_with_hint(point_family_env):
    _, variables, bundle = point_family_env
    with serve.BatchingServer(bundle, variables) as srv:
        with pytest.raises(ValueError, match="pad_to_points"):
            srv.submit(*_ragged_sample(0, N_PTS - 8))


def test_pad_to_points_serves_ragged_fold(point_family_env):
    """A ragged synthetic fold (3 distinct Ns, none except one matching a
    bucket) is served end-to-end: every output comes back at the CALLER's
    point count and padded rows never leak. Exact-N requests bypass
    padding entirely (padded_points counts only synthesized rows)."""
    model, variables, bundle = point_family_env
    ns = [N_PTS - 16, N_PTS, 2 * N_PTS - 40]  # ragged; one exact
    with serve.BatchingServer(bundle, variables, max_delay_s=0.01,
                              pad_to_points=True) as srv:
        samples = [_ragged_sample(i, n) for i, n in enumerate(ns)]
        futs = [srv.submit(x, fx) for x, fx in samples]
        outs = [f.result(timeout=120) for f in futs]
    for n, out in zip(ns, outs):
        assert out.shape == (n, 2)
    # the exact-N sample is bit-identical to the direct apply (no padding
    # was involved for it)
    x, fx = samples[1]
    direct = model.apply(variables, x[None], fx[None], train=False)
    np.testing.assert_allclose(outs[1], np.asarray(direct)[0],
                               rtol=2e-5, atol=2e-5)
    snap = srv.stats.snapshot()
    assert snap["padded_points"] == 16 + 40, snap


def test_pad_to_points_deviation_bound(point_family_env):
    """Point padding is NOT output-exact (the rep-slice softmax
    normalizes over all N points — padded rows shift the slice statistics
    of real ones; BatchingServer docstring says so). This pins the
    measured deviation envelope: rel-L2 vs the unpadded native-N forward
    stays under 10% even at a 12.5% pad fraction and under 2% at ~2%,
    shrinking monotonically as N approaches the bucket (measured on this
    config: 0.031 at 56->64, 0.004 at 63->64)."""
    model, variables, bundle = point_family_env
    app = jax.jit(lambda v, x, fx: model.apply(v, x, fx, train=False))
    devs = {}
    with serve.BatchingServer(bundle, variables, max_delay_s=0.0,
                              pad_to_points=True) as srv:
        for n in (N_PTS - 8, N_PTS - 1):
            x, fx = _ragged_sample(n, n)
            served = srv.predict(x, fx, timeout=120)
            native = np.asarray(app(variables, x[None], fx[None]))[0]
            devs[n] = (np.linalg.norm(served - native)
                       / np.linalg.norm(native))
    assert devs[N_PTS - 8] < 0.10, devs
    assert devs[N_PTS - 1] < 0.02, devs
    assert devs[N_PTS - 1] < devs[N_PTS - 8], devs


def test_pad_to_points_picks_smallest_bucket(point_family_env):
    """N between the buckets rides the SMALLEST bucket that fits (the
    128 one), not the first seen."""
    _, variables, bundle = point_family_env
    n = N_PTS + 8
    with serve.BatchingServer(bundle, variables, max_delay_s=0.0,
                              pad_to_points=True) as srv:
        out = srv.predict(*_ragged_sample(0, n), timeout=120)
        assert out.shape == (n, 2)
        assert srv.stats.snapshot()["padded_points"] == 2 * N_PTS - n


def test_pad_to_points_ignores_unbucketed_families(bundle_env, tmp_path):
    """Families exported WITHOUT export_point_family's point_bucket
    marker are never pad targets: a structured-grid artifact that merely
    has a larger axis-1 must not silently receive padded point clouds.
    (bundle_env's family is plain export_batch_family output.)"""
    _, variables, bundle = bundle_env
    with serve.BatchingServer(bundle, variables,
                              pad_to_points=True) as srv:
        with pytest.raises(ValueError,
                           match="no point-bucket artifact fits"):
            srv.submit(*_ragged_sample(0, N_PTS - 8))


def test_pad_to_points_never_truncates_larger_requests(point_family_env):
    """A request LARGER than every bucket must fail loudly — truncation
    would silently drop caller geometry."""
    _, variables, bundle = point_family_env
    with serve.BatchingServer(bundle, variables,
                              pad_to_points=True) as srv:
        with pytest.raises(ValueError, match="no artifact family"):
            srv.submit(*_ragged_sample(0, 2 * N_PTS + 1))


# -- pipeline_depth (double-buffered dispatch) ---------------------------


def test_pipeline_depth_matches_direct_apply(bundle_env):
    """pipeline_depth=2: outputs are identical to synchronous dispatch
    (the overlap hides the device->host fetch, it must not reorder or
    mix up deliveries) and the delivered counter reconciles."""
    model, variables, bundle = bundle_env
    with serve.BatchingServer(bundle, variables, max_delay_s=0.0,
                              pipeline_depth=2) as srv:
        samples = [_sample(i) for i in range(9)]
        futs = [srv.submit(x, fx) for x, fx in samples]
        outs = [f.result(timeout=120) for f in futs]
    for (x, fx), out in zip(samples, outs):
        direct = model.apply(variables, x[None], fx[None], train=False)
        np.testing.assert_allclose(out, np.asarray(direct)[0],
                                   rtol=2e-5, atol=2e-5)
    snap = srv.stats.snapshot()
    assert snap["delivered"] == snap["requests"] == 9, snap
    assert not srv._delivery_thread.is_alive()


def test_pipeline_depth_close_drains(bundle_env):
    """close(drain=True) must wait for batches already handed to the
    delivery thread — no future may be left forever-pending."""
    _, variables, bundle = bundle_env
    srv = serve.BatchingServer(bundle, variables, max_delay_s=0.0,
                               pipeline_depth=3)
    futs = [srv.submit(*_sample(i)) for i in range(6)]
    srv.close(drain=True)
    for f in futs:
        assert f.result(timeout=60).shape == (N_PTS, 2)
    assert not srv._delivery_thread.is_alive()


def test_pipeline_depth_fetch_error_fails_only_its_batch():
    """A device-side failure that surfaces at the FETCH (delivery thread)
    fails that batch's futures and leaves the server serving."""

    class Boom:
        def __array__(self):
            raise RuntimeError("device exploded at fetch")

    class StubBundle:
        def __init__(self):
            self.calls = 0

        def shapes(self):
            return [((1, 4),)]

        def predict(self, variables, *args):
            self.calls += 1
            if self.calls == 1:
                return Boom()
            return np.full((1, 3), self.calls, np.float32)

    srv = serve.BatchingServer(StubBundle(), variables=None,
                               max_delay_s=0.0, pipeline_depth=2)
    try:
        bad = srv.submit(np.zeros((4,), np.float32))
        with pytest.raises(RuntimeError, match="device exploded"):
            bad.result(timeout=30)
        ok = srv.predict(np.zeros((4,), np.float32), timeout=30)
        assert ok.shape == (3,)
    finally:
        srv.close()
    snap = srv.stats.snapshot()
    # both requests got a response (one an exception): delivered counts
    # results OR errors that reached the caller
    assert snap["delivered"] == 2, snap


def test_pipeline_depth_bounds_inflight_batches():
    """At most pipeline_depth batches may be dispatched-but-undelivered
    (regression: the queue-only bound allowed pipeline_depth+1 — the
    dispatcher dispatched batch k+2 before blocking on the full queue)."""
    import threading as th

    gate = th.Event()

    class Blocker:
        def __array__(self):
            gate.wait(timeout=60)  # delivery stalls until released
            return np.zeros((1, 3), np.float32)

    class StubBundle:
        def __init__(self):
            self.calls = 0

        def shapes(self):
            return [((1, 4),)]

        def predict(self, variables, *args):
            self.calls += 1
            return Blocker()

    stub = StubBundle()
    srv = serve.BatchingServer(stub, None, max_delay_s=0.0,
                               pipeline_depth=2)
    try:
        futs = [srv.submit(np.zeros((4,), np.float32)) for _ in range(4)]
        time.sleep(0.3)  # give the dispatcher every chance to overrun
        assert stub.calls == 2, stub.calls  # depth bound, not depth+1
        gate.set()
        for f in futs:
            assert f.result(timeout=60).shape == (3,)
        assert stub.calls == 4
    finally:
        gate.set()
        srv.close()


def test_mid_queue_cancels_do_not_inflate_readiness(bundle_env, tmp_path):
    """Cancelled mid-queue requests must not count toward readiness: 4
    arrivals with 3 instant cancels used to mark a no-b1 family's queue
    'full', strand-failing the live survivor before its delay window
    elapsed."""
    model, variables, _ = bundle_env
    x = jax.random.normal(jax.random.PRNGKey(1), (1, N_PTS, 3))
    fx = jax.random.normal(jax.random.PRNGKey(2), (1, N_PTS, 1))
    root = str(tmp_path / "no_b1")
    serve.export_batch_family(root, model, variables, (x, fx),
                              batch_sizes=(2, 4))
    bundle = hexport.ServingBundle.load(root)
    srv = serve.BatchingServer(bundle, variables, max_delay_s=60.0)
    try:
        futs = [srv.submit(*_sample(i)) for i in range(4)]
        for f in futs[1:]:
            assert f.cancel()
        time.sleep(0.2)  # pre-fix: survivor strand-failed by now
        assert not futs[0].done(), futs[0]
        srv.submit(*_sample(9))  # a co-batch partner arrives in-window
    finally:
        srv.close(drain=True)  # drain dispatches the b2 batch
    assert futs[0].result(timeout=30).shape == (N_PTS, 2)


def test_delivery_failure_keeps_server_alive():
    """An output the per-sample splitter cannot index (e.g. a scalar
    leaf) fails THAT batch's futures — it must not kill the dispatcher
    thread and strand later requests with forever-pending futures."""

    class StubBundle:
        def __init__(self):
            self.calls = 0

        def shapes(self):
            return [((1, 4),)]

        def predict(self, variables, *args):
            self.calls += 1
            if self.calls == 1:
                return np.float32(3.0)  # 0-d: [i] raises IndexError
            return np.zeros((1, 3), np.float32)

    srv = serve.BatchingServer(StubBundle(), None, max_delay_s=0.0)
    try:
        bad = srv.submit(np.zeros((4,), np.float32))
        with pytest.raises(IndexError):
            bad.result(timeout=30)
        ok = srv.predict(np.zeros((4,), np.float32), timeout=30)
        assert ok.shape == (3,)
        assert srv._thread.is_alive()
    finally:
        srv.close()


def test_reload_validates_structure_eagerly(bundle_env):
    """reload(warmup=False) with a structurally wrong checkpoint (the
    classic: missing batch_stats) must raise THERE and keep serving the
    old weights — binding is lazy, so without the eager check the broken
    tree swaps in cleanly and poisons every later request."""
    model, variables, bundle = bundle_env
    with serve.BatchingServer(bundle, variables, max_delay_s=0.0) as srv:
        s = _sample(0)
        before = srv.predict(*s, timeout=60)
        with pytest.raises(ValueError, match="variables pytree"):
            srv.reload({"params": variables["params"]}, warmup=False)
        after = srv.predict(*s, timeout=60)  # still the old weights
        np.testing.assert_array_equal(before, after)


def test_bound_bundle_is_accepted_and_reload_refused(bundle_env):
    """A caller-bound BoundBundle duck-types shapes()/predict but takes
    no variables — the server must use it weight-free (previously the
    weights dict was fed in as the first input array, failing every
    request) and must refuse reload() with a clear error."""
    model, variables, bundle = bundle_env
    bound = bundle.bind(variables)
    with serve.BatchingServer(bound, None, max_delay_s=0.0) as srv:
        s = _sample(4)
        out = srv.predict(*s, timeout=60)
        direct = model.apply(variables, s[0][None], s[1][None],
                             train=False)
        np.testing.assert_allclose(out, np.asarray(direct)[0],
                                   rtol=2e-5, atol=2e-5)
        with pytest.raises(ValueError, match="BoundBundle"):
            srv.reload(variables)
        # the guards survive binding (BoundBundle forwards _by_key):
        # wrong-dtype submits are still rejected BEFORE co-batching
        x, fx = _sample(5)
        with pytest.raises(ValueError, match="dtype mismatch"):
            srv.submit(x.astype(np.float64), fx)


def test_bound_point_family_keeps_pad_to_points(point_family_env):
    """pad_to_points must work on a caller-bound bundle too — the bucket
    markers ride the forwarded artifact map."""
    model, variables, bundle = point_family_env
    with serve.BatchingServer(bundle.bind(variables), None,
                              max_delay_s=0.0,
                              pad_to_points=True) as srv:
        n = N_PTS - 8
        out = srv.predict(*_ragged_sample(0, n), timeout=120)
        assert out.shape == (n, 2)


def test_pad_to_points_scalar_arg_rejected_cleanly(point_family_env):
    """A malformed request with a scalar arg must get the ValueError, not
    an IndexError out of the repeat-last-row padding."""
    _, variables, bundle = point_family_env
    with serve.BatchingServer(bundle, variables,
                              pad_to_points=True) as srv:
        with pytest.raises(ValueError, match="no artifact family"):
            srv.submit(np.zeros((N_PTS - 8, 3), np.float32),
                       np.float32(1.0))


def test_export_batch_family_validates_mesh_sizes(bundle_env, tmp_path):
    """mesh= with sizes that don't divide the dp degree must fail BEFORE
    writing anything (a mid-loop failure left half-written families that
    ServingBundle served silently missing sizes) — and the default
    batch_sizes include b1, which never divides dp>1."""
    import os

    from jax.sharding import Mesh

    model, variables, _ = bundle_env
    x = np.zeros((2, N_PTS, 3), np.float32)
    fx = np.zeros((2, N_PTS, 1), np.float32)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("dp",))
    root = str(tmp_path / "dp_family")
    with pytest.raises(ValueError, match="do not divide"):
        serve.export_batch_family(root, model, variables, (x, fx),
                                  batch_sizes=(2, 3, 4), mesh=mesh)
    assert not os.path.exists(root)  # nothing half-written


def test_export_point_family_scalar_arg_raises(bundle_env):
    model, variables, _ = bundle_env
    x = np.zeros((1, N_PTS, 3), np.float32)
    t = np.zeros((1,), np.float32)  # per-sample scalar: no point axis
    with pytest.raises(ValueError, match="point families need"):
        serve.export_point_family("/nonexistent", model, variables,
                                  (x, t), point_buckets=(N_PTS,))


def test_export_point_family_extra_manifest(bundle_env, tmp_path):
    """Caller manifest extras (e.g. car_eval's checkpoint provenance)
    must land in every bucket's manifests alongside the point_bucket
    marker; the marker key itself is reserved."""
    import glob
    import json
    import os

    model, variables, _ = bundle_env
    x = np.zeros((1, N_PTS, 3), np.float32)
    fx = np.zeros((1, N_PTS, 1), np.float32)
    with pytest.raises(ValueError, match="reserved"):
        serve.export_point_family(
            str(tmp_path / "nope"), model, variables, (x, fx),
            point_buckets=(N_PTS,), batch_sizes=(1,),
            extra_manifest={"point_bucket": 7})
    root = str(tmp_path / "fam")
    serve.export_point_family(root, model, variables, (x, fx),
                              point_buckets=(N_PTS,), batch_sizes=(1,),
                              extra_manifest={"checkpoint": "best",
                                              "fold_id": 3})
    manifests = glob.glob(os.path.join(root, "*", "manifest.json"))
    assert manifests
    for m in manifests:
        rec = json.load(open(m))
        assert rec["checkpoint"] == "best" and rec["fold_id"] == 3
        assert rec["point_bucket"] == N_PTS


def test_stress_concurrent_cancel_reload_pipeline(bundle_env):
    """Serving soak: concurrent client threads, random cancels, and a
    mid-traffic reload against a pipeline_depth=3 server. Every
    non-cancelled future must resolve to the CORRECT per-sample output
    (reload swaps in the same weights, so outputs stay comparable while
    the swap machinery runs under load), and the stats must reconcile."""
    model, variables, bundle = bundle_env
    srv = serve.BatchingServer(bundle, variables, max_delay_s=0.001,
                               pipeline_depth=3, max_queue=4096)
    n_req = 48
    lock = threading.Lock()
    futs = {}
    cancelled = set()
    errs = []

    def client(base):
        try:
            for i in range(base, base + n_req // 6):
                f = srv.submit(*_sample(i))
                with lock:
                    futs[i] = f
                if i % 7 == 3 and f.cancel():
                    with lock:
                        cancelled.add(i)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=client, args=(k * (n_req // 6),))
               for k in range(6)]
    for t in threads:
        t.start()
    srv.reload(variables)  # same weights: exercises the swap under load
    for t in threads:
        t.join()
    assert not errs, errs
    done = 0
    for i, f in futs.items():
        if i in cancelled:
            continue
        out = f.result(timeout=120)
        done += 1
        x, fx = _sample(i)
        direct = model.apply(variables, x[None], fx[None], train=False)
        # tolerance above b1-vs-bN reduction-order noise (measured
        # 2.4e-5 max-abs when a request rides a b4 program) but far
        # below a wrong-sample mix-up (O(0.1))
        np.testing.assert_allclose(out, np.asarray(direct)[0],
                                   rtol=5e-4, atol=5e-5)
    assert done == n_req - len(cancelled)
    srv.close()
    snap = srv.stats.snapshot()
    assert snap["requests"] == n_req
    # every non-cancelled request was delivered (cancels may or may not
    # have been purged before dispatch — delivered is bounded by both)
    assert snap["delivered"] >= n_req - len(cancelled), snap
    assert snap["delivered"] <= n_req, snap
    assert not srv._delivery_thread.is_alive()


def test_pipeline_depth_validates():
    with pytest.raises(ValueError, match="pipeline_depth"):
        serve.BatchingServer(object(), None, pipeline_depth=0)


def test_inconsistent_family_dtypes_raise_at_construction():
    """A bundle whose batch sizes of ONE sample signature were exported
    with different dtypes must fail at server construction — at dispatch
    it would co-batch fine-looking requests and fail all of them."""

    class StubModel:
        def __init__(self, dts):
            self.manifest = {"input_dtypes": dts}

    class StubBundle:
        def __init__(self):
            self._by_key = {((1, 4),): StubModel(("float32",)),
                            ((2, 4),): StubModel(("bfloat16",))}

        def shapes(self):
            return list(self._by_key)

        def predict(self, variables, *args):  # pragma: no cover
            raise AssertionError("must not dispatch")

    with pytest.raises(ValueError, match="inconsistent artifact family"):
        serve.BatchingServer(StubBundle(), variables=None)


def test_mean_queue_wait_counts_only_dispatched():
    """Queued-but-never-dispatched requests must not deflate
    mean_queue_wait_s (ADVICE r4: the old denominator was `requests`)."""

    class StubBundle:
        def shapes(self):
            return [((1, 4),)]

        def predict(self, variables, *args):
            return np.zeros((1, 3), np.float32)

    srv = serve.BatchingServer(StubBundle(), None, max_delay_s=60.0)
    try:
        srv.predict(np.zeros((4,), np.float32), timeout=30)
        # park one request in the queue (never dispatched before close)
        time.sleep(0.01)
        parked = srv.submit(np.zeros((4,), np.float32))
        parked.cancel()
        snap = srv.stats.snapshot()
        assert snap["requests"] == 2
        assert snap["delivered"] == 1
        # denominator is dispatched requests (1), not submitted (2)
        assert srv.stats.dispatched_requests == 1
        assert snap["mean_queue_wait_s"] == pytest.approx(
            srv.stats.queue_wait_s_total / 1)
    finally:
        srv.close()


def test_export_batch_family_reserved_extras(bundle_env, tmp_path):
    """batch_size is measured per artifact and point_bucket is the
    pad_to_points validity marker — caller extras must not be able to
    clobber the one or inject the other (a structured-grid family
    stamped as a point bucket would become a silent pad target)."""
    model, variables, _ = bundle_env
    x = np.zeros((1, N_PTS, 3), np.float32)
    fx = np.zeros((1, N_PTS, 1), np.float32)
    for bad in ({"batch_size": 4}, {"point_bucket": N_PTS}):
        with pytest.raises(ValueError, match="reserved"):
            serve.export_batch_family(
                str(tmp_path / "nope"), model, variables, (x, fx),
                batch_sizes=(1,), extra_manifest=bad)


def test_bound_bundle_construction_validates_structure(bundle_env):
    """ServingBundle.bind is LAZY (per-signature bind on first
    dispatch), so a caller-bound BoundBundle over a structurally wrong
    checkpoint must be caught at BatchingServer construction — not on
    the first request of every signature."""
    _, variables, bundle = bundle_env
    bad = bundle.bind({"params": variables["params"]})  # no batch_stats
    with pytest.raises(ValueError, match="variables pytree"):
        serve.BatchingServer(bad, None)
