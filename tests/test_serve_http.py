"""HTTP front-end for the batching server (haet_tpu/serve_http.py).

Runs a real ThreadingHTTPServer on an ephemeral port and drives it with
urllib: npz round trip == direct apply, concurrent posts co-batch, error
paths map to 400, health/shape/stats endpoints, and the checkpoint loader
(incl. the pipeline stacked-layout auto-convert).
"""

import io
import json
import sys
import threading
import time
import urllib.error
import urllib.request
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from haet_tpu import serve, serve_http
from haet_tpu.export import ServingBundle
from haet_tpu.models import HAETransolver_Irregular_Mesh

N_PTS = 64


@pytest.fixture(scope="module")
def http_env(tmp_path_factory):
    model = HAETransolver_Irregular_Mesh(
        space_dim=3, fun_dim=1, out_dim=2, n_layers=1, n_hidden=32,
        n_head=4, slice_num=8, rotate=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, N_PTS, 3))
    fx = jax.random.normal(jax.random.PRNGKey(2), (1, N_PTS, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    root = str(tmp_path_factory.mktemp("bundle"))
    serve.export_batch_family(root, model, variables, (x, fx),
                              batch_sizes=(1, 4))
    bundle = ServingBundle.load(root)
    srv = serve.BatchingServer(bundle, variables, max_delay_s=0.05)
    httpd = serve_http.make_server(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield model, variables, f"http://127.0.0.1:{port}", srv
    httpd.shutdown()
    httpd.server_close()
    srv.close()


def _post_predict(base, arrays, timeout=120):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(
        base + "/predict", data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        assert r.status == 200
        with np.load(io.BytesIO(r.read())) as z:
            return z["output"]


def _sample(seed):
    r = np.random.RandomState(seed)
    return (r.randn(N_PTS, 3).astype(np.float32),
            r.randn(N_PTS, 1).astype(np.float32))


def test_health_shapes_stats(http_env):
    _, _, base, _ = http_env
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        assert r.read() == b"ok"
    with urllib.request.urlopen(base + "/shapes", timeout=30) as r:
        sigs = json.load(r)["signatures"]
    assert sigs == [[[N_PTS, 3], [N_PTS, 1]]]
    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
        snap = json.load(r)
    assert {"requests", "dispatches", "batch_histogram"} <= set(snap)


def test_predict_round_trip(http_env):
    model, variables, base, _ = http_env
    x, fx = _sample(0)
    out = _post_predict(base, {"arg0": x, "arg1": fx})
    direct = model.apply(variables, x[None], fx[None], train=False)
    np.testing.assert_allclose(out, np.asarray(direct)[0],
                               rtol=2e-5, atol=2e-5)


def test_concurrent_posts_cobatch(http_env):
    model, variables, base, srv = http_env
    before = dict(srv.stats.batch_histogram)
    results = {}

    def client(i):
        x, fx = _sample(i)
        results[i] = _post_predict(base, {"arg0": x, "arg1": fx})

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(4):
        x, fx = _sample(i)
        direct = model.apply(variables, x[None], fx[None], train=False)
        np.testing.assert_allclose(results[i], np.asarray(direct)[0],
                                   rtol=2e-5, atol=2e-5)
    # at least one multi-sample dispatch happened across the 4 posts
    after = srv.stats.batch_histogram
    multi = sum(c for b, c in after.items() if b > 1) - \
        sum(c for b, c in before.items() if b > 1)
    assert multi >= 1, dict(after)


def test_bad_signature_is_400(http_env):
    _, _, base, _ = http_env
    x, fx = _sample(0)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_predict(base, {"arg0": x[: N_PTS // 2], "arg1": fx})
    assert ei.value.code == 400
    assert "no artifact family" in json.load(ei.value)["error"]


def test_bad_keys_is_400(http_env):
    _, _, base, _ = http_env
    x, fx = _sample(0)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_predict(base, {"foo": x, "bar": fx})
    assert ei.value.code == 400
    assert "arg0..argN" in json.load(ei.value)["error"]


def test_unknown_path_is_404(http_env):
    _, _, base, _ = http_env
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(base + "/nope", timeout=30)
    assert ei.value.code == 404


def test_load_variables_plain_and_pipeline(tmp_path):
    """_load_variables restores a Trainer checkpoint; the stacked
    pipeline layout converts automatically with n_layers inferred from
    the leading axis."""
    from haet_tpu.train.checkpoint import Checkpointer

    # plain layout
    ck = Checkpointer(str(tmp_path / "plain"))
    state = {"params": {"blocks_0": {"w": np.ones((2, 2), np.float32)}},
             "batch_stats": {}}
    ck.save_last(state, epoch=0)
    ck.wait()
    v = serve_http._load_variables(str(tmp_path / "plain"), "last")
    np.testing.assert_array_equal(v["params"]["blocks_0"]["w"],
                                  np.ones((2, 2), np.float32))

    # pipeline stacked layout: {pre, layers (stacked), head}
    ck2 = Checkpointer(str(tmp_path / "pp"))
    stacked = {
        "params": {
            "pre": {"preprocess": {"w": np.zeros((2,), np.float32)}},
            "layers": {"attn": {"w": np.arange(6, dtype=np.float32)
                                .reshape(3, 2)}},
            "head": {"out": {"w": np.ones((2,), np.float32)}},
        },
        "batch_stats": {},
    }
    ck2.save_last(stacked, epoch=0)
    ck2.wait()
    v2 = serve_http._load_variables(str(tmp_path / "pp"), "last")
    assert set(v2["params"]) == {"preprocess", "blocks_0", "blocks_1",
                                 "blocks_2"}
    np.testing.assert_array_equal(v2["params"]["blocks_1"]["attn"]["w"],
                                  np.array([2.0, 3.0], np.float32))
    # the head params merge into the LAST block
    assert "out" in v2["params"]["blocks_2"]

    with pytest.raises(FileNotFoundError):
        serve_http._load_variables(str(tmp_path / "missing"), "last")


def test_reload_not_configured_is_501(http_env):
    _, _, base, _ = http_env
    req = urllib.request.Request(base + "/reload", data=b"", method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 501
    assert "not configured" in json.load(ei.value)["error"]


def test_reload_endpoint_swaps_weights_mid_traffic(tmp_path):
    """POST /reload mid-traffic: no in-flight request fails, later
    predictions flip to the new weights (VERDICT r4 #7 — the
    zero-downtime swap was programmatic-only)."""
    model = HAETransolver_Irregular_Mesh(
        space_dim=3, fun_dim=1, out_dim=2, n_layers=1, n_hidden=32,
        n_head=4, slice_num=8, rotate=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, N_PTS, 3))
    fx = jax.random.normal(jax.random.PRNGKey(2), (1, N_PTS, 1))
    v1 = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    v2 = jax.jit(model.init)(jax.random.PRNGKey(99), x, fx)
    root = str(tmp_path / "bundle")
    serve.export_batch_family(root, model, v1, (x, fx), batch_sizes=(1,))
    bundle = ServingBundle.load(root)

    checkpoints = {"best": v1, "v2": v2}

    srv = serve.BatchingServer(bundle, v1, max_delay_s=0.0)
    reloaded = []

    def reload_fn(which):
        if which not in checkpoints:
            raise FileNotFoundError(f"no '{which}' checkpoint")
        srv.reload(checkpoints[which])
        reloaded.append(which)

    httpd = serve_http.make_server(srv, "127.0.0.1", 0,
                                   reload_fn=reload_fn)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        xs, fs = _sample(7)
        # background traffic running THROUGH the reload
        stop = threading.Event()
        errs = []

        def hammer():
            while not stop.is_set():
                try:
                    _post_predict(base, {"arg0": xs, "arg1": fs})
                except Exception as e:  # pragma: no cover
                    errs.append(e)
                    return

        ht = threading.Thread(target=hammer)
        ht.start()
        try:
            req = urllib.request.Request(
                base + "/reload", data=json.dumps({"which": "v2"}).encode(),
                headers={"Content-Type": "application/json"},
                method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                assert json.load(r) == {"reloaded": "v2"}
        finally:
            stop.set()
            ht.join(timeout=120)
        assert not errs, errs  # zero downtime: no request failed
        assert reloaded == ["v2"]
        out = _post_predict(base, {"arg0": xs, "arg1": fs})
        ref2 = model.apply(v2, xs[None], fs[None], train=False)
        np.testing.assert_allclose(out, np.asarray(ref2)[0],
                                   rtol=2e-5, atol=2e-5)

        # missing checkpoint -> 404; malformed body -> 400
        bad = urllib.request.Request(
            base + "/reload", data=json.dumps({"which": "nope"}).encode(),
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 404
        garbled = urllib.request.Request(base + "/reload",
                                         data=b"{not json", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(garbled, timeout=30)
        assert ei.value.code == 400
        # empty body defaults to "best"
        empty = urllib.request.Request(base + "/reload", data=b"",
                                       method="POST")
        with urllib.request.urlopen(empty, timeout=120) as r:
            assert json.load(r) == {"reloaded": "best"}
    finally:
        httpd.shutdown()
        httpd.server_close()
        srv.close()


def test_ragged_fold_through_http(tmp_path):
    """VERDICT r4 #1 'Done' criterion: a ragged synthetic car-like fold
    (3 distinct point counts, none matching a bucket exactly except one)
    served end-to-end through serve_http with pad_to_points — every
    per-sample output matches the unpadded native-N forward within the
    documented deviation bound (BatchingServer docstring; measured
    envelope in test_serve.py::test_pad_to_points_deviation_bound).
    Reference behavior matched: main_evaluation.py consumes each sample
    at its native N."""
    model = HAETransolver_Irregular_Mesh(
        space_dim=3, fun_dim=1, out_dim=2, n_layers=1, n_hidden=32,
        n_head=4, slice_num=8, rotate=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, N_PTS, 3))
    fx = jax.random.normal(jax.random.PRNGKey(2), (1, N_PTS, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    root = str(tmp_path / "buckets")
    serve.export_point_family(root, model, variables, (x, fx),
                              point_buckets=(N_PTS, 2 * N_PTS),
                              batch_sizes=(1, 2))
    bundle = ServingBundle.load(root)
    srv = serve.BatchingServer(bundle, variables, max_delay_s=0.01,
                               pad_to_points=True, pipeline_depth=2)
    httpd = serve_http.make_server(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    app = jax.jit(lambda v, x, fx: model.apply(v, x, fx, train=False))
    try:
        ns = [N_PTS - 10, N_PTS, 2 * N_PTS - 24]  # ragged; one exact
        r = np.random.RandomState(0)
        for n in ns:
            xs = r.randn(n, 3).astype(np.float32)
            fs = r.randn(n, 1).astype(np.float32)
            out = _post_predict(base, {"arg0": xs, "arg1": fs})
            assert out.shape == (n, 2)  # native N, padding truncated
            native = np.asarray(app(variables, xs[None], fs[None]))[0]
            dev = (np.linalg.norm(out - native)
                   / np.linalg.norm(native))
            # documented bound: <10% rel-L2 even at the worst pad
            # fraction here (~16%); the exact-N sample is bit-exact
            assert dev < 0.10, (n, dev)
            if n == N_PTS:
                np.testing.assert_allclose(out, native, rtol=2e-5,
                                           atol=2e-5)
        snap = srv.stats.snapshot()
        assert snap["padded_points"] == 10 + 24, snap
        assert snap["delivered"] == 3, snap
    finally:
        httpd.shutdown()
        httpd.server_close()
        srv.close()


def test_npz_keys_order_numerically():
    """11+ inputs: 'arg10' sorts lexicographically before 'arg2' — the
    handler must order args NUMERICALLY (ADVICE r4: sorted(z.files) was a
    latent protocol bug)."""

    class StubServer:
        class stats:
            @staticmethod
            def snapshot():
                return {}

        @staticmethod
        def submit(*args):
            from concurrent.futures import Future

            assert len(args) == 11
            # args must arrive in arg0..arg10 order: argI is filled with I
            for i, a in enumerate(args):
                np.testing.assert_array_equal(
                    a, np.full((2,), i, np.float32))
            f = Future()
            f.set_result(np.asarray([1.0], np.float32))
            return f

    httpd = serve_http.make_server(StubServer(), "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        arrays = {f"arg{i}": np.full((2,), i, np.float32)
                  for i in range(11)}
        out = _post_predict(f"http://127.0.0.1:{port}", arrays)
        np.testing.assert_array_equal(out, np.asarray([1.0], np.float32))
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_cli_tp_bundle(tmp_path):
    """`python -m haet_tpu.serve_http --tp 4`: a head-TP b1 bundle
    (data_axis=None, model shard_axes) served from the CLI — each
    request spans the 4-device mesh; numerics == the plain forward."""
    import os
    import socket
    import subprocess
    import time as _time

    from jax.sharding import Mesh

    from haet_tpu.train.checkpoint import Checkpointer

    model_tp = HAETransolver_Irregular_Mesh(
        space_dim=3, fun_dim=1, out_dim=2, n_layers=1, n_hidden=32,
        n_head=4, slice_num=8, rotate=0, shard_axes=(None, "tp"))
    model_plain = HAETransolver_Irregular_Mesh(
        space_dim=3, fun_dim=1, out_dim=2, n_layers=1, n_hidden=32,
        n_head=4, slice_num=8, rotate=0)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("tp",))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, N_PTS, 3))
    fx = jax.random.normal(jax.random.PRNGKey(2), (1, N_PTS, 1))
    with mesh:
        variables = jax.jit(model_tp.init)(jax.random.PRNGKey(0), x, fx)
    bundle_dir = str(tmp_path / "bundle")
    serve.export_batch_family(bundle_dir, model_tp, variables, (x, fx),
                              batch_sizes=(1,), mesh=mesh,
                              data_axis=None)
    ck = Checkpointer(str(tmp_path / "run"))
    ck.save_last(
        {"params": jax.tree_util.tree_map(np.asarray,
                                          variables["params"]),
         "batch_stats": jax.tree_util.tree_map(
             np.asarray, variables.get("batch_stats", {}))}, epoch=0)
    ck.wait()

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, HAET_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    proc = subprocess.Popen(
        [sys.executable, "-m", "haet_tpu.serve_http",
         "--bundle", bundle_dir, "--checkpoint", str(tmp_path / "run"),
         "--which", "last", "--port", str(port), "--warmup", "1",
         "--tp", "4"],
        cwd=str(Path(__file__).resolve().parents[1]),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = _time.time() + 240
        up = False
        while _time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"server exited early:\n{proc.stdout.read()}")
            try:
                with urllib.request.urlopen(base + "/healthz",
                                            timeout=5) as r:
                    up = r.read() == b"ok"
                    break
            except Exception:
                _time.sleep(0.5)
        assert up, "server never came up"
        xs, fs = _sample(3)
        out = _post_predict(base, {"arg0": xs, "arg1": fs})
        ref = model_plain.apply(variables, xs[None], fs[None],
                                train=False)
        np.testing.assert_allclose(out, np.asarray(ref)[0],
                                   rtol=1e-4, atol=1e-4)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_cli_end_to_end(tmp_path):
    """`python -m haet_tpu.serve_http` as a deployment would run it: a
    trained orbax checkpoint + exported bundle on disk, the server in a
    subprocess, a client over real HTTP."""
    import os
    import socket
    import subprocess
    import time as _time

    from haet_tpu.train.checkpoint import Checkpointer

    model = HAETransolver_Irregular_Mesh(
        space_dim=3, fun_dim=1, out_dim=2, n_layers=1, n_hidden=32,
        n_head=4, slice_num=8, rotate=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, N_PTS, 3))
    fx = jax.random.normal(jax.random.PRNGKey(2), (1, N_PTS, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    bundle_dir = str(tmp_path / "bundle")
    serve.export_batch_family(bundle_dir, model, variables, (x, fx),
                              batch_sizes=(1,))
    ck = Checkpointer(str(tmp_path / "run"))
    ck.save_last(
        {"params": jax.tree_util.tree_map(np.asarray,
                                          variables["params"]),
         "batch_stats": jax.tree_util.tree_map(
             np.asarray, variables.get("batch_stats", {}))}, epoch=0)
    ck.wait()

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, HAET_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "haet_tpu.serve_http",
         "--bundle", bundle_dir, "--checkpoint", str(tmp_path / "run"),
         "--which", "last", "--port", str(port), "--warmup", "1"],
        cwd=str(Path(__file__).resolve().parents[1]),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = _time.time() + 240
        up = False
        while _time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"server exited early:\n{proc.stdout.read()}")
            try:
                with urllib.request.urlopen(base + "/healthz",
                                            timeout=5) as r:
                    up = r.read() == b"ok"
                    break
            except Exception:
                _time.sleep(0.5)
        assert up, "server never came up"
        xs, fs = _sample(3)
        out = _post_predict(base, {"arg0": xs, "arg1": fs})
        ref = model.apply(variables, xs[None], fs[None], train=False)
        np.testing.assert_allclose(out, np.asarray(ref)[0],
                                   rtol=2e-5, atol=2e-5)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_cli_sigterm_graceful_drain(tmp_path):
    """SIGTERM (what docker stop / kubernetes send) drains instead of
    killing: a request queued at signal time still gets its 200, and the
    process exits 0 so orchestrators see a clean stop."""
    import os
    import signal as _signal
    import socket
    import subprocess
    import time as _time

    from haet_tpu.train.checkpoint import Checkpointer

    model = HAETransolver_Irregular_Mesh(
        space_dim=3, fun_dim=1, out_dim=2, n_layers=1, n_hidden=32,
        n_head=4, slice_num=8, rotate=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, N_PTS, 3))
    fx = jax.random.normal(jax.random.PRNGKey(2), (1, N_PTS, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    bundle_dir = str(tmp_path / "bundle")
    # largest exported batch = 4: a lone request is NOT instantly ready,
    # so it is still queued (aging toward max_delay) when SIGTERM lands
    serve.export_batch_family(bundle_dir, model, variables, (x, fx),
                              batch_sizes=(1, 4))
    ck = Checkpointer(str(tmp_path / "run"))
    ck.save_last(
        {"params": jax.tree_util.tree_map(np.asarray,
                                          variables["params"]),
         "batch_stats": jax.tree_util.tree_map(
             np.asarray, variables.get("batch_stats", {}))}, epoch=0)
    ck.wait()

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, HAET_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "haet_tpu.serve_http",
         "--bundle", bundle_dir, "--checkpoint", str(tmp_path / "run"),
         "--which", "last", "--port", str(port), "--warmup", "1",
         "--max_delay_ms", "800"],
        cwd=str(Path(__file__).resolve().parents[1]),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = _time.time() + 240
        up = False
        while _time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"server exited early:\n{proc.stdout.read()}")
            try:
                with urllib.request.urlopen(base + "/healthz",
                                            timeout=5) as r:
                    up = r.read() == b"ok"
                    break
            except Exception:
                _time.sleep(0.5)
        assert up, "server never came up"

        xs, fs = _sample(7)
        result = {}

        def post():
            try:
                result["out"] = _post_predict(base, {"arg0": xs,
                                                     "arg1": fs})
            except Exception as e:  # surfaced by the main thread
                result["err"] = e

        t = threading.Thread(target=post)
        t.start()
        _time.sleep(0.3)  # request is in the batcher's delay window
        proc.send_signal(_signal.SIGTERM)
        t.join(timeout=120)
        assert not t.is_alive(), "client never got a response"
        assert "err" not in result, f"drained request failed: {result}"
        ref = model.apply(variables, xs[None], fs[None], train=False)
        np.testing.assert_allclose(result["out"], np.asarray(ref)[0],
                                   rtol=2e-5, atol=2e-5)
        rc = proc.wait(timeout=60)
        assert rc == 0, f"expected clean exit after drain, got {rc}"
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait(timeout=30)


def test_drain_not_blocked_by_silent_client(http_env):
    """A connected-but-silent client (half-open LB probe, a POST whose
    body never arrives) must not pin its non-daemon handler thread
    forever: Handler.timeout bounds every socket read, so a fresh
    shutdown()+server_close() drain completes. Without it server_close()
    joins that thread indefinitely and SIGTERM drains hang."""
    import socket

    model, variables, base, srv = http_env
    httpd = serve_http.make_server(srv, "127.0.0.1", 0,
                                   request_timeout_s=1.0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    stuck = socket.create_connection(("127.0.0.1", port))
    try:
        # half a request: headers promise a body that never comes
        stuck.sendall(b"POST /predict HTTP/1.1\r\nHost: x\r\n"
                      b"Content-Length: 100000\r\n\r\n")
        time.sleep(0.2)  # let the handler block in rfile.read
        done = threading.Event()

        def drain():
            httpd.shutdown()
            httpd.server_close()
            done.set()

        threading.Thread(target=drain, daemon=True).start()
        assert done.wait(timeout=10), (
            "graceful drain hung on a silent client connection")
        # the stuck client got an explicit 408 and the connection was
        # closed after ONE timeout (not silently kept alive for a
        # second request-line timeout)
        stuck.settimeout(5)
        data = b""
        while True:
            chunk = stuck.recv(4096)
            if not chunk:
                break
            data += chunk
        assert b"408" in data.split(b"\r\n", 1)[0], data[:120]
    finally:
        stuck.close()


def test_metrics_prometheus_exposition(http_env):
    """GET /metrics mirrors /stats in the Prometheus text format — a
    scrape target with no JSON adapter. Counters appear with HELP/TYPE
    headers and the batch histogram carries size labels."""
    model, variables, base, srv = http_env
    x, fx = _sample(21)
    _post_predict(base, {"arg0": x, "arg1": fx})
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
    assert "# TYPE haet_requests_total counter" in body
    # at least one request has been delivered by this point
    total = [ln for ln in body.splitlines()
             if ln.startswith("haet_requests_total ")]
    assert total and float(total[0].split()[-1]) >= 1
    assert 'haet_batch_size_dispatches_total{size="' in body
    assert "haet_request_latency_seconds{quantile=\"0.5\"}" in body


def test_watch_checkpoint_auto_reloads(tmp_path):
    """watch_checkpoint: the server hot-reloads through its own /reload
    when the WATCHED checkpoint name advances in the run's sidecar —
    and ignores saves of other names (serving 'last' while a new 'best'
    lands must not trigger a pointless recompile-reload)."""
    from haet_tpu.train.checkpoint import Checkpointer

    model = HAETransolver_Irregular_Mesh(
        space_dim=3, fun_dim=1, out_dim=2, n_layers=1, n_hidden=32,
        n_head=4, slice_num=8, rotate=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, N_PTS, 3))
    fx = jax.random.normal(jax.random.PRNGKey(2), (1, N_PTS, 1))
    v1 = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    v2 = jax.jit(model.init)(jax.random.PRNGKey(99), x, fx)

    def tree(v):
        return jax.tree_util.tree_map(np.asarray, {
            "params": v["params"],
            "batch_stats": v.get("batch_stats", {})})

    ckdir = str(tmp_path / "run")
    ck = Checkpointer(ckdir)
    ck.save_last(tree(v1), epoch=0)
    ck.wait()

    root = str(tmp_path / "bundle")
    serve.export_batch_family(root, model, v1, (x, fx), batch_sizes=(1,))
    bundle = ServingBundle.load(root)
    srv = serve.BatchingServer(
        bundle, serve_http._load_variables(ckdir, "last"),
        max_delay_s=0.0)
    reloads = []

    def reload_fn(which):
        srv.reload(serve_http._load_variables(ckdir, which))
        reloads.append(which)

    httpd = serve_http.make_server(srv, "127.0.0.1", 0,
                                   reload_fn=reload_fn)
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    stop = threading.Event()
    wt = threading.Thread(target=serve_http.watch_checkpoint,
                          args=(base, ckdir, "last", 0.1, stop),
                          daemon=True)
    wt.start()
    xs, fs = _sample(7)
    ref1 = np.asarray(model.apply(v1, xs[None], fs[None],
                                  train=False))[0]
    ref2 = np.asarray(model.apply(v2, xs[None], fs[None],
                                  train=False))[0]
    try:
        # a save under ANOTHER name must not reload the watched one
        ck.save_best(tree(v2), val_loss=1.0, epoch=0)
        ck.wait()
        time.sleep(0.6)
        np.testing.assert_allclose(
            _post_predict(base, {"arg0": xs, "arg1": fs}), ref1,
            rtol=2e-5, atol=2e-5)
        assert reloads == []

        # advancing 'last' flips the served weights, hands-free
        ck.save_last(tree(v2), epoch=1)
        ck.wait()
        deadline = time.time() + 120
        while time.time() < deadline:
            out = _post_predict(base, {"arg0": xs, "arg1": fs})
            if np.allclose(out, ref2, rtol=2e-5, atol=2e-5):
                break
            time.sleep(0.2)
        else:
            raise AssertionError(f"auto-reload never landed: {reloads}")
        assert reloads == ["last"]
    finally:
        stop.set()
        wt.join(timeout=30)
        httpd.shutdown()
        httpd.server_close()
        srv.close()
