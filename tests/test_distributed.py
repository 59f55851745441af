"""Multi-host SPMD (haet_tpu.parallel.distributed): a REAL 2-process CPU
cluster (Gloo collectives), not a simulation — each worker process owns 4
virtual devices, joins the group, loads only its dp-slice of the global
batch, and runs one Trainer train step on the global (dp,) mesh.

Done = loss / grad-norm / post-step parameter fingerprints agree across the
two processes AND match the single-process (8-device) run of the identical
global batch: the cross-host psum produced exactly the single-controller
gradient.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "distributed_worker.py")

_RESULT = re.compile(
    r"RESULT (\d+) loss=([-\d.]+) gnorm=([-\d.]+) psum=([-\d.]+) "
    r"nglobal=(\d+) nlocal=(\d+)")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cluster(nproc: int, port: int, mode: str = "dp"):
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": os.path.dirname(HERE)}
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port), mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(HERE),
        )
        for pid in range(nproc)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    results = {}
    for out in outs:
        m = _RESULT.search(out)
        assert m, out[-3000:]
        results[int(m.group(1))] = dict(
            loss=float(m.group(2)), gnorm=float(m.group(3)),
            psum=float(m.group(4)), nglobal=int(m.group(5)),
            nlocal=int(m.group(6)))
    return results


def test_two_process_cluster_matches_single_process():
    port = _free_port()
    two = _run_cluster(2, port)
    assert set(two) == {0, 1}
    for r in two.values():
        assert r["nglobal"] == 8 and r["nlocal"] == 4

    # both processes observe the identical global step
    assert two[0]["loss"] == pytest.approx(two[1]["loss"], rel=1e-7)
    assert two[0]["gnorm"] == pytest.approx(two[1]["gnorm"], rel=1e-7)
    assert two[0]["psum"] == pytest.approx(two[1]["psum"], rel=1e-7)

    # and it equals the single-process truth on the same 8 global devices
    one = _run_cluster(1, _free_port())
    assert one[0]["nglobal"] == 4  # single process keeps its 4 devices
    # device count differs (4 vs 8) but the global batch and math are the
    # same; dp-mean losses and grads must agree to f32 reduction noise
    assert two[0]["loss"] == pytest.approx(one[0]["loss"], rel=2e-5)
    assert two[0]["gnorm"] == pytest.approx(one[0]["gnorm"], rel=2e-4)
    assert two[0]["psum"] == pytest.approx(one[0]["psum"], rel=2e-5)


def test_two_process_pipeline_parallel_matches_single_process():
    """Pipeline parallelism across a REAL process boundary: the pp mesh
    axis is process-major, so the mid-pipeline lax.ppermute hop crosses
    the 2-process Gloo cluster (the pod-scale pp layout: stages ride DCN).
    dp is held at 2 in both cluster sizes (identical per-dp-shard
    BatchNorm statistics); the stage count (pp=4 across 2 processes vs
    pp=2 single-process) is numerics-invariant, so the whole train step
    must agree to f32 reduction noise."""
    two = _run_cluster(2, _free_port(), mode="pp")
    assert set(two) == {0, 1}
    for r in two.values():
        assert r["nglobal"] == 8 and r["nlocal"] == 4

    # both processes observe the identical global step
    assert two[0]["loss"] == pytest.approx(two[1]["loss"], rel=1e-7)
    assert two[0]["gnorm"] == pytest.approx(two[1]["gnorm"], rel=1e-7)
    assert two[0]["psum"] == pytest.approx(two[1]["psum"], rel=1e-7)

    one = _run_cluster(1, _free_port(), mode="pp")
    assert one[0]["nglobal"] == 4
    assert two[0]["loss"] == pytest.approx(one[0]["loss"], rel=2e-5)
    assert two[0]["gnorm"] == pytest.approx(one[0]["gnorm"], rel=2e-4)
    assert two[0]["psum"] == pytest.approx(one[0]["psum"], rel=2e-5)


def test_two_process_tensor_parallel_matches_single_process():
    """Head-TP across a REAL process boundary (VERDICT r3 #6): the tp mesh
    axis is process-major, so the per-head shards of the [B, H, N, *]
    intermediates — and the head-merge all-gather — cross the 2-process
    Gloo cluster. dp held at 2 in both cluster sizes; the tp width (4
    across 2 processes vs 2 single-process) only changes reduction order,
    so the whole train step must agree to f32 noise."""
    two = _run_cluster(2, _free_port(), mode="tp")
    assert set(two) == {0, 1}
    for r in two.values():
        assert r["nglobal"] == 8 and r["nlocal"] == 4

    assert two[0]["loss"] == pytest.approx(two[1]["loss"], rel=1e-7)
    assert two[0]["gnorm"] == pytest.approx(two[1]["gnorm"], rel=1e-7)
    assert two[0]["psum"] == pytest.approx(two[1]["psum"], rel=1e-7)

    one = _run_cluster(1, _free_port(), mode="tp")
    assert one[0]["nglobal"] == 4
    assert two[0]["loss"] == pytest.approx(one[0]["loss"], rel=2e-5)
    assert two[0]["gnorm"] == pytest.approx(one[0]["gnorm"], rel=2e-4)
    assert two[0]["psum"] == pytest.approx(one[0]["psum"], rel=2e-5)
