"""The examples/ scripts must keep running end-to-end (they are the
onboarding surface; a stale example is worse than none)."""

import contextlib
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(__file__)
EXAMPLES = os.path.abspath(os.path.join(HERE, "..", "examples"))

# Cross-PROCESS lock: the full suite runs as several parallel pytest
# chunks (the Bash 10-min cap forces splitting, CLAUDE.md), and each
# example is itself a subprocess that compiles a model on CPU. Four
# chunks' worth of compile jobs stacked on one machine used to push an
# example past its timeout (the r4 "contention-only flake"). Serializing
# the example subprocesses — across chunks, via flock on a shared temp
# file — removes the flake without weakening the assertion.
_LOCK_PATH = os.path.join(tempfile.gettempdir(), "haet_examples.lock")


@contextlib.contextmanager
def _exclusive():
    import fcntl

    with open(_LOCK_PATH, "w") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)


def _run(name):
    env = dict(os.environ, HAET_PLATFORM="cpu")
    # the examples set their own XLA_FLAGS; drop conftest's to avoid dupes
    env.pop("XLA_FLAGS", None)
    with _exclusive():
        r = subprocess.run(
            [sys.executable, os.path.join(EXAMPLES, name)],
            # generous: the flock serializes examples against each other,
            # but it cannot stop OTHER suites' compile jobs (or a bench on
            # the same box) from starving this subprocess of CPU — 540 s
            # was observed to trip under a 6-way oversubscribed machine
            capture_output=True, text=True, timeout=900, env=env,
        )
    assert r.returncode == 0, f"{name} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


def test_train_and_serve_example():
    out = _run("train_and_serve.py")
    assert "AOT artifact output == live model output" in out
    assert "restored best checkpoint" in out


def test_multichip_example():
    out = _run("multichip.py")
    assert "mesh:" in out
    assert "sharded training + jitted predict OK" in out


def test_serving_example():
    out = _run("serving.py")
    assert "HTTP predict == direct apply" in out
    assert "GET /metrics scrape OK" in out
    assert "serving tour OK" in out
