"""Tracing / profiling helpers.

The reference instruments with manual wall-clock timers and CUDA memory
probes (SURVEY.md §5). TPU-native equivalents:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard/Perfetto trace;
* :class:`StepTimer` — per-step wall-clock with the reference's metric names
  (``train/avg_batch_time`` etc., ``train.py:109-125``);
* :func:`device_memory_mb` — per-device HBM usage (the CUDA
  ``max_memory_allocated`` analogue, ``velocity-mem-checker.py:64-76``);
* :func:`host_rss_mb` — host RSS via /proc (psutil-free).

NOTE (this environment): under the tunneled-TPU runtime
``block_until_ready`` is a no-op — for honest step timing, end measured
regions with a device->host scalar fetch (see ``bench.py``).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/jax-trace'): ...`` -> TensorBoard trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-step timings; reports reference-style metrics."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        self.times.append(time.perf_counter() - self._t0)

    @contextlib.contextmanager
    def step(self):
        self.start()
        yield
        self.stop()

    def metrics(self, prefix: str = "train/"):
        if not self.times:
            return {}
        return {
            f"{prefix}avg_batch_time": sum(self.times) / len(self.times),
            f"{prefix}last_batch_time": self.times[-1],
            f"{prefix}num_batches": len(self.times),
        }


def device_memory_mb(device=None):
    """Peak/current HBM bytes-in-use for a device (None if unsupported)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return None
    peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use"))
    return peak / 2**20 if peak else None


def host_rss_mb() -> float:
    """Host resident set size in MB (reference uses psutil, train.py:49-51)."""
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0
