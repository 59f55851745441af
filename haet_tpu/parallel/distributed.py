"""Multi-host (pod-scale) SPMD: process groups + host-local data sharding.

The reference is single-process single-GPU (SURVEY.md §2.7). Single-host
multi-chip is covered by :mod:`haet_tpu.parallel.mesh`; this module adds the
multi-PROCESS layer for TPU pods / pod slices, where each host owns a subset
of the chips and JAX runs one process per host:

* :func:`init_distributed` — join the JAX process group. On TPU pods the
  coordinator/topology autodetects from the TPU runtime; elsewhere (CPU
  testing, GPU clusters) pass ``coordinator/num_processes/process_id`` or
  set ``HAET_COORDINATOR`` / ``HAET_NUM_PROCESSES`` / ``HAET_PROCESS_ID``.
* :func:`global_mesh` — the same ``(dp, tp)`` mesh as
  :func:`haet_tpu.parallel.mesh.make_mesh`, built over the GLOBAL device
  set (``jax.devices()`` spans all processes after init).
* :func:`shard_host_batch` — the multi-host data-pipeline ingredient: each
  process loads only ITS batch shard (a dp-slice of the global batch);
  this assembles the per-host arrays into one global sharded array without
  any cross-host copy (``jax.make_array_from_process_local_data``).

Everything downstream (Trainer, drivers, checkpointing) is unchanged: jit
over a global mesh is SPMD per se, orbax checkpointing of global arrays is
already process-aware, and XLA rides ICI within a host and DCN across
hosts according to the mesh layout.

Validated by ``tests/test_distributed.py`` with a real 2-process CPU
cluster (Gloo collectives): global mesh over 2x4 virtual devices,
per-process batch shards, one train step — loss and gradients bitwise
equal across processes and equal to the single-process run.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh

_INITIALIZED = False


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Join (or skip joining) the JAX process group. Idempotent.

    Resolution order: explicit args > ``HAET_COORDINATOR`` /
    ``HAET_NUM_PROCESSES`` / ``HAET_PROCESS_ID`` env vars > TPU-pod
    autodetection (bare ``jax.distributed.initialize()``) when running on
    TPU. Returns True if a multi-process group is active after the call.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1

    coordinator = coordinator or os.environ.get("HAET_COORDINATOR")
    if num_processes is None and "HAET_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["HAET_NUM_PROCESSES"])
    if process_id is None and "HAET_PROCESS_ID" in os.environ:
        process_id = int(os.environ["HAET_PROCESS_ID"])

    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
        _INITIALIZED = True
    elif jax.default_backend() == "tpu":
        # TPU pods: topology + coordinator autodetect from the runtime.
        jax.distributed.initialize()
        _INITIALIZED = True
    return jax.process_count() > 1


def global_mesh(n_dp: int | None = None, n_tp: int = 1) -> Mesh:
    """The (dp, tp) mesh over the GLOBAL device set (all processes)."""
    return make_mesh(n_dp, n_tp, devices=jax.devices())


def process_batch_slice(global_batch: int) -> slice:
    """Which rows of the global batch THIS process should load.

    The dp order follows ``jax.devices()``, which groups devices by
    process; an equal contiguous slice per process therefore lines up with
    ``shard_host_batch``'s expectations.
    """
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count {n}")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def shard_host_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Assemble per-process host-local batch shards into global arrays.

    Each process passes only ITS slice of the global batch (see
    :func:`process_batch_slice`); the result is one global jax.Array per
    leaf, batch axis sharded over ``axis``, with no cross-host transfer.
    In a single-process context this degrades to a plain ``device_put``
    with the batch sharding.
    """
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, tree)
