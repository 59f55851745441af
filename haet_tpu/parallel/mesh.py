"""Device-mesh / sharding helpers (SPMD over ICI).

The reference is single-process single-GPU (SURVEY.md §2.7); here scaling is
first-class: a ``jax.sharding.Mesh`` with axes

* ``dp`` — data parallel over the batch (the primary axis),
* ``tp`` — tensor parallel over attention heads (heads are embarrassingly
  parallel: the Erwin stage treats ``B*heads`` as independent clouds,
  reference ``StructuredMesh2D.py:238``).

XLA's SPMD partitioner inserts the collectives (gradient ``psum`` over dp,
head-axis all-gathers only at the merge) — no hand-written backend, and they
ride ICI when the mesh matches the physical topology.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int | None = None, n_tp: int = 1, devices=None) -> Mesh:
    """Create a ``(dp, tp)`` mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_dp is None:
        n_dp = n // n_tp
    if n_dp * n_tp != n:
        raise ValueError(f"dp({n_dp}) * tp({n_tp}) != device count ({n})")
    arr = np.asarray(devices).reshape(n_dp, n_tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def make_pp_mesh(n_dp: int = 1, n_pp: int = 1, devices=None,
                 n_tp: int = 1) -> Mesh:
    """Create a ``(dp, pp)`` — or, with ``n_tp > 1``, ``(dp, pp, tp)`` —
    mesh for pipeline parallelism
    (:class:`haet_tpu.parallel.pipeline.PipelinedModel`). tp is the
    fastest-varying axis (head-TP's all-gather at the head-merge projection
    is the chattiest collective, so its shards should be ICI neighbours);
    pp next, so a stage's ppermute hop crosses at most one tp-group."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_dp * n_pp * n_tp != n:
        raise ValueError(
            f"dp({n_dp}) * pp({n_pp}) * tp({n_tp}) != device count ({n})")
    if n_tp > 1:
        arr = np.asarray(devices).reshape(n_dp, n_pp, n_tp)
        return Mesh(arr, axis_names=("dp", "pp", "tp"))
    arr = np.asarray(devices).reshape(n_dp, n_pp)
    return Mesh(arr, axis_names=("dp", "pp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def head_sharding(mesh: Mesh) -> NamedSharding:
    """[B, heads, ...] sharded batch-over-dp, heads-over-tp."""
    return NamedSharding(mesh, P("dp", "tp"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Shard every array in ``tree`` with its batch axis over dp.

    Process-aware: under a multi-process (multi-host) mesh, a host-local
    numpy array is treated as THIS process's dp-slice of the global batch
    (``jax.make_array_from_process_local_data`` — the fit()-path analogue
    of :func:`haet_tpu.parallel.distributed.shard_host_batch`). Arrays the
    caller already distributed across devices pass through untouched.
    """
    s = batch_sharding(mesh)
    n_dp = int(mesh.shape.get("dp", 1))
    multiproc = jax.process_count() > 1

    def put(x):
        if isinstance(x, jax.Array) and len(x.sharding.device_set) > 1:
            return x  # already globally placed by the caller
        x = np.asarray(x)
        if multiproc:
            try:
                return jax.make_array_from_process_local_data(s, x)
            except ValueError as e:
                raise ValueError(
                    "multihost shard_batch needs the global batch "
                    "divisible by dp — the replicated fallback for "
                    "trailing partial batches is single-process only "
                    "(each process holds just its slice). Drop the "
                    "trailing batch (drop_last) or pad it at the data "
                    "layer.") from e
        if x.ndim and x.shape[0] % n_dp:
            # uneven trailing batch (batch_iter drop_last=False): an exact
            # P("dp") placement is impossible (device_put requires even
            # shards), so fall back to replicated placement — numerically
            # identical, just no dp speedup for this one batch. The
            # pipelined model additionally pads such batches internally.
            return jax.device_put(x, replicate(mesh))
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(put, tree)
