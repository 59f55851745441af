"""Capped-degree neighbor search, on device.

TPU-native replacement for ``torch_cluster.radius_graph`` (used by the
reference at ``erwin_flash.py:160-166`` when MPNN embedding is enabled, and by
the ShapeNet-Car ``GraphDataset`` with ``r=0.2, max_neighbors=32``,
``benchmarks/02-.../dataset/dataset.py:357-373``). Instead of a ragged edge
list, every point carries a fixed ``[K]`` neighbor slab plus a validity mask,
so downstream aggregation is static-shape.

Brute-force O(N^2) distances — fine for the sizes where MPNN is actually used
(slice-token clouds, <=8k-point meshes). For larger clouds, group points with
:func:`haet_tpu.ops.ball_groups.median_split_perm` first and search within
balls.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def knn_edges(pos, k: int, *, mask=None, include_self: bool = True):
    """K-nearest-neighbor indices per point.

    Args:
        pos: ``[B, N, D]``.
        k: neighbors per point (capped at N).
        mask: optional ``[B, N]`` validity; invalid points neither send nor
            receive edges.
        include_self: keep the self edge (``loop=True`` in the reference's
            radius_graph call, ``erwin_flash.py:164``).

    Returns:
        ``(idx, valid)``: ``[B, N, K]`` int32 indices and bool validity.
    """
    B, N, _ = pos.shape
    k = min(k, N)
    d2 = jnp.sum(
        (pos[:, :, None, :] - pos[:, None, :, :]) ** 2, axis=-1
    )  # [B, N, N]
    big = jnp.asarray(jnp.finfo(d2.dtype).max, d2.dtype)
    if not include_self:
        eye = jnp.eye(N, dtype=bool)[None]
        d2 = jnp.where(eye, big, d2)
    if mask is not None:
        d2 = jnp.where(mask[:, None, :], d2, big)  # invalid senders
    neg, idx = lax.top_k(-d2, k)
    valid = neg > -big
    if mask is not None:
        valid = valid & mask[:, :, None]  # invalid receivers get no edges
    return idx.astype(jnp.int32), valid


def radius_edges(pos, radius: float, k: int, *, mask=None,
                 include_self: bool = True):
    """Radius graph with a neighbor cap: kNN filtered to ``dist <= radius``."""
    idx, valid = knn_edges(pos, k, mask=mask, include_self=include_self)
    d2 = jnp.take_along_axis(
        jnp.sum((pos[:, :, None, :] - pos[:, None, :, :]) ** 2, axis=-1),
        idx, axis=-1,
    )
    return idx, valid & (d2 <= radius * radius)
