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

import jax
import jax.numpy as jnp
from jax import lax


#: above this cloud size, knn_edges switches to the ball-grouped search
BRUTE_FORCE_MAX_N = 4096


def knn_edges(pos, k: int, *, mask=None, include_self: bool = True,
              ball: int = 128):
    """K-nearest neighbors per point; exact brute force for small clouds,
    ball-grouped local search for large ones (see :func:`knn_edges_grouped`).
    """
    if pos.shape[1] > BRUTE_FORCE_MAX_N:
        return knn_edges_grouped(pos, k, mask=mask,
                                 include_self=include_self, ball=ball)
    return knn_edges_brute(pos, k, mask=mask, include_self=include_self)


def knn_edges_brute(pos, k: int, *, mask=None, include_self: bool = True):
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


def knn_edges_grouped(pos, k: int, *, mask=None, include_self: bool = True,
                      ball: int = 128):
    """Approximate kNN for large clouds via ball grouping.

    Points are ordered by the on-device median-split permutation so
    contiguous ``ball``-size blocks are spatially compact; each point's
    candidate set is its own ball plus both neighboring balls (3*ball
    candidates). This is the TPU-native replacement for
    ``torch_cluster.radius_graph`` at mesh scale: O(N * 3 * ball) instead of
    O(N^2), static shapes, no host round trip. Neighbors across distant
    ball boundaries may be missed — acceptable for MPNN aggregation
    (the reference caps neighbors at 32 anyway, ``dataset.py:357-373``).
    """
    import math as _math

    from .ball_groups import median_split_perm, pad_pow2, rotation_matrix

    B, N, D = pos.shape
    k = min(k, N)
    pos_p, _, pmask = pad_pow2(pos, pos)
    if mask is not None:
        n = mask.shape[1]
        pmask = pmask & jnp.pad(mask, ((0, 0), (0, pmask.shape[1] - n)))
    pos_p = jax.lax.stop_gradient(pos_p)
    Np = pos_p.shape[1]
    # Np is a power of two (pad_pow2); the balls must tile it exactly, so
    # round a non-power-of-two ball up to the next power of two. The
    # candidate set is two groupings x a +-1-ball window = 6*ball, and
    # lax.top_k cannot return more than that — grow the ball until it
    # can serve the requested k.
    ball = 1 << max(0, (max(ball, -(-k // 6)) - 1)).bit_length()
    ball = min(ball, Np)
    nb = Np // ball
    k = min(k, 6 * ball)  # only binding when ball hit the Np cap
    levels = max(0, int(_math.log2(Np)) - int(_math.log2(ball)))

    def gather_cands(perm):
        """Per-point candidate (pos, idx, mask) from a +-1 ball window in
        the permutation's ball order -> arrays in ORIGINAL point order."""
        post = jnp.take_along_axis(pos_p, perm[..., None], axis=1)
        maskt = jnp.take_along_axis(pmask, perm, axis=1)
        pb = post.reshape(B, nb, ball, D)
        mb = maskt.reshape(B, nb, ball)
        permb = perm.reshape(B, nb, ball)

        def window(a, fill):
            prev = jnp.concatenate(
                [jnp.full_like(a[:, :1], fill), a[:, :-1]], 1)
            nxt = jnp.concatenate(
                [a[:, 1:], jnp.full_like(a[:, :1], fill)], 1)
            return jnp.concatenate([prev, a, nxt], axis=2)

        w = 3 * ball
        cpos = window(pb, 0.0)
        cmask = window(mb, False)
        edge = jnp.ones((B, nb, w), bool)
        edge = edge.at[:, 0, :ball].set(False)
        edge = edge.at[:, -1, 2 * ball:].set(False)
        cmask = cmask & edge
        cidx = window(permb, 0)
        # broadcast per ball -> per point, then undo the permutation
        inv = jnp.argsort(perm, axis=-1)

        def unperm(a):
            flat = a[:, :, None].repeat(ball, axis=2).reshape(B, Np, w, -1)
            return jnp.take_along_axis(flat, inv[..., None, None], axis=1)

        return (
            unperm(cpos),                              # [B, Np, w, D]
            unperm(cidx[..., None])[..., 0],           # [B, Np, w]
            unperm(cmask[..., None])[..., 0].astype(bool),
        )

    perm_main = median_split_perm(pos_p, levels)
    cp1, ci1, cm1 = gather_cands(perm_main)
    # second, rotated grouping: catches neighbors split across ball
    # boundaries (the Erwin cross-ball rotation trick, balltree.pyx:598).
    R = rotation_matrix(45.0, D).astype(pos_p.dtype)
    perm_rot = median_split_perm(pos_p @ R, levels)
    cp2, ci2, cm2 = gather_cands(perm_rot)
    # dedupe: drop rotated candidates already present in the main window.
    # Compare only against VALID main candidates: boundary-ball windows are
    # filled with index 0 (window(permb, 0) above), and matching those fill
    # slots would silently drop every rotated candidate equal to original
    # point 0 for points in the first/last ball.
    ci1_valid = jnp.where(cm1, ci1, -1)
    dup = (ci2[:, :, :, None] == ci1_valid[:, :, None, :]).any(-1)
    cm2 = cm2 & ~dup

    cand_pos = jnp.concatenate([cp1, cp2], axis=2)     # [B, Np, 6*ball, D]
    cand_idx = jnp.concatenate([ci1, ci2], axis=2)
    cand_mask = jnp.concatenate([cm1, cm2], axis=2)

    d2 = jnp.sum((cand_pos - pos_p[:, :, None, :]) ** 2, axis=-1)
    big = jnp.asarray(jnp.finfo(d2.dtype).max, d2.dtype)
    d2 = jnp.where(cand_mask, d2, big)
    if not include_self:
        self_idx = jnp.arange(Np, dtype=cand_idx.dtype)[None, :, None]
        d2 = jnp.where(cand_idx == self_idx, big, d2)
    neg, ci = lax.top_k(-d2, k)                        # [B, Np, k]
    valid = neg > -big
    idx_o = jnp.take_along_axis(cand_idx, ci, axis=-1)[:, :N]
    valid_o = valid[:, :N]
    if mask is not None:
        valid_o = valid_o & mask[:, :, None]
    # invalid slots may carry pad indices >= N; clamp so gathers stay in
    # bounds (they are masked out anyway)
    idx_o = jnp.minimum(idx_o, N - 1)
    return idx_o.astype(jnp.int32), valid_o


def radius_edges(pos, radius: float, k: int, *, mask=None,
                 include_self: bool = True):
    """Radius graph with a neighbor cap: kNN filtered to ``dist <= radius``."""
    idx, valid = knn_edges(pos, k, mask=mask, include_self=include_self)
    B, N, D = pos.shape
    K = idx.shape[-1]
    nbr_pos = jnp.take_along_axis(
        pos, idx.reshape(B, N * K)[..., None], axis=1
    ).reshape(B, N, K, D)
    d2 = jnp.sum((nbr_pos - pos[:, :, None, :]) ** 2, axis=-1)
    return idx, valid & (d2 <= radius * radius)
