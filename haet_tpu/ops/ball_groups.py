"""On-device ball grouping: the TPU-native replacement for the host ball tree.

The reference builds a complete binary ball tree on the host (C++/Cython/
OpenMP, ``models/components/balltree/balltree.h:121-186``) with a
device->host->device round trip inside **every** forward layer
(``balltree.pyx:542-550``). Because the Erwin positions are derived from
features (``PhysicsAttention/StructuredMesh2D.py:228-234``), the tree must be
rebuilt each step — so grouping has to live on-device to stay inside ``jit``.

This module computes the same grouping *on device* with static shapes:

* ``median_split_perm`` — the exact median-split tree, re-expressed as
  ``levels`` rounds of vectorized within-segment argsorts. At each level every
  segment picks its max-spread dimension (mirroring
  ``find_split_dimension``, ``balltree.h:32-66``) and is sorted along it; the
  two halves are the median split (``std::nth_element`` in the reference,
  ``balltree.h:82-101`` — a full sort is a strictly stronger partition, so the
  resulting tree structure is identical up to ties). A permutation comes out;
  contiguous blocks of any power-of-two size are balls.
* ``morton_perm`` — a single space-filling-curve sort: cheaper (one sort
  instead of ``log2 N``) with slightly different ball membership; a speed
  option, off by default.
* ``build_erwin_perms`` — the full backbone for an Erwin forward: main-tree
  permutation + per-level rotated permutations, mirroring
  ``build_balltree_with_rotations`` (``balltree.pyx:598-662``).

Layout: clouds are **dense batched** ``pos: [B, N, D]`` with N padded to a
power of two (``pad_pow2``); dummies duplicate real points (the reference
duplicates singleton leaf points, ``balltree.h:136-150``) and are excluded
from outputs via the mask, never via attention masking (the reference's flash
path does not mask dummies in attention either).

Everything here is gradient-free (the reference wraps tree building in
``torch.no_grad``, ``erwin_flash.py:149``) — callers should pass positions
through ``jax.lax.stop_gradient``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp


def _take_points(pos, order):
    """Gather ``pos[b, order[b]]`` -> [B, N, D]."""
    return jnp.take_along_axis(pos, order[..., None], axis=1)


def median_split_perm(pos, levels: int):
    """Median-split ball-tree permutation, fully on device.

    Args:
        pos: ``[B, N, D]`` positions, N a power of two.
        levels: number of split rounds; the output groups points so contiguous
            segments of size ``N / 2**l`` are balls for every ``l <= levels``.

    Returns:
        ``order: [B, N]`` int32 permutation (tree order -> original index).
    """
    B, N, D = pos.shape
    if N & (N - 1):
        raise ValueError(f"N must be a power of two, got {N}")
    levels = max(0, min(levels, int(math.log2(N))))
    order = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    p = pos
    for level in range(levels):
        seg = N >> level
        if seg <= 1:
            break
        S = N // seg
        pv = p.reshape(B, S, seg, D)
        spread = pv.max(axis=2) - pv.min(axis=2)              # [B, S, D]
        split_dim = jnp.argmax(spread, axis=-1)               # [B, S]
        key = jnp.take_along_axis(
            pv, split_dim[:, :, None, None], axis=-1
        )[..., 0]                                             # [B, S, seg]
        idx = jnp.argsort(key, axis=-1, stable=True)
        order = jnp.take_along_axis(
            order.reshape(B, S, seg), idx, axis=-1
        ).reshape(B, N)
        p = jnp.take_along_axis(
            p.reshape(B, S, seg, D), idx[..., None], axis=2
        ).reshape(B, N, D)
    return order


def _part1by1(x):
    """Spread 16 bits of x so there is a zero bit between each (Morton 2D)."""
    x = x & 0x0000FFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _part1by2(x):
    """Spread 10 bits of x with two zero bits between each (Morton 3D)."""
    x = x & 0x000003FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_code(pos):
    """Quantize positions to a Morton (Z-order) code. ``pos: [..., D]``, D in {1,2,3}."""
    D = pos.shape[-1]
    lo = pos.min(axis=-2, keepdims=True)
    hi = pos.max(axis=-2, keepdims=True)
    scale = jnp.where(hi - lo > 0, hi - lo, 1.0)
    unit = (pos - lo) / scale
    if D == 1:
        q = jnp.clip((unit[..., 0] * 0x3FFFFFFF), 0, 0x3FFFFFFF).astype(jnp.int32)
        return q
    if D == 2:
        bits = 15
        q = jnp.clip(unit * ((1 << bits) - 1), 0, (1 << bits) - 1).astype(jnp.int32)
        return (_part1by1(q[..., 0]) << 1) | _part1by1(q[..., 1])
    if D == 3:
        bits = 10
        q = jnp.clip(unit * ((1 << bits) - 1), 0, (1 << bits) - 1).astype(jnp.int32)
        return (
            (_part1by2(q[..., 0]) << 2)
            | (_part1by2(q[..., 1]) << 1)
            | _part1by2(q[..., 2])
        )
    raise ValueError(f"morton_code supports D in (1, 2, 3); got {D}")


def morton_perm(pos, levels: int = 0):
    """Single-sort SFC grouping. ``levels`` is accepted for API parity and ignored."""
    del levels
    code = morton_code(pos)
    return jnp.argsort(code, axis=-1, stable=True).astype(jnp.int32)


GROUPERS = {"median": median_split_perm, "morton": morton_perm}


def rotation_matrix(angle_deg: float, dim: int):
    """Cross-ball rotation matrix — parity with ``generate_rotation_matrix``
    (``balltree.pyx:576-596``), including the reference's specific (and
    unusual) 3D matrix."""
    a = math.radians(angle_deg)
    c, s = math.cos(a), math.sin(a)
    if dim == 1:
        return jnp.array([[1.0]], dtype=jnp.float32)
    if dim == 2:
        return jnp.array([[c, -s], [s, c]], dtype=jnp.float32)
    if dim == 3:
        return jnp.array(
            [
                [c * c, s * c * (s - 1), s * (s + c * c)],
                [s * c, s * s * s + c * c, s * c * (s - 1)],
                [-s, s * c, c * c],
            ],
            dtype=jnp.float32,
        )
    raise ValueError(f"Unsupported dimension: {dim}")


def pad_pow2(x, pos, *, axis: int = 1):
    """Pad points axis to the next power of two by duplicating real points.

    Returns ``(x_pad, pos_pad, mask)`` where ``mask: [B, N_pad]`` is False on
    duplicate slots. Mirrors the reference's dummy-duplication semantics
    (``balltree.h:136-150``): duplicates share coordinates with real points so
    grouping and pooling statistics stay anchored to real data.
    """
    n = x.shape[axis]
    n_pad = 1 << max(0, math.ceil(math.log2(max(n, 1))))
    mask = jnp.arange(n_pad) < n
    if axis == 1:  # batched [B, N, ...]: mask is [B, N_pad]
        mask = jnp.broadcast_to(mask[None], (x.shape[0], n_pad))
    elif axis != 0:  # axis=0 (unbatched): mask stays [N_pad]
        raise ValueError(f"pad_pow2 supports axis 0 or 1, got {axis}")
    if n_pad == n:
        return x, pos, mask
    idx = jnp.concatenate(
        [jnp.arange(n), jnp.arange(n_pad - n) % n]
    )
    return (
        jnp.take(x, idx, axis=axis),
        jnp.take(pos, idx, axis=axis),
        mask,
    )


@dataclass
class ErwinPerms:
    """Static-shape backbone of one Erwin forward pass.

    Attributes:
        perm: ``[B, N]`` main-tree permutation (tree slot -> point index).
        unperm: ``[B, N_out]`` gather indices mapping tree order back to the
            original point order, mask-aware (mirrors
            ``node.x[tree_mask][argsort(tree_idx[tree_mask])]``,
            ``erwin_flash.py:193``).
        rot_perms: per-level rotated permutations over the *current level's*
            nodes (or None if rotation disabled), mirroring the per-level
            partition trees of ``build_balltree_with_rotations``.
        rot_inv_perms: inverses of ``rot_perms``.
    """

    perm: jnp.ndarray
    unperm: jnp.ndarray
    rot_perms: list = field(default_factory=list)
    rot_inv_perms: list = field(default_factory=list)


jax.tree_util.register_pytree_node(
    ErwinPerms,
    lambda p: ((p.perm, p.unperm, p.rot_perms, p.rot_inv_perms), None),
    lambda _, c: ErwinPerms(*c),
)


def effective_ball_size(ball_size: int, n: int) -> int:
    """The largest power of two <= min(ball_size, n): the ball size a level
    actually attends over. ONE definition shared by BallMSA, BasicLayer's
    rotation-skip, and build_erwin_perms — these three must agree exactly
    (a desync makes BasicLayer demand rotation perms the builder decided
    not to emit, or tile balls differently from the perms)."""
    return 1 << (min(ball_size, n).bit_length() - 1)


def invert_perm(perm):
    """Inverse of a batched permutation: ``inv[b, perm[b, i]] = i``."""
    return jnp.argsort(perm, axis=-1, stable=True).astype(jnp.int32)


@partial(jax.jit, static_argnames=("ball_sizes", "strides", "rotate_angle",
                                   "grouping", "n_original"))
def build_erwin_perms(
    pos,
    *,
    ball_sizes: tuple,
    strides: tuple,
    rotate_angle: float = 45.0,
    grouping: str = "median",
    mask=None,
    n_original: int | None = None,
):
    """Build all permutations an Erwin forward needs, fully on device.

    Mirrors ``build_balltree_with_rotations`` (``balltree.pyx:598-662``):
    main tree, rotated leaves, per-level partition trees with
    ``target = max(0, int(log2(total_points / ball_size)))`` computed from the
    level-0 total (the reference computes all targets upfront,
    ``balltree.pyx:643``), coarsening by stride-mean between levels.

    Args:
        pos: ``[B, N, D]`` (N a power of two; use :func:`pad_pow2` first).
        ball_sizes / strides: per-level Erwin config.
        rotate_angle: degrees; ``<= 0`` disables rotation.
        grouping: ``"median"`` (tree parity) or ``"morton"`` (single sort).
        mask: optional ``[B, N]`` validity mask (False on pad duplicates).
        n_original: if given, ``unperm`` maps back to this many points.

    Returns:
        :class:`ErwinPerms`.
    """
    pos = jax.lax.stop_gradient(pos)
    B, N, D = pos.shape
    grouper = GROUPERS[grouping]
    full_levels = max(int(math.log2(N)) - 1, 0)
    perm = grouper(pos, full_levels)

    if mask is None:
        unperm = invert_perm(perm)
        if n_original is not None:
            # without a mask the permutation is a pure bijection; honoring
            # n_original still means "return only the first n_original
            # original points' slots"
            unperm = unperm[:, :n_original]
    else:
        # Only mask-True slots map back; sort invalid slots to the end.
        mask_t = jnp.take_along_axis(mask, perm, axis=1)
        key = jnp.where(mask_t, perm, N + 1)
        n_out = n_original if n_original is not None else N
        unperm = jnp.argsort(key, axis=-1, stable=True)[:, :n_out].astype(jnp.int32)

    num_layers = len(ball_sizes)
    rot_perms: list = []
    rot_inv_perms: list = []
    if rotate_angle <= 0:
        rot_perms = [None] * num_layers
        rot_inv_perms = [None] * num_layers
    else:
        R = rotation_matrix(rotate_angle, D).astype(pos.dtype)
        leaves = _take_points(pos, perm) @ R
        total0 = B * N  # reference uses the flat leaf count (balltree.pyx:643)
        targets = [
            max(0, int(math.log2(total0 / bs))) for bs in ball_sizes
        ]
        n_level = N
        for i in range(num_layers):
            # When the ball covers the whole cloud (common with slice-token
            # clouds: ball_sizes default to min(32, G)), rotation only
            # permutes tokens *within* the single ball — attention over a
            # full ball is permutation-equivariant, so
            # blk(x[rot])[rot_inv] == blk(x) exactly. Skip the partition
            # build and the per-block gathers; BasicLayer treats a None
            # rot_perm at full-ball levels as this no-op.
            bs_eff = effective_ball_size(ball_sizes[i], n_level)
            if bs_eff >= n_level:
                rot_perms.append(None)
                rot_inv_perms.append(None)
            else:
                t = min(targets[i], int(math.log2(max(n_level, 1))))
                rp = grouper(leaves, t)
                rot_perms.append(rp)
                rot_inv_perms.append(invert_perm(rp))
            if i < num_layers - 1:
                s = strides[i]
                leaves = leaves.reshape(B, n_level // s, s, D).mean(axis=2)
                n_level //= s

    return ErwinPerms(
        perm=perm, unperm=unperm, rot_perms=rot_perms, rot_inv_perms=rot_inv_perms
    )
