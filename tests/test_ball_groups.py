"""Ball-grouping invariants: on-device perms vs a numpy tree oracle.

The oracle mirrors the reference C++ semantics (max-spread split dimension +
median partition, ``balltree.h:32-186``) recursively in numpy. With
tie-free random data the median split is unique, so ball *memberships* must
match exactly at every granularity.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from haet_tpu.ops.ball_groups import (
    build_erwin_perms,
    invert_perm,
    median_split_perm,
    morton_perm,
    pad_pow2,
    rotation_matrix,
)


def oracle_median_split(pos, levels):
    """Recursive max-spread median split; returns index order."""
    n = pos.shape[0]
    order = np.arange(n)

    def rec(idx, level):
        if level == levels or len(idx) <= 1:
            return idx
        spread = pos[idx].max(0) - pos[idx].min(0)
        dim = int(np.argmax(spread))
        mid = len(idx) // 2
        srt = idx[np.argsort(pos[idx, dim], kind="stable")]
        return np.concatenate([rec(srt[:mid], level + 1), rec(srt[mid:], level + 1)])

    return rec(order, 0)


def ball_sets(order, ball_size):
    return [frozenset(order[i:i + ball_size].tolist())
            for i in range(0, len(order), ball_size)]


@pytest.mark.parametrize("n,d", [(16, 2), (64, 3), (128, 3)])
def test_median_perm_matches_oracle(n, d):
    rng = np.random.RandomState(42)
    pos = rng.rand(n, d).astype(np.float32)
    levels = int(math.log2(n)) - 1

    ours = np.asarray(median_split_perm(jnp.asarray(pos)[None], levels))[0]
    ref = oracle_median_split(pos, levels)

    # memberships must match at every power-of-two granularity down to
    # the leaf size implied by `levels`
    for lvl in range(levels + 1):
        seg = n >> lvl
        assert ball_sets(ours, seg) == ball_sets(ref, seg), f"level {lvl}"


def test_median_perm_is_permutation_batched():
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.rand(5, 32, 3).astype(np.float32))
    perm = np.asarray(median_split_perm(pos, 4))
    for b in range(5):
        assert sorted(perm[b].tolist()) == list(range(32))


def test_invert_perm():
    pos = jnp.asarray(np.random.RandomState(1).rand(3, 16, 2).astype(np.float32))
    perm = median_split_perm(pos, 3)
    inv = invert_perm(perm)
    composed = jnp.take_along_axis(perm, inv, axis=-1)
    np.testing.assert_array_equal(
        np.asarray(composed), np.tile(np.arange(16), (3, 1))
    )


def test_morton_perm_is_permutation():
    rng = np.random.RandomState(2)
    for d in (1, 2, 3):
        pos = jnp.asarray(rng.rand(2, 64, d).astype(np.float32))
        perm = np.asarray(morton_perm(pos))
        for b in range(2):
            assert sorted(perm[b].tolist()) == list(range(64))


def test_morton_locality():
    """Morton-sorted neighbors should be spatially closer than random order."""
    rng = np.random.RandomState(3)
    pos = rng.rand(1, 256, 3).astype(np.float32)
    perm = np.asarray(morton_perm(jnp.asarray(pos)))[0]
    sorted_pos = pos[0][perm]
    d_sorted = np.linalg.norm(np.diff(sorted_pos, axis=0), axis=-1).mean()
    d_rand = np.linalg.norm(np.diff(pos[0], axis=0), axis=-1).mean()
    assert d_sorted < 0.5 * d_rand


def test_pad_pow2():
    x = jnp.asarray(np.random.rand(2, 50, 4).astype(np.float32))
    pos = jnp.asarray(np.random.rand(2, 50, 3).astype(np.float32))
    xp, pp, mask = pad_pow2(x, pos)
    assert xp.shape == (2, 64, 4) and pp.shape == (2, 64, 3)
    assert mask.shape == (2, 64)
    assert bool(mask[:, :50].all()) and not bool(mask[:, 50:].any())
    # pad slots duplicate real points
    np.testing.assert_array_equal(np.asarray(xp[:, 50:]), np.asarray(x[:, :14]))


def test_rotation_matrix_orthogonal_2d():
    R = np.asarray(rotation_matrix(45.0, 2))
    np.testing.assert_allclose(R @ R.T, np.eye(2), atol=1e-6)


def test_rotation_matrix_3d_matches_reference_form():
    """The reference 3D matrix (balltree.pyx:589-594) — replicate exactly."""
    a = math.radians(30.0)
    c, s = math.cos(a), math.sin(a)
    expected = np.array([
        [c * c, s * c * (s - 1), s * (s + c * c)],
        [s * c, s ** 3 + c * c, s * c * (s - 1)],
        [-s, s * c, c * c],
    ], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(rotation_matrix(30.0, 3)), expected)


def test_build_erwin_perms_shapes_and_rotation():
    rng = np.random.RandomState(4)
    pos = jnp.asarray(rng.rand(3, 64, 3).astype(np.float32))
    perms = build_erwin_perms(
        pos, ball_sizes=(16, 8), strides=(2,), rotate_angle=45.0
    )
    assert perms.perm.shape == (3, 64)
    assert perms.unperm.shape == (3, 64)
    assert len(perms.rot_perms) == 2
    assert perms.rot_perms[0].shape == (3, 64)
    assert perms.rot_perms[1].shape == (3, 32)  # after stride-2 coarsening
    for rp, ri in zip(perms.rot_perms, perms.rot_inv_perms):
        comp = jnp.take_along_axis(rp, ri, axis=-1)
        np.testing.assert_array_equal(
            np.asarray(comp),
            np.tile(np.arange(rp.shape[1]), (3, 1)),
        )


def test_build_erwin_perms_no_rotation():
    pos = jnp.asarray(np.random.rand(2, 32, 2).astype(np.float32))
    perms = build_erwin_perms(
        pos, ball_sizes=(8, 4), strides=(2,), rotate_angle=0.0
    )
    assert perms.rot_perms == [None, None]


def test_unperm_with_mask_roundtrip():
    """Permute + mask-aware unpermute must restore original point order."""
    rng = np.random.RandomState(5)
    n = 50
    x = jnp.asarray(rng.rand(2, n, 4).astype(np.float32))
    pos = jnp.asarray(rng.rand(2, n, 3).astype(np.float32))
    xp, pp, mask = pad_pow2(x, pos)
    perms = build_erwin_perms(
        pp, ball_sizes=(16, 8), strides=(2,), rotate_angle=0.0,
        mask=mask, n_original=n,
    )
    xt = jnp.take_along_axis(xp, perms.perm[..., None], axis=1)
    back = jnp.take_along_axis(xt, perms.unperm[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
