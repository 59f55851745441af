"""Native C++ ball tree: build, invariants, and cross-check vs the
on-device grouping."""

import math

import numpy as np
import pytest

from haet_tpu import native
from haet_tpu.ops.ball_groups import median_split_perm

import jax.numpy as jnp


@pytest.fixture(scope="module")
def lib():
    return native.get_lib()


def test_tree_slots(lib):
    # slots = 2^ceil(log2 n): one pair-slot leaf per 2^max_level
    assert lib.haet_tree_slots(1) == 2
    assert lib.haet_tree_slots(2) == 2
    assert lib.haet_tree_slots(3) == 4
    assert lib.haet_tree_slots(8) == 8
    assert lib.haet_tree_slots(9) == 16
    assert lib.haet_tree_slots(1000) == 1024


def test_build_single_batch_pow2(lib):
    rng = np.random.RandomState(0)
    pts = rng.rand(64, 3)
    idx, mask = native.build_balltree(pts, np.zeros(64, dtype=np.int64))
    assert len(idx) == 64
    assert mask.all()
    assert sorted(idx.tolist()) == list(range(64))


def test_build_non_pow2_duplicates(lib):
    rng = np.random.RandomState(1)
    n = 37
    pts = rng.rand(n, 2)
    idx, mask = native.build_balltree(pts, np.zeros(n, dtype=np.int64))
    assert len(idx) == 64
    assert mask.sum() == n
    # every real point appears exactly once among masked-True slots
    assert sorted(idx[mask].tolist()) == list(range(n))


def test_build_batched(lib):
    rng = np.random.RandomState(2)
    n1, n2 = 32, 16
    pts = rng.rand(n1 + n2, 3)
    batch_idx = np.concatenate([np.zeros(n1), np.ones(n2)]).astype(np.int64)
    idx, mask = native.build_balltree(pts, batch_idx)
    assert len(idx) == n1 + n2
    # first batch slots reference only batch-0 points, second only batch-1
    assert idx[:n1].max() < n1
    assert idx[n1:].min() >= n1


def test_native_matches_ondevice_memberships(lib):
    """Same median-split semantics => same ball memberships at every level."""
    rng = np.random.RandomState(3)
    n = 128
    pts = rng.rand(n, 3)
    idx, mask = native.build_balltree(pts, np.zeros(n, dtype=np.int64))
    levels = int(math.log2(n)) - 1
    perm = np.asarray(
        median_split_perm(jnp.asarray(pts[None].astype(np.float32)), levels)
    )[0]
    for lvl in range(levels + 1):
        seg = n >> lvl
        a = {frozenset(idx[i:i + seg].tolist()) for i in range(0, n, seg)}
        b = {frozenset(perm[i:i + seg].tolist()) for i in range(0, n, seg)}
        assert a == b, f"membership mismatch at segment size {seg}"


def test_partition_balltree(lib):
    rng = np.random.RandomState(4)
    n = 64
    pts = rng.rand(n, 3)
    out = native.partition_balltree(pts, np.zeros(n, dtype=np.int64), 2)
    assert sorted(out.tolist()) == list(range(n))
    # 4 partitions of 16: each quarter is a contiguous median split
    # (cross-check with on-device partition at 2 levels)
    perm = np.asarray(
        median_split_perm(jnp.asarray(pts[None].astype(np.float32)), 2)
    )[0]
    a = {frozenset(out[i:i + 16].tolist()) for i in range(0, n, 16)}
    b = {frozenset(perm[i:i + 16].tolist()) for i in range(0, n, 16)}
    assert a == b


def test_rotations_pipeline(lib):
    rng = np.random.RandomState(5)
    n = 64
    pts = rng.rand(n, 3)
    batch_idx = np.zeros(n, dtype=np.int64)
    tree_idx, tree_mask, rots = native.build_balltree_with_rotations(
        pts, batch_idx, strides=[2], ball_sizes=[16, 8], angle=45.0
    )
    assert len(rots) == 2
    assert sorted(rots[0].tolist()) == list(range(n))
    assert sorted(rots[1].tolist()) == list(range(n // 2))


def test_validation_errors(lib):
    with pytest.raises(ValueError):
        native.build_balltree(np.random.rand(4, 2),
                              np.array([1, 1, 1, 1], dtype=np.int64))
    with pytest.raises(ValueError):
        native.build_balltree(np.random.rand(4), np.zeros(4, dtype=np.int64))
    with pytest.raises(ValueError):
        native.build_balltree(np.random.rand(4, 2),
                              np.zeros(3, dtype=np.int64))
