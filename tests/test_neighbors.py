"""Neighbor search: brute-force correctness and grouped-search recall."""

import jax.numpy as jnp
import numpy as np

from haet_tpu.ops.neighbors import (
    knn_edges,
    knn_edges_brute,
    knn_edges_grouped,
    radius_edges,
)


def brute_numpy(pos, k):
    d = ((pos[:, None] - pos[None]) ** 2).sum(-1)
    return np.argsort(d, axis=-1, kind="stable")[:, :k]


def test_knn_brute_matches_numpy():
    rng = np.random.RandomState(0)
    pos = rng.rand(1, 64, 3).astype(np.float32)
    idx, valid = knn_edges_brute(jnp.asarray(pos), 5)
    assert valid.all()
    ref = brute_numpy(pos[0], 5)
    d_ref = ((pos[0][ref] - pos[0][:, None]) ** 2).sum(-1)
    d_got = ((pos[0][np.asarray(idx[0])] - pos[0][:, None]) ** 2).sum(-1)
    # distances of selected neighbors must match the optimal set
    np.testing.assert_allclose(np.sort(d_got, -1), np.sort(d_ref, -1),
                               rtol=1e-5, atol=1e-7)


def test_knn_brute_mask_and_noself():
    rng = np.random.RandomState(1)
    pos = rng.rand(1, 16, 2).astype(np.float32)
    mask = np.ones((1, 16), bool)
    mask[0, 10:] = False
    idx, valid = knn_edges_brute(jnp.asarray(pos), 4,
                                 mask=jnp.asarray(mask),
                                 include_self=False)
    # invalid receivers have no edges
    assert not np.asarray(valid)[0, 10:].any()
    # no self edges among valid entries
    rows = np.arange(16)[:, None]
    v = np.asarray(valid[0])
    assert not (np.asarray(idx[0]) == rows)[v].any()
    # no invalid senders
    assert (np.asarray(idx[0])[v] < 10).all()


def test_grouped_knn_high_recall():
    """Grouped search recovers almost all true neighbors on uniform data."""
    rng = np.random.RandomState(2)
    n, k = 3000, 8
    pos = rng.rand(1, n, 3).astype(np.float32)
    idx_g, valid_g = knn_edges_grouped(jnp.asarray(pos), k, ball=128)
    assert valid_g.all()
    ref = brute_numpy(pos[0], k)
    got = np.asarray(idx_g[0])
    recall = np.mean([
        len(set(got[i]) & set(ref[i])) / k for i in range(n)
    ])
    assert recall > 0.95, f"recall {recall}"


def test_knn_dispatch_large_n():
    pos = jnp.asarray(np.random.RandomState(3).rand(1, 5000, 3), jnp.float32)
    idx, valid = knn_edges(pos, 4)
    assert idx.shape == (1, 5000, 4)
    assert int(idx.max()) < 5000
    assert valid.all()


def test_radius_edges_filters():
    pos = jnp.asarray(
        np.array([[[0, 0, 0], [0.05, 0, 0], [10, 0, 0], [10.05, 0, 0]]],
                 np.float32))
    idx, valid = radius_edges(pos, radius=0.2, k=3)
    v = np.asarray(valid[0])
    i = np.asarray(idx[0])
    # point 0: itself and point 1 in radius; point 2 not
    nb0 = set(i[0][v[0]].tolist())
    assert nb0 == {0, 1}
    nb2 = set(i[2][v[2]].tolist())
    assert nb2 == {2, 3}


def test_segment_ops_match_torch_scatter_semantics():
    from haet_tpu.ops.scatter import segment_mean, segment_sum

    rng = np.random.RandomState(5)
    data = rng.randn(10, 3).astype(np.float32)
    seg = np.array([0, 0, 1, 1, 1, 3, 3, 0, 2, 2])
    ours_sum = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(seg), 5))
    ours_mean = np.asarray(segment_mean(jnp.asarray(data), jnp.asarray(seg), 5))
    ref_sum = np.zeros((5, 3), np.float32)
    np.add.at(ref_sum, seg, data)
    cnt = np.bincount(seg, minlength=5).astype(np.float32)
    ref_mean = ref_sum / np.maximum(cnt, 1)[:, None]
    np.testing.assert_allclose(ours_sum, ref_sum, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours_mean, ref_mean, rtol=1e-5, atol=1e-6)
    # empty segment (4) gives zeros, matching torch_scatter
    assert (ours_mean[4] == 0).all()


def test_grouped_knn_boundary_ball_keeps_edges_to_point_zero():
    """Regression: the rotated-vs-main dedup must only compare against
    VALID main candidates. Boundary-ball windows are filled with index 0,
    and a dedup over the raw filled indices dropped every rotated candidate
    equal to original point 0 for queries in the first/last main ball —
    silently losing true kNN edges (and thus MPNN messages) to point 0.

    Construction: q (index 1) sits in main ball 0; its true nearest
    neighbor is point 0, pushed 3 balls away in the main (x-sorted)
    grouping by spacer points that are near in x but far in y, while the
    45-degree rotated grouping puts 0 adjacent to q. The edge q->0 is then
    reachable ONLY through the rotated grouping, where the old dedup
    discarded it."""
    import math

    from haet_tpu.ops.ball_groups import median_split_perm

    rng = np.random.RandomState(0)
    p0 = np.array([[2.0, 0.0, 0.0]], np.float32)                  # index 0
    q = np.array([[1.0, 0.0, 0.0]], np.float32)                   # index 1
    mates = np.column_stack([0.1 + 0.8 * rng.rand(63),
                             5 + 0.01 * rng.rand(63),
                             0.01 * rng.rand(63)]).astype(np.float32)
    spacer = np.column_stack([1.01 + 0.98 * rng.rand(130),
                              5 + 0.01 * rng.rand(130),
                              0.01 * rng.rand(130)]).astype(np.float32)
    bg = np.column_stack([4 + 6 * rng.rand(61), rng.rand(61),
                          0.01 * rng.rand(61)]).astype(np.float32)
    pos = np.concatenate([p0, q, mates, spacer, bg])[None]        # 256 pts
    n, ball = 256, 64

    # the construction's premise: q in the first main ball, point 0 beyond
    # q's +-1-ball window (otherwise this test wouldn't exercise the path)
    levels = int(math.log2(n)) - int(math.log2(ball))
    perm = np.asarray(median_split_perm(jnp.asarray(pos), levels))[0]
    balls = perm.reshape(-1, ball)
    assert int(np.where(balls == 1)[0][0]) == 0
    assert int(np.where(balls == 0)[0][0]) >= 2

    k = 4
    idx_b, _ = knn_edges_brute(jnp.asarray(pos), k)
    assert 0 in set(np.asarray(idx_b[0, 1]))  # 0 is a true kNN of q
    idx_g, val_g = knn_edges_grouped(jnp.asarray(pos), k, ball=ball)
    got = set(np.asarray(idx_g[0, 1])[np.asarray(val_g[0, 1])])
    assert 0 in got


def test_segment_mean_bf16_large_segment():
    """bf16 accumulation saturates at 256 when summing ones — counts and
    sums must accumulate in f32 (segment of 1000 ones: mean is exactly 1)."""
    from haet_tpu.ops.scatter import segment_mean

    data = jnp.ones(1000, jnp.bfloat16)
    seg = jnp.zeros(1000, jnp.int32)
    out = segment_mean(data, seg, 1)
    assert out.dtype == jnp.bfloat16
    assert float(out[0]) == 1.0
    # and a non-trivial mean stays accurate at bf16 resolution
    data2 = jnp.asarray(np.linspace(0.0, 2.0, 1000), jnp.bfloat16)
    out2 = segment_mean(data2, seg, 1)
    assert abs(float(out2[0]) - 1.0) < 0.01


def test_knn_edges_grouped_non_pow2_ball_and_large_k():
    """Non-power-of-two ball sizes must not crash the grouped path (the
    pow2-padded cloud must tile exactly), and k larger than the candidate
    window grows the ball instead of breaking lax.top_k."""
    from haet_tpu.ops.neighbors import knn_edges_grouped

    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.rand(1, 700, 3), jnp.float32)
    idx, valid = knn_edges_grouped(pos, k=8, ball=100)  # 100 -> 128
    assert idx.shape == (1, 700, 8)
    assert bool(valid.any())
    # k > 6*ball for the requested ball: ball auto-grows to serve k
    idx2, valid2 = knn_edges_grouped(pos, k=80, ball=8)
    assert idx2.shape == (1, 700, 80)
    # self always among neighbors when include_self=True
    self_hit = (np.asarray(idx2) == np.arange(700)[None, :, None])
    assert bool((self_hit.any(-1)).all())
