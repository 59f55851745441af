"""Full-ball rotation skip is an exact no-op.

At levels where one ball covers the whole cloud (the default slice-token
configs), cross-ball rotation only permutes tokens inside the ball; since
full-ball attention (and every other block op) is permutation-equivariant,
skipping the rotation machinery must give bitwise-identical outputs.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from haet_tpu.models.erwin import ErwinTransformer
from haet_tpu.ops.ball_groups import (
    ErwinPerms,
    build_erwin_perms,
    invert_perm,
    median_split_perm,
    rotation_matrix,
)


def test_full_ball_rotation_skip_is_exact():
    rng = np.random.RandomState(0)
    B, N = 4, 32
    x = jnp.asarray(rng.randn(B, N, 8).astype(np.float32))
    pos = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))

    model = ErwinTransformer(
        c_in=8, c_hidden=(8, 16), ball_sizes=(32, 16),
        enc_num_heads=(2, 2), enc_depths=(2, 2), dec_num_heads=(2,),
        dec_depths=(2,), strides=(2,), rotate=45, mp_steps=0, embed=False,
    )

    # fast path: perms builder skips rotation at full-ball levels
    perms_fast = build_erwin_perms(
        pos, ball_sizes=(32, 16), strides=(2,), rotate_angle=45.0
    )
    assert all(p is None for p in perms_fast.rot_perms)

    v = jax.jit(
        lambda x, p: model.init(jax.random.PRNGKey(0), x, p, perms=perms_fast)
    )(x, pos)
    out_fast = model.apply(v, x, pos, perms=perms_fast)

    # explicit-rotation path: hand-build the rotated permutations as the
    # reference semantics prescribe (balltree.pyx:598-662)
    R = rotation_matrix(45.0, 3)
    leaves = jnp.take_along_axis(pos, perms_fast.perm[..., None], axis=1) @ R
    t0 = min(max(0, int(math.log2(B * N / 32))), 5)
    rp0 = median_split_perm(leaves, t0)
    leaves1 = leaves.reshape(B, 16, 2, 3).mean(axis=2)
    t1 = min(max(0, int(math.log2(B * N / 16))), 4)
    rp1 = median_split_perm(leaves1, t1)
    perms_slow = ErwinPerms(
        perm=perms_fast.perm, unperm=perms_fast.unperm,
        rot_perms=[rp0, rp1],
        rot_inv_perms=[invert_perm(rp0), invert_perm(rp1)],
    )
    out_slow = model.apply(v, x, pos, perms=perms_slow)

    np.testing.assert_array_equal(np.asarray(out_fast), np.asarray(out_slow))


def test_partial_ball_levels_keep_rotation():
    pos = jnp.asarray(np.random.RandomState(1).rand(2, 64, 3).astype(np.float32))
    perms = build_erwin_perms(
        pos, ball_sizes=(16, 8), strides=(2,), rotate_angle=45.0
    )
    assert all(p is not None for p in perms.rot_perms)
