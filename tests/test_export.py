"""AOT export / serving artifacts (haet_tpu.export).

The reference has no deployment story (its eval scripts re-import the torch
module + state_dict); the exported StableHLO artifact must reproduce the
eval-mode forward exactly, survive a serialize/deserialize round trip, and
refuse shape mismatches instead of silently padding.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from haet_tpu.export import (
    ExportedModel,
    ServingBundle,
    load_artifact,
    save_artifact,
)
from haet_tpu.models import HAETransolver_Irregular_Mesh


def _tiny():
    model = HAETransolver_Irregular_Mesh(
        space_dim=3, n_layers=1, n_hidden=32, n_head=2, slice_num=8,
        fun_dim=1, out_dim=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 3))
    fx = jax.random.normal(jax.random.PRNGKey(2), (2, 256, 1))
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    return model, v, x, fx


def test_artifact_round_trip_matches_eval_forward(tmp_path):
    model, v, x, fx = _tiny()
    p = save_artifact(str(tmp_path / "art"), model, v, (x, fx))
    assert sorted(os.listdir(p)) == ["apply.stablehlo.bin", "manifest.json"]
    em = load_artifact(p)
    assert isinstance(em, ExportedModel)
    ref = model.apply(v, x, fx)  # eval mode == exported semantics
    np.testing.assert_allclose(np.asarray(em(v, x, fx)), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    man = json.load(open(os.path.join(p, "manifest.json")))
    assert man["input_shapes"] == [[2, 256, 3], [2, 256, 1]]


def test_artifact_refuses_shape_mismatch(tmp_path):
    """No silent padding: duplicate points would change the rep-slice
    statistics, and batch size is part of the program (the Erwin hierarchy
    depth follows the flat leaf count B*N, mirroring balltree.pyx:643)."""
    model, v, x, fx = _tiny()
    em = load_artifact(save_artifact(str(tmp_path / "art"), model, v, (x, fx)))
    with pytest.raises(ValueError, match="shape mismatch"):
        em(v, x[:, :128], fx[:, :128])  # wrong N
    with pytest.raises(ValueError, match="shape mismatch"):
        em(v, x[:1], fx[:1])  # wrong B


def test_batch_size_is_part_of_the_program():
    """Document WHY export pins B: the Erwin rotated-tree depth follows the
    FLAT leaf count (targets = log2(B*N/ball_size), mirroring the
    reference's batched tree, balltree.pyx:643), so the same sample inside
    a bigger batch is grouped by a deeper rotated partition — batch size
    changes the compiled program's structure, not just its shapes. If this
    ever becomes batch-independent, the export module's static-B rationale
    (and this test) should be revisited."""
    from haet_tpu.ops.ball_groups import build_erwin_perms

    rng = np.random.RandomState(0)
    pos1 = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
    pos4 = jnp.tile(pos1, (4, 1, 1))  # same sample, batched
    kw = dict(ball_sizes=(32,), strides=(2,), rotate_angle=45.0)
    p1 = build_erwin_perms(pos1, **kw)
    p4 = build_erwin_perms(pos4, **kw)
    # B=1: target = log2(64/32) = 1 split; B=4: log2(256/32) = 3 splits —
    # the rotated grouping of the identical sample differs.
    assert p1.rot_perms[0] is not None and p4.rot_perms[0] is not None
    assert not np.array_equal(np.asarray(p1.rot_perms[0][0]),
                              np.asarray(p4.rot_perms[0][0]))


def test_serving_bundle_dispatch(tmp_path):
    model, v, x, fx = _tiny()
    save_artifact(str(tmp_path / "b2"), model, v, (x, fx))
    save_artifact(str(tmp_path / "b1"), model, v, (x[:1], fx[:1]))
    bundle = ServingBundle.load(str(tmp_path))
    assert len(bundle.shapes()) == 2
    out = bundle.predict(v, x[:1], fx[:1])
    assert out.shape == (1, 256, 2)
    with pytest.raises(ValueError, match="no artifact"):
        bundle.predict(v, x[:, :128], fx[:, :128])


def test_export_multi_platform_and_fx_none(tmp_path):
    """Cross-platform lowering (a CPU host can build TPU artifacts) and the
    fx=None (always-placeholder) model path."""
    model = HAETransolver_Irregular_Mesh(
        space_dim=3, n_layers=1, n_hidden=32, n_head=2, slice_num=8,
        fun_dim=0, out_dim=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 3))
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x, None)
    p = save_artifact(str(tmp_path / "art"), model, v, (x, None),
                      platforms=("cpu", "tpu"))
    em = load_artifact(p)
    assert set(em.manifest["platforms"]) == {"cpu", "tpu"}
    ref = model.apply(v, x, None)
    np.testing.assert_allclose(np.asarray(em(v, x, None)), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
