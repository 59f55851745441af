"""Pipeline parallelism (GPipe over the Transolver block stack).

Numerics contract: a pipelined model IS the plain model — same math, merely
executed stage-by-stage over a pp mesh axis — so every test here compares
against ``model.apply`` on the same weights. The reference has no
distributed path at all (SURVEY.md §2.7); pipeline parity is pinned against
our own oracle-tested single-device model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from haet_tpu.models import (
    HAETransolverIrregularMesh,
    HAETransolverStructuredMesh2D,
)
from haet_tpu.parallel import PipelinedModel, make_pp_mesh
from haet_tpu.parallel.pipeline import merge_variables, split_variables


def _model(**over):
    kw = dict(space_dim=3, fun_dim=1, out_dim=2, n_hidden=32, n_layers=4,
              n_head=4, slice_num=16, mlp_ratio=1, rotate=45)
    kw.update(over)
    return HAETransolverIrregularMesh(**kw)


def _data(B=4, N=64, fun_dim=1, out_dim=2, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    fx = jnp.asarray(rng.randn(B, N, fun_dim).astype(np.float32))
    y = jnp.asarray(rng.randn(B, N, out_dim).astype(np.float32))
    return x, fx, y


def _max_diff(a, b):
    d = jax.tree_util.tree_map(
        lambda u, v: float(jnp.max(jnp.abs(u - v))), a, b)
    return max(jax.tree_util.tree_leaves(d))


def test_split_merge_round_trip():
    model = _model()
    x, fx, _ = _data()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    pvars = split_variables(variables, model.n_layers)
    # stacked layout: every layer leaf leads with [L]
    for leaf in jax.tree_util.tree_leaves(pvars["params"]["layers"]):
        assert leaf.shape[0] == model.n_layers
    back = merge_variables(pvars, model.n_layers)
    assert _max_diff(back["params"], dict(variables["params"])) == 0.0
    assert _max_diff(back["batch_stats"], dict(variables["batch_stats"])) == 0.0


def test_pipeline_eval_parity_dp_pp():
    """dp2 x pp4 mesh, 2 microbatches: pipelined eval == plain eval."""
    model = _model()
    x, fx, _ = _data()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    ref = model.apply(variables, x, fx)

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "pp"))
    pm = PipelinedModel(model, mesh, num_microbatches=2, dp_axis="dp")
    pvars = pm.to_pipeline_variables(variables)
    with mesh:
        out = jax.jit(lambda v, a, b: pm.apply(v, a, b))(pvars, x, fx)
    assert out.shape == ref.shape
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-5


def test_pipeline_train_parity_m1():
    """pp-only mesh, 1 microbatch: train outputs AND BatchNorm running
    stats match the plain model exactly (same batch statistics)."""
    model = _model()
    x, fx, _ = _data()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    ref, ref_mut = model.apply(
        variables, x, fx, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})

    mesh = make_pp_mesh(n_dp=1, n_pp=4, devices=jax.devices()[:4])
    pm = PipelinedModel(model, mesh, num_microbatches=1, dp_axis="dp")
    pvars = pm.to_pipeline_variables(variables)
    with mesh:
        out, mut = jax.jit(lambda v, a, b: pm.apply(
            v, a, b, train=True, mutable=["batch_stats"]))(pvars, x, fx)
    assert float(jnp.max(jnp.abs(out - ref))) < 5e-5
    merged = merge_variables(
        {"params": pvars["params"], **mut}, model.n_layers)
    assert _max_diff(merged["batch_stats"], dict(ref_mut["batch_stats"])) < 1e-6


def test_pipeline_grad_parity():
    """Whole gradient tree through the pipelined step == plain grads."""
    model = _model()
    x, fx, y = _data()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    bs = variables["batch_stats"]

    def loss_plain(params):
        out = model.apply({"params": params, "batch_stats": bs}, x, fx)
        return jnp.mean((out - y) ** 2)

    g_plain = jax.grad(loss_plain)(variables["params"])

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "pp"))
    pm = PipelinedModel(model, mesh, num_microbatches=2, dp_axis="dp")
    pvars = pm.to_pipeline_variables(variables)

    def loss_pp(pparams):
        out = pm.apply(
            {"params": pparams, "batch_stats": pvars["batch_stats"]}, x, fx)
        return jnp.mean((out - y) ** 2)

    with mesh:
        g_pp = jax.jit(jax.grad(loss_pp))(pvars["params"])
    g_std = merge_variables({"params": g_pp}, model.n_layers)["params"]
    assert _max_diff(g_std, dict(g_plain)) < 1e-4


def test_pipeline_remat_matches_no_remat():
    model = _model()
    x, fx, y = _data()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    mesh = make_pp_mesh(n_dp=1, n_pp=4, devices=jax.devices()[:4])
    outs = {}
    for remat in (True, False):
        pm = PipelinedModel(model, mesh, num_microbatches=2,
                            dp_axis="dp", remat=remat)
        pvars = pm.to_pipeline_variables(variables)

        def loss(pparams):
            out = pm.apply({"params": pparams,
                            "batch_stats": pvars["batch_stats"]}, x, fx)
            return jnp.mean((out - y) ** 2)

        with mesh:
            outs[remat] = jax.jit(jax.grad(loss))(pvars["params"])
    assert _max_diff(outs[True], outs[False]) < 1e-6


def test_pipeline_dropout_stage_count_invariance():
    """Dropout masks are keyed by (global layer, microbatch), so the SAME
    masks apply whatever the stage count: S=2 and S=4 agree."""
    model = _model(dropout=0.1)
    x, fx, _ = _data()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    outs = []
    for n_pp in (2, 4):
        mesh = make_pp_mesh(n_dp=1, n_pp=n_pp, devices=jax.devices()[:n_pp])
        pm = PipelinedModel(model, mesh, num_microbatches=2, dp_axis="dp")
        pvars = pm.to_pipeline_variables(variables)
        with mesh:
            out, _ = jax.jit(lambda v, a, b: pm.apply(
                v, a, b, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(7)}))(pvars, x, fx)
        outs.append(np.asarray(jax.device_get(out)))
    assert float(np.max(np.abs(outs[0] - outs[1]))) < 1e-5


def test_pipeline_time_input_and_unified_pos():
    """The pre-stage restatement (unified_pos grid, placeholder, time
    embedding) matches the model's own — 2D structured variant."""
    model = HAETransolverStructuredMesh2D(
        space_dim=2, fun_dim=1, out_dim=1, H=8, W=8, unified_pos=True,
        ref=4, Time_Input=True, n_layers=4, n_hidden=32, n_head=4,
        slice_num=16, mlp_ratio=1, rotate=45)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 64, 2).astype(np.float32))
    fx = jnp.asarray(rng.randn(4, 64, 1).astype(np.float32))
    T = jnp.ones((4, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx, T)
    ref = model.apply(variables, x, fx, T)
    mesh = make_pp_mesh(n_dp=2, n_pp=4)
    pm = PipelinedModel(model, mesh, num_microbatches=2, dp_axis="dp")
    pvars = pm.to_pipeline_variables(variables)
    with mesh:
        out = jax.jit(lambda v, a, b, t: pm.apply(v, a, b, t))(
            pvars, x, fx, T)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


def test_pipeline_eval_parity_structured_3d():
    """The 3D structured variant (Conv3d tokenizer, ref^3 unified pos)
    through the pipeline.

    At M>1 the reference's BATCH-GLOBAL pseudo-position min-max
    (physics_attention.py: feat.min/max over the flat [B*H*G] batch,
    mirroring StructuredMesh2D.py:228-234) is computed per microbatch —
    the rescale is monotone so the median-split ball grouping is
    IDENTICAL, but pe_proj / distance-bias inputs shift, so M>1 parity
    is approximate (variant-dependent; measured ~7e-3 here). At M=1,
    dp=1 the pipeline is exact — assert both."""
    from haet_tpu.models import HAETransolverStructuredMesh3D

    model = HAETransolverStructuredMesh3D(
        space_dim=3, fun_dim=1, out_dim=1, H=4, W=4, D=4, n_layers=4,
        n_hidden=32, n_head=4, slice_num=16, mlp_ratio=1, rotate=45)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    fx = jnp.asarray(rng.randn(2, 64, 1).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    ref = model.apply(variables, x, fx)

    mesh1 = make_pp_mesh(n_dp=1, n_pp=4, devices=jax.devices()[:4])
    pm1 = PipelinedModel(model, mesh1, num_microbatches=1, dp_axis="dp")
    pvars = pm1.to_pipeline_variables(variables)
    with mesh1:
        out1 = jax.jit(lambda v, a, b: pm1.apply(v, a, b))(pvars, x, fx)
    assert float(jnp.max(jnp.abs(out1 - ref))) < 1e-4  # exact regime

    mesh = make_pp_mesh(n_dp=2, n_pp=4)
    pm = PipelinedModel(model, mesh, num_microbatches=2, dp_axis="dp")
    with mesh:
        out = jax.jit(lambda v, a, b: pm.apply(v, a, b))(pvars, x, fx)
    assert float(jnp.max(jnp.abs(out - ref))) < 5e-2  # microbatched min-max


def test_pipeline_trainer_integration():
    """Trainer(model=PipelinedModel(...)) trains end to end; the per-layer
    parameter stacks and their Adam moments are ACTUALLY sharded over pp."""
    from haet_tpu.train.trainer import Trainer
    from haet_tpu.utils.config import TrainConfig

    model = _model()
    x, fx, y = _data(B=8)
    mesh = make_pp_mesh(n_dp=2, n_pp=4)
    pm = PipelinedModel(model, mesh, num_microbatches=2, dp_axis="dp")
    trainer = Trainer(
        model=pm,
        loss_fn=lambda out, b: (
            jnp.mean((out.astype(jnp.float32) - b["y"]) ** 2), {}),
        cfg=TrainConfig(lr=1e-3, epochs=1, batch_size=8),
        total_steps=4,
        batch_args=lambda b: (b["x"], b["fx"]),
        mesh=mesh,
    )
    batch = {"x": x, "fx": fx, "y": y}
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    # the pp sharding is real: layer stacks live stage-sharded
    layer_leaf = jax.tree_util.tree_leaves(state.params["layers"])[0]
    assert layer_leaf.sharding.spec == P("pp")
    pre_leaf = jax.tree_util.tree_leaves(state.params["pre"])[0]
    assert pre_leaf.sharding.spec == P()

    losses = []
    for i in range(4):
        state, metrics = trainer.train_step(
            state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_pipeline_trainer_step_matches_plain():
    """One full Trainer step (fwd+bwd+Adam) pipelined == unpipelined."""
    from haet_tpu.train.trainer import Trainer
    from haet_tpu.utils.config import TrainConfig

    model = _model()
    x, fx, y = _data()
    batch = {"x": x, "fx": fx, "y": y}
    cfg = TrainConfig(lr=1e-3, epochs=1, batch_size=4)
    loss_fn = lambda out, b: (  # noqa: E731
        jnp.mean((out.astype(jnp.float32) - b["y"]) ** 2), {})
    kw = dict(loss_fn=loss_fn, cfg=cfg, total_steps=4,
              batch_args=lambda b: (b["x"], b["fx"]))

    t_plain = Trainer(model=model, **kw)
    s_plain = t_plain.init_state(jax.random.PRNGKey(0), batch)

    mesh = make_pp_mesh(n_dp=1, n_pp=4, devices=jax.devices()[:4])
    pm = PipelinedModel(model, mesh, num_microbatches=1, dp_axis="dp")
    t_pp = Trainer(model=pm, mesh=mesh, **kw)
    s_pp = t_pp.init_state(jax.random.PRNGKey(0), batch)

    s_plain, m_plain = t_plain.train_step(s_plain, batch, jax.random.PRNGKey(1))
    s_pp, m_pp = t_pp.train_step(s_pp, batch, jax.random.PRNGKey(1))

    assert abs(float(m_plain["loss"]) - float(m_pp["loss"])) < 1e-5
    merged = merge_variables({"params": jax.device_get(s_pp.params)},
                             model.n_layers)["params"]
    # Adam turns f32-noise gradient differences into ~lr-scale update
    # differences in low-|grad| coordinates (observed 7e-5 at lr=1e-3);
    # the loss equality above is the tight functional check.
    assert _max_diff(merged, dict(jax.device_get(s_plain.params))) < 3e-4


def test_pipeline_validations():
    model = _model()
    mesh = make_pp_mesh(n_dp=2, n_pp=4)

    with pytest.raises(ValueError, match="divisible by the"):
        PipelinedModel(_model(n_layers=3), mesh)
    with pytest.raises(ValueError, match="no 'pp' axis"):
        from haet_tpu.parallel import make_mesh
        PipelinedModel(model, make_mesh(n_dp=8, n_tp=1))
    with pytest.raises(ValueError, match="shard_axes"):
        PipelinedModel(_model(shard_axes=("dp", "tp")), mesh)
    with pytest.raises(ValueError, match="use_pallas"):
        PipelinedModel(_model(use_pallas="auto"), mesh)

    x, fx, _ = _data(B=4)
    pm2 = PipelinedModel(_model(dropout=0.1), mesh, dp_axis="dp")
    pvars = pm2.init(jax.random.PRNGKey(0), x, fx)
    with pytest.raises(ValueError, match="dropout"):
        with mesh:
            pm2.apply(pvars, x, fx, train=True, mutable=["batch_stats"])


def test_pipeline_partial_batch_padding():
    """A batch that doesn't divide microbatches x dp (the trailing partial
    batch of an epoch) is transparently padded and sliced — outputs match
    the plain model on the real rows."""
    model = _model()
    x, fx, _ = _data(B=3)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    ref = model.apply(variables, x, fx)
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "pp"))
    pm = PipelinedModel(model, mesh, num_microbatches=2, dp_axis="dp")
    pvars = pm.to_pipeline_variables(variables)
    with mesh:
        out = jax.jit(lambda v, a, b: pm.apply(v, a, b))(pvars, x, fx)
    assert out.shape == ref.shape
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-5


def test_pipeline_composes_with_accum():
    """accum_steps=2 under a pp-only mesh == accum_steps=2 unpipelined
    (dp=1 keeps the BN microbatch semantics identical, so the whole
    Trainer step must agree)."""
    from haet_tpu.train.trainer import Trainer
    from haet_tpu.utils.config import TrainConfig

    model = _model()
    x, fx, y = _data()
    batch = {"x": x, "fx": fx, "y": y}
    loss_fn = lambda out, b: (  # noqa: E731
        jnp.mean((out.astype(jnp.float32) - b["y"]) ** 2), {})
    kw = dict(loss_fn=loss_fn,
              cfg=TrainConfig(lr=1e-3, epochs=1, batch_size=4,
                              accum_steps=2),
              total_steps=4, batch_args=lambda b: (b["x"], b["fx"]))

    t_plain = Trainer(model=model, **kw)
    s_plain = t_plain.init_state(jax.random.PRNGKey(0), batch)
    s_plain, m_plain = t_plain.train_step(s_plain, batch,
                                          jax.random.PRNGKey(1))

    mesh = make_pp_mesh(n_dp=1, n_pp=4, devices=jax.devices()[:4])
    pm = PipelinedModel(model, mesh, num_microbatches=1, dp_axis="dp")
    t_pp = Trainer(model=pm, mesh=mesh, **kw)
    s_pp = t_pp.init_state(jax.random.PRNGKey(0), batch)
    s_pp, m_pp = t_pp.train_step(s_pp, batch, jax.random.PRNGKey(1))

    assert abs(float(m_plain["loss"]) - float(m_pp["loss"])) < 1e-5
    merged = merge_variables({"params": jax.device_get(s_pp.params)},
                             model.n_layers)["params"]
    assert _max_diff(merged, dict(jax.device_get(s_plain.params))) < 3e-4


def test_pipeline_driver_glue(tmp_path, capsys):
    """The --pp CLI path end to end: make_mesh_from_args builds the
    (dp, pp) mesh, maybe_pipeline wraps the model, and Trainer.fit runs
    epochs/eval/checkpoints through the pipelined apply."""
    import argparse
    import os
    import sys

    bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks")
    if bench not in sys.path:
        sys.path.insert(0, bench)
    import exp_darcy

    args = argparse.Namespace(
        lr=1e-3, epochs=2, batch_size=2, n_hidden=32, n_layers=2, n_heads=4,
        slice_num=16, mlp_ratio=1, downsample=8, unified_pos=0, ntrain=4,
        ntest=2, bf16=0, data_path=str(tmp_path / "absent"),
        out_dir=str(tmp_path), showcase=False, resume=False,
        dp=2, tp=1, pp=2, pp_microbatches=1, smoke=False,
    )
    rel = exp_darcy.main(args)
    out = capsys.readouterr().out
    assert "[mesh] dp=2 pp=2" in out
    assert np.isfinite(rel)


def test_trailing_partial_batch_through_trainer():
    """The REAL trailing-batch path: batch_iter(drop_last=False) hands
    Trainer.train_step a batch whose size doesn't divide dp.
    shard_batch's replicated fallback + the pipeline's internal padding
    must run it, for both the plain-dp and the pipelined model, matching
    the meshless step's loss."""
    from haet_tpu.train.trainer import Trainer
    from haet_tpu.utils.config import TrainConfig

    model = _model()
    x, fx, y = _data(B=3)
    batch = {"x": x, "fx": fx, "y": y}
    loss_fn = lambda out, b: (  # noqa: E731
        jnp.mean((out.astype(jnp.float32) - b["y"]) ** 2), {})
    kw = dict(loss_fn=loss_fn,
              cfg=TrainConfig(lr=1e-3, epochs=1, batch_size=4),
              total_steps=4, batch_args=lambda b: (b["x"], b["fx"]))

    t_ref = Trainer(model=model, **kw)
    s_ref = t_ref.init_state(jax.random.PRNGKey(0), batch)
    _, m_ref = t_ref.train_step(s_ref, batch, jax.random.PRNGKey(1))

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "pp"))
    pm = PipelinedModel(model, mesh, num_microbatches=2, dp_axis="dp")
    t_pp = Trainer(model=pm, mesh=mesh, **kw)
    s_pp = t_pp.init_state(jax.random.PRNGKey(0), batch)
    _, m_pp = t_pp.train_step(s_pp, batch, jax.random.PRNGKey(1))
    # train-mode BN statistics are per-dp-shard under the pipeline
    # (documented semantics) — the loss is close, not bitwise
    assert np.isfinite(float(m_pp["loss"]))
    assert abs(float(m_ref["loss"]) - float(m_pp["loss"])) < 0.05 * abs(
        float(m_ref["loss"]))

    from haet_tpu.parallel import make_mesh
    t_dp = Trainer(model=model, mesh=make_mesh(n_dp=8, n_tp=1), **kw)
    s_dp = t_dp.init_state(jax.random.PRNGKey(0), batch)
    _, m_dp = t_dp.train_step(s_dp, batch, jax.random.PRNGKey(1))
    assert abs(float(m_ref["loss"]) - float(m_dp["loss"])) < 1e-5


def test_pipeline_composes_with_train_steps_scan():
    """The K-steps-per-dispatch lax.scan (Trainer.train_steps) traces the
    pipelined shard_map inside the scan body and matches sequential
    train_step calls."""
    from haet_tpu.train.trainer import Trainer
    from haet_tpu.utils.config import TrainConfig

    model = _model()
    x, fx, y = _data(B=4)
    loss_fn = lambda out, b: (  # noqa: E731
        jnp.mean((out.astype(jnp.float32) - b["y"]) ** 2), {})
    kw = dict(loss_fn=loss_fn,
              cfg=TrainConfig(lr=1e-3, epochs=1, batch_size=4),
              total_steps=4, batch_args=lambda b: (b["x"], b["fx"]))
    mesh = make_pp_mesh(n_dp=2, n_pp=4)
    K = 2
    batches = [{"x": x, "fx": fx, "y": y} for _ in range(K)]

    pm = PipelinedModel(model, mesh, num_microbatches=2, dp_axis="dp")
    t1 = Trainer(model=pm, mesh=mesh, **kw)
    s1 = t1.init_state(jax.random.PRNGKey(0), {"x": x, "fx": fx, "y": y})
    rng = jax.random.PRNGKey(1)
    s_scan, metrics = t1.train_steps(s1, batches, rng)
    assert np.isfinite(np.asarray(metrics["loss"])).all()

    t2 = Trainer(model=pm, mesh=mesh, **kw)
    s2 = t2.init_state(jax.random.PRNGKey(0), {"x": x, "fx": fx, "y": y})
    r = rng
    for i in range(K):
        r, sub = jax.random.split(r)
        s2, _ = t2.train_step(s2, {"x": x, "fx": fx, "y": y}, sub)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        jax.device_get(s_scan.params), jax.device_get(s2.params))
    assert max(jax.tree_util.tree_leaves(d)) < 2e-5


def test_pipeline_custom_loop_driver_plas(tmp_path, capsys):
    """--pp through the CUSTOM-loop driver exp_plas: the pipelined apply
    runs inside the train-mode lax.scan over T queries (BN stats carried)
    AND under the eval vmap over T (vmap-of-shard_map), with Time_Input.
    exp_ns shares the same custom_loop_mesh scaffolding."""
    import argparse
    import os
    import sys

    bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks")
    if bench not in sys.path:
        sys.path.insert(0, bench)
    import exp_plas
    from _common import shrink_for_smoke

    args = argparse.Namespace(
        lr=1e-3, epochs=2, weight_decay=1e-5, batch_size=2, n_hidden=32,
        n_layers=2, n_heads=4, slice_num=16, mlp_ratio=1, dropout=0.0,
        max_grad_norm=None, accum_steps=1, unified_pos=0, ref=8, ntrain=8,
        ntest=4, bf16=0, mu_bf16=0, use_checkpoint=0,
        data_path=str(tmp_path / "absent"), out_dir=str(tmp_path),
        save_name="plas", smoke=True, dp=2, tp=1, pp=2, pp_microbatches=1,
    )
    shrink_for_smoke(args)
    args.n_layers = 2
    rel = exp_plas.main(args)
    out = capsys.readouterr().out
    assert "[mesh] dp=2 pp=2" in out
    assert np.isfinite(rel)


def test_pipeline_train_then_plain_eval_export(tmp_path, capsys):
    """The production story end to end: car_train --pp writes a
    pipeline-layout checkpoint; car_eval (plain model) auto-converts it,
    evaluates, and exports an AOT serving artifact from the converted
    weights."""
    import argparse
    import os
    import sys

    bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks")
    if bench not in sys.path:
        sys.path.insert(0, bench)
    import car_eval
    import car_train

    out_dir = str(tmp_path / "runs")
    targs = argparse.Namespace(
        data_dir=str(tmp_path / "absent"), save_dir=None,
        preprocessed=False, fold_id=0, epochs=2, lr=1e-3, weight=0.5,
        n_hidden=32, n_layers=2, slice_num=16, bf16=0, out_dir=out_dir,
        prefetch=0, dp=1, tp=1, pp=2, pp_microbatches=1, resume=False,
        smoke=True,
    )
    metrics = car_train.main(targs)
    out = capsys.readouterr().out
    assert "[mesh] dp=1 pp=2" in out
    assert np.isfinite(metrics["rel_l2_press"])

    artifact = str(tmp_path / "artifact")
    eargs = argparse.Namespace(
        data_dir=str(tmp_path / "absent"), save_dir=None,
        preprocessed=False, fold_id=0,
        checkpoint_dir=os.path.join(out_dir, "checkpoints", "car"),
        torch_checkpoint=None, which="best", n_hidden=32, n_layers=2,
        slice_num=16, visualize=False, max_slice_figs=None, scatter=False,
        save_preds=False, out_dir=out_dir, export_artifact=artifact,
        smoke=True,
    )
    car_eval.main(eargs)
    out = capsys.readouterr().out
    assert "converted a --pp pipeline-layout checkpoint" in out
    import glob
    assert glob.glob(os.path.join(artifact, "b1_n*", "manifest.json"))
    """A --pp run's checkpoint (pipeline layout) evaluates on the PLAIN
    model via restore_raw + merge_variables — the car_eval conversion
    path."""
    from haet_tpu.train import Checkpointer
    from haet_tpu.train.trainer import Trainer
    from haet_tpu.utils.config import TrainConfig

    model = _model()
    x, fx, y = _data()
    batch = {"x": x, "fx": fx, "y": y}
    mesh = make_pp_mesh(n_dp=1, n_pp=4, devices=jax.devices()[:4])
    pm = PipelinedModel(model, mesh, num_microbatches=1, dp_axis="dp")
    t_pp = Trainer(
        model=pm,
        loss_fn=lambda out, b: (
            jnp.mean((out.astype(jnp.float32) - b["y"]) ** 2), {}),
        cfg=TrainConfig(lr=1e-3, epochs=1, batch_size=4),
        total_steps=2,
        batch_args=lambda b: (b["x"], b["fx"]),
        mesh=mesh,
    )
    s = t_pp.init_state(jax.random.PRNGKey(0), batch)
    s, _ = t_pp.train_step(s, batch, jax.random.PRNGKey(1))

    ck = Checkpointer(str(tmp_path))
    ck.save_last(s, epoch=0)
    ck.wait()

    raw = ck.restore_raw("last")
    assert raw is not None and "layers" in raw["params"]
    merged = merge_variables(
        {"params": raw["params"], "batch_stats": raw["batch_stats"]},
        model.n_layers)
    out_plain = model.apply(
        {"params": merged["params"], "batch_stats": merged["batch_stats"]},
        x, fx)
    with mesh:
        out_pp = pm.apply(
            {"params": s.params, "batch_stats": s.batch_stats}, x, fx)
    assert float(jnp.max(jnp.abs(
        out_plain - jax.device_get(out_pp)))) < 2e-5


def test_pipeline_composes_with_head_tp():
    """pp x tp COMPOSES (VERDICT r3 #4): a head-TP model
    (shard_axes=(None, 'tp')) wrapped in PipelinedModel on a
    (dp=1, pp=2, tp=2) mesh matches the plain unsharded model exactly at
    M=1 — forward AND whole-tree gradients. Mechanism: the pipeline body
    is manual over (pp, dp) only (jax.shard_map axis_names), so the
    model's head-axis constraints stay XLA-automatic inside each stage."""
    plain = _model()
    tp_model = _model(shard_axes=(None, "tp"))
    x, fx, _ = _data(B=2)
    variables = jax.jit(plain.init)(jax.random.PRNGKey(0), x, fx)
    pvars = split_variables(variables, plain.n_layers)

    mesh = make_pp_mesh(n_dp=1, n_pp=2, n_tp=2, devices=jax.devices()[:4])
    pm = PipelinedModel(tp_model, mesh, num_microbatches=1)

    rng = np.random.RandomState(7)
    r = jnp.asarray(rng.randn(*_data(B=2)[0].shape[:2], 2)
                    .astype(np.float32))

    def loss_pp(pv):
        return jnp.sum(pm.apply(pv, x, fx) * r)

    def loss_plain(v):
        return jnp.sum(plain.apply(v, x, fx) * r)

    with mesh:
        out_pp = jax.jit(lambda pv: pm.apply(pv, x, fx))(pvars)
        g_pp = jax.jit(jax.grad(loss_pp))(pvars)
    out = plain.apply(variables, x, fx)
    g = jax.grad(loss_plain)(variables)

    np.testing.assert_allclose(np.asarray(out_pp), np.asarray(out),
                               rtol=2e-5, atol=2e-5)
    g_split = split_variables(g, plain.n_layers)
    scale = max(float(jnp.abs(l).max())
                for l in jax.tree_util.tree_leaves(g_split["params"]))
    assert _max_diff(g_pp["params"], g_split["params"]) < 3e-5 * scale


def test_pipeline_tp_validation_errors():
    mesh = make_pp_mesh(n_dp=1, n_pp=2, n_tp=2, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="collides"):
        PipelinedModel(_model(shard_axes=(None, "pp")), mesh)
    with pytest.raises(ValueError, match="not in the mesh"):
        PipelinedModel(_model(shard_axes=(None, "nope")), mesh)
    with pytest.raises(ValueError, match="divisible"):
        # n_head=3 not divisible by tp=2
        PipelinedModel(
            _model(n_head=3, n_hidden=33, shard_axes=(None, "tp")), mesh)
    with pytest.raises(ValueError, match="batch axis"):
        PipelinedModel(_model(shard_axes=("other", "tp")), mesh,
                       dp_axis=None)
