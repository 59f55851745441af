"""Trainer with a device mesh: data-parallel fit on the simulated 8-chip
CPU mesh produces the same result as single-device training.

Whole-param-tree comparisons at f32 tolerances (conftest pins matmul
precision to "highest"): a subtly wrong gradient psum shows up in every
leaf after an Adam step, so every leaf is checked."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from haet_tpu.parallel import make_mesh
from haet_tpu.train import Trainer
from haet_tpu.utils.config import ModelConfig, TrainConfig


def _setup(mesh=None, shard_axes=None, accum_steps=1):
    cfg = ModelConfig(variant="irregular", space_dim=3, fun_dim=1, out_dim=1,
                      n_layers=1, n_hidden=32, n_head=4, slice_num=16,
                      rotate=0, shard_axes=shard_axes)
    model = cfg.build()
    trainer = Trainer(
        model=model,
        loss_fn=lambda out, b: (jnp.mean((out - b["y"]) ** 2), {}),
        cfg=TrainConfig(lr=1e-3, epochs=1, batch_size=8, schedule="constant",
                        weight_decay=0.0, accum_steps=accum_steps),
        total_steps=10,
        batch_args=lambda b: (b["x"], b["fx"]),
        mesh=mesh,
    )
    rng = np.random.RandomState(0)
    batch = {
        "x": rng.randn(8, 64, 3).astype(np.float32),
        "fx": rng.randn(8, 64, 1).astype(np.float32),
        "y": rng.randn(8, 64, 1).astype(np.float32),
    }
    return trainer, batch


def _assert_tree_close(t1, t2, rtol, atol):
    """Every leaf of the param tree, not just the first."""
    leaves1, tree1 = jax.tree_util.tree_flatten(t1)
    leaves2, tree2 = jax.tree_util.tree_flatten(t2)
    assert tree1 == tree2
    for path_leaf, (a, b) in zip(
        jax.tree_util.tree_leaves_with_path(t1), zip(leaves1, leaves2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path_leaf[0]),
        )


def _assert_params_close(p1, p2, g_ref, rtol=1e-4, atol=2e-5):
    """Compare post-Adam params leaf-wise, masking leaves with (near-)zero
    true gradient: there Adam's m/(sqrt(v)+eps) is a ratio of pure
    reduction-order noise and takes full-lr steps in arbitrary directions
    on BOTH sides — no tolerance is meaningful, and no psum bug can hide in
    a leaf that receives no training signal (those are covered by the tight
    gradient comparison instead). Masked leaves are still bounded by the
    maximum plausible 2-step Adam movement (bias-corrected updates can
    transiently exceed lr; observed ~4e-3 at lr=1e-3)."""
    for (path, a), (_, b), (_, g) in zip(
        jax.tree_util.tree_leaves_with_path(p1),
        jax.tree_util.tree_leaves_with_path(p2),
        jax.tree_util.tree_leaves_with_path(g_ref),
    ):
        name = jax.tree_util.keystr(path)
        if float(np.max(np.abs(np.asarray(g)))) < 1e-6:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-2,
                err_msg=f"{name} (no-signal leaf, Adam-noise bound)")
        else:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
                err_msg=name)


def _run_two_steps(trainer, batch):
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, m1 = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    state, m2 = trainer.train_step(state, batch, jax.random.PRNGKey(2))
    return state, m1, m2


def _grad_tree(trainer, batch, mesh=None, batch_spec=None):
    """Whole-tree gradients of the trainer's loss at the (deterministic)
    init params — gradients are exactly what a cross-device psum touches,
    and unlike post-Adam params they carry no eps-normalized noise
    amplification, so they can be compared at f32-tight tolerances."""
    from jax.sharding import NamedSharding

    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    def loss(params, b):
        # TRAIN mode, like the real step: BatchNorm's batch-centering
        # kills some bias gradients exactly (e.g. a SwiGLU output bias
        # right before a pooling BN), and the no-signal mask in
        # _assert_params_close must see the same zeros the optimizer saw.
        out, _ = trainer._apply(
            params, state.batch_stats, b, True, jax.random.PRNGKey(1)
        )
        return trainer.loss_fn(out, b)[0]

    if mesh is None:
        return jax.jit(jax.grad(loss))(state.params, batch)
    sharded = {
        k: jax.device_put(v, NamedSharding(mesh, batch_spec))
        for k, v in batch.items()
    }
    with mesh:
        return jax.jit(jax.grad(loss))(state.params, sharded)


def test_dp_training_matches_single_device():
    t1, batch = _setup(mesh=None)
    s1, m1, m1b = _run_two_steps(t1, batch)

    t2, _ = _setup(mesh=make_mesh(n_dp=8, n_tp=1))
    s2, m2, m2b = _run_two_steps(t2, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m1b["loss"]), float(m2b["loss"]),
                               rtol=1e-6)
    # Gradients tree-wide at f32-tight tolerance: a subtly wrong dp psum
    # shifts every leaf here.
    g1 = _grad_tree(t1, batch)
    g2 = _grad_tree(t2, batch, make_mesh(n_dp=8, n_tp=1), P("dp"))
    _assert_tree_close(g1, g2, rtol=1e-5, atol=1e-6)
    _assert_params_close(s1.params, s2.params, g1)


def test_dp_tp_mesh_matches_single_device():
    """Combined dp x tp mesh with REAL head tensor parallelism
    (shard_axes constraints active) == single-device numerics."""
    t1, batch = _setup(mesh=None)
    s1, m1, _ = _run_two_steps(t1, batch)

    t2, _ = _setup(mesh=make_mesh(n_dp=4, n_tp=2), shard_axes=("dp", "tp"))
    s2, m2, _ = _run_two_steps(t2, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    g1 = _grad_tree(t1, batch)
    g2 = _grad_tree(t2, batch, make_mesh(n_dp=4, n_tp=2), P("dp"))
    _assert_tree_close(g1, g2, rtol=1e-5, atol=1e-6)
    _assert_params_close(s1.params, s2.params, g1)


def test_dp_cp_combined_mesh_matches_single_device():
    """Combined dp x cp mesh: batch over dp AND the points axis over cp.
    The slice/deslice ops are reductions over N, exact under point
    sharding (SURVEY.md §2.7 'context parallel')."""
    t1, batch = _setup(mesh=None)
    s1, m1, _ = _run_two_steps(t1, batch)

    mesh = make_mesh(n_dp=4, n_tp=2)  # second axis doubles as the cp axis
    t2, _ = _setup(mesh=mesh)
    # Override the Trainer's default dp-only batch placement: points over tp.
    sharded = {
        k: jax.device_put(v, NamedSharding(mesh, P("dp", "tp")))
        for k, v in batch.items()
    }
    s2 = t2.init_state(jax.random.PRNGKey(0), batch)
    with mesh:
        s2, m2 = t2._train_step(s2, sharded, jax.random.PRNGKey(1))
        s2, _ = t2._train_step(s2, sharded, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    g1 = _grad_tree(t1, batch)
    g2 = _grad_tree(t2, batch, mesh, P("dp", "tp"))
    _assert_tree_close(g1, g2, rtol=1e-5, atol=1e-6)
    _assert_params_close(s1.params, s2.params, g1)


def test_train_steps_scan_under_mesh_matches_sequential():
    """K scanned steps in ONE sharded device program == K dispatched
    train_step calls on the same dp mesh (same rng split sequence)."""
    mesh = make_mesh(n_dp=8, n_tp=1)
    t1, batch = _setup(mesh=mesh)
    batches = [
        {k: v + 0.01 * i for k, v in batch.items()} for i in range(3)
    ]
    rng = jax.random.PRNGKey(7)
    s1 = t1.init_state(jax.random.PRNGKey(0), batches[0])
    s1, metrics = t1.train_steps(s1, batches, rng)
    assert metrics["loss"].shape == (3,)

    t2, _ = _setup(mesh=mesh)
    s2 = t2.init_state(jax.random.PRNGKey(0), batches[0])
    r = rng
    seq = []
    for b in batches:
        r, sub = jax.random.split(r)
        s2, m = t2.train_step(s2, b, sub)
        seq.append(float(m["loss"]))
    assert int(s1.step) == int(s2.step) == 3
    np.testing.assert_allclose(np.asarray(metrics["loss"]), np.asarray(seq),
                               rtol=1e-5, atol=1e-7)
    # scanned vs per-step programs compile (and fuse) differently; the
    # usual post-Adam noise rules apply, including the no-signal mask
    g1 = _grad_tree(t2, batches[0], mesh, P("dp"))
    _assert_params_close(s1.params, s2.params, g1)


def test_accum_under_dp_mesh_matches_single_device():
    """Gradient accumulation (lax.scan over microbatches) composes with a
    dp mesh: the scanned microbatches stay dp-sharded on their batch axis
    and the accumulated update == the plain single-device full-batch step.
    The model is BatchNorm-bearing (Erwin pooling), so grads take
    sequential-small-batch BN semantics on BOTH sides being compared here
    (accum@mesh vs accum@single-device), which must agree exactly; the
    plain step is additionally checked at the documented BN-coupling
    bound."""
    # accum on a single device is the semantics oracle
    t1, batch = _setup(mesh=None, accum_steps=2)
    s1, m1, _ = _run_two_steps(t1, batch)

    # same accumulation under a dp mesh (microbatch 4 over dp=4)
    t2, _ = _setup(mesh=make_mesh(n_dp=4, n_tp=2), accum_steps=2)
    s2, m2, _ = _run_two_steps(t2, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-5)
    # post-Adam params need the no-signal mask: BN-killed bias grads are
    # zero under BOTH accum semantics, and Adam amplifies reduction-order
    # noise there to full-lr steps (see _assert_params_close)
    g1 = _grad_tree(t1, batch)
    _assert_params_close(s1.params, s2.params, g1)

    # (accum-vs-plain equality is covered exactly, BN-free, in
    # test_train.py::test_accum_step_equals_full_batch_step — not repeated
    # here to keep this file's compile count down)

    # REAL head-TP inside the accumulation scan: the model's [B,H,N,*]
    # sharding constraints must trace/compile/execute within the lax.scan
    # microbatch body and preserve numerics (the documented
    # "composes with --dp/--tp" claim).
    t4, _ = _setup(mesh=make_mesh(n_dp=4, n_tp=2), shard_axes=("dp", "tp"),
                   accum_steps=2)
    s4, m4, _ = _run_two_steps(t4, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]),
                               rtol=1e-6)
    _assert_params_close(s1.params, s4.params, g1)


def test_make_mesh_from_args_validation():
    """Driver --dp/--tp glue: mesh construction, head-TP enablement, and
    the clear errors for indivisible head counts / batch sizes."""
    import os
    import sys
    import types

    import pytest

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "benchmarks"))
    from _common import make_mesh_from_args

    from haet_tpu.utils.config import ModelConfig, TrainConfig

    class Cfg:
        pass

    def cfg(n_head=4, batch_size=8):
        c = Cfg()
        c.model = ModelConfig(n_head=n_head)
        c.train = TrainConfig(batch_size=batch_size)
        return c

    args = types.SimpleNamespace(dp=0, tp=1)
    assert make_mesh_from_args(cfg(), args) is None  # no mesh requested

    args = types.SimpleNamespace(dp=4, tp=2)
    c = cfg()
    mesh = make_mesh_from_args(c, args)
    assert dict(mesh.shape) == {"dp": 4, "tp": 2}
    assert c.model.shard_axes == ("dp", "tp")

    args = types.SimpleNamespace(dp=0, tp=2)  # tp-only -> dp=1
    c = cfg(batch_size=1)
    mesh = make_mesh_from_args(c, args)
    assert dict(mesh.shape) == {"dp": 1, "tp": 2}

    with pytest.raises(SystemExit, match="divide n_heads"):
        make_mesh_from_args(cfg(n_head=3), types.SimpleNamespace(dp=2, tp=2))
    with pytest.raises(SystemExit, match="divisible by the"):
        make_mesh_from_args(cfg(batch_size=3),
                            types.SimpleNamespace(dp=2, tp=1))
    with pytest.raises(SystemExit, match="devices"):
        make_mesh_from_args(cfg(), types.SimpleNamespace(dp=64, tp=2))
