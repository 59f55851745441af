"""Trainer with a device mesh: data-parallel fit on the simulated 8-chip
CPU mesh produces the same result as single-device training."""

import numpy as np

import jax
import jax.numpy as jnp

from haet_tpu.parallel import make_mesh
from haet_tpu.train import Trainer
from haet_tpu.utils.config import ModelConfig, TrainConfig


def _setup(mesh=None):
    cfg = ModelConfig(variant="irregular", space_dim=3, fun_dim=1, out_dim=1,
                      n_layers=1, n_hidden=32, n_head=4, slice_num=16,
                      rotate=0)
    model = cfg.build()
    trainer = Trainer(
        model=model,
        loss_fn=lambda out, b: (jnp.mean((out - b["y"]) ** 2), {}),
        cfg=TrainConfig(lr=1e-3, epochs=1, batch_size=8, schedule="constant",
                        weight_decay=0.0),
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


def test_dp_training_matches_single_device():
    t1, batch = _setup(mesh=None)
    s1 = t1.init_state(jax.random.PRNGKey(0), batch)
    s1, m1 = t1.train_step(s1, batch, jax.random.PRNGKey(1))
    s1, m1b = t1.train_step(s1, batch, jax.random.PRNGKey(2))

    mesh = make_mesh(n_dp=8, n_tp=1)
    t2, _ = _setup(mesh=mesh)
    s2 = t2.init_state(jax.random.PRNGKey(0), batch)
    with mesh:
        s2, m2 = t2.train_step(s2, batch, jax.random.PRNGKey(1))
        s2, m2b = t2.train_step(s2, batch, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1b["loss"]), float(m2b["loss"]),
                               rtol=1e-4)
    # final params agree across dp sharding
    k1 = jax.tree_util.tree_leaves(s1.params)[0]
    k2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), rtol=2e-4,
                               atol=2e-6)


def test_dp_tp_mesh_runs():
    mesh = make_mesh(n_dp=4, n_tp=2)
    trainer, batch = _setup(mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    with mesh:
        state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
