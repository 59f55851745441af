"""End-to-end smoke tests: every model variant initializes and runs forward."""

import jax
import jax.numpy as jnp
import numpy as np

from haet_tpu.models import (
    HAETransolverIrregularMesh,
    HAETransolverStructuredMesh2D,
    HAETransolverStructuredMesh3D,
)


def _small_kwargs():
    return dict(
        n_layers=2, n_hidden=32, n_head=4, slice_num=16, mlp_ratio=1,
        rotate=45,
    )


def test_structured_2d_forward():
    model = HAETransolverStructuredMesh2D(
        space_dim=2, fun_dim=1, out_dim=1, H=8, W=8, **_small_kwargs()
    )
    x = jnp.ones((2, 64, 2))
    fx = jnp.ones((2, 64, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    out = model.apply(variables, x, fx)
    assert out.shape == (2, 64, 1)
    assert jnp.isfinite(out).all()


def test_structured_2d_unified_pos_and_time():
    model = HAETransolverStructuredMesh2D(
        space_dim=2, fun_dim=1, out_dim=1, H=8, W=8, unified_pos=True,
        ref=4, Time_Input=True, **_small_kwargs()
    )
    x = jnp.ones((2, 64, 2))
    fx = jnp.ones((2, 64, 1))
    T = jnp.ones((2, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx, T)
    out = model.apply(variables, x, fx, T)
    assert out.shape == (2, 64, 1)


def test_structured_2d_no_fx_placeholder():
    model = HAETransolverStructuredMesh2D(
        space_dim=2, fun_dim=0, out_dim=1, H=8, W=8, **_small_kwargs()
    )
    x = jnp.ones((2, 64, 2))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, None)
    out = model.apply(variables, x, None)
    assert out.shape == (2, 64, 1)


def test_structured_3d_forward():
    model = HAETransolverStructuredMesh3D(
        space_dim=3, fun_dim=1, out_dim=1, H=4, W=4, D=4, **_small_kwargs()
    )
    x = jnp.ones((1, 64, 3))
    fx = jnp.ones((1, 64, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    out = model.apply(variables, x, fx)
    assert out.shape == (1, 64, 1)


def test_irregular_forward():
    model = HAETransolverIrregularMesh(
        space_dim=3, fun_dim=1, out_dim=2, **_small_kwargs()
    )
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 100, 3))
    fx = jax.random.normal(key, (2, 100, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    out = model.apply(variables, x, fx)
    assert out.shape == (2, 100, 2)
    assert jnp.isfinite(out).all()


def test_forward_is_jittable():
    model = HAETransolverIrregularMesh(
        space_dim=3, fun_dim=1, out_dim=1, **_small_kwargs()
    )
    x = jnp.ones((1, 50, 3))
    fx = jnp.ones((1, 50, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))
    out1 = fwd(variables, x, fx)
    out2 = fwd(variables, x, fx)
    assert jnp.allclose(out1, out2)


def test_train_mode_batchnorm_updates():
    model = HAETransolverIrregularMesh(
        space_dim=3, fun_dim=1, out_dim=1, dropout=0.1, **_small_kwargs()
    )
    x = jnp.ones((2, 32, 3))
    fx = jnp.ones((2, 32, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    assert "batch_stats" in variables
    out, updates = model.apply(
        variables, x, fx, train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert out.shape == (2, 32, 1)
    assert "batch_stats" in updates


def test_gradients_flow():
    model = HAETransolverIrregularMesh(
        space_dim=3, fun_dim=1, out_dim=1, **_small_kwargs()
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 3))
    fx = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)

    def loss_fn(params):
        out = model.apply({**variables, "params": params}, x, fx)
        return jnp.mean(out ** 2)

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(jnp.isfinite(g).all() for g in leaves)
    # most parameters should receive nonzero gradient
    nonzero = sum(bool(jnp.any(g != 0)) for g in leaves)
    assert nonzero > len(leaves) * 0.7


def test_time_input_param_tree_follows_config():
    """time_fc params exist iff Time_Input=True (reference creates them at
    construction, ..._2D.py:257-263) — NOT based on whether init happened
    to receive T. Init without T must still produce a tree that a later
    apply(x, fx, T) can use, and T with Time_Input=False must raise."""
    import pytest

    from haet_tpu.models import HAETransolver_Structured_Mesh_2D

    kw = dict(space_dim=2, fun_dim=1, out_dim=1, n_layers=1, n_hidden=32,
              n_head=4, slice_num=16, H=8, W=8)
    m = HAETransolver_Structured_Mesh_2D(Time_Input=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 2))
    fx = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 1))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x, fx)  # NO T at init
    assert "time_fc1" in v["params"] and "time_fc2" in v["params"]
    T = jnp.ones((2,), jnp.float32)
    out_t = m.apply(v, x, fx, T)          # works: params already exist
    out_none = m.apply(v, x, fx)          # T optional at apply, like ref
    assert np.isfinite(np.asarray(out_t)).all()
    assert not np.allclose(np.asarray(out_t), np.asarray(out_none))

    m0 = HAETransolver_Structured_Mesh_2D(Time_Input=False, **kw)
    v0 = jax.jit(m0.init)(jax.random.PRNGKey(0), x, fx)
    assert "time_fc1" not in v0["params"]
    with pytest.raises(ValueError, match="Time_Input"):
        m0.apply(v0, x, fx, T)
