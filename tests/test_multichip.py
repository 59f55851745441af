"""Multi-chip sharding tests on the simulated 8-device CPU mesh."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    out = compiled(*args)
    assert out.shape == (1, 4096, 4)


def test_dp_sharded_forward_matches_single_device():
    """Data-parallel forward over 8 chips == single-device forward."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from haet_tpu.models import HAETransolverIrregularMesh

    model = HAETransolverIrregularMesh(
        space_dim=3, fun_dim=1, out_dim=1, n_layers=1, n_hidden=32,
        n_head=4, slice_num=16, rotate=0,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 64, 3).astype(np.float32))
    fx = jnp.asarray(rng.randn(8, 64, 1).astype(np.float32))
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)

    ref = jax.jit(lambda v, x, fx: model.apply(v, x, fx))(v, x, fx)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1), ("dp", "tp"))
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    fxs = jax.device_put(fx, NamedSharding(mesh, P("dp")))
    vr = jax.device_put(v, NamedSharding(mesh, P()))
    with mesh:
        out = jax.jit(lambda v, x, fx: model.apply(v, x, fx))(vr, xs, fxs)

    # NOTE: not bitwise — XLA partitions/fuses differently per sharding —
    # but f32-tight (conftest pins matmul precision to "highest").
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_point_axis_sharding_matches_replicated():
    """Context parallel: sharding the points axis across 8 chips is exact —
    the slice/deslice reductions over N become psums (SURVEY.md §2.7)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from haet_tpu.models import HAETransolverIrregularMesh

    model = HAETransolverIrregularMesh(
        space_dim=3, fun_dim=1, out_dim=1, n_layers=1, n_hidden=32,
        n_head=4, slice_num=16, rotate=0,
    )
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 512, 3).astype(np.float32))
    fx = jnp.asarray(rng.randn(1, 512, 1).astype(np.float32))
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)
    ref = jax.jit(lambda v, x, fx: model.apply(v, x, fx))(v, x, fx)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("cp",))
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "cp")))
    fxs = jax.device_put(fx, NamedSharding(mesh, P(None, "cp")))
    vr = jax.device_put(v, NamedSharding(mesh, P()))
    with mesh:
        out = jax.jit(lambda v, x, fx: model.apply(v, x, fx))(vr, xs, fxs)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
