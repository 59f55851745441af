"""Head tensor parallelism: real, verified sharding over the heads axis.

The reference has no TP at all (SURVEY.md §2.7); the TPU build shards the
``[B, H, N, *]`` physics-attention intermediates over a ``tp`` mesh axis —
heads are embarrassingly parallel through slice->Erwin->deslice (the
reference encodes head independence via ``batch_idx = arange(B*H)``,
``StructuredMesh2D.py:238``). These tests verify:

1. numerics: tp=2 output and gradients match the unsharded model to f32
   tolerance (exact math, different partitioning);
2. the sharding constraints actually survive into the lowered module
   (``sdy.sharding_constraint`` with the head axis) and the compiled module
   contains the cross-device collectives they imply.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from haet_tpu.models import HAETransolverIrregularMesh

MODEL_KW = dict(
    space_dim=3, fun_dim=0, out_dim=2, n_layers=2, n_hidden=32,
    n_head=4, slice_num=16, mlp_ratio=2, rotate=45,
)


@pytest.fixture(scope="module")
def setup():
    model_ref = HAETransolverIrregularMesh(**MODEL_KW)
    model_tp = HAETransolverIrregularMesh(shard_axes=("dp", "tp"), **MODEL_KW)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 128, 3).astype(np.float32))
    y = jnp.asarray(rng.randn(4, 128, 2).astype(np.float32))
    variables = jax.jit(model_ref.init)(jax.random.PRNGKey(0), x, None)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "tp"))
    return model_ref, model_tp, variables, x, y, mesh


def _put(variables, x, y, mesh):
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    return (
        jax.device_put(variables, repl),
        jax.device_put(x, data),
        jax.device_put(y, data),
    )


def test_tp_forward_matches_replicated(setup):
    model_ref, model_tp, variables, x, y, mesh = setup
    out_ref = jax.jit(lambda v, x: model_ref.apply(v, x, None))(variables, x)

    vs, xs, _ = _put(variables, x, y, mesh)
    with mesh:
        out_tp = jax.jit(lambda v, x: model_tp.apply(v, x, None))(vs, xs)
    np.testing.assert_allclose(
        np.asarray(out_tp), np.asarray(out_ref), rtol=1e-5, atol=1e-6
    )


def test_tp_grads_match_replicated(setup):
    model_ref, model_tp, variables, x, y, mesh = setup

    def make_loss(model):
        def loss(v, x, y):
            out = model.apply(v, x, None)
            return jnp.mean((out - y) ** 2)
        return loss

    g_ref = jax.jit(jax.grad(make_loss(model_ref)))(variables, x, y)
    vs, xs, ys = _put(variables, x, y, mesh)
    with mesh:
        g_tp = jax.jit(jax.grad(make_loss(model_tp)))(vs, xs, ys)

    # Whole-tree comparison at f32 tolerance (conftest pins matmul
    # precision to "highest"); the only reduction-order difference is the
    # dp/tp psum of the batch-mean.
    flat_ref, tree_ref = jax.tree_util.tree_flatten(g_ref)
    flat_tp, tree_tp = jax.tree_util.tree_flatten(g_tp)
    assert tree_ref == tree_tp
    for a, b in zip(flat_ref, flat_tp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6
        )


def test_tp_constraints_survive_to_compiled_module(setup):
    model_ref, model_tp, variables, x, y, mesh = setup
    vs, xs, _ = _put(variables, x, y, mesh)
    fwd = jax.jit(lambda v, x: model_tp.apply(v, x, None))
    with mesh:
        lowered = fwd.lower(vs, xs)
        compiled = lowered.compile()

    lt = lowered.as_text()
    # [B, H, N, *] intermediates constrained batch-over-dp, heads-over-tp...
    assert 'sdy.sharding_constraint' in lt
    assert '[{"dp"}, {"tp"}, {}, {}]' in lt
    # ...and the Erwin [B*H, G, C] token batch over both axes jointly.
    assert '[{"dp", "tp"}, {}, {}]' in lt

    # The head split forces real communication at the head-concat merge:
    # the compiled module must contain cross-device collectives.
    ct = compiled.as_text()
    assert ("all-gather" in ct) or ("all-reduce" in ct)


def test_tp_without_mesh_context_unchanged(setup):
    """shard_axes=None models trace and run with no mesh at all."""
    model_ref, _, variables, x, _, _ = setup
    out = jax.jit(lambda v, x: model_ref.apply(v, x, None))(variables, x)
    assert np.isfinite(np.asarray(out)).all()


def test_tp_structured_2d_matches_replicated():
    """Head TP through the Conv-projection (structured 2D) variant too —
    the conv runs per-batch-row, the head split happens at the reshape."""
    from haet_tpu.models import HAETransolverStructuredMesh2D

    kw = dict(space_dim=2, fun_dim=1, out_dim=1, n_layers=1, n_hidden=32,
              n_head=4, slice_num=16, mlp_ratio=1, rotate=0, H=16, W=16)
    model_ref = HAETransolverStructuredMesh2D(**kw)
    model_tp = HAETransolverStructuredMesh2D(shard_axes=("dp", "tp"), **kw)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 256, 2).astype(np.float32))
    fx = jnp.asarray(rng.randn(4, 256, 1).astype(np.float32))
    v = jax.jit(model_ref.init)(jax.random.PRNGKey(0), x, fx)
    out_ref = jax.jit(lambda v, x, fx: model_ref.apply(v, x, fx))(v, x, fx)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "tp"))
    vs = jax.device_put(v, NamedSharding(mesh, P()))
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    fxs = jax.device_put(fx, NamedSharding(mesh, P("dp")))
    with mesh:
        out_tp = jax.jit(lambda v, x, fx: model_tp.apply(v, x, fx))(
            vs, xs, fxs)
    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)
