"""Fused Pallas Erwin-block kernel vs the XLA block — values and grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from haet_tpu.models.erwin import ErwinTransformerBlock
from haet_tpu.ops.pallas import erwin_block as eb


@pytest.fixture(autouse=True)
def interpret_mode():
    eb.INTERPRET = True
    yield
    eb.INTERPRET = False


def _mk(b, n, c, d, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    pos = jnp.asarray(rng.rand(b, n, d).astype(np.float32))
    return x, pos


def _pair(b=8, n=32, c=32, d=3, heads=4, ball=32, mlp_ratio=4,
          use_dist_bias=True, seed=0):
    x, pos = _mk(b, n, c, d, seed)
    kw = dict(dim=c, num_heads=heads, ball_size=ball, mlp_ratio=mlp_ratio,
              dimensionality=d, use_dist_bias=use_dist_bias)
    ref = ErwinTransformerBlock(**kw)
    fused = ErwinTransformerBlock(use_pallas=True, **kw)
    params = jax.jit(ref.init)(jax.random.PRNGKey(1), x, pos)
    return ref, fused, params, x, pos


@pytest.mark.parametrize("ball,heads,use_dist_bias", [
    (32, 4, True),    # full-ball level (car config, level 0)
    (16, 8, True),    # two balls per cloud
    (8, 2, False),    # flash-parity mode, many balls
])
def test_fused_matches_xla(ball, heads, use_dist_bias):
    ref, fused, params, x, pos = _pair(ball=ball, heads=heads,
                                       use_dist_bias=use_dist_bias)
    out_ref = ref.apply(params, x, pos)
    out_fused = fused.apply(params, x, pos)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_cloud_folding_padding():
    # b=3 clouds, tb folds 8 per program -> padding path exercised
    ref, fused, params, x, pos = _pair(b=3, n=32, c=32, seed=3)
    np.testing.assert_allclose(np.asarray(fused.apply(params, x, pos)),
                               np.asarray(ref.apply(params, x, pos)),
                               rtol=2e-5, atol=2e-5)


def test_fused_grads_match_xla():
    ref, fused, params, x, pos = _pair(b=4, n=32, c=32, heads=4, ball=16)

    def loss(mod):
        def f(p, x, pos):
            out = mod.apply(p, x, pos)
            return jnp.sum(out * jnp.cos(out.astype(jnp.float32)))
        return f

    g_ref = jax.grad(loss(ref), argnums=(0, 1, 2))(params, x, pos)
    g_fused = jax.grad(loss(fused), argnums=(0, 1, 2))(params, x, pos)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree_util.tree_leaves(g_fused)
    assert len(flat_ref) == len(flat_fused)
    for (path, a), b in zip(flat_ref, flat_fused):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_sigma_att_gets_zero_grad():
    """The distance bias is stop_gradient'ed in both paths (reference
    attention.py:29 @no_grad)."""
    ref, fused, params, x, pos = _pair(b=2, n=32, c=32)

    def f(p):
        return jnp.sum(fused.apply(p, x, pos) ** 2)

    g = jax.grad(f)(params)
    sig = g["params"]["BMSA"]["sigma_att"]
    assert float(jnp.abs(sig).max()) == 0.0


def test_fused_inside_full_erwin():
    """use_pallas_blocks on the whole ErwinTransformer matches XLA
    (pool/unpool/rotation stay XLA; only the blocks are fused)."""
    from haet_tpu.models.erwin import ErwinTransformer

    kw = dict(
        c_in=16, c_hidden=(16, 32), ball_sizes=(16, 8), enc_num_heads=(2, 4),
        enc_depths=(2, 2), dec_num_heads=(2,), dec_depths=(2,), strides=(2,),
        rotate=45, mp_steps=0, embed=False, dimensionality=3,
    )
    x, pos = _mk(2, 64, 16, 3, seed=5)
    ref = ErwinTransformer(**kw)
    fused = ErwinTransformer(use_pallas_blocks=True, **kw)
    variables = jax.jit(ref.init)(jax.random.PRNGKey(2), x, pos)
    out_ref = ref.apply(variables, x, pos)
    out_fused = fused.apply(variables, x, pos)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=5e-5, atol=5e-5)


def test_flag_engages_through_model_api(monkeypatch):
    """use_pallas_erwin on a HAET model must actually reach the fused
    kernel (guards against a silent fallback making A/Bs meaningless)."""
    from haet_tpu.models import HAETransolverIrregularMesh

    calls = {"n": 0}
    orig = eb.fused_erwin_block

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(eb, "fused_erwin_block", counting)
    m = HAETransolverIrregularMesh(
        space_dim=3, fun_dim=1, out_dim=2, n_layers=1, n_hidden=32,
        n_head=4, slice_num=16, use_pallas_erwin=True,
        enc_num_heads=(1, 2), enc_depths=(1, 1), dec_num_heads=(1,),
        dec_depths=(1,), ball_sizes=(16, 8), strides=(2,))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 3))
    fx = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 1))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x, fx)
    calls["n"] = 0
    m.apply(v, x, fx)
    # EVERY block must engage: encoder (1) + bottleneck (1) + DECODER (1)
    # — the decoder once silently stayed on the XLA path
    assert calls["n"] == 3
