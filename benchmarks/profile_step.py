#!/usr/bin/env python
"""Differential ablation profile of the flagship train step on TPU.

Times each suspect component with the differential-reps trick
(time(hi reps) - time(lo reps)) / (hi - lo), which cancels the ~26 ms
tunnel dispatch/fetch RTT.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from haet_tpu.utils.env import apply_platform_override  # noqa: E402

apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np
import optax

LO, HI = 5, 25


def timed(mk, *args):
    """Interleaved differential lo/hi windows (cancels RTT; both minima
    from the same regime of the drifting chip — see docs/benchmarks.md)."""
    fns = {}
    for reps in (LO, HI):
        fn = jax.jit(mk(reps))
        out = fn(*args)  # compile
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        fns[reps] = fn

    def once(reps):
        t0 = time.perf_counter()
        out = fns[reps](*args)
        s = jax.tree_util.tree_map(
            lambda a: jnp.sum(a.astype(jnp.float32)), out)
        float(sum(jax.tree_util.tree_leaves(s)))
        return time.perf_counter() - t0

    best = {LO: float("inf"), HI: float("inf")}
    for _ in range(5):
        for reps in (LO, HI):
            best[reps] = min(best[reps], once(reps))
    diff = (best[HI] - best[LO]) / (HI - LO)
    return diff


def fmt(t):
    """Negative differential = the chip's throughput drifted more between
    windows than the component costs — report as below noise."""
    return f"{t * 1e3:8.3f} ms" if t > 0 else "  below drift noise"


def loop(body):
    def mk(reps):
        def run(x):
            return jax.lax.fori_loop(0, reps, lambda i, v: body(v), x)
        return run
    return mk


def main():
    from haet_tpu.models import HAETransolverIrregularMesh
    from haet_tpu.models.physics_attention import PhysicsAttentionIrregularMesh
    from haet_tpu.models.erwin import ErwinTransformer
    from haet_tpu.ops.ball_groups import build_erwin_perms

    on_tpu = jax.devices()[0].platform != "cpu"
    dt = jnp.bfloat16 if on_tpu else None
    N = 32768
    rng = np.random.RandomState(0)

    # ---- full train step -------------------------------------------------
    # the exact vendored car config (1,757,190 params; see
    # shapenet_car_config)
    model = HAETransolverIrregularMesh(
        space_dim=7, fun_dim=0, out_dim=4, n_layers=2, n_hidden=256,
        n_head=8, slice_num=32, mlp_ratio=2, rotate=45,
        enc_num_heads=(8, 8), enc_depths=(4, 4), dec_num_heads=(8,),
        dec_depths=(4,), erwin_mlp_ratio=4, embed=True, dtype=dt)
    x = jnp.asarray(rng.randn(1, N, 7).astype(np.float32))
    y = jnp.asarray(rng.randn(1, N, 4).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, None)
    params, bstats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt0 = tx.init(params)

    def step_body(carry):
        p, bs, opt = carry

        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": bs}, x, None, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.mean((out.astype(jnp.float32) - y) ** 2), upd["batch_stats"]

        (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        upd, nopt = tx.update(grads, opt, p)
        return (optax.apply_updates(p, upd), nbs, nopt)

    t = timed(loop(step_body), (params, bstats, opt0))
    print(f"train step (fwd+bwd+adam): {fmt(t)}", flush=True)

    # chain fwd through an x perturbation
    def fwd_chain(v):
        out, _ = model.apply({"params": params, "batch_stats": bstats},
                             v, None, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
        return v + 1e-12 * jnp.mean(out).astype(v.dtype)

    t = timed(loop(fwd_chain), x)
    print(f"model fwd only           : {fmt(t)}", flush=True)

    # ---- physics attention alone ----------------------------------------
    pa = PhysicsAttentionIrregularMesh(
        dim=256, heads=8, dim_head=32, slice_num=32, mlp_ratio=2,
        rotate=45, dtype=dt)
    fx = jnp.asarray(rng.randn(1, N, 256).astype(np.float32))
    if dt is not None:
        fx = fx.astype(dt)
    pav = pa.init(jax.random.PRNGKey(0), fx)

    def pa_chain(v):
        out = pa.apply(pav, v)
        return v + 1e-12 * jnp.mean(out).astype(v.dtype)

    t = timed(loop(pa_chain), fx)
    print(f"physics attention fwd    : {fmt(t)}", flush=True)

    def pa_grad_chain(v):
        g = jax.grad(lambda u: jnp.mean(pa.apply(pav, u))
                     .astype(jnp.float32))(v)
        return v + 1e-12 * g.astype(v.dtype)

    t = timed(loop(pa_grad_chain), fx)
    print(f"physics attention fwd+bwd: {fmt(t)}", flush=True)

    # ---- erwin stage alone (8 clouds x 32 states) ------------------------
    er = ErwinTransformer(
        c_in=32, c_hidden=(32, 64), ball_sizes=(32, 16),
        enc_num_heads=(4, 8), enc_depths=(2, 2), dec_num_heads=(4,),
        dec_depths=(2,), strides=(2,), rotate=45, mp_steps=0, embed=False,
        mlp_ratio=2, dimensionality=3, dtype=dt)
    s = jnp.asarray(rng.randn(8, 32, 32).astype(np.float32))
    pos = jnp.asarray(rng.rand(8, 32, 3).astype(np.float32))
    if dt is not None:
        s = s.astype(dt)
    erv = er.init(jax.random.PRNGKey(0), s, pos)

    def er_chain(v):
        out = er.apply(erv, v, pos)
        return v + 1e-12 * jnp.mean(out).astype(v.dtype)

    t = timed(loop(er_chain), s)
    print(f"erwin stage fwd          : {fmt(t)}", flush=True)

    def perm_chain(v):
        perms = build_erwin_perms(v, ball_sizes=(32, 16), strides=(2,),
                                  rotate_angle=45.0, grouping="median")
        return v + 1e-12 * perms.perm[..., :1, None].astype(v.dtype)

    t = timed(loop(perm_chain), pos)
    print(f"build_erwin_perms        : {fmt(t)}", flush=True)

    # ---- tokenizer einsums alone -----------------------------------------
    from haet_tpu.ops import slice_ops
    xp = jnp.asarray(rng.randn(1, 8, N, 32).astype(np.float32))
    if dt is not None:
        xp = xp.astype(dt)
    wsl = jnp.asarray(rng.randn(32, 32).astype(np.float32))

    def tok_chain(v):
        logits = v @ wsl
        w = slice_ops.rep_slice_weights(
            logits, jnp.full(v.shape[:-1] + (1,), 0.5, v.dtype), 1e-6)
        w = w.astype(v.dtype)
        st = slice_ops.eidetic_states(v, w)
        out = slice_ops.deslice(st, w)
        return v + 1e-12 * jnp.mean(out).astype(v.dtype)

    t = timed(loop(tok_chain), xp)
    print(f"slice+eidetic+deslice fwd: {fmt(t)}", flush=True)


if __name__ == "__main__":
    main()
