#!/usr/bin/env python
"""Plasticity benchmark (reference ``exp_plas.py``): 101x31 grid,
time-conditioned (Time_Input=True), out_dim=4 deformation; the model is
queried for each t in [0, 20) with ``model(x, fx, T=t)`` (:204-216).

The reference's committed status for this task is "training never starts
after 8h" (overall_results.md:10) — the per-t python loop around a compiled
graph thrashes torch.compile. Here the 20 time queries run under a single
jit: eval vmaps over T; train runs them as one ``lax.scan`` so the
BatchNorm running stats advance per query like the reference's t-loop.
"""

from __future__ import annotations

import os

from _common import (apply_model_args, base_parser, make_mesh_from_args,
                     shrink_for_smoke)

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from haet_tpu.data import batch_iter
from haet_tpu.data.pde_datasets import load_plasticity
from haet_tpu.train import Checkpointer, MetricsLogger, RelLpLoss
from haet_tpu.train.trainer import TrainState, make_optimizer
from haet_tpu.utils.config import plasticity_config


def main(args):
    cfg = apply_model_args(plasticity_config(), args)
    if cfg.train.accum_steps > 1:
        raise SystemExit(
            "exp_plas: --accum_steps is not supported by this custom "
            "time-query loop (use --use_checkpoint for memory)")
    mesh = make_mesh_from_args(cfg, args)
    data = load_plasticity(args.data_path, args.ntrain, args.ntest)
    if data["synthetic"]:
        print("[plasticity] dataset not found -> synthetic stand-in data")
    h, w, t_steps = data["h"], data["w"], data["t"]
    cfg.model.H, cfg.model.W = h, w
    cfg.model.fun_dim = 1
    cfg.model.out_dim = 4
    cfg.model.Time_Input = True

    train = {k: v.astype(np.float32) for k, v in data["train"].items()}
    test = {k: v.astype(np.float32) for k, v in data["test"].items()}
    # clamp batch size to the dataset (tiny synthetic stand-ins)
    cfg.train.batch_size = min(cfg.train.batch_size, len(train["y"]),
                               len(test["y"]))

    from _common import maybe_pipeline
    model = maybe_pipeline(cfg.model.build(), mesh, args)
    rel_l2 = RelLpLoss(size_average=False)
    bs = cfg.train.batch_size  # already clamped above
    ts = jnp.arange(t_steps, dtype=jnp.float32)

    def all_t_forward(params, batch_stats, batch, train_mode, rng):
        """[T] queries: out [T, B, N, 4] plus the updated batch_stats.

        Eval vmaps over T (stats frozen). Train-mode BatchNorm must UPDATE
        the running stats, so the T queries run as a lax.scan carrying
        batch_stats — the same sequential semantics as the reference's
        python t-loop over the torch model (exp_plas.py:204-216), where
        each query advances the running averages.
        """
        has_bn = bool(jax.tree_util.tree_leaves(batch_stats))

        def T_of(t):
            return jnp.full((batch["pos"].shape[0], 1), t)

        # fresh dropout mask per time query (fold_in the query index) —
        # a shared rng would give every T the SAME mask, unlike the
        # reference, where each torch call draws new randomness
        idx = jnp.arange(ts.shape[0], dtype=jnp.uint32)
        if train_mode and has_bn:
            def step(bs_carry, t_i):
                t, i = t_i
                out, upd = model.apply(
                    {"params": params, "batch_stats": bs_carry},
                    batch["pos"], batch["fx"], T_of(t),
                    mutable=["batch_stats"], train=True,
                    rngs={"dropout": jax.random.fold_in(rng, i)},
                )
                return upd["batch_stats"], out
            new_bs, outs = jax.lax.scan(step, batch_stats, (ts, idx))
            return outs, new_bs

        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = batch_stats

        def one_t(t, i):
            kwargs = dict(train=train_mode)
            if train_mode:
                kwargs["rngs"] = {"dropout": jax.random.fold_in(rng, i)}
            return model.apply(variables, batch["pos"], batch["fx"], T_of(t),
                               **kwargs)

        return jax.vmap(one_t)(ts, idx), batch_stats

    def loss_of(params, batch_stats, batch, train_mode, rng):
        out, new_bs = all_t_forward(params, batch_stats, batch, train_mode,
                                    rng)
        # y: [B, N, T, 4] -> [T, B, N, 4]
        y = jnp.transpose(batch["y"], (2, 0, 1, 3))
        b = y.shape[1]
        loss = rel_l2(
            jnp.transpose(out, (1, 0, 2, 3)).reshape(b, -1),
            jnp.transpose(y, (1, 0, 2, 3)).reshape(b, -1),
        ) / b
        return loss, new_bs

    steps = max(1, -(-len(train["y"]) // bs))  # ceil: partial batch kept
    tx = make_optimizer(cfg.train, steps * cfg.train.epochs)
    sample = {k: v[:bs] for k, v in train.items()}
    from _common import init_custom_loop_state
    variables, opt_state = init_custom_loop_state(
        model, tx, mesh, jax.random.PRNGKey(cfg.train.seed),
        sample["pos"], sample["fx"],
        jnp.zeros((sample["pos"].shape[0], 1)))
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=opt_state,
    )
    n_params = sum(int(p.size) for p in jax.tree_util.tree_leaves(state.params))
    print(f"Total Trainable Params: {n_params}")

    # dp/tp sharding for the custom loop — shared scaffolding (_common)
    from _common import custom_loop_mesh
    mesh_ctx, place, put_state = custom_loop_mesh(mesh, model)
    state = put_state(state)

    @jax.jit
    def train_step(state, batch, rng):
        (loss, new_bs), grads = jax.value_and_grad(
            lambda p: loss_of(p, state.batch_stats, batch, True, rng),
            has_aux=True,
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_bs,
            opt_state=opt_state,
        ), loss

    @jax.jit
    def eval_step(state, batch):
        loss, _ = loss_of(state.params, state.batch_stats, batch, False, None)
        return loss

    logger = MetricsLogger(os.path.join(args.out_dir, "plas_metrics.jsonl"))
    ckpt = Checkpointer(os.path.join(args.out_dir, "checkpoints", "plas"))
    rng = jax.random.PRNGKey(0)
    import time
    for ep in range(cfg.train.epochs):
        t0 = time.time()
        losses = []
        for batch in batch_iter(train, bs, True, ep)():
            rng, sub = jax.random.split(rng)
            with mesh_ctx():
                state, l = train_step(state, place(batch), sub)
            losses.append(float(l))
        with mesh_ctx():
            evs = [float(eval_step(state, place(b)))
                   for b in batch_iter(test, bs, False)()]
        logger.log({
            "epoch": ep, "train/rel_l2": float(np.mean(losses)),
            "val/rel_l2": float(np.mean(evs)),
            "epoch/time_seconds": time.time() - t0,
        })
        ckpt.save_best(state, float(np.mean(evs)), ep)
        ckpt.save_last(state, ep)
    ckpt.wait()
    with mesh_ctx():
        # per-SAMPLE weighting: the trailing partial batch must not be
        # over-weighted (reference divides summed losses by ntest)
        tot, n = 0.0, 0
        for b in batch_iter(test, bs, False)():
            k = len(next(iter(b.values())))
            tot += float(eval_step(state, place(b))) * k
            n += k
        rel = tot / max(n, 1)
    print(f"rel_err:{rel}")
    logger.close()
    return rel


if __name__ == "__main__":
    p = base_parser("HAET-TPU Plasticity")
    p.set_defaults(batch_size=8)  # reference HAETransolver_Plas.sh
    args = p.parse_args()
    if args.smoke:
        shrink_for_smoke(args)
    main(args)
