#!/usr/bin/env python
"""Plasticity benchmark (reference ``exp_plas.py``): 101x31 grid,
time-conditioned (Time_Input=True), out_dim=4 deformation; the model is
queried for each t in [0, 20) with ``model(x, fx, T=t)`` (:204-216).

The reference's committed status for this task is "training never starts
after 8h" (overall_results.md:10) — the per-t python loop around a compiled
graph thrashes torch.compile. Here the 20 time queries run inside one
``jax.vmap`` over T under a single jit, so the whole epoch is one program.
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

    model = cfg.model.build()
    rel_l2 = RelLpLoss(size_average=False)
    bs = cfg.train.batch_size  # already clamped above
    ts = jnp.arange(t_steps, dtype=jnp.float32)

    def all_t_forward(params, batch_stats, batch, train_mode, rng):
        """[T] queries vmapped: out [T, B, N, 4]."""
        variables = {"params": params}
        has_bn = bool(jax.tree_util.tree_leaves(batch_stats))
        if has_bn:
            variables["batch_stats"] = batch_stats

        def one_t(t):
            T = jnp.full((batch["pos"].shape[0], 1), t)
            kwargs = dict(train=train_mode)
            if train_mode:
                kwargs["rngs"] = {"dropout": rng}
            if has_bn and train_mode:
                out, _ = model.apply(variables, batch["pos"], batch["fx"], T,
                                     mutable=["batch_stats"], **kwargs)
                return out
            return model.apply(variables, batch["pos"], batch["fx"], T,
                               **kwargs)

        return jax.vmap(one_t)(ts)

    def loss_of(params, batch_stats, batch, train_mode, rng):
        out = all_t_forward(params, batch_stats, batch, train_mode, rng)
        # y: [B, N, T, 4] -> [T, B, N, 4]
        y = jnp.transpose(batch["y"], (2, 0, 1, 3))
        b = y.shape[1]
        return rel_l2(
            jnp.transpose(out, (1, 0, 2, 3)).reshape(b, -1),
            jnp.transpose(y, (1, 0, 2, 3)).reshape(b, -1),
        ) / b

    steps = max(1, len(train["y"]) // bs)
    tx = make_optimizer(cfg.train, steps * cfg.train.epochs)
    sample = {k: v[:bs] for k, v in train.items()}
    import contextlib
    with (mesh if mesh is not None else contextlib.nullcontext()):
        # TP sharding constraints need the mesh at trace time
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(cfg.train.seed), sample["pos"], sample["fx"],
            jnp.zeros((sample["pos"].shape[0], 1)),
        )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(variables["params"]),
    )
    n_params = sum(int(p.size) for p in jax.tree_util.tree_leaves(state.params))
    print(f"Total Trainable Params: {n_params}")

    # dp/tp sharding for the custom loop (see exp_ns.py)
    mesh_ctx = (lambda: mesh) if mesh is not None else contextlib.nullcontext
    if mesh is not None:
        from haet_tpu.parallel.mesh import replicate

        state = jax.device_put(state, replicate(mesh))

    def place(batch):
        if mesh is None:
            return batch
        from haet_tpu.parallel.mesh import batch_sharding

        return {k: jax.device_put(v, batch_sharding(mesh))
                for k, v in batch.items()}

    @jax.jit
    def train_step(state, batch, rng):
        loss, grads = jax.value_and_grad(
            lambda p: loss_of(p, state.batch_stats, batch, True, rng)
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state,
        ), loss

    @jax.jit
    def eval_step(state, batch):
        return loss_of(state.params, state.batch_stats, batch, False, None)

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
        rel = float(np.mean([float(eval_step(state, place(b)))
                             for b in batch_iter(test, bs, False)()]))
    print(f"rel_err:{rel}")
    return rel


if __name__ == "__main__":
    args = base_parser("HAET-TPU Plasticity").parse_args()
    args.batch_size = 8
    if args.smoke:
        shrink_for_smoke(args)
    main(args)
