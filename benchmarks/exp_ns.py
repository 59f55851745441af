#!/usr/bin/env python
"""Navier-Stokes benchmark (reference ``exp_ns.py``): 64x64 vorticity,
T_in=10 input frames, 10-step rollout — teacher-forced during training
(:223, feeds ground truth), autoregressive at eval (:163, feeds
predictions). Reference result to match: rel-L2 0.16251
(overall_results.md:11)."""

from __future__ import annotations

import os

from _common import (apply_model_args, base_parser, make_mesh_from_args,
                     shrink_for_smoke)

import jax
import jax.numpy as jnp
import numpy as np

from haet_tpu.data import batch_iter
from haet_tpu.data.pde_datasets import load_ns
from haet_tpu.train import Checkpointer, MetricsLogger, RelLpLoss
from haet_tpu.utils.config import ns_config

T_IN, T_OUT, STEP = 10, 10, 1


def main(args):
    cfg = apply_model_args(ns_config(), args)
    if cfg.train.accum_steps > 1:
        raise SystemExit(
            "exp_ns: --accum_steps is not supported by this custom rollout "
            "loop (the per-step remat + lax.scan already bounds activation "
            "memory; use --use_checkpoint)")
    mesh = make_mesh_from_args(cfg, args)
    data = load_ns(args.data_path, args.ntrain, args.ntest, T_IN, T_OUT)
    if data["synthetic"]:
        print("[ns] dataset not found -> synthetic stand-in data")
    s = data["s"]
    cfg.model.H = cfg.model.W = s
    cfg.model.fun_dim = T_IN

    train = {k: v.astype(np.float32) for k, v in data["train"].items()}
    test = {k: v.astype(np.float32) for k, v in data["test"].items()}

    from _common import maybe_pipeline
    model = maybe_pipeline(cfg.model.build(), mesh, args)
    rel_l2 = RelLpLoss(size_average=False)
    bs = cfg.train.batch_size

    # Teacher-forced multi-step loss: the whole rollout is ONE jitted
    # program with the step body under ``lax.scan`` — the reference's
    # python loop re-runs the compiled graph per frame; a python-unrolled
    # jit (10x the graph) took 25+ min to compile at the full preset.
    def rollout_loss(params, batch_stats, batch, train_mode, rng):
        fx0 = batch["x"]
        yy = batch["y"]
        b, n, _ = yy.shape
        n_steps = T_OUT // STEP
        # [B, N, T_OUT] -> [n_steps, B, N, STEP]
        ys = jnp.moveaxis(yy.reshape(b, n, n_steps, STEP), 2, 0)

        def body(carry, ys_t):
            y, t = ys_t
            fx, bs, loss = carry
            variables = {"params": params}
            if jax.tree_util.tree_leaves(bs):
                variables["batch_stats"] = bs
                im, upd = model.apply(
                    variables, batch["pos"], fx, train=train_mode,
                    mutable=["batch_stats"],
                    # fresh dropout mask per rollout frame (fold_in the
                    # frame index) — a constant rng would give all T_OUT
                    # frames IDENTICAL masks, unlike the reference, where
                    # each torch call draws new randomness
                    rngs=({"dropout": jax.random.fold_in(rng, t)}
                          if train_mode else {}),
                )
                bs = upd["batch_stats"]
            else:
                im = model.apply(variables, batch["pos"], fx,
                                 train=train_mode)
            loss = loss + rel_l2(
                im.reshape(b, -1), y.reshape(b, -1)
            ) / b
            nxt = y if train_mode else im  # teacher forcing vs autoregressive
            fx = jnp.concatenate([fx[..., STEP:], nxt], axis=-1)
            return (fx, bs, loss), im

        # Rematerialize each rollout step in the backward pass: saving all
        # T_OUT steps of 8-layer activations OOMs a 16 GB chip (measured
        # 21.8 GB at the full preset); remat trades ~1/3 more FLOPs for
        # O(1)-in-T activation memory.
        body_fn = jax.checkpoint(body) if train_mode else body
        (fx, batch_stats, loss), preds = jax.lax.scan(
            body_fn, (fx0, batch_stats, jnp.zeros((), jnp.float32)),
            (ys, jnp.arange(n_steps, dtype=jnp.uint32)),
        )
        pred = jnp.moveaxis(preds, 0, 2).reshape(b, n, T_OUT)
        full = rel_l2(pred.reshape(b, -1), yy.reshape(b, -1)) / b
        return loss, full, batch_stats

    import optax
    from haet_tpu.train.trainer import TrainState, make_optimizer
    from flax.core import FrozenDict

    steps = max(1, -(-len(train["y"]) // bs))  # ceil: partial batch kept
    tx = make_optimizer(cfg.train, steps * cfg.train.epochs)

    sample = {k: v[:bs] for k, v in train.items()}
    from _common import init_custom_loop_state
    variables, opt_state = init_custom_loop_state(
        model, tx, mesh, jax.random.PRNGKey(cfg.train.seed),
        sample["pos"], sample["x"])
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
        def lf(p):
            loss, full, new_bs = rollout_loss(p, state.batch_stats, batch,
                                              True, rng)
            return loss, (full, new_bs)

        (loss, (full, new_bs)), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=new_bs, opt_state=opt_state), loss, full

    @jax.jit
    def eval_step(state, batch):
        _, full, _ = rollout_loss(state.params, state.batch_stats, batch,
                                  False, None)
        return full

    logger = MetricsLogger(os.path.join(args.out_dir, "ns_metrics.jsonl"))
    ckpt = Checkpointer(os.path.join(args.out_dir, "checkpoints", "ns"))
    rng = jax.random.PRNGKey(0)
    for ep in range(cfg.train.epochs):
        import time
        t0 = time.time()
        step_losses, full_losses = [], []
        for batch in batch_iter(train, bs, True, ep)():
            rng, sub = jax.random.split(rng)
            with mesh_ctx():
                state, l, f = train_step(state, place(batch), sub)
            step_losses.append(float(l))
            full_losses.append(float(f))
        with mesh_ctx():
            evs = [float(eval_step(state, place(b)))
                   for b in batch_iter(test, bs, False)()]
        logger.log({
            "epoch": ep,
            "train/l2_step": float(np.mean(step_losses)),
            "train/l2_full": float(np.mean(full_losses)),
            "val/l2_full": float(np.mean(evs)),
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

    if getattr(args, "export_rollout", None):
        # deployment: the whole T_OUT-frame autoregressive rollout as ONE
        # AOT program (lax.scan inside the artifact) — the reference's
        # eval loop re-dispatches per frame; this dispatches once
        if args.pp > 1:
            raise SystemExit(
                "--export_rollout with --pp: convert the stacked pipeline "
                "checkpoint to the plain layout first (parallel.pipeline."
                "merge_variables; car_eval --export_artifact shows the "
                "flow) — rollout export runs the unpipelined model")
        from haet_tpu.export import save_rollout_artifact

        plain = cfg.model.build()
        variables = {"params": state.params}
        if jax.tree_util.tree_leaves(state.batch_stats):
            variables["batch_stats"] = state.batch_stats
        save_rollout_artifact(
            args.export_rollout, plain, variables,
            (jnp.asarray(test["pos"][:1]), jnp.asarray(test["x"][:1])),
            steps=T_OUT // STEP)
        print(f"rollout artifact -> {args.export_rollout}")
    return rel


if __name__ == "__main__":
    _p = base_parser("HAET-TPU Navier-Stokes")
    _p.add_argument("--export_rollout", type=str, default=None,
                    help="after training, export the full autoregressive "
                         "rollout (T_OUT frames under lax.scan) as one AOT "
                         "artifact directory")
    args = _p.parse_args()
    if args.smoke:
        shrink_for_smoke(args)
    main(args)
