#!/usr/bin/env python
"""Darcy flow benchmark driver (PDE-solving standard benchmark).

Mirrors the reference's ``benchmarks/04-PDE-Solving-StandardBenchmark/
exp_darcy.py``: 421^2 grids downsampled to 85x85, UnitTransformer
normalization, HAETransolver_Structured_Mesh_2D, AdamW + OneCycleLR,
rel-L2 loss + 0.1 x central-difference gradient loss (:219-226), per-epoch
test rel-L2. Falls back to synthetic data when the .mat files are absent.

Usage:
    python benchmarks/exp_darcy.py --epochs 500 --data_path /data/fno
    python benchmarks/exp_darcy.py --smoke            # tiny synthetic run
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from haet_tpu.utils.env import apply_platform_override  # noqa: E402

apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np

from haet_tpu.data import batch_iter
from haet_tpu.data.pde_datasets import load_darcy
from haet_tpu.train import (
    Checkpointer,
    MetricsLogger,
    RelLpLoss,
    Trainer,
    UnitTransformer,
    central_diff,
    zero_boundary,
)
from haet_tpu.utils.config import darcy_config


def build(args):
    cfg = darcy_config(args.downsample)
    cfg.train.lr = args.lr
    cfg.train.epochs = args.epochs
    cfg.train.batch_size = args.batch_size
    cfg.model.n_hidden = args.n_hidden
    cfg.model.n_layers = args.n_layers
    cfg.model.n_head = args.n_heads
    cfg.model.slice_num = args.slice_num
    cfg.model.unified_pos = bool(args.unified_pos)
    cfg.model.mlp_ratio = args.mlp_ratio
    cfg.model.bf16 = bool(args.bf16)
    cfg.train.max_grad_norm = getattr(args, "max_grad_norm", None)
    cfg.train.accum_steps = getattr(args, "accum_steps", 1)
    cfg.train.mu_bf16 = bool(getattr(args, "mu_bf16", 0))
    return cfg


def main(args):
    cfg = build(args)
    from _common import make_mesh_from_args, maybe_pipeline
    mesh = make_mesh_from_args(cfg, args)
    data = load_darcy(args.data_path, args.ntrain, args.ntest, args.downsample)
    s = data["s"]
    if data["synthetic"]:
        print("[exp_darcy] dataset not found -> synthetic stand-in data")
    # The grid side is derived from the loaded file (the preset bakes in the
    # 421-grid FNO assumption); reconcile the model's H/W with the data.
    cfg.model.H = cfg.model.W = s

    x_norm = UnitTransformer(data["train"]["x"])
    y_norm = UnitTransformer(data["train"]["y"])
    train = {
        "pos": data["train"]["pos"],
        "fx": x_norm.encode(data["train"]["x"])[..., None].astype(np.float32),
        "y": data["train"]["y"].astype(np.float32),
    }
    test = {
        "pos": data["test"]["pos"],
        "fx": x_norm.encode(data["test"]["x"])[..., None].astype(np.float32),
        "y": data["test"]["y"].astype(np.float32),
    }

    model = maybe_pipeline(cfg.model.build(), mesh, args)
    rel_l2 = RelLpLoss(size_average=False)
    dx = 1.0 / s
    y_mean = jnp.asarray(y_norm.mean.squeeze())
    y_std = jnp.asarray(y_norm.std.squeeze())
    bs = cfg.train.batch_size

    def loss_fn(out, batch):
        out = out[..., 0] * y_std + y_mean  # decode (train on decoded scale)
        y = batch["y"]
        l2 = rel_l2(out, y) / out.shape[0]
        # gradient regularizer with zeroed boundary ring (exp_darcy.py:219-226)
        outz = zero_boundary(out[..., None], s)
        gx_p, gy_p = central_diff(outz, dx, s)
        gx_t, gy_t = central_diff(y[..., None], dx, s)
        deriv = (
            rel_l2(gx_p, gx_t) + rel_l2(gy_p, gy_t)
        ) / out.shape[0]
        return l2 + 0.1 * deriv, {"rel_l2": l2, "deriv": deriv}

    def eval_fn(out, batch):
        out = out[..., 0] * y_std + y_mean
        return {"loss": rel_l2(out, batch["y"]) / out.shape[0]}

    # reference steps_per_epoch = len(train_loader) with drop_last=False
    steps_per_epoch = max(1, -(-len(train["y"]) // bs))
    trainer = Trainer(
        model=model,
        loss_fn=loss_fn,
        eval_fn=eval_fn,
        cfg=cfg.train,
        total_steps=steps_per_epoch * cfg.train.epochs,
        batch_args=lambda b: (b["pos"], b["fx"]),
        mesh=mesh,
    )
    state = trainer.init_state(
        jax.random.PRNGKey(cfg.train.seed),
        {k: v[:bs] for k, v in train.items()},
    )
    print(f"Total Trainable Params: {trainer.num_params(state)}")

    logger = MetricsLogger(os.path.join(args.out_dir, "darcy_metrics.jsonl"))
    ckpt = Checkpointer(os.path.join(args.out_dir, "checkpoints", "darcy"))
    if args.resume:
        state = trainer.maybe_restore(state, ckpt)
    state = trainer.fit(
        state,
        train_batches=batch_iter(train, bs, shuffle=True, seed=1),
        eval_batches=batch_iter(test, bs, shuffle=False),
        logger=logger,
        checkpointer=ckpt,
    )
    # final eval
    from _common import weighted_eval
    rel = weighted_eval(trainer, state, test, bs)
    print(f"rel_err:{rel}")

    if args.showcase:
        # prediction / gt / error renders (reference exp_darcy.py:166-200)
        from haet_tpu.utils.visualization import plot_prediction_triptych
        batch = {k: v[:1] for k, v in test.items()}
        # the jitted public eval path — eager apply pays per-op dispatch
        # latency through the tunneled runtime (~70 s/sample measured;
        # the reason Trainer.predict exists)
        out = trainer.predict(state, batch)
        pred = np.asarray(out)[0, :, 0] * float(y_std) + float(y_mean)
        out_dir = os.path.join(args.out_dir, "results", "darcy")
        plot_prediction_triptych(pred, batch["y"][0], s, s, out_dir, 1)
        print(f"showcase renders -> {out_dir}")
    logger.close()
    return rel


if __name__ == "__main__":
    p = argparse.ArgumentParser("HAET-TPU Darcy")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=4, dest="batch_size")
    p.add_argument("--n-hidden", type=int, default=128, dest="n_hidden")
    p.add_argument("--n-layers", type=int, default=8, dest="n_layers")
    p.add_argument("--n-heads", type=int, default=8, dest="n_heads")
    p.add_argument("--slice_num", type=int, default=64)
    p.add_argument("--mlp_ratio", type=int, default=1)
    p.add_argument("--max_grad_norm", type=float, default=None,
                   help="global grad-norm clip (reference HAET_Darcy.sh "
                        "passes 0.1)")
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient accumulation: microbatches per optimizer "
                        "step (must divide --batch-size)")
    p.add_argument("--downsample", type=int, default=5)
    p.add_argument("--unified_pos", type=int, default=0)
    p.add_argument("--ntrain", type=int, default=1000)
    p.add_argument("--ntest", type=int, default=200)
    p.add_argument("--bf16", type=int, default=0)
    p.add_argument("--mu_bf16", type=int, default=0,
                   help="store Adam's first moment in bfloat16 "
                        "(saves 2 bytes/param of optimizer-state HBM)")
    p.add_argument("--data_path", type=str, default="./data/fno")
    p.add_argument("--out_dir", type=str, default="./runs")
    p.add_argument("--showcase", action="store_true",
                   help="save prediction/gt/error images after eval")
    p.add_argument("--resume", action="store_true",
                   help="resume from the last checkpoint in out_dir")
    from _common import add_mesh_args
    add_mesh_args(p)
    p.add_argument("--smoke", action="store_true",
                   help="tiny synthetic run (CI/dev)")
    args = p.parse_args()
    if args.smoke:
        args.epochs = 2
        args.n_hidden = 32
        args.n_layers = 2
        args.n_heads = 4
        args.slice_num = 16
        args.batch_size = 2
        args.ntrain, args.ntest = 8, 4
        args.downsample = 14  # 31x31
    main(args)
