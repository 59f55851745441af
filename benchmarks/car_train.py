#!/usr/bin/env python
"""ShapeNet-Car aerodynamics benchmark: training + evaluation.

Mirrors the reference's ``benchmarks/02-Car-Design-ShapeNetCar``
(``main.py`` config, ``train.py`` loop, ``main_evaluation.py`` metrics):

* HAET irregular model, n_hidden=256, 2 layers, 8 heads, slice_num=32,
  mlp_ratio=2, enc_depths=(4,4), rotate=45 (``main.py:41-67``,
  ``Transolver.py:50-64``);
* loss = MSE(velocity) + 0.5 * MSE(surface pressure) (``train.py:82-85``),
  Adam + OneCycle, grad-clip 1.0, EarlyStopping(patience=7);
* eval: per-sample rel-L2 (surface pressure / exterior velocity), drag
  coefficient rel. error + Spearman rho over the fold
  (``main_evaluation.py:275-357``).

Ragged car meshes are padded to 2k buckets with a validity mask so jit
recompiles stay bounded. Synthetic stand-in data when no dataset present.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from haet_tpu.utils.env import apply_platform_override  # noqa: E402

apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np

from haet_tpu.data import shapenet_car
from haet_tpu.train import Checkpointer, MetricsLogger, Trainer
from haet_tpu.utils.config import shapenet_car_config

BUCKET = 2048


def bucket_size(n: int) -> int:
    return ((n + BUCKET - 1) // BUCKET) * BUCKET


def make_batch(sample):
    n_pad = bucket_size(len(sample.pos))
    _, x, y, surf, mask = shapenet_car.pad_sample(sample, n_pad)
    return {
        "x": x[None], "y": y[None], "surf": surf[None].astype(np.float32),
        "mask": mask[None].astype(np.float32),
    }


def loss_fn_builder(reg: float):
    def loss_fn(out, batch):
        mask = batch["mask"][..., None]
        surf = batch["surf"]
        y = batch["y"]
        v_err = ((out[..., :3] - y[..., :3]) ** 2) * mask
        loss_velo = v_err.sum() / jnp.maximum((mask * 3).sum(), 1.0)
        p_err = ((out[..., 3] - y[..., 3]) ** 2) * surf
        loss_press = p_err.sum() / jnp.maximum(surf.sum(), 1.0)
        return loss_velo + reg * loss_press, {
            "loss_velo": loss_velo, "loss_press": loss_press,
        }
    return loss_fn


def evaluate(trainer, state, samples, coef, logger=None):
    """Per-sample rel-L2 + drag metrics (main_evaluation.py:275-357)."""
    from haet_tpu.data.car_metrics import drag_coefficient, spearman_rho

    rel_p, rel_v, times = [], [], []
    mses_p, mses_v = [], []
    cd_pred, cd_gt = [], []
    for s in samples:
        batch = make_batch(s)
        t0 = time.perf_counter()
        out = np.asarray(trainer.predict(state, batch))[0]
        times.append(time.perf_counter() - t0)
        n = len(s.pos)
        out = out[:n]
        yd = coef.decode_y(s.y)
        od = coef.decode_y(out)
        surf = s.surf
        ext = ~surf
        rel_p.append(
            np.linalg.norm(od[surf, 3] - yd[surf, 3])
            / (np.linalg.norm(yd[surf, 3]) + 1e-12)
        )
        rel_v.append(
            np.linalg.norm(od[ext, :3] - yd[ext, :3])
            / (np.linalg.norm(yd[ext, :3]) + 1e-12)
        )
        # normalized-scale MSEs, denormalized to RMSE at the end
        # (reference main_evaluation.py:314-315,346-350)
        mses_p.append(np.mean((out[surf, 3] - s.y[surf, 3]) ** 2))
        mses_v.append(np.mean((out[ext, :3] - s.y[ext, :3]) ** 2, axis=0))
        if s.quads is not None and s.surf_slice is not None:
            pts = s.pos[s.surf_slice]
            cd_pred.append(drag_coefficient(
                pts, s.quads, od[s.surf_slice, 3], od[s.surf_slice, :3]))
            cd_gt.append(drag_coefficient(
                pts, s.quads, yd[s.surf_slice, 3], yd[s.surf_slice, :3]))
    std_out = np.asarray(coef.std_out).reshape(-1)
    rmse_velo_var = np.sqrt(np.mean(mses_v, axis=0)) * std_out[:3]
    metrics = {
        "rel_l2_press": float(np.mean(rel_p)),
        "rel_l2_velo": float(np.mean(rel_v)),
        # denormalized RMSEs (reference "press:" / "velo:" lines)
        "rmse_press": float(np.sqrt(np.mean(mses_p)) * std_out[3]),
        "rmse_velo": float(np.sqrt(np.mean(rmse_velo_var ** 2))),
        "time_per_sample": float(np.mean(times)),
    }
    if cd_gt:
        cd_pred, cd_gt = np.asarray(cd_pred), np.asarray(cd_gt)
        metrics["cd_rel_err"] = float(
            np.mean(np.abs(cd_pred - cd_gt) / (np.abs(cd_gt) + 1e-12))
        )
        metrics["rho_d"] = spearman_rho(cd_pred, cd_gt)
    if logger:
        logger.log({f"eval/{k}": v for k, v in metrics.items()})
    return metrics


def main(args):
    cfg = shapenet_car_config()
    cfg.train.epochs = args.epochs
    cfg.train.lr = args.lr
    cfg.model.n_hidden = args.n_hidden
    cfg.model.n_layers = args.n_layers
    cfg.model.slice_num = args.slice_num
    cfg.model.bf16 = bool(args.bf16)
    cfg.train.mu_bf16 = bool(getattr(args, "mu_bf16", 0))
    if args.smoke:
        # reset the preset's pinned Erwin sizing (8-head, depth-4, vendored
        # reference config) to the defaults, which scale with n_head —
        # 8 erwin heads cannot split a dim_head of 32/8=4
        cfg.model.n_head = 4
        cfg.model.enc_num_heads = cfg.model.enc_depths = None
        cfg.model.dec_num_heads = cfg.model.dec_depths = None
        cfg.model.erwin_mlp_ratio = None
        cfg.model.embed = False
    from _common import make_mesh_from_args, maybe_pipeline
    mesh = make_mesh_from_args(cfg, args)

    train_s, val_s, coef, is_synth = shapenet_car.load_train_val_fold(
        args.data_dir, args.fold_id, savedir=args.save_dir,
        preprocessed=args.preprocessed,
    )
    if is_synth:
        print("[car_train] dataset not found -> synthetic stand-in data")
    print(f"train {len(train_s)} / val {len(val_s)} samples")

    model = maybe_pipeline(cfg.model.build(), mesh, args)
    trainer = Trainer(
        model=model,
        loss_fn=loss_fn_builder(args.weight),
        cfg=cfg.train,
        total_steps=len(train_s) * cfg.train.epochs,
        batch_args=lambda b: (b["x"], None),
        mesh=mesh,
    )
    state = trainer.init_state(
        jax.random.PRNGKey(cfg.train.seed), make_batch(train_s[0])
    )
    print(f"nb_parameters {trainer.num_params(state)}")

    logger = MetricsLogger(os.path.join(args.out_dir, "car_metrics.jsonl"))
    ckpt = Checkpointer(os.path.join(args.out_dir, "checkpoints", "car"))
    if args.resume:
        state = trainer.maybe_restore(state, ckpt)

    # one RandomState OUTSIDE the factory: fit() re-calls train_batches()
    # every epoch, and a re-seeded state would replay the identical sample
    # order for all epochs (the reference's DataLoader reshuffles per epoch)
    shuffle_rng = np.random.RandomState(0)

    def train_batches():
        order = shuffle_rng.permutation(len(train_s))
        for i in order:
            yield make_batch(train_s[i])

    def eval_batches():
        for s in val_s:
            yield make_batch(s)

    from haet_tpu.data import Prefetcher

    state = trainer.fit(
        state,
        # overlap host-side batch assembly (padding etc.) with the device
        # step — the reference's DataLoader-worker analogue
        Prefetcher(train_batches, depth=args.prefetch) if args.prefetch
        else train_batches,
        eval_batches,
        logger=logger, checkpointer=ckpt,
    )

    metrics = evaluate(trainer, state, val_s, coef, logger)
    print("relative l2 error press:", metrics["rel_l2_press"])
    print("relative l2 error velo:", metrics["rel_l2_velo"])
    print("press:", metrics["rmse_press"])
    print("velo:", metrics["rmse_velo"])
    if "rho_d" in metrics:
        print("rho_d:", metrics["rho_d"], "c_d:", metrics["cd_rel_err"])
    print("time:", metrics["time_per_sample"])
    logger.close()
    return metrics


if __name__ == "__main__":
    p = argparse.ArgumentParser("HAET-TPU ShapeNet-Car")
    p.add_argument("--data_dir", type=str,
                   default="./data/shapenet_car/mlcfd_data/training_data")
    p.add_argument("--save_dir", type=str, default=None)
    p.add_argument("--preprocessed", action="store_true")
    p.add_argument("--fold_id", type=int, default=0)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight", type=float, default=0.5)
    p.add_argument("--n_hidden", type=int, default=256)
    p.add_argument("--n_layers", type=int, default=2)
    p.add_argument("--slice_num", type=int, default=32)
    p.add_argument("--bf16", type=int, default=0)
    p.add_argument("--mu_bf16", type=int, default=0,
                   help="store Adam's first moment in bfloat16 "
                        "(saves 2 bytes/param of optimizer-state HBM)")
    p.add_argument("--out_dir", type=str, default="./runs")
    p.add_argument("--prefetch", type=int, default=2,
                   help="background batch prefetch depth (0 disables)")
    from _common import add_mesh_args
    add_mesh_args(p)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()
    if args.smoke:
        args.epochs = 2
        args.n_hidden = 32
        args.n_layers = 1
        args.slice_num = 16
    main(args)
