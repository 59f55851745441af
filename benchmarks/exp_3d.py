#!/usr/bin/env python
"""Volumetric (3D structured) benchmark driver.

The reference ships the 3D model (``HAETransolver_Structured_Mesh_3D``) but
no committed experiment for it; this driver exercises the full 3D path
(Conv3d slice projection, ref^3 unified position encoding, optional gradient
checkpointing) on a synthetic heat-diffusion volume — BASELINE.json config
#3 ("HAETransolver_Structured_Mesh_3D on a 3D structured PDE benchmark").
"""

from __future__ import annotations

import os

import numpy as np

from _common import (apply_model_args, base_parser, make_mesh_from_args,
                     maybe_pipeline,
                     shrink_for_smoke)

import jax

from haet_tpu.data import batch_iter
from haet_tpu.train import (
    Checkpointer, MetricsLogger, RelLpLoss, Trainer, UnitTransformer,
)
from haet_tpu.utils.config import ExperimentConfig, ModelConfig, TrainConfig


def heat3d_like(n: int, s: int, seed: int = 0):
    """Initial temperature field -> diffused field after k steps."""
    rng = np.random.RandomState(seed)
    u0 = rng.randn(n, s, s, s).astype(np.float32)
    # smooth the initial condition
    for _ in range(2):
        u0 = sum(np.roll(u0, sh, ax) for ax in (1, 2, 3) for sh in (-1, 1)) / 6
    u = u0.copy()
    for _ in range(10):
        u = 0.4 * u + 0.6 * (
            sum(np.roll(u, sh, ax) for ax in (1, 2, 3) for sh in (-1, 1)) / 6
        )
    g = np.linspace(0, 1, s, dtype=np.float32)
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    pos = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)[None].repeat(n, 0)
    return pos, u0.reshape(n, -1), u.reshape(n, -1)


def main(args):
    s = 16 if args.smoke else 32
    cfg = ExperimentConfig(
        name="heat3d",
        model=ModelConfig(
            variant="structured_3d", space_dim=3, fun_dim=1, out_dim=1,
            n_layers=args.n_layers, n_hidden=args.n_hidden,
            n_head=args.n_heads, slice_num=args.slice_num,
            mlp_ratio=args.mlp_ratio, H=s, W=s, D=s,
            unified_pos=bool(args.unified_pos), ref=4,
            use_checkpoint=not args.smoke,
        ),
        train=TrainConfig(lr=args.lr, epochs=args.epochs,
                          batch_size=args.batch_size),
    )
    cfg = apply_model_args(cfg, args)
    # apply_model_args would overwrite use_checkpoint with the CLI value;
    # when the flag was not given (None default set below), full-size 32^3
    # runs default to remat, an explicit --use_checkpoint 0/1 always wins.
    cfg.model.use_checkpoint = (
        (not args.smoke) if args.use_checkpoint is None
        else bool(args.use_checkpoint))
    mesh = make_mesh_from_args(cfg, args)
    cfg.model.H = cfg.model.W = cfg.model.D = s
    # apply_model_args copied args.ref in; cfg.model.ref stays whatever
    # the user asked for (this driver's DEFAULT is 4, set at the parser —
    # ref^3 position channels at the base_parser default 8 would be 512)

    pos_tr, x_tr, y_tr = heat3d_like(max(8, min(args.ntrain, 32)), s, 0)
    pos_te, x_te, y_te = heat3d_like(max(4, min(args.ntest, 8)), s, 1)

    x_norm = UnitTransformer(x_tr)
    y_norm = UnitTransformer(y_tr)
    train = {"pos": pos_tr, "fx": x_norm.encode(x_tr)[..., None].astype(np.float32),
             "y": y_tr.astype(np.float32)}
    test = {"pos": pos_te, "fx": x_norm.encode(x_te)[..., None].astype(np.float32),
            "y": y_te.astype(np.float32)}

    model = maybe_pipeline(cfg.model.build(), mesh, args)
    rel_l2 = RelLpLoss(size_average=False)
    y_mean = np.float32(y_norm.mean.squeeze())
    y_std = np.float32(y_norm.std.squeeze())
    bs = cfg.train.batch_size

    def loss_fn(out, batch):
        out = out[..., 0] * y_std + y_mean
        l2 = rel_l2(out, batch["y"]) / out.shape[0]
        return l2, {"rel_l2": l2}

    steps = max(1, -(-len(train["y"]) // bs))  # ceil: partial batch kept
    trainer = Trainer(
        model=model, loss_fn=loss_fn, cfg=cfg.train,
        total_steps=steps * cfg.train.epochs,
        batch_args=lambda b: (b["pos"], b["fx"]),
        mesh=mesh,
    )
    state = trainer.init_state(jax.random.PRNGKey(0),
                               {k: v[:bs] for k, v in train.items()})
    print(f"Total Trainable Params: {trainer.num_params(state)}")
    logger = MetricsLogger(os.path.join(args.out_dir, "heat3d_metrics.jsonl"))
    ckpt = Checkpointer(os.path.join(args.out_dir, "checkpoints", "heat3d"))
    state = trainer.fit(
        state, batch_iter(train, bs, True, 1), batch_iter(test, bs, False),
        logger=logger, checkpointer=ckpt,
    )
    from _common import weighted_eval
    rel = weighted_eval(trainer, state, test, bs)
    print(f"rel_err:{rel}")
    logger.close()
    return rel


if __name__ == "__main__":
    p = base_parser("HAET-TPU 3D volume")
    p.set_defaults(use_checkpoint=None)  # None = "not given" -> remat on
    # full-size runs (see main); explicit 0/1 always wins
    p.set_defaults(ref=4)  # ref^3 unified-pos channels: 4^3=64 is this
    # driver's default; an explicit --ref is honored (main no longer
    # silently forces 4 over the CLI value)
    args = p.parse_args()
    if args.smoke:
        shrink_for_smoke(args)
    main(args)
