#!/usr/bin/env python
"""Elasticity benchmark (reference ``exp_elas.py``): 972-point unit-cell
point clouds, fun_dim=0, HAETransolver_Irregular_Mesh.
Reference result to match: rel-L2 0.10848 (overall_results.md:9)."""

from __future__ import annotations

import os

from _common import (apply_model_args, base_parser, make_mesh_from_args,
                     maybe_pipeline,
                     shrink_for_smoke)

import jax
import numpy as np

from haet_tpu.data import batch_iter
from haet_tpu.data.pde_datasets import load_elasticity
from haet_tpu.train import (
    Checkpointer, MetricsLogger, RelLpLoss, Trainer, UnitGaussianNormalizer,
)
from haet_tpu.utils.config import elasticity_config


def main(args):
    cfg = apply_model_args(elasticity_config(), args)
    mesh = make_mesh_from_args(cfg, args)
    data = load_elasticity(args.data_path, args.ntrain, args.ntest)
    if data["synthetic"]:
        print("[elasticity] dataset not found -> synthetic stand-in data")

    y_norm = UnitGaussianNormalizer(data["train"]["y"])
    train = {
        "pos": data["train"]["pos"].astype(np.float32),
        "y": data["train"]["y"].astype(np.float32),
        "y_enc": y_norm.encode(data["train"]["y"]).astype(np.float32),
    }
    test = {
        "pos": data["test"]["pos"].astype(np.float32),
        "y": data["test"]["y"].astype(np.float32),
        "y_enc": y_norm.encode(data["test"]["y"]).astype(np.float32),
    }

    model = maybe_pipeline(cfg.model.build(), mesh, args)
    rel_l2 = RelLpLoss(size_average=False)
    y_mean = np.asarray(y_norm.mean, np.float32)
    y_std = np.asarray(y_norm.std + y_norm.eps, np.float32)
    bs = cfg.train.batch_size

    def loss_fn(out, batch):
        out = out[..., 0] * y_std + y_mean
        l2 = rel_l2(out, batch["y"]) / out.shape[0]
        return l2, {"rel_l2": l2}

    steps = max(1, -(-len(train["y"]) // bs))  # ceil: partial batch kept
    trainer = Trainer(
        model=model, loss_fn=loss_fn, cfg=cfg.train,
        total_steps=steps * cfg.train.epochs,
        batch_args=lambda b: (b["pos"], None),
        mesh=mesh,
    )
    state = trainer.init_state(jax.random.PRNGKey(cfg.train.seed),
                               {k: v[:bs] for k, v in train.items()})
    print(f"Total Trainable Params: {trainer.num_params(state)}")
    logger = MetricsLogger(os.path.join(args.out_dir, "elas_metrics.jsonl"))
    ckpt = Checkpointer(os.path.join(args.out_dir, "checkpoints", "elas"))
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
    p = base_parser("HAET-TPU Elasticity")
    p.set_defaults(batch_size=1)  # reference HAETransolver_Elas.sh; an
    # explicit --batch-size (e.g. for --dp) is respected
    args = p.parse_args()
    if args.smoke:
        shrink_for_smoke(args)
    main(args)
