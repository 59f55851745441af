#!/usr/bin/env python
"""Pipe benchmark (reference ``exp_pipe.py``): 129x129 mesh coordinates as
input, fun_dim=0 (the placeholder path), rel-L2 on the decoded field.
Reference result to match: rel-L2 0.00505 (overall_results.md:7)."""

from __future__ import annotations

import os

from _common import (apply_model_args, base_parser, make_mesh_from_args,
                     maybe_pipeline,
                     shrink_for_smoke)

import jax
import numpy as np

from haet_tpu.data import batch_iter
from haet_tpu.data.pde_datasets import load_structured_mesh
from haet_tpu.train import (
    Checkpointer, MetricsLogger, RelLpLoss, Trainer, UnitTransformer,
)
from haet_tpu.utils.config import pipe_config


def run(args, prefix="Pipe", h=129, w=129, config_fn=pipe_config,
        name="pipe"):
    cfg = apply_model_args(config_fn(), args)
    mesh = make_mesh_from_args(cfg, args)
    if args.smoke:
        h, w = 33, 33
    data = load_structured_mesh(args.data_path, prefix, args.ntrain,
                                args.ntest, h, w)
    if data["synthetic"]:
        print(f"[{name}] dataset not found -> synthetic stand-in data")
    h, w = data["h"], data["w"]
    cfg.model.H, cfg.model.W = h, w

    x_norm = UnitTransformer(data["train"]["pos"])
    y_norm = UnitTransformer(data["train"]["y"])
    train = {
        "pos": x_norm.encode(data["train"]["pos"]).astype(np.float32),
        "y": data["train"]["y"].astype(np.float32),
    }
    test = {
        "pos": x_norm.encode(data["test"]["pos"]).astype(np.float32),
        "y": data["test"]["y"].astype(np.float32),
    }

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
        batch_args=lambda b: (b["pos"], None),
        mesh=mesh,
    )
    state = trainer.init_state(jax.random.PRNGKey(cfg.train.seed),
                               {k: v[:bs] for k, v in train.items()})
    print(f"Total Trainable Params: {trainer.num_params(state)}")
    logger = MetricsLogger(os.path.join(args.out_dir, f"{name}_metrics.jsonl"))
    ckpt = Checkpointer(os.path.join(args.out_dir, "checkpoints", name))
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
    args = base_parser("HAET-TPU Pipe").parse_args()
    if args.smoke:
        shrink_for_smoke(args)
    run(args)
