#!/usr/bin/env python
"""Erwin-only ShapeNet-Car baseline (reference ``benchmarks/02.1``).

Bare :class:`ErwinTransformer` over the raw 7-feature car points (no
physics-attention tokenizer) + a 2-layer prediction head, config
``c_hidden=[128,128], ball_sizes=[64,32], enc_depths=[4,4], mp_steps=3``
(reference ``02.1/main.py:59-73``). Baseline numbers to compare:
rel-L2 press 0.1335 / velo 0.0766 (ErwinEval.out).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from haet_tpu.utils.env import apply_platform_override  # noqa: E402

apply_platform_override()

import jax
import numpy as np
from flax import linen as nn

from haet_tpu.data import shapenet_car
from haet_tpu.models import ErwinTransformer
from haet_tpu.ops.ball_groups import pad_pow2
from haet_tpu.train import Checkpointer, MetricsLogger, Trainer
from haet_tpu.utils.config import TrainConfig

from car_train import evaluate, loss_fn_builder, make_batch  # noqa: E402


class ErwinCarModel(nn.Module):
    """ErwinTransformer + prediction head (reference 02.1/main.py:51-106)."""

    hidden_dim: int = 128
    mp_steps: int = 3
    # reference 02.1 builds the MPNN graph with radius_graph(r=0.2,
    # default neighbor cap 32) (02.1/main.py:53-102)
    radius: float = 0.2

    @nn.compact
    def __call__(self, x, fx=None, *, train: bool = False):
        # x: [B, N, 7]; positions are the first 3 features.
        pos = x[..., :3]
        xp, posp, mask = pad_pow2(x, pos)
        out = ErwinTransformer(
            c_in=7,
            c_hidden=(self.hidden_dim, self.hidden_dim),
            ball_sizes=(64, 32),
            enc_num_heads=(8, 8),
            enc_depths=(4, 4),
            dec_num_heads=(8,),
            dec_depths=(4,),
            strides=(2,),
            rotate=45,
            decode=True,
            mlp_ratio=4,
            dimensionality=3,
            mp_steps=self.mp_steps,
            mp_radius=self.radius,
            mp_neighbors=32,
            embed=True,
            name="erwin",
        )(xp, posp, mask=mask, train=train)
        out = out[:, : x.shape[1]]
        h = nn.Dense(self.hidden_dim, name="head1")(out)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(4, name="head2")(h)


def main(args):
    train_s, val_s, coef, is_synth = shapenet_car.load_train_val_fold(
        args.data_dir, args.fold_id,
    )
    if is_synth:
        print("[erwin_baseline] dataset not found -> synthetic stand-in data")

    cfg = TrainConfig(lr=args.lr, epochs=args.epochs, batch_size=1,
                      max_grad_norm=1.0, early_stop_patience=7)
    model = ErwinCarModel(hidden_dim=args.hidden_dim, mp_steps=args.mp_steps,
                          radius=args.r)
    trainer = Trainer(
        model=model, loss_fn=loss_fn_builder(args.weight), cfg=cfg,
        total_steps=len(train_s) * cfg.epochs,
        batch_args=lambda b: (b["x"],),
    )
    state = trainer.init_state(jax.random.PRNGKey(0), make_batch(train_s[0]))
    print(f"nb_parameters {trainer.num_params(state)}")

    logger = MetricsLogger(os.path.join(args.out_dir, "erwin_metrics.jsonl"))
    ckpt = Checkpointer(os.path.join(args.out_dir, "checkpoints", "erwin_car"))

    # one RandomState OUTSIDE the factory: fit() re-calls train_batches()
    # every epoch, and a re-seeded state would replay the identical sample
    # order for all epochs (the reference's DataLoader reshuffles per epoch)
    shuffle_rng = np.random.RandomState(0)

    def train_batches():
        order = shuffle_rng.permutation(len(train_s))
        for i in order:
            yield make_batch(train_s[i])

    state = trainer.fit(
        state, train_batches, lambda: (make_batch(s) for s in val_s),
        logger=logger, checkpointer=ckpt,
    )
    metrics = evaluate(trainer, state, val_s, coef, logger)
    print("relative l2 error press:", metrics["rel_l2_press"])
    print("relative l2 error velo:", metrics["rel_l2_velo"])
    logger.close()
    return metrics


if __name__ == "__main__":
    p = argparse.ArgumentParser("HAET-TPU Erwin-only car baseline")
    p.add_argument("--data_dir", type=str,
                   default="./data/shapenet_car/mlcfd_data/training_data")
    p.add_argument("--fold_id", type=int, default=0)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight", type=float, default=0.5)
    p.add_argument("--hidden_dim", type=int, default=128)
    p.add_argument("--mp_steps", type=int, default=3)
    p.add_argument("--r", type=float, default=0.2,
                   help="MPNN radius-graph radius (reference 02.1 default)")
    p.add_argument("--out_dir", type=str, default="./runs")
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()
    if args.smoke:
        args.epochs = 1
        args.hidden_dim = 32
        args.mp_steps = 1
    main(args)
