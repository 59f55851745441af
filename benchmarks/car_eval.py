#!/usr/bin/env python
"""ShapeNet-Car evaluation CLI (reference ``main_evaluation.py``).

Loads a checkpoint saved by ``car_train.py`` and reports per-sample rel-L2
(surface pressure / exterior velocity), inference latency, drag-coefficient
relative error and Spearman rho, plus optional slice-weight visualization
(``--visualize``, reference ``main_evaluation.py:423-427``).
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

from haet_tpu.data import shapenet_car
from haet_tpu.train import Checkpointer, Trainer
from haet_tpu.utils.config import shapenet_car_config

from car_train import evaluate, loss_fn_builder, make_batch  # noqa: E402


def main(args):
    cfg = shapenet_car_config()
    cfg.model.n_hidden = args.n_hidden
    cfg.model.n_layers = args.n_layers
    cfg.model.slice_num = args.slice_num
    if getattr(args, "smoke", False):
        # same sizing reset as car_train --smoke: the preset's pinned
        # 8-head Erwin config cannot split tiny hidden dims
        cfg.model.n_head = 4
        cfg.model.enc_num_heads = cfg.model.enc_depths = None
        cfg.model.dec_num_heads = cfg.model.dec_depths = None
        cfg.model.erwin_mlp_ratio = None
        cfg.model.embed = False

    train_s, val_s, coef, is_synth = shapenet_car.load_train_val_fold(
        args.data_dir, args.fold_id, savedir=args.save_dir,
        preprocessed=args.preprocessed,
    )
    model = cfg.model.build()
    # inference-only CLI: a constant schedule avoids constructing the
    # preset's onecycle over total_steps=1 (whose tiny-horizon stretch
    # warning would misleadingly flag a "training run" that never takes
    # an optimizer step)
    import dataclasses as _dc

    trainer = Trainer(
        model=model, loss_fn=loss_fn_builder(0.5),
        cfg=_dc.replace(cfg.train, schedule="constant"),
        total_steps=1, batch_args=lambda b: (b["x"], None),
    )
    state = trainer.init_state(jax.random.PRNGKey(0), make_batch(val_s[0]))
    if getattr(args, "torch_checkpoint", None):
        # Evaluate a checkpoint trained by the REFERENCE code (torch .pt,
        # main.py/train.py) — imported into the flax tree.
        from haet_tpu.utils.torch_import import load_torch_checkpoint

        variables = load_torch_checkpoint(
            args.torch_checkpoint,
            {"params": state.params, "batch_stats": state.batch_stats})
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        print(f"[car_eval] imported reference torch checkpoint "
              f"{args.torch_checkpoint}")
    else:
        ckpt = Checkpointer(args.checkpoint_dir)
        template = jax.tree_util.tree_map(np.asarray, state)
        try:
            restored = ckpt.restore(template, args.which)
        except Exception:
            # A checkpoint written by a --pp (pipeline-parallel) run stores
            # the pipeline layout {pre, layers, head}; convert it to the
            # plain model's blocks_i tree for evaluation.
            raw = ckpt.restore_raw(args.which)
            if raw is None or "layers" not in (raw.get("params") or {}):
                raise
            from haet_tpu.parallel.pipeline import merge_raw_variables

            merged = merge_raw_variables(raw)
            restored = state.replace(
                params=merged["params"],
                batch_stats=(merged["batch_stats"]
                             if jax.tree_util.tree_leaves(
                                 merged["batch_stats"])
                             else state.batch_stats))
            print("[car_eval] converted a --pp pipeline-layout checkpoint "
                  "to the plain model layout")
        if restored is None:
            print(f"[car_eval] no checkpoint at "
                  f"{args.checkpoint_dir}/{args.which}"
                  " — evaluating the random init")
        else:
            state = restored

    metrics = evaluate(trainer, state, val_s, coef)
    print("relative l2 error press:", metrics["rel_l2_press"])
    print("relative l2 error velo:", metrics["rel_l2_velo"])
    if "rho_d" in metrics:
        print("rho_d:", metrics["rho_d"])
        print("c_d:", metrics["cd_rel_err"])
    print("time:", metrics["time_per_sample"])

    # save_preds and scatter share ONE prediction pass over the fold (each
    # tunneled dispatch costs 30-150 ms; don't pay it twice).
    save_preds = getattr(args, "save_preds", False)
    scatter = args.scatter and "rho_d" in metrics
    cds_p, cds_g = [], []
    if save_preds or scatter:
        from haet_tpu.data.car_metrics import drag_coefficient

        results_dir = os.path.join(args.out_dir, "results")
        if save_preds:
            # per-sample DENORMALIZED prediction/gt dumps, reference
            # main_evaluation.py:252,297-298 ({index}_pred.npy /
            # {index}_gt.npy in a results directory)
            os.makedirs(results_dir, exist_ok=True)
        for idx, s_ in enumerate(val_s):
            out = trainer.predict(state, make_batch(s_))
            od = coef.decode_y(np.asarray(out)[0][: len(s_.pos)])
            yd = coef.decode_y(s_.y)
            if save_preds:
                np.save(os.path.join(results_dir, f"{idx}_pred.npy"), od)
                np.save(os.path.join(results_dir, f"{idx}_gt.npy"), yd)
            # surf_slice=None would make pos[s_.surf_slice] a newaxis
            # index (silently wrong Cd), not an error — skip like
            # evaluate() does
            if scatter and s_.quads is not None and s_.surf_slice is not None:
                pts = s_.pos[s_.surf_slice]
                cds_p.append(drag_coefficient(pts, s_.quads,
                                              od[s_.surf_slice, 3],
                                              od[s_.surf_slice, :3]))
                cds_g.append(drag_coefficient(pts, s_.quads,
                                              yd[s_.surf_slice, 3],
                                              yd[s_.surf_slice, :3]))
        if save_preds:
            print(f"per-sample predictions -> {results_dir} "
                  f"({len(val_s)} samples)")

    if scatter:
        # Cd predicted-vs-true scatter (reference main_evaluation.py:360-417)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.scatter(cds_g, cds_p, s=16)
        lo, hi = min(cds_g + cds_p), max(cds_g + cds_p)
        ax.plot([lo, hi], [lo, hi], "k--", lw=1)
        ax.set_xlabel("true Cd")
        ax.set_ylabel("predicted Cd")
        ax.set_title(f"rho_d={metrics['rho_d']:.3f}")
        os.makedirs(args.out_dir, exist_ok=True)
        fig.savefig(os.path.join(args.out_dir, "cd_scatter.png"),
                    bbox_inches="tight", dpi=120)
        print(f"Cd scatter -> {args.out_dir}/cd_scatter.png")

    if args.export_artifact:
        # AOT serving artifact (haet_tpu/export.py): the eval-mode forward
        # at this fold's serving shape, runnable later without model code.
        from haet_tpu.export import save_artifact

        batch = make_batch(val_s[0])
        variables = {"params": state.params}
        if jax.tree_util.tree_leaves(state.batch_stats):
            variables["batch_stats"] = state.batch_stats
        n = int(np.shape(batch["x"])[1])
        provenance = {"fold_id": args.fold_id,
                      # provenance: where the weights actually came from
                      "checkpoint": (
                          f"torch:{args.torch_checkpoint}"
                          if getattr(args, "torch_checkpoint", None)
                          else args.which)}
        if getattr(args, "export_point_buckets", None):
            # bucket family for RAGGED folds: real car meshes span
            # ~29-38k points per sample (reference main_evaluation.py
            # serves each at its native N); export one batch family per
            # bucket so `serve_http --pad_to_points 1` covers the fold
            # (outputs truncated back; deviation measured in
            # docs/measurements/pad_deviation_flagship_r5.jsonl)
            from haet_tpu.serve import export_point_family

            buckets = sorted(int(b) for b in
                             args.export_point_buckets.split(","))
            path = export_point_family(
                args.export_artifact, model, variables,
                (batch["x"], None), point_buckets=buckets,
                batch_sizes=(1, 2, 4), extra_manifest=provenance)
            print(f"serving point-bucket family ({buckets}) -> {path}")
        else:
            path = save_artifact(
                os.path.join(args.export_artifact, f"b1_n{n}"),
                model, variables, (batch["x"], None),
                extra_manifest=provenance,
            )
            print(f"serving artifact -> {path}")

    if args.visualize:
        # Full reference artifact set (visualization.py:20-260): mesh +
        # top-k overlay, per-slice dominance masks, total heatmap, 2D
        # projections — all on the car surface points.
        from haet_tpu.utils.visualization import (
            get_slice_weights, visualize_car_and_slices,
        )
        s = val_s[0]
        batch = make_batch(s)
        variables = {"params": state.params}
        if jax.tree_util.tree_leaves(state.batch_stats):
            variables["batch_stats"] = state.batch_stats
        w = get_slice_weights(model, variables, batch["x"], None)
        vis_dir = os.path.join(args.out_dir, "visualizations")
        visualize_car_and_slices(
            s, w, vis_dir, sample_idx=0,
            max_slice_figs=args.max_slice_figs,
        )
        print(f"slice visualizations -> {vis_dir}")
    return metrics


if __name__ == "__main__":
    p = argparse.ArgumentParser("HAET-TPU ShapeNet-Car evaluation")
    p.add_argument("--data_dir", type=str,
                   default="./data/shapenet_car/mlcfd_data/training_data")
    p.add_argument("--save_dir", type=str, default=None)
    p.add_argument("--preprocessed", action="store_true")
    p.add_argument("--fold_id", type=int, default=0)
    p.add_argument("--checkpoint_dir", type=str,
                   default="./runs/checkpoints/car")
    p.add_argument("--torch_checkpoint", type=str, default=None,
                   help="evaluate a reference-trained torch .pt checkpoint "
                        "(imported via haet_tpu.utils.torch_import)")
    p.add_argument("--which", type=str, default="best",
                   choices=["best", "last"])
    p.add_argument("--n_hidden", type=int, default=256)
    p.add_argument("--n_layers", type=int, default=2)
    p.add_argument("--slice_num", type=int, default=32)
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--max_slice_figs", type=int, default=None,
                   help="cap per-slice dominance figures (None = all G, "
                        "as the reference)")
    p.add_argument("--scatter", action="store_true")
    p.add_argument("--save_preds", action="store_true",
                   help="save per-sample denormalized pred/gt .npy dumps "
                        "into out_dir/results (reference "
                        "main_evaluation.py:297-298)")
    p.add_argument("--out_dir", type=str, default="./runs")
    p.add_argument("--export_artifact", type=str, default=None,
                   help="write an AOT StableHLO serving artifact "
                        "(haet_tpu.export) to this directory")
    p.add_argument("--export_point_buckets", type=str, default=None,
                   help="comma-separated point counts: export a "
                        "point-bucket batch family under "
                        "--export_artifact instead of one exact-N "
                        "artifact, so a RAGGED fold serves via "
                        "serve_http --pad_to_points 1 (e.g. "
                        "'30720,32768,34816,36864,38912' for real car "
                        "meshes)")
    p.add_argument("--smoke", action="store_true")
    main(p.parse_args())
