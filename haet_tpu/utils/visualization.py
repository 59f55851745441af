"""Visualization utilities: slice-weight heatmaps and field renders.

Mirrors the reference's artifacts:

* slice-weight visualization over car meshes / point clouds
  (reference ``benchmarks/02-.../utils/visualization.py:20-60``, fed by
  ``get_last_block_slice_weights``, ``Transolver.py:319-321``) — here the
  weights are captured with flax ``capture_intermediates``
  (:func:`get_slice_weights`);
* prediction / ground-truth / error image triptychs for grid benchmarks
  (reference ``exp_darcy.py:166-200``).

All functions require matplotlib and are host-side only.
"""

from __future__ import annotations

import os

import numpy as np


def get_slice_weights(model, variables, *args, block: int = -1, **kwargs):
    """Run a forward pass capturing every block's rep-slice weights.

    Returns the ``[B, heads, N, G]`` weights of ``block`` (default: last),
    the analogue of the reference's ``get_last_block_slice_weights``.
    """
    _, mods = model.apply(
        variables, *args, mutable=["intermediates"], **kwargs
    )
    inter = mods["intermediates"]

    found = []

    def walk(tree, path=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k == "slice_weights":
                    found.append((path, v[0]))
                else:
                    walk(v, path + (k,))

    walk(inter)
    found.sort(key=lambda kv: kv[0])
    if not found:
        raise ValueError("no slice_weights captured (use_pallas path?)")
    return np.asarray(found[block][1])


def plot_field_grid(field, h, w, path, title=None, cmap="coolwarm",
                    clim=None):
    """Save one grid field image (reference exp_darcy.py:166-200)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure()
    plt.axis("off")
    plt.imshow(np.asarray(field).reshape(h, w), cmap=cmap)
    plt.colorbar()
    if clim:
        plt.clim(*clim)
    if title:
        plt.title(title)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path, bbox_inches="tight")
    plt.close()


def plot_prediction_triptych(pred, gt, h, w, out_dir, case_id,
                             err_clim=(-0.0005, 0.0005)):
    """pred / gt / error renders for one grid sample."""
    plot_field_grid(pred, h, w, os.path.join(out_dir, f"case_{case_id}_pred.png"))
    plot_field_grid(gt, h, w, os.path.join(out_dir, f"case_{case_id}_gt.png"))
    plot_field_grid(np.asarray(gt) - np.asarray(pred), h, w,
                    os.path.join(out_dir, f"case_{case_id}_error.png"),
                    clim=err_clim)


def plot_slice_weights_cloud(pos, slice_weights, out_dir, head: int = 0,
                             top_k: int = 6, batch: int = 0):
    """Scatter the top-k slices' weight heatmaps over a point cloud
    (reference visualization.py:20-60).

    Args:
        pos: ``[N, 3]`` or ``[N, 2]`` point positions.
        slice_weights: ``[B, heads, N, G]``.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    w = np.asarray(slice_weights)[batch, head]       # [N, G]
    pos = np.asarray(pos)
    mass = w.sum(axis=0)
    top = np.argsort(-mass)[:top_k]
    os.makedirs(out_dir, exist_ok=True)
    for rank, g in enumerate(top):
        fig = plt.figure(figsize=(6, 5))
        if pos.shape[1] >= 3:
            ax = fig.add_subplot(111, projection="3d")
            sc = ax.scatter(pos[:, 0], pos[:, 1], pos[:, 2], c=w[:, g],
                            s=1, cmap="viridis")
        else:
            ax = fig.add_subplot(111)
            sc = ax.scatter(pos[:, 0], pos[:, 1], c=w[:, g], s=1,
                            cmap="viridis")
        fig.colorbar(sc)
        ax.set_title(f"slice {g} (head {head})")
        fig.savefig(os.path.join(out_dir, f"slice_{rank}_g{g}.png"),
                    bbox_inches="tight", dpi=120)
        plt.close(fig)
