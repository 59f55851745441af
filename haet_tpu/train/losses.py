"""Losses & metrics — parity with the reference benchmark utilities.

* :class:`RelLpLoss` mirrors ``TestLoss``
  (reference ``benchmarks/04-.../utils/testloss.py:31-45``): per-sample
  relative Lp norm over the flattened non-batch axes.
* :func:`central_diff` mirrors the Darcy gradient regularizer
  (reference ``exp_darcy.py:59-68``).
* :func:`mse_press_velo` mirrors the ShapeNet-Car composite loss
  ``MSE(velocity) + reg * MSE(surface pressure)``
  (reference ``benchmarks/02-.../train.py:82-85``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class RelLpLoss:
    d: int = 2
    p: int = 2
    size_average: bool = True
    reduction: bool = True

    def _norm(self, x, axis):
        return jnp.sum(jnp.abs(x) ** self.p, axis=axis) ** (1.0 / self.p)

    def abs(self, x, y):
        n = x.shape[0]
        h = 1.0 / (x.shape[1] - 1.0)
        all_norms = (h ** (self.d / self.p)) * self._norm(
            x.reshape(n, -1) - y.reshape(n, -1), axis=1
        )
        return self._reduce(all_norms)

    def rel(self, x, y):
        n = x.shape[0]
        diff = self._norm(x.reshape(n, -1) - y.reshape(n, -1), axis=1)
        ynorm = self._norm(y.reshape(n, -1), axis=1)
        return self._reduce(diff / ynorm)

    def _reduce(self, v):
        if not self.reduction:
            return v
        return jnp.mean(v) if self.size_average else jnp.sum(v)

    def __call__(self, x, y):
        return self.rel(x, y)


def central_diff(x, h: float, resolution: int):
    """PBC-padded central differences on a square grid
    (reference ``exp_darcy.py:59-68``).

    Args:
        x: ``[B, H*W, C]``.
    Returns:
        ``(grad_x, grad_y)`` each ``[B, H, W, C]``.
    """
    b, n, c = x.shape
    x = x.reshape(b, resolution, resolution, c)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    grad_x = (x[:, 1:-1, 2:, :] - x[:, 1:-1, :-2, :]) / (2 * h)
    grad_y = (x[:, 2:, 1:-1, :] - x[:, :-2, 1:-1, :]) / (2 * h)
    return grad_x, grad_y


def zero_boundary(x, resolution: int):
    """Zero out the outer ring of a square-grid field
    (the reference's pad-crop trick, ``exp_darcy.py:219-222``)."""
    b, n, c = x.shape
    xg = x.reshape(b, resolution, resolution, c)
    mask = jnp.zeros((resolution, resolution), x.dtype)
    mask = mask.at[1:-1, 1:-1].set(1.0)
    return (xg * mask[None, :, :, None]).reshape(b, n, c)


def mse_press_velo(pred, target, surf_mask, reg: float = 0.5):
    """ShapeNet-Car loss: velocity MSE + ``reg`` x surface-pressure MSE.

    Args:
        pred/target: ``[N, 4]`` (3 velocity + 1 pressure).
        surf_mask: ``[N]`` bool, True on surface points.
    """
    loss_velo = jnp.mean((pred[..., :3] - target[..., :3]) ** 2)
    press_err = (pred[..., 3] - target[..., 3]) ** 2
    w = surf_mask.astype(pred.dtype)
    loss_press = jnp.sum(press_err * w) / jnp.maximum(jnp.sum(w), 1.0)
    return loss_velo + reg * loss_press, (loss_velo, loss_press)
