"""MLP building blocks (Flax linen).

Covers the reference's shared MLP (reference ``models/components/mlp.py:23-96``)
and Erwin's SwiGLU (reference
``models/components/erwinflash/components/mlp.py:8-18``).

The reference keeps an activation registry with a latent bug (the
``leaky_relu`` entry is an *instance*, ``models/components/mlp.py:16``); here
the registry holds plain callables so every entry behaves the same.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

# Activation registry mirroring reference models/components/mlp.py:11-20.
ACTIVATION: dict[str, Callable] = {
    "gelu": nn.gelu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "relu": nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.1),
    "softplus": jax.nn.softplus,
    "ELU": nn.elu,
    "silu": nn.silu,
}

# torch's nn.GELU default is the exact (erf) formulation; flax's default is
# tanh-approximate in some versions, so resolve explicitly for parity.
ACTIVATION["gelu"] = lambda x: nn.gelu(x, approximate=False)


def get_activation(act: str) -> Callable:
    if act not in ACTIVATION:
        raise NotImplementedError(f"activation {act!r} not supported")
    return ACTIVATION[act]


def trunc_normal_init(std: float = 0.02, a: float = -2.0, b: float = 2.0):
    """timm-style truncated normal init (reference HAETransolver_*:_init_weights).

    timm's ``trunc_normal_(t, std=0.02)`` truncates at the ABSOLUTE bounds
    a=-2, b=2 — at std=0.02 that is ±100σ, i.e. effectively an untruncated
    normal. jax's ``truncated_normal`` bounds are in σ units, so the bounds
    must be divided by std (passing ±2 directly would clip at ±2σ and
    shrink the realized std ~12% below the reference's)."""
    return nn.initializers.truncated_normal(
        stddev=std, lower=a / std, upper=b / std)


class MLP(nn.Module):
    """Pre-Linear+act, ``n_layers`` hidden layers (optional residual), post-Linear.

    Mirrors reference ``models/components/mlp.py:23-96``.
    """

    n_hidden: int
    n_output: int
    n_layers: int = 1
    act: str = "gelu"
    res: bool = True
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.act)
        dense = lambda feat, name: nn.Dense(  # noqa: E731
            feat,
            kernel_init=trunc_normal_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        x = act(dense(self.n_hidden, "linear_pre")(x))
        for i in range(self.n_layers):
            h = act(dense(self.n_hidden, f"linear_{i}")(x))
            x = h + x if self.res else h
        return dense(self.n_output, "linear_post")(x)


class SwiGLU(nn.Module):
    """``w3(w2(x) * silu(w1(x)))`` — reference erwinflash ``mlp.py:8-18``."""

    dim: int
    hidden_dim: int
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dense = lambda feat, name: nn.Dense(  # noqa: E731
            feat,
            kernel_init=trunc_normal_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        w1 = dense(self.hidden_dim, "w1")(x)
        w2 = dense(self.hidden_dim, "w2")(x)
        return dense(self.dim, "w3")(w2 * nn.silu(w1))
