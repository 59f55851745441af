"""Transolver++ rep-slice tokenizer ops (pure JAX, Pallas-fusable).

Implements "Transolver++ Algorithm 1" numerics exactly as the reference does
(reference ``models/PhysicsAttention/StructuredMesh2D.py:180-262``):

1. Ada-Temp:    ``tau = tau0 + clamp(Linear(x), -0.4, 0.4)``       (:193)
2. Rep-Slice:   ``w = softmax((Linear(x) - log(-log(eps))) / tau)`` with the
   softmax over the **points** axis (dim=2)                        (:197-199)
3. Eidetic:     ``s = einsum('bhnc,bhng->bhgc', x, w) / (sum_n w + 1e-5)``
                                                                    (:202-213)
4. Deslice:     ``x' = einsum('bhgc,bhng->bhnc', s, w)``           (:253-255)

All functions operate on the multi-head layout ``x: [B, H, N, C]``,
``w: [B, H, N, G]`` and are shape-polymorphic in N — sharding the N axis
across chips turns the reductions into one ``psum`` (exact context parallel).

These are the two N-scaling hot ops of the whole model; on TPU they compile to
large MXU matmuls. A fused Pallas variant lives in
``haet_tpu.ops.pallas.slice_kernels``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

#: the reference's slice-norm regularizer (StructuredMesh2D.py:211-213)
SLICE_NORM_EPS = 1e-5


def ada_temp(temp_raw, base_temp: float = 0.5, clamp: float = 0.4):
    """Adaptive temperature ``tau = tau0 + clamp(raw, +-clamp)``.

    Args:
        temp_raw: ``[..., 1]`` output of the Ada-Temp linear head.
    """
    return base_temp + jnp.clip(temp_raw, -clamp, clamp)


def rep_slice_weights(slice_logits, temperature, epsilon: float = 1e-6):
    """Rep-Slice softmax over the points axis.

    Args:
        slice_logits: ``[B, H, N, G]`` raw outputs of the slice linear head.
        temperature: ``[B, H, N, 1]`` adaptive temperature.
        epsilon: the Gumbel-trick epsilon; logits are shifted by
            ``-log(-log(eps))`` (StructuredMesh2D.py:197-198).

    Returns:
        ``[B, H, N, G]`` slice weights, softmax-normalized over axis 2 (N).
    """
    shift = math.log(-math.log(epsilon))
    logits = (slice_logits - shift) / temperature
    # Softmax over the points axis N (dim=2), matching the reference exactly
    # (StructuredMesh2D.py:199). Numerically stabilized.
    m = jnp.max(logits, axis=2, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=2, keepdims=True)


def eidetic_states(x_proj, slice_weights):
    """Weighted center-of-mass slice states (StructuredMesh2D.py:202-213).

    Args:
        x_proj: ``[B, H, N, C]`` projected features (value == key source:
            the 50%-memory eidetic trick, StructuredMesh2D.py:106,181).
        slice_weights: ``[B, H, N, G]``.

    Returns:
        ``[B, H, G, C]`` eidetic states.
    """
    states = jnp.einsum(
        "bhnc,bhng->bhgc", x_proj, slice_weights,
        preferred_element_type=jnp.float32,
    )
    norm = jnp.sum(slice_weights.astype(jnp.float32), axis=2)  # [B, H, G]
    out = states / (norm + SLICE_NORM_EPS)[..., None]
    # accumulate in f32, store in the compute dtype (halves HBM traffic
    # under the bf16 policy; exact for f32 inputs)
    return out.astype(x_proj.dtype)


def deslice(states, slice_weights):
    """Project slice states back onto points (StructuredMesh2D.py:253-255).

    Args:
        states: ``[B, H, G, C]`` transformed eidetic states.
        slice_weights: ``[B, H, N, G]`` (the *same* weights used to slice).

    Returns:
        ``[B, H, N, C]``.
    """
    return jnp.einsum(
        "bhgc,bhng->bhnc", states, slice_weights,
        preferred_element_type=jnp.float32,
    ).astype(states.dtype)


def merge_heads(x):
    """``[B, H, N, C] -> [B, N, H*C]`` (StructuredMesh2D.py:259)."""
    b, h, n, c = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, n, h * c)


def split_heads(x, heads: int):
    """``[B, N, H*C] -> [B, H, N, C]`` (StructuredMesh2D.py:182-189)."""
    b, n, hc = x.shape
    c = hc // heads
    return jnp.transpose(x.reshape(b, n, heads, c), (0, 2, 1, 3))
