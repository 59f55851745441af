"""Segment reductions — the ``torch_scatter`` equivalents.

The reference depends on the torch_scatter CUDA extension for
``scatter_mean`` (``erwinflash/components/utils/scatter_ops.py:5-18``);
on TPU these are one-liner wrappers over ``jax.ops.segment_sum`` with
static segment counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int):
    """Sum ``data[i]`` into ``out[segment_ids[i]]``; [N, ...] -> [S, ...]."""
    return jax.ops.segment_sum(data, segment_ids, num_segments)


def segment_mean(data, segment_ids, num_segments: int):
    """Mean-aggregate (the reference's ``scatter_mean``); empty segments
    give 0 (matching torch_scatter).

    Sums and counts accumulate in f32 regardless of ``data.dtype`` (result
    is cast back) — accumulating in bf16 saturates: summing ones sticks at
    256 (256 + 1 rounds back to 256), inflating the mean of any segment
    larger than ~256 elements."""
    s = jax.ops.segment_sum(
        data.astype(jnp.float32), segment_ids, num_segments)
    cnt = jax.ops.segment_sum(
        jnp.ones(data.shape[:1], jnp.float32), segment_ids, num_segments
    )
    mean = s / jnp.maximum(cnt, 1.0)[(...,) + (None,) * (data.ndim - 1)]
    return mean.astype(data.dtype)


def segment_max(data, segment_ids, num_segments: int):
    return jax.ops.segment_max(data, segment_ids, num_segments)
