"""Positional / temporal embeddings.

Mirrors reference ``models/components/embedding.py`` (timestep_embedding at
:69-99, RotaryEmbedding/PositionalEncoding at :8-66 — the latter two are API
surface only, unused by the reference models but exported for parity).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn


def timestep_embedding(timesteps, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embeddings (reference embedding.py:69-99).

    Args:
        timesteps: ``[N]`` or ``[N, 1]`` array of (possibly fractional) times.
        dim: embedding dimension.

    Returns:
        ``[N, dim]`` embeddings (cos in the first half, sin in the second, a
        zero column appended when ``dim`` is odd).
    """
    timesteps = jnp.asarray(timesteps)
    if timesteps.ndim == 2:
        timesteps = timesteps[:, 0]
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


def rotary_frequencies(coordinates, dim: int, min_freq: float = 1 / 2,
                       scale: float = 1.0):
    """RotaryEmbedding.forward (reference embedding.py:8-21).

    Args:
        coordinates: ``[B, N]`` coordinate values.
    Returns:
        ``[B, N, dim]`` frequencies (duplicated halves).
    """
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = coordinates * (scale / min_freq)
    freqs = jnp.einsum("...i,j->...ij", t, inv_freq)
    return jnp.concatenate([freqs, freqs], axis=-1)


def _rotate_half(x):
    x = x.reshape(*x.shape[:-1], 2, x.shape[-1] // 2)
    x1, x2 = x[..., 0, :], x[..., 1, :]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb(t, freqs):
    return (t * jnp.cos(freqs)) + (_rotate_half(t) * jnp.sin(freqs))


def apply_2d_rotary_pos_emb(t, freqs_x, freqs_y):
    """reference embedding.py:34-43."""
    d = t.shape[-1]
    t_x, t_y = t[..., : d // 2], t[..., d // 2:]
    return jnp.concatenate(
        [apply_rotary_pos_emb(t_x, freqs_x), apply_rotary_pos_emb(t_y, freqs_y)],
        axis=-1,
    )


class PositionalEncoding(nn.Module):
    """Classic sinusoidal PE table (reference embedding.py:46-66)."""

    d_model: int
    dropout: float = 0.0
    max_len: int = 421 * 421

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        position = jnp.arange(self.max_len, dtype=jnp.float32)[:, None]
        div_term = jnp.exp(
            jnp.arange(0, self.d_model, 2, dtype=jnp.float32)
            * -(math.log(10000.0) / self.d_model)
        )
        pe = jnp.zeros((self.max_len, self.d_model))
        pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
        pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
        x = x + pe[None, : x.shape[1]]
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)
