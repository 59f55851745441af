"""Shared components (reference ``models/components/__init__.py:15-24``)."""

from .embedding import (  # noqa: F401
    PositionalEncoding,
    apply_2d_rotary_pos_emb,
    apply_rotary_pos_emb,
    rotary_frequencies,
    timestep_embedding,
)
from .mlp import ACTIVATION, MLP, SwiGLU, get_activation, trunc_normal_init  # noqa: F401
