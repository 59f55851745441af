"""Core device-side ops: rep-slice tokenizer, ball grouping, neighbors."""

from . import ball_groups, neighbors, scatter, slice_ops  # noqa: F401
from .ball_groups import (  # noqa: F401
    ErwinPerms,
    build_erwin_perms,
    median_split_perm,
    morton_perm,
    pad_pow2,
    rotation_matrix,
)
from .neighbors import knn_edges, radius_edges  # noqa: F401
from .scatter import segment_max, segment_mean, segment_sum  # noqa: F401
