"""haet_tpu — a TPU-native JAX framework with the capabilities of HAET.

HAET (Hierarchical Attention Erwin Transolver) fuses Transolver++'s rep-slice
physics attention with Erwin's ball-tree hierarchical attention.  This package
is a from-scratch rebuild designed for TPU:

* the slice/deslice tokenizer runs as dense batched einsums (optionally fused
  Pallas kernels) in bf16 on the MXU;
* ball-tree grouping is an **on-device** vectorized median-split (or Morton
  sort) producing static-shape permutations, so the whole train step compiles
  under one ``jax.jit`` — no host round trips (the reference rebuilds a
  host-side C++ tree inside every layer, see reference
  ``models/components/balltree/balltree.pyx:542-550``);
* scaling is SPMD over a ``jax.sharding.Mesh`` (data parallel over batch,
  optional tensor parallel over attention heads).

Public API mirrors the reference ``models`` package
(reference ``models/__init__.py:15-23``):

>>> from haet_tpu.models import (
...     HAETransolver_Structured_Mesh_2D,
...     HAETransolver_Structured_Mesh_3D,
...     HAETransolver_Irregular_Mesh,
... )
"""

__version__ = "0.7.1"

from . import data, export, models, ops, parallel, serve, train, utils  # noqa: F401,E402
