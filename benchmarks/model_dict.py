"""Model registry (reference ``benchmarks/04-.../model_dict.py:8-14``).

Maps ``--model`` names to model classes so drivers can stay generic.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from haet_tpu.models import (  # noqa: E402
    HAETransolverIrregularMesh,
    HAETransolverStructuredMesh2D,
    HAETransolverStructuredMesh3D,
)

MODEL_DICT = {
    "Transolver_2D": HAETransolverStructuredMesh2D,
    "Transolver_3D": HAETransolverStructuredMesh3D,
    "Transolver_1D": HAETransolverIrregularMesh,
    "HAETransolver_Structured_Mesh_2D": HAETransolverStructuredMesh2D,
    "HAETransolver_Structured_Mesh_3D": HAETransolverStructuredMesh3D,
    "HAETransolver_Irregular_Mesh": HAETransolverIrregularMesh,
}


def get_model(args):
    """Return the model class for ``args.model`` (reference model_dict.py)."""
    name = args.model if hasattr(args, "model") else args
    if name not in MODEL_DICT:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(MODEL_DICT)}"
        )
    return MODEL_DICT[name]
