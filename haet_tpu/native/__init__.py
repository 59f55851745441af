"""Native (C++/OpenMP) host-side components, loaded via ctypes.

The exact median-split ball tree lives here — the parity oracle for the
on-device grouping in :mod:`haet_tpu.ops.ball_groups` and a host
preprocessing option for static point sets. Mirrors the reference's
C++/Cython component semantics (``models/components/balltree/``) without
being on the hot path: TPU forward passes never call into this.

The shared library is compiled on first use with g++ (-O3 -fopenmp) and
cached next to the source.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "balltree.cpp")
_LIB = os.path.join(_HERE, "libballtree.so")
_lock = threading.Lock()
_lib = None


def _build_lib():
    cmd = [
        "g++", "-O3", "-std=c++17", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (compiling if needed) the native library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build_lib()
        lib = ctypes.CDLL(_LIB)
        lib.haet_tree_slots.restype = ctypes.c_int64
        lib.haet_tree_slots.argtypes = [ctypes.c_int64]
        lib.haet_build_balltree.restype = ctypes.c_int64
        lib.haet_build_balltree.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.haet_partition_balltree.restype = ctypes.c_int64
        lib.haet_partition_balltree.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.haet_num_threads.restype = ctypes.c_int64
        _lib = lib
        return lib


def _offsets_from_batch_idx(batch_idx: np.ndarray) -> np.ndarray:
    """Convert a sorted batch-index vector to offsets
    (mirrors ``balltree.pyx:462-471`` incl. its validation)."""
    batch_idx = np.asarray(batch_idx, dtype=np.int64)
    if batch_idx.ndim != 1 or len(batch_idx) == 0:
        raise ValueError("batch_idx must be a non-empty 1D array")
    if batch_idx[0] != 0:
        raise ValueError("Batch indices must start from 0")
    if np.any(np.diff(batch_idx) < 0):
        raise ValueError("batch_idx must be sorted")
    n = len(batch_idx)
    change = np.flatnonzero(batch_idx[1:] != batch_idx[:-1]) + 1
    num_batches = int(batch_idx[-1]) + 1
    offsets = np.zeros(num_batches + 1, dtype=np.int64)
    offsets[1:num_batches] = change
    offsets[num_batches] = n
    return offsets


def _cptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def build_balltree(data: np.ndarray, batch_idx: np.ndarray):
    """Exact batched ball tree.

    Args:
        data: ``[N, dim]`` float array (any dtype; computed in float64 like
            the reference bridge, ``balltree.pyx:542``).
        batch_idx: ``[N]`` sorted batch assignment.

    Returns:
        ``(tree_idx, tree_mask)`` flat arrays in tree order, one entry per
        leaf slot (2 per leaf; duplicates masked False), matching the
        reference ``build_balltree`` contract (``balltree.pyx:525-550``).
    """
    lib = get_lib()
    data = np.ascontiguousarray(data, dtype=np.float64)
    if data.ndim != 2:
        raise ValueError(f"data must be 2D, got {data.shape}")
    if data.shape[0] != len(batch_idx):
        raise ValueError("batch_idx length must match number of points")
    offsets = _offsets_from_batch_idx(batch_idx)
    nb = len(offsets) - 1
    slots = np.array(
        [lib.haet_tree_slots(int(offsets[i + 1] - offsets[i]))
         for i in range(nb)],
        dtype=np.int64,
    )
    out_offsets = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(slots, out=out_offsets[1:])
    total = int(out_offsets[-1])
    out_idx = np.empty(total, dtype=np.int64)
    out_mask = np.empty(total, dtype=np.uint8)
    rc = lib.haet_build_balltree(
        _cptr(data, ctypes.c_double), data.shape[1],
        _cptr(offsets, ctypes.c_int64), _cptr(out_offsets, ctypes.c_int64),
        nb, _cptr(out_idx, ctypes.c_int64), _cptr(out_mask, ctypes.c_uint8),
    )
    if rc != 0:
        raise RuntimeError(f"native build_balltree failed rc={rc}")
    return out_idx, out_mask.astype(bool)


def partition_balltree(data: np.ndarray, batch_idx: np.ndarray,
                       target_level: int):
    """Partition-only tree over existing orderings
    (reference ``balltree.pyx:552-574``)."""
    lib = get_lib()
    data = np.ascontiguousarray(data, dtype=np.float64)
    offsets = _offsets_from_batch_idx(batch_idx)
    out_idx = np.empty(data.shape[0], dtype=np.int64)
    rc = lib.haet_partition_balltree(
        _cptr(data, ctypes.c_double), data.shape[1],
        _cptr(offsets, ctypes.c_int64), len(offsets) - 1, int(target_level),
        _cptr(out_idx, ctypes.c_int64),
    )
    if rc != 0:
        raise RuntimeError(f"native partition_balltree failed rc={rc}")
    return out_idx


def build_balltree_with_rotations(data: np.ndarray, batch_idx: np.ndarray,
                                  strides, ball_sizes, angle: float = 45.0):
    """Host-side analogue of ``build_balltree_with_rotations``
    (``balltree.pyx:598-662``): main tree + per-level rotated partitions
    with stride-mean coarsening in between."""
    from ..ops.ball_groups import rotation_matrix

    assert len(strides) == len(ball_sizes) - 1
    data = np.asarray(data, dtype=np.float64)
    dim = data.shape[1]
    num_layers = len(ball_sizes)

    tree_idx, tree_mask = build_balltree(data, batch_idx)
    if angle <= 0:
        return tree_idx, tree_mask, [None] * num_layers

    leaves = data[tree_idx]
    cur_batch = np.asarray(batch_idx, dtype=np.int64)[tree_idx]
    targets = [max(0, int(math.log2(leaves.shape[0] / bs)))
               for bs in ball_sizes]
    rot = np.asarray(rotation_matrix(angle, dim), dtype=np.float64)
    rotated = leaves @ rot
    rot_indices = []
    for i in range(num_layers):
        rot_indices.append(partition_balltree(rotated, cur_batch, targets[i]))
        if i < num_layers - 1:
            s = strides[i]
            rotated = rotated.reshape(-1, s, dim).mean(axis=1)
            cur_batch = cur_batch[::s]
    return tree_idx, tree_mask, rot_indices


# ---------------------------------------------------------------------------
# Native legacy-VTK reader (vtkread.cpp) — the C++ data-loader path for the
# ShapeNet-Car pipeline (reference loads via the VTK library,
# dataset.py:161-181; the numpy fallback lives in haet_tpu/data/vtk_io.py).
# ---------------------------------------------------------------------------

_VTK_SRC = os.path.join(_HERE, "vtkread.cpp")
_VTK_LIB = os.path.join(_HERE, "libvtkread.so")
_vtk_lib = None


def get_vtk_lib():
    """Load (compiling if needed) the native VTK reader library."""
    global _vtk_lib
    with _lock:
        if _vtk_lib is not None:
            return _vtk_lib
        if (not os.path.exists(_VTK_LIB)
                or os.path.getmtime(_VTK_LIB) < os.path.getmtime(_VTK_SRC)):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                 _VTK_SRC, "-o", _VTK_LIB],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_VTK_LIB)
        lib.haet_vtk_parse.restype = ctypes.c_void_p
        lib.haet_vtk_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.haet_vtk_free.argtypes = [ctypes.c_void_p]
        for name in ("num_points", "num_cells", "cells_flat_size",
                     "num_cell_types"):
            fn = getattr(lib, f"haet_vtk_{name}")
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_void_p]
        lib.haet_vtk_num_fields.restype = ctypes.c_int64
        lib.haet_vtk_num_fields.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.haet_vtk_field_name.restype = ctypes.c_char_p
        lib.haet_vtk_field_name.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int64]
        for name in ("field_size", "field_ncomp"):
            fn = getattr(lib, f"haet_vtk_{name}")
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int64]
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.haet_vtk_get_points.argtypes = [ctypes.c_void_p, f32p]
        lib.haet_vtk_get_cell_sizes.argtypes = [ctypes.c_void_p, i64p]
        lib.haet_vtk_get_cell_index.argtypes = [ctypes.c_void_p, i64p]
        lib.haet_vtk_get_cell_types.argtypes = [ctypes.c_void_p, i64p]
        lib.haet_vtk_get_field.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int64, f32p]
        _vtk_lib = lib
        return _vtk_lib


def vtk_parse(raw: bytes) -> dict:
    """Parse a legacy .vtk buffer natively.

    Returns a dict with ``points [n,3] f32``, ``cell_sizes`` /
    ``cell_flat`` (compact connectivity), ``cell_types [m] i64`` (or
    None), ``point_data`` / ``cell_data`` (name -> [n, ncomp] f32) — the
    same content contract as :func:`haet_tpu.data.vtk_io.read_vtk_legacy`.
    """
    lib = get_vtk_lib()
    h = lib.haet_vtk_parse(raw, len(raw))
    if not h:
        raise ValueError("native VTK parse failed")
    try:
        n = lib.haet_vtk_num_points(h)
        points = np.empty((n, 3), np.float32)
        if n:
            lib.haet_vtk_get_points(
                h, points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))

        m = lib.haet_vtk_num_cells(h)
        sizes = np.empty(m, np.int64)
        flat = np.empty(lib.haet_vtk_cells_flat_size(h), np.int64)
        if m:
            lib.haet_vtk_get_cell_sizes(
                h, sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            lib.haet_vtk_get_cell_index(
                h, flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))

        nt = lib.haet_vtk_num_cell_types(h)
        cell_types = None
        if nt:
            cell_types = np.empty(nt, np.int64)
            lib.haet_vtk_get_cell_types(
                h, cell_types.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))

        def fields(point_data: int) -> dict:
            out = {}
            for i in range(lib.haet_vtk_num_fields(h, point_data)):
                name = lib.haet_vtk_field_name(h, point_data, i).decode()
                size = lib.haet_vtk_field_size(h, point_data, i)
                ncomp = lib.haet_vtk_field_ncomp(h, point_data, i)
                arr = np.empty(size, np.float32)
                if size:
                    lib.haet_vtk_get_field(
                        h, point_data, i,
                        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
                out[name] = arr.reshape(-1, ncomp)
            return out

        return {
            "points": points,
            "cell_sizes": sizes,
            "cell_flat": flat,
            "cell_types": cell_types,
            "point_data": fields(1),
            "cell_data": fields(0),
        }
    finally:
        lib.haet_vtk_free(h)
