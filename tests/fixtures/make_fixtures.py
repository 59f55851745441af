"""Generate the committed dataset fixtures (small files, upstream formats).

The real datasets (FNO suite + ShapeNet-Car, see scripts/fetch_datasets.py)
are multi-GB and absent from this environment, so the loader tests exercise
*real bytes* via these miniature files instead: identical container formats,
key names, dtypes, and axis layouts as the upstream files — only smaller.

Formats reproduced (reference file:line for each layout):

* Darcy ``piececonst_r421_N1024_smooth{1,2}.mat`` — MATLAB v5 .mat with
  ``coeff``/``sol`` [N, S, S] float64 (``exp_darcy.py:77-91``).
* NS ``NavierStokes_V1e-5_N1200_T20.mat`` — MATLAB **v7.3** (HDF5 with the
  512-byte MATLAB userblock, arrays stored transposed / column-major), key
  ``u`` [N, S, S, T] (``exp_ns.py``; the v7.3 branch of
  ``haet_tpu.data.pde_datasets._loadmat``).
* Airfoil ``NACA_Cylinder_{X,Y,Q}.npy`` (Q 4-dim, 5 channels) and Pipe
  ``Pipe_{X,Y,Q}.npy`` (Q 4-dim) (``exp_airfoil.py:83-101``,
  ``exp_pipe.py:83-100``).
* Elasticity ``Random_UnitCell_{XY,sigma}_10.npy`` (``exp_elas.py:73-85``).
* Plasticity ``plas_N987_T20.mat`` v5 with ``input`` [N,H] (2-D profile,
  broadcast across W by the loader) / ``output`` [N,H,W,T,4]
  (``exp_plas.py:124-135``).
* ShapeNet-Car ``param0/<id>/{quadpress_smpl.vtk,hexvelo_smpl.vtk}`` —
  legacy VTK UNSTRUCTURED_GRID; the press file ASCII with quad CELLS +
  SCALARS point data, the velo file BINARY big-endian with VECTORS point
  data and the surface points embedded among the volume points
  (``dataset.py:161-225``).

Deterministic (fixed seeds): tests re-derive the expected arrays by calling
the ``*_arrays()`` helpers and compare against what the loaders parse.

Run from the repo root:  python tests/fixtures/make_fixtures.py
"""

from __future__ import annotations

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data")


# --------------------------------------------------------------------------
# expected-array builders (also imported by tests)
# --------------------------------------------------------------------------

def darcy_arrays(which: int):
    rng = np.random.RandomState(10 + which)
    n, s = 3, 41
    coeff = np.where(rng.rand(n, s, s) > 0.5, 12.0, 3.0)
    sol = rng.rand(n, s, s) * 0.01
    return coeff, sol


def ns_arrays():
    rng = np.random.RandomState(20)
    return rng.randn(4, 16, 16, 12).astype(np.float64)


def airfoil_arrays():
    rng = np.random.RandomState(30)
    X = rng.rand(4, 17, 9)
    Y = rng.rand(4, 17, 9)
    # 5 channels like the real NACA files — the reference trains on
    # channel 4 (exp_airfoil.py:90), so a wrong-channel pick is detectable
    Q = rng.randn(4, 5, 17, 9)
    return X, Y, Q


def pipe_arrays():
    rng = np.random.RandomState(40)
    X = rng.rand(4, 13, 13)
    Y = rng.rand(4, 13, 13)
    # 4-D [N, C, H, W] like the real Pipe_Q.npy — the reference trains on
    # channel 0 (exp_pipe.py:90); C=3 makes a wrong-channel pick detectable
    Q = rng.randn(4, 3, 13, 13)
    return X, Y, Q


def elasticity_arrays():
    rng = np.random.RandomState(50)
    xy = rng.rand(37, 2, 6)      # [points, 2, N] as the upstream file
    sigma = rng.randn(37, 6)     # [points, N]
    return xy, sigma


def plasticity_arrays():
    rng = np.random.RandomState(60)
    # input is a 2-D [N, s1] boundary profile in the real plas_N987_T20.mat
    # — the reference broadcasts it across s2 (exp_plas.py:127-128)
    inp = rng.rand(3, 11)
    out = rng.randn(3, 11, 7, 5, 4) * 0.1
    return inp, out


def car_arrays():
    """A tiny closed 'car': a quad-meshed box surface + volume points."""
    rng = np.random.RandomState(70)
    # surface: 4x4 quads on the z=0 face of a box, plus jitter in z
    g = np.linspace(0.0, 1.0, 5)
    gx, gy = np.meshgrid(g, g, indexing="ij")
    # 3-decimal quantization: the press file is ASCII (%.6f) and the velo
    # file binary (>f4); the surface points appear in BOTH and the loader
    # matches them by exact float32 equality (dataset.py semantics), so the
    # coordinates must round-trip identically through both encodings.
    surf_pts = np.round(np.stack(
        [gx.ravel(), gy.ravel(), 0.05 * np.sin(6 * gx.ravel())], axis=-1
    ), 3)
    quads = []
    for i in range(4):
        for j in range(4):
            a = i * 5 + j
            quads.append([a, a + 1, a + 6, a + 5])
    quads = np.asarray(quads, np.int64)
    press = 0.5 + 0.1 * np.sin(8 * surf_pts[:, 0])

    ext_pts = rng.rand(60, 3) * np.array([1.0, 1.0, 0.8]) + [0.0, 0.0, 0.1]
    velo_pts = np.concatenate([ext_pts, surf_pts])     # surface embedded
    velo = np.concatenate([
        rng.randn(60, 3) * 0.3 + [20.0, 0.0, 0.0],     # exterior flow
        np.zeros((25, 3)),                             # no-slip surface
    ])
    return surf_pts, quads, press, velo_pts, velo


# --------------------------------------------------------------------------
# writers
# --------------------------------------------------------------------------

def _write_mat73(path: str, arrays: dict):
    """HDF5 + 512-byte MATLAB userblock = a real v7.3 .mat container.

    MATLAB stores arrays column-major, i.e. with reversed axis order —
    exactly what ``_loadmat``'s ``np.array(f[k]).T`` undoes.
    """
    import h5py

    with h5py.File(path, "w", userblock_size=512) as f:
        for k, v in arrays.items():
            f[k] = np.ascontiguousarray(np.transpose(v))
    header = b"MATLAB 7.3 MAT-file, created by haet_tpu fixture generator"
    header = header + b" " * (116 - len(header))
    header += b"\x00" * 8                               # subsystem offset
    header += (0x0200).to_bytes(2, "little") + b"IM"    # version + endian
    with open(path, "r+b") as f:
        f.write(header)


def _write_vtk_unstructured_ascii(path, points, cells, cell_type,
                                  point_scalars):
    """Legacy ASCII UNSTRUCTURED_GRID like quadpress_smpl.vtk."""
    k = cells.shape[1]
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 2.0\n")
        f.write("Unstructured Grid Example\n")
        f.write("ASCII\n")
        f.write("DATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {len(points)} float\n")
        for p in points:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        f.write(f"CELLS {len(cells)} {len(cells) * (k + 1)}\n")
        for c in cells:
            f.write(f"{k} " + " ".join(str(int(v)) for v in c) + "\n")
        f.write(f"CELL_TYPES {len(cells)}\n")
        for _ in cells:
            f.write(f"{cell_type}\n")
        for name, arr in point_scalars.items():
            f.write(f"POINT_DATA {len(points)}\n")
            f.write(f"SCALARS {name} float 1\nLOOKUP_TABLE default\n")
            for v in np.asarray(arr).reshape(-1):
                f.write(f"{v:.6f}\n")


def _write_vtk_unstructured_binary(path, points, point_vectors):
    """Legacy BINARY (big-endian) UNSTRUCTURED_GRID like hexvelo_smpl.vtk."""
    with open(path, "wb") as f:
        f.write(b"# vtk DataFile Version 2.0\n")
        f.write(b"Unstructured Grid Example\n")
        f.write(b"BINARY\n")
        f.write(b"DATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {len(points)} float\n".encode())
        f.write(np.asarray(points, ">f4").tobytes())
        f.write(b"\n")
        f.write(f"POINT_DATA {len(points)}\n".encode())
        for name, arr in point_vectors.items():
            f.write(f"VECTORS {name} float\n".encode())
            f.write(np.asarray(arr, ">f4").tobytes())
            f.write(b"\n")


def main():
    import scipy.io as scio

    os.makedirs(DATA, exist_ok=True)

    d = os.path.join(DATA, "darcy")
    os.makedirs(d, exist_ok=True)
    for which, name in ((1, "piececonst_r421_N1024_smooth1.mat"),
                        (2, "piececonst_r421_N1024_smooth2.mat")):
        coeff, sol = darcy_arrays(which)
        scio.savemat(os.path.join(d, name), {"coeff": coeff, "sol": sol})

    d = os.path.join(DATA, "ns")
    os.makedirs(d, exist_ok=True)
    _write_mat73(os.path.join(d, "NavierStokes_V1e-5_N1200_T20.mat"),
                 {"u": ns_arrays()})

    d = os.path.join(DATA, "airfoil")
    os.makedirs(d, exist_ok=True)
    X, Y, Q = airfoil_arrays()
    np.save(os.path.join(d, "NACA_Cylinder_X.npy"), X)
    np.save(os.path.join(d, "NACA_Cylinder_Y.npy"), Y)
    np.save(os.path.join(d, "NACA_Cylinder_Q.npy"), Q)

    d = os.path.join(DATA, "pipe")
    os.makedirs(d, exist_ok=True)
    X, Y, Q = pipe_arrays()
    np.save(os.path.join(d, "Pipe_X.npy"), X)
    np.save(os.path.join(d, "Pipe_Y.npy"), Y)
    np.save(os.path.join(d, "Pipe_Q.npy"), Q)

    d = os.path.join(DATA, "elasticity")
    os.makedirs(d, exist_ok=True)
    xy, sigma = elasticity_arrays()
    np.save(os.path.join(d, "Random_UnitCell_XY_10.npy"), xy)
    np.save(os.path.join(d, "Random_UnitCell_sigma_10.npy"), sigma)

    d = os.path.join(DATA, "plasticity")
    os.makedirs(d, exist_ok=True)
    inp, out = plasticity_arrays()
    scio.savemat(os.path.join(d, "plas_N987_T20.mat"),
                 {"input": inp, "output": out})

    d = os.path.join(DATA, "car", "param0", "fixturecar000")
    os.makedirs(d, exist_ok=True)
    surf_pts, quads, press, velo_pts, velo = car_arrays()
    _write_vtk_unstructured_ascii(
        os.path.join(d, "quadpress_smpl.vtk"), surf_pts, quads,
        cell_type=9, point_scalars={"press": press},
    )
    _write_vtk_unstructured_binary(
        os.path.join(d, "hexvelo_smpl.vtk"), velo_pts,
        {"velocity": velo},
    )

    total = 0
    for root, _, files in os.walk(DATA):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    print(f"fixtures written to {DATA} ({total / 1024:.1f} KiB)")


if __name__ == "__main__":
    main()
