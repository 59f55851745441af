"""Loaders parse *real bytes*: committed miniature files in the exact
upstream container formats (see tests/fixtures/make_fixtures.py), not the
synthetic fallbacks. Expected values re-derived from the generator's seeded
array builders and compared against what the parsers produce.

Reference formats: exp_darcy.py:77-91 (.mat v5), exp_ns.py (.mat v7.3 /
HDF5), exp_airfoil.py:80-96 / exp_pipe.py:80-95 / exp_elas.py:73-85 (.npy),
dataset.py:161-225 (legacy VTK, ASCII + big-endian binary).
"""

import os
import sys

import numpy as np

from haet_tpu.data import pde_datasets, shapenet_car
from haet_tpu.data.vtk_io import read_vtk_legacy

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "fixtures", "data")
sys.path.insert(0, os.path.join(HERE, "fixtures"))

import make_fixtures as mf  # noqa: E402


def test_darcy_mat_fixture():
    d = pde_datasets.load_darcy(
        os.path.join(DATA, "darcy"), ntrain=3, ntest=3, downsample=5)
    assert not d["synthetic"]
    s = d["s"]
    assert s == 9  # (41-1)/5 + 1
    coeff, sol = mf.darcy_arrays(1)
    np.testing.assert_allclose(
        d["train"]["x"][0].reshape(s, s),
        coeff[0, ::5, ::5][:s, :s], rtol=1e-6)
    np.testing.assert_allclose(
        d["train"]["y"][2].reshape(s, s),
        sol[2, ::5, ::5][:s, :s], rtol=1e-6)
    assert d["train"]["pos"].shape == (3, s * s, 2)


def test_ns_mat73_fixture():
    """Exercises the v7.3 (HDF5 + MATLAB userblock) branch of _loadmat:
    scipy must refuse the container and h5py must undo the column-major
    (transposed) storage."""
    import scipy.io as scio
    import pytest

    path = os.path.join(DATA, "ns", "NavierStokes_V1e-5_N1200_T20.mat")
    with pytest.raises(NotImplementedError):
        scio.loadmat(path)  # real v7.3 behavior

    d = pde_datasets.load_ns(os.path.join(DATA, "ns"),
                             ntrain=3, ntest=2, t_in=10, t_out=2)
    assert not d["synthetic"]
    u = mf.ns_arrays()
    s = u.shape[1]
    assert d["s"] == s
    np.testing.assert_allclose(
        d["train"]["x"][1], u[1, :, :, :10].reshape(s * s, 10), rtol=1e-6)
    np.testing.assert_allclose(
        d["test"]["y"][-1], u[-1, :, :, 10:12].reshape(s * s, 2), rtol=1e-6)


def test_airfoil_npy_fixture():
    d = pde_datasets.load_structured_mesh(
        os.path.join(DATA, "airfoil"), "NACA_Cylinder",
        ntrain=3, ntest=1, h=17, w=9)
    assert not d["synthetic"]
    X, Y, Q = mf.airfoil_arrays()
    np.testing.assert_allclose(
        d["train"]["pos"][0, :, 0], X[0].reshape(-1), rtol=1e-6)
    # airfoil trains on CHANNEL 4 of the 5-channel Q (exp_airfoil.py:90)
    np.testing.assert_allclose(
        d["train"]["y"][1], Q[1, 4].reshape(-1), rtol=1e-6)
    # airfoil test split is [ntrain:ntrain+ntest] (exp_airfoil.py:96-97),
    # NOT the tail of the file
    np.testing.assert_allclose(
        d["test"]["y"][0], Q[3, 4].reshape(-1), rtol=1e-6)


def test_pipe_npy_fixture():
    d = pde_datasets.load_structured_mesh(
        os.path.join(DATA, "pipe"), "Pipe", ntrain=3, ntest=1, h=13, w=13)
    assert not d["synthetic"]
    X, Y, Q = mf.pipe_arrays()
    # pipe trains on CHANNEL 0 of the 4-D Q (reference exp_pipe.py:90)
    np.testing.assert_allclose(
        d["test"]["y"][-1], Q[-1, 0].reshape(-1), rtol=1e-6)


def test_elasticity_npy_fixture():
    d = pde_datasets.load_elasticity(
        os.path.join(DATA, "elasticity"), ntrain=4, ntest=2)
    assert not d["synthetic"]
    xy, sigma = mf.elasticity_arrays()
    np.testing.assert_allclose(d["train"]["pos"][0], xy[:, :, 0], rtol=1e-6)
    np.testing.assert_allclose(d["test"]["y"][-1], sigma[:, -1], rtol=1e-6)


def test_plasticity_mat_fixture():
    d = pde_datasets.load_plasticity(
        os.path.join(DATA, "plasticity"), ntrain=2, ntest=1)
    assert not d["synthetic"]
    inp, out = mf.plasticity_arrays()
    h, w, t = out.shape[1], out.shape[2], out.shape[3]
    assert (d["h"], d["w"], d["t"]) == (h, w, t)
    # the real file's input is a 2-D [N, h] profile broadcast across w
    # (reference exp_plas.py:127-128)
    assert inp.ndim == 2
    np.testing.assert_allclose(
        d["train"]["fx"][0],
        np.repeat(inp[0][:, None], w, axis=1).reshape(h * w, 1), rtol=1e-6)
    np.testing.assert_allclose(
        d["train"]["y"][1], out[1].reshape(h * w, t, 4), rtol=1e-6)


def test_car_vtk_fixture_raw_parse():
    """read_vtk_legacy on both container flavors: ASCII quad grid with
    SCALARS, and big-endian BINARY with VECTORS."""
    sample_dir = os.path.join(DATA, "car", "param0", "fixturecar000")
    surf_pts, quads, press, velo_pts, velo = mf.car_arrays()

    g = read_vtk_legacy(os.path.join(sample_dir, "quadpress_smpl.vtk"))
    np.testing.assert_allclose(g.points, surf_pts, atol=1e-5)
    np.testing.assert_array_equal(g.quads, quads)
    np.testing.assert_allclose(
        g.point_data["press"].reshape(-1), press, atol=1e-5)

    v = read_vtk_legacy(os.path.join(sample_dir, "hexvelo_smpl.vtk"))
    np.testing.assert_allclose(v.points, velo_pts, atol=1e-5)
    np.testing.assert_allclose(v.point_data["velocity"], velo, atol=1e-5)


def test_car_pipeline_on_vtk_fixture():
    """The full sample assembly (dataset.py:161-225 semantics) from the
    committed VTK pair: exterior/surface split, SDF, normals, targets."""
    sample_dir = os.path.join(DATA, "car", "param0", "fixturecar000")
    surf_pts, quads, press, velo_pts, velo = mf.car_arrays()
    s = shapenet_car.load_sample(sample_dir, "fixturecar000")

    n_surf, n_ext = len(surf_pts), len(velo_pts) - len(surf_pts)
    assert s.surf.sum() == n_surf and (~s.surf).sum() == n_ext
    assert s.x.shape == (n_surf + n_ext, 7)
    assert s.y.shape == (n_surf + n_ext, 4)
    # exterior: sdf > 0, normals zeroed; surface: sdf == 0, unit normals
    ext_sdf = s.x[~s.surf, 3]
    assert (ext_sdf > 0).all()
    np.testing.assert_allclose(s.x[s.surf, 3], 0.0)
    nrm = np.linalg.norm(s.x[s.surf, 4:7], axis=1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-5)
    # surface targets: pressure in the last channel, zero velocity
    np.testing.assert_allclose(np.sort(s.y[s.surf, 3]), np.sort(press),
                               atol=1e-5)
    np.testing.assert_allclose(s.y[s.surf, :3], 0.0, atol=1e-6)

    # get_samples discovers the fixture fold layout
    folds = shapenet_car.get_samples(os.path.join(DATA, "car"))
    assert folds[0] == [os.path.join("param0", "fixturecar000")]


def test_visualize_car_and_slices(tmp_path):
    """The full reference artifact set (visualization.py:20-260) renders
    from a CarSample + [B,H,N,G] weights: mesh+top-k overlay, per-slice
    dominance masks, total heatmap, 2D projections."""
    from haet_tpu.utils.visualization import visualize_car_and_slices

    sample_dir = os.path.join(DATA, "car", "param0", "fixturecar000")
    s = shapenet_car.load_sample(sample_dir, "fixturecar000")
    rng = np.random.RandomState(0)
    n_pad = len(s.pos) + 3  # padded N, as the eval pipeline produces
    w = np.abs(rng.rand(1, 4, n_pad, 8)).astype(np.float32)

    out = str(tmp_path / "vis")
    visualize_car_and_slices(s, w, out, sample_idx=0, top_k=3,
                             max_slice_figs=2, dpi=40)
    files = sorted(os.listdir(out))
    assert "car_slices_0.png" in files
    assert "slice_heatmap_0.png" in files
    assert "slice_0_sample_0.png" in files and "slice_1_sample_0.png" in files
    assert "slice_2_sample_0.png" not in files  # capped
    for plane in ("xy", "xz", "yz"):
        assert f"projection_{plane}_0.png" in files


def test_native_vtk_reader_matches_python():
    """The C++ reader (native/vtkread.cpp) parses the committed fixture
    pair — ASCII quads + big-endian binary vectors — identically to the
    numpy parser."""
    sample_dir = os.path.join(DATA, "car", "param0", "fixturecar000")
    for fn in ("quadpress_smpl.vtk", "hexvelo_smpl.vtk"):
        path = os.path.join(sample_dir, fn)
        py = read_vtk_legacy(path, use_native=False)
        nat = read_vtk_legacy(path, use_native=True)
        np.testing.assert_array_equal(nat.points, py.points)
        assert len(nat.cells) == len(py.cells)
        for a, b in zip(nat.cells, py.cells):
            np.testing.assert_array_equal(a, b)
        if py.cell_types is not None:
            np.testing.assert_array_equal(nat.cell_types, py.cell_types)
        assert set(nat.point_data) == set(py.point_data)
        for k in py.point_data:
            np.testing.assert_allclose(nat.point_data[k], py.point_data[k],
                                       rtol=1e-6, atol=1e-7)


def test_native_vtk_reader_rejects_malformed_counts():
    """Adversarial headers (huge/negative counts, junk ncomp) must fail as
    a clean ValueError through ctypes — never an exception escaping the
    extern "C" boundary (which would abort the interpreter) and never a
    multi-GB resize (ADVICE r2)."""
    import pytest

    from haet_tpu.native import vtk_parse

    header = b"# vtk DataFile Version 3.0\nfixture\nASCII\nDATASET UNSTRUCTURED_GRID\n"
    bad = [
        header + b"POINTS 99999999999999999 float\n0 0 0\n",
        header + b"POINTS -5 float\n",
        header + b"POINTS 9223372036854775807 float\n",  # n*3 would overflow
        header + b"POINTS 1 float\n0 0 0\nPOINT_DATA -2\n",
        header + b"POINTS 1 float\n0 0 0\nPOINT_DATA 99999999999999\n",
        header
        + b"POINTS 1 float\n0 0 0\nPOINT_DATA 1\nSCALARS p float 9999999\n",
        header + b"CELLS 5 99999999999999\n",
        b"# vtk DataFile Version 3.0\nfixture\nBINARY\nDATASET "
        b"UNSTRUCTURED_GRID\nPOINTS 4096 double\n" + b"\x00" * 16,
    ]
    for raw in bad:
        with pytest.raises(ValueError, match="native VTK parse failed"):
            vtk_parse(raw)

    # a well-formed minimal file still parses after the hardening
    ok = header + b"POINTS 2 float\n0 0 0\n1 1 1\n"
    out = vtk_parse(ok)
    assert out["points"].shape == (2, 3)


def test_native_vtk_reader_through_car_pipeline():
    """load_sample (which uses the auto native path) on the fixture gives
    the identical CarSample as the forced-python path."""
    import haet_tpu.data.vtk_io as vio

    sample_dir = os.path.join(DATA, "car", "param0", "fixturecar000")
    s_auto = shapenet_car.load_sample(sample_dir, "x")

    orig = vio.read_vtk_legacy
    try:
        vio.read_vtk_legacy = lambda p, use_native="auto": orig(
            p, use_native=False)
        import importlib
        importlib.reload(shapenet_car)
        s_py = shapenet_car.load_sample(sample_dir, "x")
    finally:
        vio.read_vtk_legacy = orig
        importlib.reload(shapenet_car)

    np.testing.assert_array_equal(s_auto.pos, s_py.pos)
    np.testing.assert_allclose(s_auto.x, s_py.x, atol=1e-6)
    np.testing.assert_allclose(s_auto.y, s_py.y, atol=1e-6)
    np.testing.assert_array_equal(s_auto.surf, s_py.surf)


def test_structured_mesh_crop_matches_reference_slicing():
    """The loader must trim the (downsampled) grids to (h, w) exactly like
    the reference's ``[:, ::r1, ::r2][:, :s1, :s2]`` (exp_airfoil.py:93,
    exp_pipe.py:92) — raw grids can carry extra rows/cols past the target."""
    d = pde_datasets.load_structured_mesh(
        os.path.join(DATA, "pipe"), "Pipe", ntrain=3, ntest=1, h=11, w=7)
    assert (d["h"], d["w"]) == (11, 7)
    X, Y, Q = mf.pipe_arrays()
    np.testing.assert_allclose(
        d["train"]["y"][0], Q[0, 0, :11, :7].reshape(-1), rtol=1e-6)
    np.testing.assert_allclose(
        d["train"]["pos"][0, :, 0], X[0, :11, :7].reshape(-1), rtol=1e-6)
