"""ShapeNet-Car pipeline: VTK IO round trip, geometry metrics, dataset
assembly, drag coefficient sanity."""

import numpy as np
import pytest

from haet_tpu.data import car_metrics, shapenet_car, synthetic
from haet_tpu.data.vtk_io import read_vtk_legacy, write_vtk_ascii_polydata


def make_box_quads():
    """Unit cube surface as 6 quads."""
    pts = np.array([
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ], dtype=np.float32)
    quads = np.array([
        [0, 1, 2, 3], [4, 5, 6, 7], [0, 1, 5, 4],
        [2, 3, 7, 6], [0, 3, 7, 4], [1, 2, 6, 5],
    ], dtype=np.int64)
    return pts, quads


def test_vtk_ascii_roundtrip(tmp_path):
    pts, quads = make_box_quads()
    press = np.arange(8, dtype=np.float32)
    path = str(tmp_path / "box.vtk")
    write_vtk_ascii_polydata(path, pts, quads, {"press": press,
                                                "velo": np.ones((8, 3))})
    data = read_vtk_legacy(path)
    np.testing.assert_allclose(data.points, pts)
    np.testing.assert_array_equal(data.quads, quads)
    np.testing.assert_allclose(data.point_data["press"][:, 0], press)
    assert data.point_data["velo"].shape == (8, 3)


def test_quad_areas_and_normals():
    pts, quads = make_box_quads()
    areas = car_metrics.quad_cell_areas(pts, quads)
    np.testing.assert_allclose(areas, np.ones(6), atol=1e-6)
    normals = car_metrics.quad_cell_normals(pts, quads)
    # unit normals, outward: n . (center - centroid) > 0
    np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0,
                               atol=1e-6)
    centers = pts[quads].mean(axis=1)
    outward = centers - pts.mean(axis=0)
    assert (np.sum(normals * outward, axis=-1) > 0).all()


def test_frontal_area_unit_square():
    pts, _ = make_box_quads()
    assert car_metrics.frontal_area(pts) == pytest.approx(1.0)


def test_drag_coefficient_uniform_pressure():
    """Closed surface + uniform pressure -> zero net force -> Cd ~ 0."""
    pts, quads = make_box_quads()
    press = np.full(8, 5.0, dtype=np.float32)
    velo = np.zeros((8, 3), dtype=np.float32)
    cd = car_metrics.drag_coefficient(pts, quads, press, velo)
    assert abs(cd) < 1e-6


def test_drag_coefficient_directional_pressure():
    """Higher pressure on the +z face than -z -> NEGATIVE z drag force.

    Pinned value: unit box, press = 10z -> only the z faces contribute
    (+z face: p=10, area 1, n_z=+1; -z face: p=0), F_d = -Σ p·A·n_z = -10,
    Cd = 2F/(ρ v² A_ref) = 2·(-10)/(0.3·20²·1) = -1/6. A sign flip in the
    outward orientation or the pressure term would flip it to +1/6."""
    pts, quads = make_box_quads()
    press = pts[:, 2] * 10.0  # pressure grows with z
    velo = np.zeros((8, 3), dtype=np.float32)
    cd = car_metrics.drag_coefficient(pts, quads, press, velo)
    assert cd == pytest.approx(-1.0 / 6.0, rel=1e-6)


def test_sdf():
    boundary = np.array([[0, 0, 0], [1, 0, 0]], dtype=np.float64)
    target = np.array([[0.2, 0, 0], [5, 0, 0]], dtype=np.float64)
    d, dirs = shapenet_car.get_sdf(target, boundary)
    np.testing.assert_allclose(d, [0.2, 4.0], atol=1e-6)


def test_synthetic_fold_loading():
    train, val, coef, is_synth = shapenet_car.load_train_val_fold("/nonexistent")
    assert is_synth
    assert len(train) == 6 and len(val) == 2
    s = train[0]
    assert s.x.shape[1] == 7 and s.y.shape[1] == 4
    # normalization applied: roughly zero mean over train
    allx = np.concatenate([t.x for t in train])
    assert abs(allx.mean()) < 0.2


def test_pad_sample():
    rng = np.random.RandomState(0)
    s = shapenet_car.CarSample(
        pos=rng.rand(100, 3).astype(np.float32),
        x=rng.rand(100, 7).astype(np.float32),
        y=rng.rand(100, 4).astype(np.float32),
        surf=rng.rand(100) < 0.5,
    )
    pos, x, y, surf, mask = shapenet_car.pad_sample(s, 128)
    assert x.shape == (128, 7)
    assert mask[:100].all() and not mask[100:].any()
    assert not surf[100:].any()


def test_synthetic_car_has_quads_and_learnable_cd():
    from haet_tpu.data.car_metrics import drag_coefficient

    raw = synthetic.car_like(3, npts=2048, seed=0)
    cds = []
    for d in raw:
        assert d["quads"] is not None
        pts = d["pos"][d["surf_slice"]]
        press = d["y"][d["surf_slice"], 3]
        velo = d["y"][d["surf_slice"], :3]
        cds.append(drag_coefficient(pts, d["quads"], press, velo))
    # different body shapes -> different drag coefficients
    assert len({round(c, 6) for c in cds}) == 3


def test_streaming_normalizer_matches_batch():
    from haet_tpu.train.normalizer import StreamingNormalizer

    rng = np.random.RandomState(0)
    chunks = [rng.randn(50, 4) * 3 + 1 for _ in range(5)]
    sn = StreamingNormalizer(4)
    for c in chunks:
        sn.update(c)
    allc = np.concatenate(chunks)
    np.testing.assert_allclose(sn.mean, allc.mean(0), rtol=1e-6)
    np.testing.assert_allclose(sn.std, allc.std(0, ddof=1) + 1e-8, rtol=1e-5)


def test_load_sample_from_vtk(tmp_path):
    """End-to-end: write surface+volume VTK files, assemble a CarSample."""
    pts, quads = make_box_quads()
    press = np.linspace(0, 1, 8).astype(np.float32)
    sdir = tmp_path / "param0" / "car0"
    sdir.mkdir(parents=True)
    write_vtk_ascii_polydata(str(sdir / "quadpress_smpl.vtk"), pts, quads,
                             {"press": press})
    # volume: surface points + 4 exterior points
    ext = np.array([[2, 2, 2], [3, 0, 0], [0, 3, 0], [0, 0, 3]],
                   dtype=np.float32)
    vol_pts = np.concatenate([pts, ext])
    velo = np.tile(np.array([[1.0, 0, 0]], np.float32), (12, 1))
    # write as polydata with dummy quads over the first 8 points
    write_vtk_ascii_polydata(str(sdir / "hexvelo_smpl.vtk"), vol_pts, quads,
                             {"velo": velo})
    s = shapenet_car.load_sample(str(sdir), "param0/car0")
    assert s.x.shape == (12, 7)
    assert s.surf.sum() == 8
    # exterior points come first (reference concat order)
    assert not s.surf[:4].any()
    # surface velocities looked up from the volume dict
    np.testing.assert_allclose(s.y[4:, 0], 1.0)


def test_vtk_binary_roundtrip(tmp_path):
    """Real mlcfd files are BINARY legacy VTK (big-endian); exercise that
    parser path with a hand-written file."""
    pts, quads = make_box_quads()
    press = np.arange(8, dtype=np.float32)
    velo = np.tile(np.array([[1, 2, 3]], np.float32), (8, 1))

    path = tmp_path / "box_bin.vtk"
    with open(path, "wb") as f:
        f.write(b"# vtk DataFile Version 3.0\nbinary box\nBINARY\n")
        f.write(b"DATASET UNSTRUCTURED_GRID\n")
        f.write(b"POINTS 8 float\n")
        f.write(pts.astype(">f4").tobytes())
        f.write(b"\n")
        f.write(f"CELLS {len(quads)} {len(quads) * 5}\n".encode())
        # NOTE: keep big-endian dtype (np.concatenate would byte-swap!)
        flat = np.c_[np.full(len(quads), 4), quads].astype(">i4").ravel()
        f.write(flat.tobytes())
        f.write(b"\n")
        f.write(f"CELL_TYPES {len(quads)}\n".encode())
        f.write(np.full(len(quads), 9, dtype=">i4").tobytes())  # VTK_QUAD
        f.write(b"\n")
        f.write(b"POINT_DATA 8\n")
        f.write(b"SCALARS press float 1\nLOOKUP_TABLE default\n")
        f.write(press.astype(">f4").tobytes())
        f.write(b"\n")
        f.write(b"VECTORS velo float\n")
        f.write(velo.astype(">f4").tobytes())
        f.write(b"\n")

    data = read_vtk_legacy(str(path))
    np.testing.assert_allclose(data.points, pts)
    np.testing.assert_array_equal(data.quads, quads)
    np.testing.assert_allclose(data.point_data["press"][:, 0], press)
    np.testing.assert_allclose(data.point_data["velo"], velo)
    np.testing.assert_array_equal(data.cell_types, np.full(6, 9))
