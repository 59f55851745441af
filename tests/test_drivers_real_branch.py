"""Drivers' REAL-data branch, end to end, on miniature fixture-built
datasets (VERDICT r2 #3).

The committed byte-level fixtures (tests/fixtures/data) were previously only
parsed at the *loader* level; these tests point the actual driver
``main()``s at fixture-built on-disk datasets so the glue between loader
output and driver batching — grid-side reconciliation, key names, fold
layout, normalization, the ``--preprocessed`` npy cache — executes without
the synthetic fallback. Any loader/driver format drift fails here.

Each run is 2 tiny epochs on CPU.
"""

import argparse
import os
import shutil
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
BENCH = os.path.join(REPO, "benchmarks")
FIXT = os.path.join(HERE, "fixtures", "data")
if BENCH not in sys.path:
    sys.path.insert(0, BENCH)


def test_exp_darcy_real_branch(tmp_path, capsys):
    """exp_darcy.main() on the committed .mat fixtures (41-grid files with
    the real FNO key names) — exercises loadmat, downsampling, the
    UnitTransformer encode, and the H/W reconciliation with the loaded
    grid side (the preset assumes the 421 grid)."""
    import exp_darcy

    args = argparse.Namespace(
        # batch_size=1: 3 steps/epoch (make_schedule now also stretches
        # tiny OneCycle horizons, so a 2-step run no longer NaNs)
        lr=1e-3, epochs=2, batch_size=1, n_hidden=32, n_layers=2, n_heads=4,
        slice_num=16, mlp_ratio=1, downsample=2, unified_pos=0, ntrain=3,
        ntest=3, bf16=0, data_path=os.path.join(FIXT, "darcy"),
        out_dir=str(tmp_path), showcase=False, resume=False, dp=0, tp=1,
        smoke=False,
    )
    rel = exp_darcy.main(args)
    out = capsys.readouterr().out
    assert "synthetic stand-in" not in out
    assert np.isfinite(rel)
    assert os.path.exists(tmp_path / "darcy_metrics.jsonl")


def test_exp_elas_real_branch(tmp_path, capsys):
    """exp_elas.main() on the committed Random_UnitCell .npy fixtures
    (6 samples of 37 points in the reference's [npts, 2, N] layout)."""
    import exp_elas

    args = argparse.Namespace(
        lr=1e-3, epochs=2, weight_decay=1e-5, batch_size=2, n_hidden=32,
        n_layers=2, n_heads=4, slice_num=16, mlp_ratio=1, dropout=0.0,
        max_grad_norm=None, unified_pos=0, ref=8, ntrain=4, ntest=2, bf16=0,
        use_checkpoint=0, data_path=os.path.join(FIXT, "elasticity"),
        out_dir=str(tmp_path), save_name="elas", smoke=False, dp=0, tp=1,
    )
    rel = exp_elas.main(args)
    out = capsys.readouterr().out
    assert "synthetic stand-in" not in out
    assert np.isfinite(rel)


def _build_car_dataset(root):
    """Assemble a 2-fold miniature of the reference's on-disk layout
    (param{K}/<sample>/{quadpress,hexvelo}_smpl.vtk) from the committed
    fixture VTK pair."""
    src = os.path.join(FIXT, "car", "param0", "fixturecar000")
    for fold, names in [("param0", ["car_a"]), ("param1", ["car_b", "car_c"])]:
        for n in names:
            shutil.copytree(src, os.path.join(root, fold, n))


def test_car_train_real_branch(tmp_path, capsys):
    """car_train.main() on a fixture-built fold layout: VTK parse, SDF /
    normals feature assembly, fold split (fold 0 held out), streaming
    normalization, training, the full eval metric set, then a SECOND run
    through the --preprocessed npy-cache branch."""
    import car_train

    data_dir = str(tmp_path / "training_data")
    _build_car_dataset(data_dir)
    cache = str(tmp_path / "cache")
    args = argparse.Namespace(
        data_dir=data_dir, save_dir=cache, preprocessed=False, fold_id=0,
        epochs=2, lr=1e-3, weight=0.5, n_hidden=32, n_layers=1,
        slice_num=16, bf16=0, out_dir=str(tmp_path / "runs"), prefetch=2,
        dp=0, tp=1, resume=False, smoke=True,  # smoke resets erwin sizing
    )
    metrics = car_train.main(args)
    out = capsys.readouterr().out
    assert "synthetic stand-in" not in out
    assert "train 2 / val 1 samples" in out
    for key in ("rel_l2_press", "rel_l2_velo", "rmse_press", "rmse_velo",
                "time_per_sample"):
        assert key in metrics and np.isfinite(metrics[key]), key

    # the first pass wrote the npy cache for every sample
    for fold, names in [("param0", ["car_a"]), ("param1", ["car_b", "car_c"])]:
        for n in names:
            for f in ("pos.npy", "x.npy", "y.npy", "surf.npy"):
                assert os.path.exists(os.path.join(cache, fold, n, f)), (fold, n, f)

    # second run exercises the --preprocessed read branch end to end
    args.preprocessed = True
    metrics2 = car_train.main(args)
    out2 = capsys.readouterr().out
    assert "train 2 / val 1 samples" in out2
    assert np.isfinite(metrics2["rel_l2_press"])


def test_car_eval_torch_checkpoint_import(tmp_path, capsys):
    """car_eval.main(--torch_checkpoint): a reference-schema torch .pt
    (as train.py:250-259 saves) is imported and drives the evaluation —
    two runs from the same .pt agree exactly, and differ from the random
    init (i.e. the weights really landed)."""
    import torch

    import car_eval
    from haet_tpu.utils.torch_import import to_torch_state_dict

    data_dir = str(tmp_path / "training_data")
    _build_car_dataset(data_dir)

    # Build a reference-style checkpoint for the smoke-sized config by
    # exporting a differently-seeded init through the torch schema.
    import jax
    import car_train
    from haet_tpu.utils.config import shapenet_car_config

    cfg = shapenet_car_config()
    cfg.model.n_hidden = 32
    cfg.model.n_layers = 1
    cfg.model.slice_num = 16
    cfg.model.n_head = 4
    cfg.model.enc_num_heads = cfg.model.enc_depths = None
    cfg.model.dec_num_heads = cfg.model.dec_depths = None
    cfg.model.erwin_mlp_ratio = None
    cfg.model.embed = False
    model = cfg.model.build()
    from haet_tpu.data import shapenet_car
    _, val_s, _, _ = shapenet_car.load_train_val_fold(data_dir, 0)
    b = car_train.make_batch(val_s[0])
    variables = jax.jit(model.init)(jax.random.PRNGKey(7), b["x"], None)
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in to_torch_state_dict(variables).items()}
    pt = str(tmp_path / "best_model.pt")
    torch.save({"epoch": 1, "model_state_dict": sd}, pt)

    args = argparse.Namespace(
        data_dir=data_dir, save_dir=None, preprocessed=False, fold_id=0,
        checkpoint_dir=str(tmp_path / "no_ckpt"), which="best",
        torch_checkpoint=pt,
        n_hidden=32, n_layers=1, slice_num=16, visualize=False,
        max_slice_figs=None, scatter=True, out_dir=str(tmp_path / "runs"),
        export_artifact=str(tmp_path / "artifact"), smoke=True,
        save_preds=True,
    )
    m1 = car_eval.main(args)
    if "rho_d" in m1:  # scatter shares the save_preds prediction pass
        assert (tmp_path / "runs" / "cd_scatter.png").exists()
    # reference-style per-sample denormalized dumps (main_evaluation.py:297)
    res = tmp_path / "runs" / "results"
    pred = np.load(res / "0_pred.npy")
    gt = np.load(res / "0_gt.npy")
    assert pred.shape == gt.shape and pred.shape[1] == 4
    assert np.all(np.isfinite(pred))
    out = capsys.readouterr().out
    assert "imported reference torch checkpoint" in out
    # The serving artifact's manifest must record the TRUE weight source
    # (the torch file), not the default orbax checkpoint name.
    import glob
    import json
    [manifest] = glob.glob(str(tmp_path / "artifact" / "*" / "manifest.json"))
    with open(manifest) as fh:
        assert json.load(fh)["checkpoint"] == f"torch:{pt}"
    args.export_artifact = None
    m2 = car_eval.main(args)
    capsys.readouterr()
    assert m1["rel_l2_press"] == m2["rel_l2_press"]

    # and without the torch checkpoint (random PRNGKey(0) init) the
    # metric differs — proof the imported weights were used
    args.torch_checkpoint = None
    m3 = car_eval.main(args)
    capsys.readouterr()
    assert m1["rel_l2_press"] != m3["rel_l2_press"]


def test_erwin_baseline_real_branch(tmp_path, capsys):
    """erwin_baseline.main() (the 02.1 Erwin-only car baseline) trains and
    evaluates on a fixture-built on-disk dataset — the radius-graph MPNN
    path runs on REAL loader output, not the synthetic fallback."""
    import erwin_baseline

    data_dir = str(tmp_path / "training_data")
    _build_car_dataset(data_dir)

    args = argparse.Namespace(
        data_dir=data_dir, fold_id=0, epochs=2, lr=1e-3, weight=0.5,
        hidden_dim=32, mp_steps=1, r=0.2, out_dir=str(tmp_path / "runs"),
        smoke=False,
    )
    metrics = erwin_baseline.main(args)
    out = capsys.readouterr().out
    assert "synthetic stand-in" not in out
    assert "nb_parameters" in out
    assert np.isfinite(metrics["rel_l2_press"])
    assert np.isfinite(metrics["rel_l2_velo"])


def test_car_cache_roundtrip_identical():
    """The npy cache must reproduce the VTK-parsed samples bit-for-bit
    (loader-level check of the same branch the driver test exercises)."""
    import tempfile

    from haet_tpu.data import shapenet_car

    with tempfile.TemporaryDirectory() as td:
        data_dir = os.path.join(td, "data")
        _build_car_dataset(data_dir)
        cache = os.path.join(td, "cache")
        tr1, va1, coef1, s1 = shapenet_car.load_train_val_fold(
            data_dir, 0, savedir=cache, preprocessed=False)
        tr2, va2, coef2, s2 = shapenet_car.load_train_val_fold(
            data_dir, 0, savedir=cache, preprocessed=True)
        assert not s1 and not s2
        for a, b in zip(tr1 + va1, tr2 + va2):
            np.testing.assert_array_equal(a.pos, b.pos)
            np.testing.assert_array_equal(a.x, b.x)
            np.testing.assert_array_equal(a.y, b.y)
            np.testing.assert_array_equal(a.surf, b.surf)


def _pde_args(tmp_path, data_path, **over):
    base = dict(
        lr=1e-3, epochs=2, weight_decay=1e-5, batch_size=2, n_hidden=32,
        n_layers=2, n_heads=4, slice_num=16, mlp_ratio=1, dropout=0.0,
        max_grad_norm=None, unified_pos=0, ref=8, ntrain=4, ntest=2, bf16=0,
        use_checkpoint=0, data_path=data_path, out_dir=str(tmp_path),
        save_name="t", smoke=False, dp=0, tp=1,
    )
    base.update(over)
    return argparse.Namespace(**base)


def test_exp_pipe_real_branch(tmp_path, capsys):
    """exp_pipe.run() on the committed Pipe_{X,Y,Q}.npy fixtures (13x13
    meshes) — mesh-coordinate input path, fun_dim=0 placeholder."""
    import exp_pipe

    args = _pde_args(tmp_path, os.path.join(FIXT, "pipe"), ntrain=3,
                     ntest=1, batch_size=1)
    rel = exp_pipe.run(args)
    out = capsys.readouterr().out
    assert "synthetic stand-in" not in out
    assert np.isfinite(rel)


def test_exp_airfoil_real_branch(tmp_path, capsys):
    """Airfoil via exp_pipe.run(prefix=NACA_Cylinder): 4-channel Q file
    (pressure = last channel), 17x9 fixture meshes."""
    import exp_pipe
    from haet_tpu.utils.config import airfoil_config

    args = _pde_args(tmp_path, os.path.join(FIXT, "airfoil"), ntrain=3,
                     ntest=1, batch_size=1)
    rel = exp_pipe.run(args, prefix="NACA_Cylinder", h=221, w=51,
                       config_fn=airfoil_config, name="airfoil")
    out = capsys.readouterr().out
    assert "synthetic stand-in" not in out
    assert np.isfinite(rel)


def test_exp_ns_real_branch(tmp_path, capsys, monkeypatch):
    """exp_ns.main() on the committed v7.3-HDF5 NS fixture (N=4, 16x16,
    T=12): the autoregressive scan rollout on real file data. T_IN/T_OUT
    shrunk to fit the fixture's 12 frames."""
    import exp_ns

    monkeypatch.setattr(exp_ns, "T_IN", 6)
    monkeypatch.setattr(exp_ns, "T_OUT", 6)
    args = _pde_args(tmp_path, os.path.join(FIXT, "ns"), ntrain=3, ntest=1,
                     batch_size=1, n_layers=1)
    rel = exp_ns.main(args)
    out = capsys.readouterr().out
    assert "synthetic stand-in" not in out
    assert np.isfinite(rel)


def test_exp_plas_real_branch(tmp_path, capsys):
    """exp_plas.main() on the committed v7.3+userblock plasticity fixture —
    the Time_Input path (timestep embedding, per-t queries) on real file
    data; t derived from the file."""
    import exp_plas

    args = _pde_args(tmp_path, os.path.join(FIXT, "plasticity"), ntrain=3,
                     ntest=1, batch_size=1, n_layers=1)
    rel = exp_plas.main(args)
    out = capsys.readouterr().out
    assert "synthetic stand-in" not in out
    assert np.isfinite(rel)


def test_car_eval_real_branch_with_export(tmp_path, capsys):
    """car_eval.main() on the fixture fold layout, including the AOT
    serving-artifact export: the artifact must load back and reproduce the
    jitted predict path on a real validation sample."""
    import car_eval

    data_dir = str(tmp_path / "training_data")
    _build_car_dataset(data_dir)
    art_dir = str(tmp_path / "artifacts")
    args = argparse.Namespace(
        data_dir=data_dir, save_dir=None, preprocessed=False, fold_id=0,
        checkpoint_dir=str(tmp_path / "no_ckpt"), which="best",
        n_hidden=32, n_layers=1, slice_num=16, visualize=False,
        max_slice_figs=None, scatter=False, out_dir=str(tmp_path / "runs"),
        export_artifact=art_dir, smoke=True,
    )
    metrics = car_eval.main(args)
    out = capsys.readouterr().out
    assert "synthetic stand-in" not in out
    assert "serving artifact ->" in out
    assert np.isfinite(metrics["rel_l2_press"])

    # the artifact loads back and its pinned signature is this fold's
    # serving shape (value round-trip numerics are covered in
    # tests/test_export.py)
    from haet_tpu.data import shapenet_car
    from haet_tpu.export import ServingBundle

    _, val_s, _, _ = shapenet_car.load_train_val_fold(data_dir, 0)
    bundle = ServingBundle.load(art_dir)
    (key,) = bundle.shapes()
    assert key[0][0] == 1  # B=1 serving
    assert key[0][1] >= len(val_s[0].pos)  # bucket-padded serving N
    assert key[0][2] == val_s[0].x.shape[-1]  # feature channels


def test_car_eval_exports_point_bucket_family(tmp_path, capsys):
    """car_eval --export_point_buckets: a trained checkpoint exports a
    point-bucket batch family ready for `serve_http --pad_to_points 1` —
    the CLI end of the ragged-fold serving story (the reference eval
    consumes each car mesh at its native N)."""
    import car_eval

    data_dir = str(tmp_path / "training_data")
    _build_car_dataset(data_dir)
    art_dir = str(tmp_path / "bucket_family")
    args = argparse.Namespace(
        data_dir=data_dir, save_dir=None, preprocessed=False, fold_id=0,
        checkpoint_dir=str(tmp_path / "no_ckpt"), which="best",
        n_hidden=32, n_layers=1, slice_num=16, visualize=False,
        max_slice_figs=None, scatter=False, out_dir=str(tmp_path / "runs"),
        export_artifact=art_dir, export_point_buckets="512,1024",
        smoke=True,
    )
    car_eval.main(args)
    out = capsys.readouterr().out
    assert "point-bucket family" in out

    from haet_tpu.export import ServingBundle

    bundle = ServingBundle.load(art_dir)
    ns = sorted({key[0][1] for key in bundle.shapes()})
    assert ns == [512, 1024]
    bs = sorted({key[0][0] for key in bundle.shapes()})
    assert bs == [1, 2, 4]
    # every artifact carries the pad_to_points bucket marker, so a
    # server with pad_to_points=True can pad onto these
    for m in bundle._by_key.values():
        assert m.manifest.get("point_bucket") in (512, 1024), m.manifest


def _build_parity_layout(root):
    """Assemble a fetch_datasets.py-conformant layout from the committed
    fixtures (PDE subdirs as-is; the car pair replicated into a
    param0/<id>/ sample dir)."""
    for sub in ("darcy", "ns", "airfoil", "pipe", "elasticity",
                "plasticity"):
        shutil.copytree(os.path.join(FIXT, sub), os.path.join(root, sub))
    shutil.copytree(
        os.path.join(FIXT, "car"),
        os.path.join(root, "shapenet_car", "training_data"))


def test_fetch_datasets_deep_verify_catches_wrong_content(tmp_path,
                                                          capsys):
    """--verify --deep is CONTENT-level (VERDICT r3 #2): on a layout where
    every expected file exists but holds miniature fixture data, shallow
    verify passes while deep verify flags the Darcy grid side (41 != the
    reference 421) — i.e. a truncated/wrong download cannot masquerade as
    a complete dataset."""
    sys.path.insert(0, os.path.join(BENCH, "scripts"))
    import fetch_datasets

    _build_parity_layout(str(tmp_path))
    assert fetch_datasets.verify(str(tmp_path), deep=False)
    assert not fetch_datasets.verify(str(tmp_path), deep=True)
    out = capsys.readouterr().out
    assert "421" in out  # names the actual content mismatch


def test_parity_repro_on_fixture_datasets(tmp_path):
    """benchmarks/parity_repro.py end to end (VERDICT r3 #2): the
    one-command kit runs the real driver CLIs (subprocesses) against a
    fixture-built fetch_datasets layout and emits a BASELINE.md-format
    table whose rows carry the committed reference numbers next to the
    fresh ones."""
    import subprocess

    _build_parity_layout(str(tmp_path / "data"))
    out_md = tmp_path / "PARITY.md"
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "HAET_PLATFORM": "cpu", "PYTHONPATH": REPO}
    cmd = [
        sys.executable, os.path.join(BENCH, "parity_repro.py"),
        "--data_root", str(tmp_path / "data"),
        "--tasks", "pipe,elas,plas",
        "--epochs", "2",
        "--workdir", str(tmp_path / "runs"),
        "--out", str(out_md),
        "--pde_flags",
        "--ntrain 3 --ntest 1 --batch-size 1 --n-hidden 32 --n-layers 2 "
        "--n-heads 4 --slice_num 16 --mlp_ratio 1",
    ]
    proc = subprocess.run(cmd, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True, env=env,
                          cwd=REPO, timeout=1500)
    assert proc.returncode == 0, proc.stdout[-3000:]
    table = out_md.read_text()
    # reference numbers present, 1:1 with BASELINE.md rows
    assert "0.00505" in table and "0.10848" in table
    # our fresh numbers parsed and finite
    for line in table.splitlines():
        if line.startswith(("| pipe", "| elas", "| plas")):
            ours = float(line.split("|")[4])
            assert np.isfinite(ours)
    # plasticity is a RECORD row: the reference never produced a number
    # (overall_results.md:10) — its row must say so instead of faking a
    # reference value (VERDICT r4 #8)
    plas_line = next(ln for ln in table.splitlines()
                     if ln.startswith("| plas"))
    assert "| — |" in plas_line and "recording ours" in plas_line
    # the epochs override is loudly marked as non-reference
    assert "NOT the reference schedule" in table
