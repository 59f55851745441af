#!/usr/bin/env python
"""Fetch + convert the real benchmark datasets.

This environment has no network egress, so this script is the documented,
runnable recipe for a machine that does. Sources (same as the reference):

* **ShapeNet-Car CFD** (Umetani & Bickel 2018) — the reference's
  ``scripts/DownloadData.sh`` pulls
  http://www.nobuyuki-umetani.com/publication/mlcfd_data.zip
  and untars ``param0..param8`` under ``training_data/`` (889 samples of
  ``{quadpress_smpl.vtk, hexvelo_smpl.vtk}``), then removes 4 corrupted
  samples (no quadpress file).
* **FNO / Geo-FNO suite** (Darcy, NS, Airfoil, Pipe, Elasticity,
  Plasticity) — Google Drive folders linked from the reference's
  ``benchmarks/04-.../README.md`` (provided by the neuraloperator /
  Geo-FNO authors):
  - Darcy + NS:   https://drive.google.com/drive/folders/1UnbQh2WWc6knEHbLn-ZaXrKUZhp7pjt-
  - Elas/Plas/Airfoil/Pipe: https://drive.google.com/drive/folders/1YBuaoTdOSr_qzaow-G-iwvbUI7fiUzu8

Expected final layout (what ``haet_tpu.data`` loaders look for):

    <data_root>/
      darcy/piececonst_r421_N1024_smooth{1,2}.mat
      ns/NavierStokes_V1e-5_N1200_T20.mat
      airfoil/NACA_Cylinder_{X,Y,Q}.npy
      pipe/Pipe_{X,Y,Q}.npy
      elasticity/Random_UnitCell_{XY,sigma}_10.npy
      plasticity/plas_N987_T20.mat
      shapenet_car/training_data/param{0..8}/<id>/{quadpress,hexvelo}_smpl.vtk

Usage:
    python benchmarks/scripts/fetch_datasets.py --root ./data [--car] [--pde]

Google Drive folders cannot be fetched anonymously with plain HTTP; install
``gdown`` (pip install gdown) on the fetching machine, or download manually
and place files per the layout above. The script verifies the layout either
way (``--verify``).
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tarfile
import urllib.request
import zipfile

CAR_URL = "http://www.nobuyuki-umetani.com/publication/mlcfd_data.zip"

# The 4 corrupted samples the reference removes (DownloadData.sh).
CAR_BAD_SAMPLES = [
    "param2/854bb96a96a4d1b338acbabdc1252e2f",
    "param2/85bb9748c3836e566f81b21e2305c824",
    "param5/9ec13da6190ab1a3dd141480e2c154d3",
    "param8/c5079a5b8d59220bc3fb0d224baae2a",
]

PDE_DRIVE_FOLDERS = {
    # folder-id: files expected inside (for gdown --folder)
    "1UnbQh2WWc6knEHbLn-ZaXrKUZhp7pjt-": [
        ("darcy", "piececonst_r421_N1024_smooth1.mat"),
        ("darcy", "piececonst_r421_N1024_smooth2.mat"),
        ("ns", "NavierStokes_V1e-5_N1200_T20.mat"),
    ],
    "1YBuaoTdOSr_qzaow-G-iwvbUI7fiUzu8": [
        ("airfoil", "NACA_Cylinder_X.npy"),
        ("airfoil", "NACA_Cylinder_Y.npy"),
        ("airfoil", "NACA_Cylinder_Q.npy"),
        ("pipe", "Pipe_X.npy"),
        ("pipe", "Pipe_Y.npy"),
        ("pipe", "Pipe_Q.npy"),
        ("elasticity", "Random_UnitCell_XY_10.npy"),
        ("elasticity", "Random_UnitCell_sigma_10.npy"),
        ("plasticity", "plas_N987_T20.mat"),
    ],
}


def fetch_car(root: str):
    car_root = os.path.join(root, "shapenet_car")
    os.makedirs(car_root, exist_ok=True)
    zip_path = os.path.join(car_root, "mlcfd_data.zip")
    if not os.path.exists(zip_path):
        print(f"downloading {CAR_URL} (~8 GB)...")
        urllib.request.urlretrieve(CAR_URL, zip_path)
    print("unzipping...")
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(car_root)
    train_dir = os.path.join(car_root, "mlcfd_data", "training_data")
    for i in range(9):
        tgz = os.path.join(train_dir, f"param{i}.tar.gz")
        if os.path.exists(tgz):
            print(f"untarring param{i}...")
            with tarfile.open(tgz) as t:
                t.extractall(train_dir)
            os.remove(tgz)
    for bad in CAR_BAD_SAMPLES:
        shutil.rmtree(os.path.join(train_dir, bad), ignore_errors=True)
    shutil.rmtree(os.path.join(car_root, "__MACOSX"), ignore_errors=True)
    # expose under the layout the loaders expect
    link = os.path.join(car_root, "training_data")
    if not os.path.exists(link):
        os.symlink(os.path.join("mlcfd_data", "training_data"), link)
    print("ShapeNet-Car ready at", train_dir)


def fetch_pde(root: str):
    try:
        import gdown  # noqa: F401
    except ImportError:
        print("gdown not installed — Google Drive folders must be fetched "
              "manually (see module docstring for URLs + layout).")
        return
    for folder_id, files in PDE_DRIVE_FOLDERS.items():
        url = f"https://drive.google.com/drive/folders/{folder_id}"
        tmp = os.path.join(root, f"_gdrive_{folder_id[:8]}")
        print(f"fetching {url} -> {tmp}")
        subprocess.run(
            [sys.executable, "-m", "gdown", "--folder", url, "-O", tmp],
            check=True,
        )
        # move known files into the loader layout
        for dirpath, _, fns in os.walk(tmp):
            for fn in fns:
                for sub, want in files:
                    if fn == want:
                        dst = os.path.join(root, sub)
                        os.makedirs(dst, exist_ok=True)
                        shutil.move(os.path.join(dirpath, fn),
                                    os.path.join(dst, fn))


def verify(root: str, deep: bool = False) -> bool:
    missing = []
    for folder_files in PDE_DRIVE_FOLDERS.values():
        for sub, fn in folder_files:
            p = os.path.join(root, sub, fn)
            if not os.path.exists(p):
                missing.append(p)
    car = os.path.join(root, "shapenet_car", "training_data", "param0")
    if not os.path.isdir(car):
        missing.append(car)
    if missing:
        print("MISSING:")
        for m in missing:
            print("  ", m)
        return False
    print("all dataset files present")
    if deep:
        return verify_deep(root)
    return True


def verify_deep(root: str) -> bool:
    """Content-level verification: every file loads, paired files agree on
    sample counts, and known grid sides match the reference configs. The
    upstream sources publish no byte hashes (Google Drive folders + a
    personal site), so this validates structure rather than checksums —
    which is also what actually breaks runs (truncated downloads, wrong
    Drive file picked, layout drift)."""
    import numpy as np
    problems = []

    def check(cond, msg):
        if not cond:
            problems.append(msg)

    try:
        from haet_tpu.data.pde_datasets import _loadmat as load_mat

        for fn in ("piececonst_r421_N1024_smooth1.mat",
                   "piececonst_r421_N1024_smooth2.mat"):
            d = load_mat(os.path.join(root, "darcy", fn))
            check("coeff" in d and "sol" in d, f"{fn}: missing coeff/sol")
            if "coeff" in d:
                check(d["coeff"].shape[-1] == 421,
                      f"{fn}: grid side {d['coeff'].shape} != 421")
        d = load_mat(os.path.join(
            root, "ns", "NavierStokes_V1e-5_N1200_T20.mat"))
        check("u" in d, "NS .mat: missing 'u'")
        if "u" in d:
            check(20 in d["u"].shape, f"NS 'u' has no T=20 axis: "
                  f"{d['u'].shape}")
        d = load_mat(os.path.join(root, "plasticity", "plas_N987_T20.mat"))
        check(any(k for k in d if not k.startswith("__")),
              "plasticity .mat: empty")
    except Exception as e:
        problems.append(f".mat verification failed: {e!r}")

    for sub, prefix, nch in (("airfoil", "NACA_Cylinder", 4),
                             ("pipe", "Pipe", 1)):
        try:
            shapes = {}
            for part in ("X", "Y", "Q"):
                a = np.load(os.path.join(root, sub, f"{prefix}_{part}.npy"),
                            mmap_mode="r")
                shapes[part] = a.shape
            check(shapes["X"] == shapes["Y"],
                  f"{sub}: X {shapes['X']} != Y {shapes['Y']}")
            check(shapes["Q"][0] == shapes["X"][0],
                  f"{sub}: Q samples {shapes['Q'][0]} != X "
                  f"{shapes['X'][0]}")
        except Exception as e:
            problems.append(f"{sub} .npy verification failed: {e!r}")

    try:
        xy = np.load(os.path.join(
            root, "elasticity", "Random_UnitCell_XY_10.npy"), mmap_mode="r")
        sig = np.load(os.path.join(
            root, "elasticity", "Random_UnitCell_sigma_10.npy"),
            mmap_mode="r")
        check(2 in xy.shape, f"elasticity XY has no coord axis: {xy.shape}")
        check(xy.shape[-1] == sig.shape[-1],
              f"elasticity XY/sigma sample counts differ: "
              f"{xy.shape} vs {sig.shape}")
    except Exception as e:
        problems.append(f"elasticity verification failed: {e!r}")

    train_dir = os.path.join(root, "shapenet_car", "training_data")
    n_samples, incomplete = 0, []
    for i in range(9):
        pdir = os.path.join(train_dir, f"param{i}")
        if not os.path.isdir(pdir):
            continue
        for sid in os.listdir(pdir):
            sdir = os.path.join(pdir, sid)
            if not os.path.isdir(sdir):
                continue
            n_samples += 1
            for want in ("quadpress_smpl.vtk", "hexvelo_smpl.vtk"):
                if not os.path.exists(os.path.join(sdir, want)):
                    incomplete.append(f"param{i}/{sid}/{want}")
    check(not incomplete,
          f"car: {len(incomplete)} samples missing a vtk file "
          f"(first: {incomplete[:3]})")
    # 889 in the archive minus the 4 corrupted ones DownloadData.sh removes
    check(n_samples in (885, 889),
          f"car: {n_samples} samples (expected 885 after bad-sample "
          "removal, or 889 raw)")

    if problems:
        print("DEEP-VERIFY PROBLEMS:")
        for p in problems:
            print("  ", p)
        return False
    print(f"deep verification OK ({n_samples} car samples; all PDE files "
          "load with consistent shapes)")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./data")
    ap.add_argument("--car", action="store_true", help="fetch ShapeNet-Car")
    ap.add_argument("--pde", action="store_true", help="fetch FNO suite")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--deep", action="store_true",
                    help="with --verify: load every file and check "
                         "shapes/sample counts, not just existence")
    args = ap.parse_args()
    os.makedirs(args.root, exist_ok=True)
    if args.car:
        fetch_car(args.root)
    if args.pde:
        fetch_pde(args.root)
    if args.verify or not (args.car or args.pde):
        ok = verify(args.root, deep=args.deep)
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
