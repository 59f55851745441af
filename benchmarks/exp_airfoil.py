#!/usr/bin/env python
"""Airfoil benchmark (reference ``exp_airfoil.py``): 221x51 structured mesh
coords from NACA_Cylinder_{X,Y}.npy, fun_dim=0 (placeholder path)."""

from __future__ import annotations

from _common import base_parser, shrink_for_smoke

from exp_pipe import run
from haet_tpu.utils.config import airfoil_config

if __name__ == "__main__":
    args = base_parser("HAET-TPU Airfoil").parse_args()
    if args.smoke:
        shrink_for_smoke(args)
    run(args, prefix="NACA_Cylinder", h=221, w=51,
        config_fn=airfoil_config, name="airfoil")
