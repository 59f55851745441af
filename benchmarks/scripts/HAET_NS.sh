#!/bin/bash
# Navier-Stokes — canonical config (reference scripts/HAETransolver_NS.sh)
python benchmarks/exp_ns.py \
  --data_path "${DATA_DIR:-./data/fno}" \
  --epochs 500 --lr 1e-3 --batch-size 2 \
  --n-hidden 256 --n-layers 8 --n-heads 8 --slice_num 32 \
  --unified_pos 1 --out_dir runs/ns
# multi-chip: append --dp N (data parallel; batch %% N == 0) and/or --tp N (head tensor parallel; n_heads %% N == 0)
