#!/bin/bash
# Airfoil — canonical config (reference scripts/HAETransolver_Airfoil.sh)
python benchmarks/exp_airfoil.py \
  --data_path "${DATA_DIR:-./data/fno}" \
  --epochs 500 --lr 1e-3 --batch-size 4 \
  --n-hidden 128 --n-layers 8 --n-heads 8 --slice_num 64 \
  --max_grad_norm 0.1 \
  --out_dir runs/airfoil
# multi-chip: append --dp N (data parallel; batch %% N == 0) and/or --tp N (head tensor parallel; n_heads %% N == 0)
