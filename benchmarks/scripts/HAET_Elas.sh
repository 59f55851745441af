#!/bin/bash
# Elasticity — canonical config (reference scripts/HAETransolver_Elas.sh)
python benchmarks/exp_elas.py \
  --data_path "${DATA_DIR:-./data/fno}" \
  --epochs 500 --lr 1e-3 --batch-size 1 \
  --n-hidden 128 --n-layers 8 --n-heads 8 --slice_num 128 \
  --max_grad_norm 0.1 \
  --out_dir runs/elas
# multi-chip: append --dp N (data parallel; batch %% N == 0) and/or --tp N (head tensor parallel; n_heads %% N == 0)
