#!/bin/bash
# ShapeNet-Car HAET training — canonical config
# (reference benchmarks/02-.../scripts/Training.sh:20-25)
python benchmarks/car_train.py \
  --data_dir "${DATA_DIR:-./data/shapenet_car/mlcfd_data/training_data}" \
  --fold_id 0 --epochs 200 --lr 1e-3 --weight 0.5 \
  --n_hidden 256 --n_layers 2 --slice_num 32 --bf16 1 \
  --out_dir runs/car
# multi-chip: append --dp N (data parallel; batch %% N == 0) and/or --tp N (head tensor parallel; n_heads %% N == 0)
