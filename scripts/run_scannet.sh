#!/usr/bin/env bash
# ScanNet training launcher (run_scannet_exps.sh equivalent).
set -e
d=$(date +%Y%m%d%H%M)
DATA=${1:-/data/scannet-preprocessed}

python -m tcsfm.cli.train \
  --iterations 4 --img_resolution med --minibatch 8 \
  --data_format scannet --data_dir "$DATA" \
  --train_seq all --val_seq scene0000_00 --test_seq scene0000_01 \
  --date "$d" --lr 1e-4 --wd 0 --num_epochs 20 --lr_decay_epoch 4 \
  --min_depth 0.03 --max_depth 3
