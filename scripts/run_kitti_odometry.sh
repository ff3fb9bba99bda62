#!/usr/bin/env bash
# KITTI odometry training launcher (run_mono_exps_kitti.sh equivalent):
# 4 coupled iterations, med res, batch 6, 12 training streams (both cams).
set -e
d=$(date +%Y%m%d%H%M)
DATA=${1:-/data/kitti-preprocessed/med_res}

python -m tcsfm.cli.train \
  --iterations 4 --img_resolution med --minibatch 6 \
  --data_dir "$DATA" \
  --train_seq 00_02 02_02 05_02 06_02 07_02 08_02 \
              00_03 02_03 05_03 06_03 07_03 08_03 \
  --val_seq 09_02 --test_seq 10_02 \
  --date "$d" --lr 1e-4 --wd 0 --num_epochs 20 --lr_decay_epoch 7 \
  --min_depth 0.06 --max_depth 2.67
