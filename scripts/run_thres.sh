#!/bin/bash
# Sweep runner (reference scripts/run_thres.sh): loops run ids over the
# threshold-config grid; each run skips itself if its brief file exists, so
# the loop is resumable after interruption.
#
# Usage: scripts/run_thres.sh <root> <pose_file> <laser_file> <seq> [beg] [end]
set -u
ROOT=${1:?config root (e.g. results/batch_pr_tests)}
POSE=${2:?gt pose file}
LASER=${3:?lidar bin list file}
SEQ=${4:?sequence tag (e.g. kitti08)}
BEG=${5:-0}
END=${6:-120}

for ((i=BEG; i<=END; i++)); do
  echo "=== runid $i ==="
  python -m contour_context_tpu.eval.sweep run \
    --root "$ROOT" --runid "$i" --pose "$POSE" --laser "$LASER" --seq "$SEQ"
done
