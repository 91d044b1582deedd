#!/bin/bash
# Paper-scale end-to-end run on synthetic data (no datasets needed):
# 12 frames at 540x960 — the reference's Tanks eval resolution
# (`configs/Tanks/Ignatius.yaml:14`) — with the full default model
# (hidden 256, 128 samples/ray, 1024 rays/step), poses from scratch,
# auto-scheduler two-stage training, then the full eval protocol
# (pose eval + held-out image eval incl. test-time pose optimization).
#
# This is the quality gate for the marketed scaling configs: run it with
# the defaults to reproduce the BASELINE.md paper-scale rows, or pass a
# chamfer mode / rays-per-step multiplier to gate a scaling config, e.g.
#   ./scripts/paper_scale_synthetic.sh /tmp/paper_k4 grid 4
# gates `tpu.chamfer_mode: grid` + `tpu.rays_per_step_multiplier: 4`
# (the BASELINE.md k=4 headline rows).
#
# Run from the repo root on a TPU host:
#   PYTHONPATH=$(pwd):/root/.axon_site ./scripts/paper_scale_synthetic.sh /tmp/paper
set -e
OUT=${1:-/tmp/paper}
CHAMFER_MODE=${2:-exact}
RAYS_MULT=${3:-1}
SEED=${4:-3}
mkdir -p "$OUT"

python tools/make_synthetic_dataset.py "$OUT/data/scene" \
  --frames 12 --height 540 --width 960 --seed "$SEED"

cat > "$OUT/scene.yaml" <<EOF
dataloading:
  path: $OUT/data
  scene: ['scene']
  resize_factor:
depth:
  type: None
pose:
  learn_pose: True
  init_pose: False
training:
  out_dir: $OUT/out
  n_training_points: 1024
  print_every: 110
  checkpoint_every: 2000
  backup_every: 0
  visualize_every: 0
  auto_scheduler: True
  length_smooth: 100
  patient: 12
  scheduling_start: 1200
  scheduling_epoch: 600
  annealing_epochs: 300
tpu:
  chamfer_mode: $CHAMFER_MODE
  rays_per_step_multiplier: $RAYS_MULT
eval_pose:
  opt_pose_epoch: 200
extract_images:
  N_novel_imgs: 12
  traj_option: interp
  resolution: [540, 960]
EOF

python train.py "$OUT/scene.yaml"
python evaluation/eval_poses.py "$OUT/scene.yaml"
python evaluation/eval.py "$OUT/scene.yaml"

echo "--- done; artifacts in $OUT/out"
