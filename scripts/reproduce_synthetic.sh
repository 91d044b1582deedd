#!/bin/bash
# End-to-end reproduction on synthetic data (no datasets needed):
#   dataset gen -> full training (poses from scratch, auto-scheduler) ->
#   pose eval -> held-out image eval -> novel-view render.
# Run from the repo root on a TPU host:
#   PYTHONPATH=$(pwd):/root/.axon_site ./scripts/reproduce_synthetic.sh /tmp/repro
set -e
OUT=${1:-/tmp/repro}
mkdir -p "$OUT"

python tools/make_synthetic_dataset.py "$OUT/data/scene" \
  --frames 20 --height 96 --width 128 --seed 3

cat > "$OUT/scene.yaml" <<EOF
model:
  hidden_dim: 128
dataloading:
  path: $OUT/data
  scene: ['scene']
  resize_factor:
rendering:
  num_points: 64
depth:
  type: None
pose:
  learn_pose: True
  init_pose: False
training:
  out_dir: $OUT/out
  n_training_points: 1024
  print_every: 190
  checkpoint_every: 2000
  backup_every: 0
  visualize_every: 0
  auto_scheduler: True
  length_smooth: 100
  patient: 12
  scheduling_start: 1200
  scheduling_epoch: 600
  annealing_epochs: 300
eval_pose:
  opt_pose_epoch: 200
extract_images:
  N_novel_imgs: 20
  traj_option: interp
  resolution: [96, 128]
EOF

python train.py "$OUT/scene.yaml"
python evaluation/eval_poses.py "$OUT/scene.yaml" --vis
python evaluation/eval.py "$OUT/scene.yaml"
python vis/render.py "$OUT/scene.yaml"

echo "--- done; artifacts in $OUT/out"
