#!/usr/bin/env python
"""Training CLI — drop-in equivalent of the reference's `train.py`.

Usage: python train.py configs/Tanks/Ignatius.yaml

Reads the same two-level YAML configs and dataset layout
(poses_bounds.npy, images_{factor}/, dpt/depth_*.npz); writes checkpoints,
logs and renderings under training.out_dir.
"""
import argparse
import os
import shutil

from nope_nerf_tpu.config import DEFAULT_CONFIG, load_config
from nope_nerf_tpu.training.loop import train


def backup(out_dir, config_path):
    """Source/config snapshot per run (reference `model/common.py:492-506`)."""
    backup_path = os.path.join(out_dir, "backup")
    os.makedirs(backup_path, exist_ok=True)
    shutil.copyfile(config_path, os.path.join(backup_path, "config.yaml"))
    shutil.copyfile(DEFAULT_CONFIG, os.path.join(backup_path, "default.yaml"))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Training of nope-nerf-tpu")
    parser.add_argument("config", type=str, help="Path to config file.")
    parser.add_argument("--max-epochs", type=int, default=None,
                        help="Optional epoch cap (smoke runs).")
    args = parser.parse_args()
    cfg = load_config(args.config, DEFAULT_CONFIG)
    os.makedirs(cfg["training"]["out_dir"], exist_ok=True)
    backup(cfg["training"]["out_dir"], args.config)
    train(cfg, max_epochs=args.max_epochs)
