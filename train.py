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
    """Per-run source + config snapshot (reference `model/common.py:492-506`
    copies its source tree into ``out_dir/backup``; we snapshot the package
    source and, when running from a git checkout, the SHA + dirty diff)."""
    backup_path = os.path.join(out_dir, "backup")
    os.makedirs(backup_path, exist_ok=True)
    shutil.copyfile(config_path, os.path.join(backup_path, "config.yaml"))
    shutil.copyfile(DEFAULT_CONFIG, os.path.join(backup_path, "default.yaml"))

    repo_root = os.path.dirname(os.path.abspath(__file__))
    for rel in ("nope_nerf_tpu", "evaluation", "vis", "preprocess"):
        src = os.path.join(repo_root, rel)
        if os.path.isdir(src):
            shutil.copytree(
                src, os.path.join(backup_path, rel), dirs_exist_ok=True,
                ignore=shutil.ignore_patterns("__pycache__", "*.pyc"),
            )
    for rel in ("train.py", "bench.py"):
        src = os.path.join(repo_root, rel)
        if os.path.isfile(src):
            shutil.copyfile(src, os.path.join(backup_path, rel))
    try:
        import subprocess

        sha = subprocess.run(
            ["git", "-C", repo_root, "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10,
        )
        diff = subprocess.run(
            ["git", "-C", repo_root, "diff", "HEAD"],
            capture_output=True, text=True, timeout=30,
        )
        if sha.returncode == 0:
            with open(os.path.join(backup_path, "git_state.txt"), "w") as f:
                f.write(sha.stdout)
                if diff.returncode == 0 and diff.stdout:
                    f.write("\n--- dirty diff ---\n")
                    f.write(diff.stdout)
    except Exception:
        pass  # not a git checkout / git unavailable — source copy suffices


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
