#!/usr/bin/env python
"""Pose-accuracy evaluation CLI — equivalent of the reference's
`evaluation/eval_poses.py`.

Loads learned poses, Sim(3)-aligns them to the COLMAP/gt trajectory, prints
RPE_t (x100), RPE_r (deg) and ATE (reference lines 31-113); ``--vis`` exports
camera frustums as a PLY line set (open3d-free).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nope_nerf_tpu.config import (
    DEFAULT_CONFIG,
    apply_parity_profile,
    load_config,
)
from nope_nerf_tpu.dataloading.scene import get_scene
from nope_nerf_tpu.geometry.align import (
    align_ate_c2b_use_a2b,
    compute_ate,
    compute_rpe,
)
from nope_nerf_tpu.models.pose import all_poses
from nope_nerf_tpu.training.checkpoints import CheckpointIO
from nope_nerf_tpu.utils.vis import export_camera_frustums


def main(cfg, vis=False):
    # surface consistency: all five CLIs accept the tpu.parity one-knob
    # profile (pose eval has no sampling knobs today, so this is a no-op
    # guard that keeps the knob future-proof here)
    apply_parity_profile(cfg)
    out_dir = cfg["training"]["out_dir"]
    scene = get_scene(cfg, mode="train")

    io = CheckpointIO(out_dir)
    pose_tree, _ = io.load(cfg["extract_images"]["model_file_pose"])
    pose_params = jax.tree.map(jnp.asarray, pose_tree["params"])
    init_c2w = (
        jnp.asarray(scene.c2ws)
        if (cfg["pose"]["init_pose"] and scene.c2ws is not None)
        else None
    )
    learned = np.asarray(all_poses(pose_params, init_c2w))
    gt = scene.c2ws
    if gt is None:
        print("No gt/COLMAP poses available for this scene")
        return None

    aligned = align_ate_c2b_use_a2b(learned, gt)
    ate = compute_ate(gt, aligned)
    rpe_t, rpe_r = compute_rpe(gt, aligned)
    print(
        "{0:.3f} & {1:.3f} & {2:.3f}".format(
            rpe_t * 100, np.rad2deg(rpe_r), ate
        )
    )
    if vis:
        ply = os.path.join(out_dir, "pose_vis.ply")
        export_camera_frustums(
            ply, [aligned, gt], colors=[(0, 0, 255), (255, 0, 0)],
            fov_deg=50.0, frustum_size=0.1,
        )
        print(f"frustum line set written to {ply}")
    return {"rpe_trans": rpe_t * 100, "rpe_rot_deg": float(np.rad2deg(rpe_r)),
            "ate": ate}


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Evaluate poses.")
    parser.add_argument("config", type=str, help="Path to config file.")
    parser.add_argument("--vis", action="store_true",
                        help="export frustum PLY")
    args = parser.parse_args()
    cfg = load_config(args.config, DEFAULT_CONFIG)
    main(cfg, vis=args.vis)
