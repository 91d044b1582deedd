#!/usr/bin/env python
"""Estimated-trajectory visualisation CLI — equivalent of the reference's
`vis/vis_poses.py` (open3d frustum viewer, lines 29-84), exporting a PLY line
set instead (open3d is not in this image; the PLY opens in MeshLab /
CloudCompare / open3d).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nope_nerf_tpu.config import DEFAULT_CONFIG, load_config
from nope_nerf_tpu.dataloading.scene import get_scene
from nope_nerf_tpu.models.pose import all_poses
from nope_nerf_tpu.training.checkpoints import CheckpointIO
from nope_nerf_tpu.utils.vis import export_camera_frustums


def main(cfg):
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
    # frustum size scaled to the trajectory extent, like the reference
    # (`vis/vis_poses.py:57-64`)
    pts = learned[:, :3, 3]
    extent = float(np.linalg.norm(pts[None] - pts[:, None], axis=-1).max())
    ply = os.path.join(out_dir, "est_poses.ply")
    export_camera_frustums(
        ply, [learned], colors=[(41, 98, 255)], fov_deg=50.0,
        frustum_size=max(extent * 0.05, 1e-3),
    )
    print(f"estimated trajectory written to {ply}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Visualise estimated poses.")
    parser.add_argument("config", type=str, help="Path to config file.")
    args = parser.parse_args()
    cfg = load_config(args.config, DEFAULT_CONFIG)
    main(cfg)
