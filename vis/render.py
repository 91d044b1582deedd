#!/usr/bin/env python
"""Novel-view synthesis CLI — equivalent of the reference's `vis/render.py`.

Restores field (+poses, +focal), builds a novel trajectory
('interp' slerp | 'bspline' | 'sprial'[sic, kept for config compat]), renders
rgb + depth per pose and writes img.mp4 / depth.mp4
(reference lines 48-118).
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
    check_supported,
    load_config,
)
from nope_nerf_tpu.dataloading.scene import get_scene
from nope_nerf_tpu.geometry.rays import camera_mat_from_fxfy
from nope_nerf_tpu.geometry.trajectory import (
    generate_spiral_nerf,
    interp_poses,
    interp_poses_bspline,
)
from nope_nerf_tpu.models.intrinsics import focal_fxfy
from nope_nerf_tpu.models.pose import all_poses
from nope_nerf_tpu.ops.rendering import render_image
from nope_nerf_tpu.training.checkpoints import CheckpointIO
from nope_nerf_tpu.training.trainer import make_render_cfg


def render_novel_views(nerf_params, camera_mat, c2ws, render_cfg, resolution,
                       render_dir, *, output_geo=False, rad=4.0):
    """Render each novel c2w and write the reference's per-frame artifact
    tree (`model/extracting_images.py:38-124`): ``img_out/NNNN.png``,
    ``depth_out/NNNN.png`` (per-frame normalised uint8) + ``depth_out/N.npy``
    (raw depth), and ``geo_out/NNNN.png`` when the phong pass is on.

    Returns (imgs, depths, geos) as lists of uint8 arrays for the videos.
    """
    import imageio

    img_out_dir = os.path.join(render_dir, "img_out")
    depth_out_dir = os.path.join(render_dir, "depth_out")
    os.makedirs(img_out_dir, exist_ok=True)
    os.makedirs(depth_out_dir, exist_ok=True)
    if output_geo:
        geo_out_dir = os.path.join(render_dir, "geo_out")
        os.makedirs(geo_out_dir, exist_ok=True)

    imgs, depths, geos = [], [], []
    for i, c2w in enumerate(np.asarray(c2ws)):
        world_mat = jnp.asarray(np.linalg.inv(c2w))
        rgb, depth = render_image(
            nerf_params, tuple(resolution), jnp.asarray(camera_mat),
            world_mat, jnp.eye(4), render_cfg,
        )
        rgb = np.clip(np.asarray(rgb), 0, 1)
        depth = np.asarray(depth)
        imgs.append((rgb * 255).astype(np.uint8))
        np.save(os.path.join(depth_out_dir, f"{i}.npy"), depth)
        dmin, dmax = depth.min(), max(depth.max(), 1e-8)
        depths.append(
            np.clip(255.0 / dmax * (depth - dmin), 0, 255).astype(np.uint8)
        )
        imageio.imwrite(
            os.path.join(img_out_dir, str(i).zfill(4) + ".png"), imgs[-1])
        imageio.imwrite(
            os.path.join(depth_out_dir, str(i).zfill(4) + ".png"),
            depths[-1])
        if output_geo:
            from nope_nerf_tpu.geometry.rays import arange_pixels
            from nope_nerf_tpu.ops.phong import phong_render

            _, pixels = arange_pixels(tuple(resolution))
            geo = phong_render(
                nerf_params, pixels, jnp.asarray(camera_mat), world_mat,
                jnp.eye(4), render_cfg, rad=rad,
            )["rgb"]
            geo = np.clip(
                np.asarray(geo).reshape(resolution[0], resolution[1], 3),
                0, 1,
            )
            geos.append((geo * 255).astype(np.uint8))
            imageio.imwrite(
                os.path.join(geo_out_dir, str(i).zfill(4) + ".png"),
                geos[-1])
        print(f"rendered novel view {i + 1}/{len(c2ws)}")
    return imgs, depths, geos


def main(cfg):
    apply_parity_profile(cfg)
    np.random.seed(0)
    out_dir = cfg["training"]["out_dir"]
    generation_dir = os.path.join(out_dir, cfg["extract_images"]["extraction_dir"])
    op = cfg["extract_images"]["traj_option"]
    n_novel = cfg["extract_images"]["N_novel_imgs"]

    scene = get_scene(cfg, mode="render")
    io = CheckpointIO(out_dir)
    nerf_tree, _ = io.load(cfg["extract_images"]["model_file"])
    nerf_params = jax.tree.map(jnp.asarray, nerf_tree["params"])
    render_cfg = make_render_cfg(cfg)

    if cfg["pose"]["learn_pose"]:
        pose_tree, _ = io.load(cfg["extract_images"]["model_file_pose"])
        pose_params = jax.tree.map(jnp.asarray, pose_tree["params"])
        init_c2w = (
            jnp.asarray(scene.c2ws)
            if (cfg["pose"]["init_pose"] and scene.c2ws is not None)
            else None
        )
        learned = np.asarray(all_poses(pose_params, init_c2w))
    else:
        learned = scene.c2ws

    if op == "sprial":  # reference spelling (`vis/render.py:64`)
        bds = np.array([2.0, 4.0])
        hwf = scene.hwf
        c2ws = generate_spiral_nerf(learned, bds, n_novel, hwf)
        pad = np.tile(np.eye(4, dtype=np.float32), (c2ws.shape[0], 1, 1))
        pad[:, :3, :4] = c2ws
        c2ws = pad
    elif op == "interp":
        c2ws = interp_poses(learned, n_novel)
    elif op == "bspline":
        c2ws = interp_poses_bspline(
            learned, n_novel, scene.i_train,
            cfg["extract_images"]["bspline_degree"],
        )
    else:
        raise ValueError(f"unknown traj_option {op}")

    if cfg["pose"]["learn_focal"]:
        focal_tree, _ = io.load(cfg["extract_images"]["model_file_focal"])
        fparams = jax.tree.map(jnp.asarray, focal_tree["params"])
        fxfy = focal_fxfy(fparams, cfg["pose"]["fx_only"],
                          cfg["pose"]["focal_order"])
        camera_mat = np.asarray(camera_mat_from_fxfy(fxfy))
        print(f"learned fx: {float(fxfy[0]):.2f}, fy: {float(fxfy[1]):.2f}")
    else:
        camera_mat = scene.K

    resolution = cfg["extract_images"]["resolution"] or (scene.H, scene.W)
    render_dir = os.path.join(generation_dir, "extracted_images", op)
    os.makedirs(render_dir, exist_ok=True)

    # the reference CLI pins output_geo=False (`vis/render.py:103`) while
    # its Extract_Images supports the phong pass; here it is an opt-in knob
    output_geo = bool(cfg["extract_images"].get("output_geo", False))
    imgs, depths, geos = render_novel_views(
        nerf_params, camera_mat, np.asarray(c2ws), render_cfg,
        tuple(resolution), render_dir, output_geo=output_geo,
        rad=cfg["rendering"]["radius"],
    )

    video_dir = os.path.join(render_dir, "video_out")
    os.makedirs(video_dir, exist_ok=True)
    from nope_nerf_tpu.utils.video import write_video

    write_video(os.path.join(video_dir, "img.mp4"), np.stack(imgs))
    write_video(
        os.path.join(video_dir, "depth.mp4"),
        np.stack(depths)[..., None].repeat(3, -1),
    )
    if geos:
        write_video(os.path.join(video_dir, "geo.mp4"), np.stack(geos))
    print(f"videos written to {video_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Render novel views.")
    parser.add_argument("config", type=str, help="Path to config file.")
    args = parser.parse_args()
    cfg = load_config(args.config, DEFAULT_CONFIG)
    check_supported(cfg)
    main(cfg)
