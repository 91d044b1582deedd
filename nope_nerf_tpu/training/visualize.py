"""Periodic training visualisations (`Trainer.render_visdata`,
`model/training.py:100-163`): low-res rgb + depth render of a monitor frame,
plus the optional phong geometry preview (``vis_geo``)."""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..geometry.rays import arange_pixels, camera_mat_from_fxfy
from ..models.intrinsics import focal_fxfy
from ..models.pose import pose_c2w
from ..ops.phong import phong_render
from ..ops.rendering import render_image


def render_visdata(state, cfg, render_cfg, init_c2w, scene, resolution, it,
                   out_render_path, img_idx=0, mesh=None):
    """Write ``%04d_img.png`` / ``%04d_depth.png`` (+ ``%04d_geo.png`` with
    vis_geo) for the monitor frame."""
    import imageio

    os.makedirs(out_render_path, exist_ok=True)
    h, w = resolution
    params = state.params
    if mesh is not None:
        # params live on the mesh's devices; no program built here may
        # contain the unpartitionable fused-MLP custom call
        render_cfg = dict(render_cfg, use_pallas_mlp=False)
    if cfg["pose"]["learn_pose"]:
        c2w = pose_c2w(params["pose"], img_idx, init_c2w)
        world_mat = jnp.linalg.inv(c2w)
    else:
        world_mat = jnp.eye(4)
    if cfg["pose"]["learn_focal"]:
        fxfy = focal_fxfy(params["focal"], cfg["pose"]["fx_only"],
                          cfg["pose"]["focal_order"])
        camera_mat = camera_mat_from_fxfy(fxfy)
    else:
        camera_mat = jnp.asarray(scene.K)
    scale_mat = jnp.asarray(scene.scale_mat)

    # mesh must be threaded through: params are committed to the mesh's
    # devices during sharded training, and render_image's mesh branch both
    # shards the chunk rays and disables the unpartitionable Pallas-MLP
    # custom call (a mesh=None jit here would embed it in a multi-device
    # GSPMD program)
    chunk = min(h * w, 16384)
    if mesh is not None:
        n_dev = len(mesh.devices.ravel())
        chunk = max(chunk // n_dev * n_dev, n_dev)
    rgb, depth = render_image(params["nerf"], (h, w), camera_mat, world_mat,
                              scale_mat, render_cfg, chunk=chunk, mesh=mesh)
    rgb = np.clip(np.asarray(rgb), 0, 1)
    depth = np.asarray(depth)
    imageio.imwrite(
        os.path.join(out_render_path, "%04d_img.png" % img_idx),
        (rgb * 255).astype(np.uint8),
    )
    d_vis = np.clip(
        255.0 / max(depth.max(), 1e-8) * (depth - depth.min()), 0, 255
    ).astype(np.uint8)
    imageio.imwrite(
        os.path.join(out_render_path, "%04d_depth.png" % img_idx), d_vis
    )

    if cfg["training"].get("vis_geo", False):
        _, pixels = arange_pixels((h, w))
        out = phong_render(
            params["nerf"], pixels, camera_mat, world_mat, scale_mat,
            render_cfg, rad=cfg["rendering"]["radius"],
        )
        geo = np.clip(np.asarray(out["rgb"]).reshape(h, w, 3), 0, 1)
        imageio.imwrite(
            os.path.join(out_render_path, "%04d_geo.png" % img_idx),
            (geo * 255).astype(np.uint8),
        )
    return rgb
