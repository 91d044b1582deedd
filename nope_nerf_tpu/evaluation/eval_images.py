"""Full-image evaluation: chunked render + PSNR/SSIM/LPIPS + artifacts.

Reimplements ``Eval_Images`` (`model/eval_images.py:16-137`): renders each
test view at the eval resolution via the lax.map-chunked renderer, computes
image metrics, writes img/depth/gt pngs, and returns masked depth arrays for
the depth-error suite.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..ops.rendering import render_image
from ..ops.ssim import ssim as ssim_fn
from .metrics import mse2psnr


def _write_png(path, arr_uint8):
    import imageio

    imageio.imwrite(path, arr_uint8)


def eval_image(
    nerf_params,
    render_cfg,
    resolution,
    camera_mat,
    world_mat,
    scale_mat,
    img_gt,
    depth_gt=None,
    lpips_fn=None,
    min_depth=0.1,
    max_depth=20.0,
    render_dir=None,
    img_idx=0,
    chunk=65536,
):
    """Render one view and compute metrics.

    Args:
        img_gt: (h, w, 3) float numpy in [0, 1] at the eval resolution.
        depth_gt: optional (hg, wg) numpy gt depth (for the depth metrics).
        lpips_fn: optional callable (img_pred, img_gt in [0,1] HWC) -> float.
    Returns dict: img (uint8), depth (pred, gt-sized), mse, psnr, ssim,
    lpips, depth_pred/depth_gt (masked flat arrays, may be empty).
    """
    h, w = resolution
    rgb, depth = render_image(
        nerf_params, (h, w), jnp.asarray(camera_mat), jnp.asarray(world_mat),
        jnp.asarray(scale_mat), render_cfg, chunk=chunk,
    )
    rgb = np.asarray(rgb)
    depth = np.asarray(depth)

    mse = float(np.mean((rgb - img_gt) ** 2))
    psnr = float(mse2psnr(mse))
    ssim_val = float(ssim_fn(jnp.asarray(rgb), jnp.asarray(img_gt)))
    lpips_val = float(lpips_fn(rgb, img_gt)) if lpips_fn is not None else float("nan")

    depth_pred_masked = np.zeros(0, np.float32)
    depth_gt_masked = np.zeros(0, np.float32)
    depth_out = depth
    if depth_gt is not None:
        import cv2

        gh, gw = depth_gt.shape[:2]
        depth_out = cv2.resize(depth, (gw, gh), interpolation=cv2.INTER_NEAREST)
        mask = (depth_gt > min_depth) & (depth_gt < max_depth)
        depth_pred_masked = depth_out[mask]
        depth_gt_masked = depth_gt[mask]

    img_uint8 = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
    if render_dir is not None:
        for sub in ("img_out", "depth_out", "img_gt_out"):
            os.makedirs(os.path.join(render_dir, sub), exist_ok=True)
        name = str(img_idx).zfill(4) + ".png"
        _write_png(os.path.join(render_dir, "img_out", name), img_uint8)
        d = depth_out
        d_vis = np.clip(
            255.0 / max(d.max(), 1e-8) * (d - d.min()), 0, 255
        ).astype(np.uint8)
        _write_png(os.path.join(render_dir, "depth_out", name), d_vis)
        _write_png(
            os.path.join(render_dir, "img_gt_out", name),
            (np.clip(img_gt, 0, 1) * 255).astype(np.uint8),
        )

    return {
        "img": img_uint8,
        "depth": depth_out,
        "mse": mse,
        "psnr": psnr,
        "ssim": ssim_val,
        "lpips": lpips_val,
        "depth_pred": depth_pred_masked,
        "depth_gt": depth_gt_masked,
    }
