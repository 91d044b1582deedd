#!/usr/bin/env python
"""Image-quality evaluation CLI — equivalent of the reference's
`evaluation/eval.py`.

Protocol (reference lines 23-209): restore field/pose/focal, optimise
per-test-frame poses photometrically (init 'pre'|'scale'|'ate'|'none'),
render every test view, report PSNR/SSIM/LPIPS (+ optional depth metrics),
write pngs and an mp4.
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
from nope_nerf_tpu.evaluation.eval_images import eval_image
from nope_nerf_tpu.evaluation.metrics import median_scaled_depth_errors
from nope_nerf_tpu.evaluation.pose_opt import (
    init_eval_poses,
    optimize_eval_poses,
)
from nope_nerf_tpu.geometry.rays import camera_mat_from_fxfy
from nope_nerf_tpu.models.intrinsics import focal_fxfy
from nope_nerf_tpu.models.pose import all_poses
from nope_nerf_tpu.training.checkpoints import CheckpointIO
from nope_nerf_tpu.training.trainer import make_render_cfg
from nope_nerf_tpu.utils.logging import MetricsLogger


def main(cfg, eval_depth=False):
    apply_parity_profile(cfg)
    np.random.seed(0)

    out_dir = cfg["training"]["out_dir"]
    generation_dir = os.path.join(out_dir, cfg["eval_pose"]["extraction_dir"])
    os.makedirs(generation_dir, exist_ok=True)
    logger = MetricsLogger(os.path.join(out_dir, "logs"))

    train_scene = get_scene(cfg, mode="train")
    eval_scene = get_scene(cfg, mode="eval")

    io = CheckpointIO(out_dir)
    nerf_tree, _ = io.load(cfg["extract_images"]["model_file"])
    nerf_params = jax.tree.map(jnp.asarray, nerf_tree["params"])

    use_learnt_poses = cfg["pose"]["learn_pose"]
    use_learnt_focal = cfg["pose"]["learn_focal"]
    init_method = cfg["eval_pose"]["init_method"]
    num_epoch = cfg["eval_pose"]["opt_pose_epoch"]
    opt_eval_lr = cfg["eval_pose"]["opt_eval_lr"]
    type_to_eval = cfg["eval_pose"]["type_to_eval"]

    render_cfg = make_render_cfg(cfg)

    if use_learnt_focal:
        focal_tree, _ = io.load(cfg["extract_images"]["model_file_focal"])
        fparams = jax.tree.map(jnp.asarray, focal_tree["params"])
        fxfy = focal_fxfy(fparams, cfg["pose"]["fx_only"],
                          cfg["pose"]["focal_order"])
        camera_mat = np.asarray(camera_mat_from_fxfy(fxfy))
        print(f"learned fx: {float(fxfy[0]):.2f}, fy: {float(fxfy[1]):.2f}")
    else:
        camera_mat = train_scene.K

    init_c2w_train = (
        jnp.asarray(train_scene.c2ws)
        if (cfg["pose"]["init_pose"] and train_scene.c2ws is not None)
        else None
    )
    if use_learnt_poses:
        pose_tree, _ = io.load(cfg["extract_images"]["model_file_pose"])
        pose_params = jax.tree.map(jnp.asarray, pose_tree["params"])
        learned_c2ws_train = np.asarray(all_poses(pose_params, init_c2w_train))
    else:
        learned_c2ws_train = train_scene.c2ws

    if type_to_eval == "train":
        scene = train_scene
        eval_c2ws = learned_c2ws_train
        render_dir = os.path.join(generation_dir, "eval_trained")
    else:
        scene = eval_scene
        render_dir = os.path.join(generation_dir, "eval", init_method)
        init_c2ws = init_eval_poses(
            init_method,
            eval_scene.c2ws,
            learned_c2ws_train,
            train_scene.c2ws,
            train_scene.sample_rate,
            eval_scene.N_imgs,
        )
        cfg2 = dict(cfg)
        eval_imgs = jnp.asarray(scene.imgs)
        eval_c2ws, _ = optimize_eval_poses(
            nerf_params, camera_mat, cfg2, render_cfg, eval_imgs,
            scene.scale_mat, init_c2ws, num_epoch, opt_eval_lr,
            cfg["eval_pose"]["n_points"], logger=logger,
        )
    os.makedirs(render_dir, exist_ok=True)

    # optional LPIPS (JAX VGG port; needs converted weights on disk).
    # Only a MISSING weights file is tolerated — a real bug in the LPIPS
    # stack must surface, not be reported as "unavailable".
    lpips_fn = None
    try:
        from nope_nerf_tpu.models.lpips import load_lpips

        # optional override of the ~/.cache weights location (used by the
        # first-contact dry run to keep its synthetic weights out of the
        # real cache); absent key -> DEFAULT_WEIGHTS
        lpips_fn = load_lpips(cfg["extract_images"].get("lpips_weights"))
    except FileNotFoundError as e:
        print(f"LPIPS weights not found ({e}); reporting nan — convert them "
              "once with tools/convert_lpips.py")

    resolution = cfg["extract_images"]["resolution"] or (scene.H, scene.W)
    results = []
    depth_gts, depth_preds = [], []
    min_depth, max_depth = 0.1, 20.0
    for i in range(scene.N_imgs):
        world_mat = np.linalg.inv(eval_c2ws[i])
        import cv2

        img_gt = cv2.resize(scene.imgs[i], (resolution[1], resolution[0]))
        dgt = scene.depth[i] if scene.depth is not None else None
        out = eval_image(
            nerf_params, render_cfg, resolution, camera_mat, world_mat,
            scene.scale_mat, img_gt, depth_gt=dgt, lpips_fn=lpips_fn,
            min_depth=min_depth, max_depth=max_depth, render_dir=render_dir,
            img_idx=i,
        )
        print(
            f"{i:4d} img: PSNR: {out['psnr']:.2f}, SSIM: {out['ssim']:.2f}, "
            f"LPIPS {out['lpips']:.2f}"
        )
        results.append(out)
        if dgt is not None:
            depth_gts.append(out["depth_gt"])
            depth_preds.append(out["depth_pred"])

    mean_psnr = float(np.mean([r["psnr"] for r in results]))
    mean_ssim = float(np.mean([r["ssim"] for r in results]))
    mean_lpips = float(np.mean([r["lpips"] for r in results]))
    mean_mse = float(np.mean([r["mse"] for r in results]))
    print("--------------------------")
    print(
        f"Mean MSE: {mean_mse:.2f}, PSNR: {mean_psnr:.2f}, "
        f"SSIM: {mean_ssim:.2f}, LPIPS {mean_lpips:.2f}"
    )
    print(f"{mean_psnr:.2f} &{mean_ssim:.2f} & {mean_lpips:.2f}")

    if eval_depth and depth_gts:
        mean_errors, _ = median_scaled_depth_errors(
            depth_gts, depth_preds, min_depth, max_depth
        )
        header = ("{:>8} | " * 7).format(
            "abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"
        )
        row = ("&{: 8.3f}  " * 7).format(*mean_errors.tolist()) + "\\\\"
        print("\n  " + header)
        print(row)
        with open(os.path.join(generation_dir, "depth_evaluation.txt"), "a") as f:
            f.write(header + "\n" + row + "\n")

    imgs = np.stack([r["img"] for r in results])
    video_dir = os.path.join(render_dir, "video_out")
    os.makedirs(video_dir, exist_ok=True)
    from nope_nerf_tpu.utils.video import write_video

    write_video(os.path.join(video_dir, "img.mp4"), imgs)
    return {"psnr": mean_psnr, "ssim": mean_ssim, "lpips": mean_lpips}


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Evaluate images.")
    parser.add_argument("config", type=str, help="Path to config file.")
    parser.add_argument("--depth", action="store_true",
                        help="evaluate depth metrics")
    args = parser.parse_args()
    cfg = load_config(args.config, DEFAULT_CONFIG)
    check_supported(cfg)
    if args.depth:
        cfg["extract_images"]["eval_depth"] = True
    main(cfg, eval_depth=cfg["extract_images"]["eval_depth"] or args.depth)
