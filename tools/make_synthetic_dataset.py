#!/usr/bin/env python
"""Generate a synthetic LLFF-layout dataset on disk.

Renders a teacher-NeRF scene at known poses and writes the exact directory
layout the training pipeline consumes (`dataloading/common.py:59-148` in the
reference): images/*.png, poses_bounds.npy, dpt/depth_*.npz.  Used by the
end-to-end verification runs and as a data-free smoke fixture.

Usage: python tools/make_synthetic_dataset.py <out_dir> [--frames 6]
       [--height 60] [--width 80]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--height", type=int, default=60)
    ap.add_argument("--width", type=int, default=80)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gt-depth", action="store_true",
                    help="also write depth/<frame>.png 16-bit mm gt depths "
                         "(the reference's with_depth/eval_depth layout, "
                         "`dataloading/common.py:241-263`)")
    args = ap.parse_args()

    from nope_nerf_tpu.utils.synthetic import SyntheticScene

    scene = SyntheticScene(
        n_frames=args.frames, hw=(args.height, args.width), seed=args.seed,
        num_points=32,
    )

    scene_dir = args.out_dir
    img_dir = os.path.join(scene_dir, "images")
    dpt_dir = os.path.join(scene_dir, "dpt")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(dpt_dir, exist_ok=True)

    H, W = args.height, args.width
    focal_px = 0.8 * W  # matches SyntheticScene's K

    rows = []
    for i in range(args.frames):
        name = f"{i:03d}"
        Image.fromarray(
            (np.clip(scene.imgs[i], 0, 1) * 255).astype(np.uint8)
        ).save(os.path.join(img_dir, name + ".png"))
        np.savez(os.path.join(dpt_dir, f"depth_{name}.npz"),
                 pred=scene.dpt_depth[i].astype(np.float32))
        if args.gt_depth:
            gt_dir = os.path.join(scene_dir, "depth")
            os.makedirs(gt_dir, exist_ok=True)
            # the teacher's rendered depth IS the ground truth here;
            # 16-bit png in millimetres per the reference's loader
            mm = np.clip(scene.dpt_depth[i] * 1000.0, 0, 65535)
            Image.fromarray(mm.astype(np.uint16)).save(
                os.path.join(gt_dir, name + ".png")
            )

        # invert the loader's column permutation
        # (`dataloading/dataset.py:57`): loader does
        # new = [old_col1, -old_col0, old_col2, t, hwf]
        # so to yield c2w cols [right, up, back, t]:
        c2w = scene.c2ws[i]
        right, up, back, t = c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3]
        m = np.stack([-up, right, back, t], axis=1)  # (3, 4) LLFF cols
        hwf = np.array([H, W, focal_px])[:, None]
        pose35 = np.concatenate([m, hwf], axis=1)  # (3, 5)
        near, far = 0.5, 6.0
        rows.append(np.concatenate([pose35.reshape(-1), [near, far]]))

    np.save(os.path.join(scene_dir, "poses_bounds.npy"),
            np.stack(rows).astype(np.float64))
    print(f"wrote {args.frames} frames to {scene_dir}")


if __name__ == "__main__":
    main()
