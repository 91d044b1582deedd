"""LLFF / COLMAP dataset IO (host-side numpy).

Reimplements `dataloading/common.py` from the reference:
* ``poses_bounds.npy`` parsing and hwf bookkeeping (`_load_data`, :59-148),
* image minification cache ``images_{factor}/`` — in-process PIL resize
  instead of the reference's ImageMagick ``mogrify`` subprocess (:8-57),
* pose recentering / spherification (:149-238),
* gt / DPT-npz depth loading incl. cross-frame normalisation (:241-315).
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image

_EXTS = ("JPG", "jpg", "png", "jpeg", "PNG")


def _list_images(d):
    return [f for f in sorted(os.listdir(d)) if f.endswith(_EXTS)]


def _minify(basedir, factor, img_folder="images"):
    """Create the ``{img_folder}_{factor}/`` downsampled cache if missing.

    PIL in-process resize (replaces the ImageMagick subprocess at
    `dataloading/common.py:45-51`); same on-disk layout, png output.
    """
    imgdir = os.path.join(basedir, f"{img_folder}_{factor}")
    if os.path.exists(imgdir):
        return
    srcdir = os.path.join(basedir, img_folder)
    names = _list_images(srcdir)
    os.makedirs(imgdir)
    for name in names:
        img = Image.open(os.path.join(srcdir, name))
        w, h = img.size
        out = img.resize((int(round(w / factor)), int(round(h / factor))),
                         Image.LANCZOS)
        stem = os.path.splitext(name)[0]
        out.save(os.path.join(imgdir, stem + ".png"))


def _imread(path):
    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    return img


def load_llff_data(basedir, factor=None, crop_size=0, load_colmap_poses=True):
    """Load images (+poses) — reference ``_load_data``
    (`dataloading/common.py:59-148`).

    Returns dict with:
        poses: (3, 5, N) raw LLFF poses (or None),
        bds:   (2, N) bounds (or None),
        imgs:  (N, H, W, 3) float32,
        img_names: list[str],
        crop_ratio, focal_crop_factor.
    """
    poses = bds = None
    if load_colmap_poses:
        poses_arr = np.load(os.path.join(basedir, "poses_bounds.npy"))
        poses = poses_arr[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
        bds = poses_arr[:, -2:].transpose([1, 0])

    img_folder = "images"
    crop_ratio = 1
    focal_crop_factor = 1
    if crop_size != 0:
        # crop black borders then restore original size
        # (`dataloading/common.py:67-85`)
        img_folder = "images_cropped"
        crop_dir = os.path.join(basedir, img_folder)
        src = os.path.join(basedir, "images")
        names = _list_images(src)
        if not os.path.exists(crop_dir):
            os.makedirs(crop_dir)
            for f in names:
                image = np.asarray(Image.open(os.path.join(src, f)))
                H, W = image.shape[:2]
                ch = crop_size
                cw = int(ch * W / H)
                cropped = image[ch : H - ch, cw : W - cw]
                Image.fromarray(cropped).resize((W, H)).save(
                    os.path.join(crop_dir, f)
                )
        probe = np.asarray(Image.open(os.path.join(src, names[0])))
        H = probe.shape[0]
        crop_ratio = crop_size / H
        focal_crop_factor = (H - 2 * crop_size) / H

    sfx = ""
    if factor is not None and factor != 1:
        sfx = f"_{factor}"
        _minify(basedir, factor, img_folder=img_folder)

    imgdir = os.path.join(basedir, img_folder + sfx)
    if not os.path.exists(imgdir):
        raise FileNotFoundError(f"{imgdir} does not exist")
    img_names = _list_images(imgdir)
    imgs = np.stack([_imread(os.path.join(imgdir, f)) for f in img_names])

    if load_colmap_poses:
        if poses.shape[-1] != len(img_names):
            raise ValueError(
                f"Mismatch between imgs {len(img_names)} and poses "
                f"{poses.shape[-1]}"
            )
        sh = imgs.shape[1:3]
        poses[:2, 4, :] = np.array(sh).reshape([2, 1])
        poses[2, 4, :] = poses[2, 4, :] * 1.0 / (factor or 1)

    return {
        "poses": poses,
        "bds": bds,
        "imgs": imgs.astype(np.float32),
        "img_names": img_names,
        "crop_ratio": crop_ratio,
        "focal_crop_factor": focal_crop_factor,
    }


def _normalize(x):
    return x / np.linalg.norm(x)


def _viewmatrix(z, up, pos):
    vec2 = _normalize(z)
    vec0 = _normalize(np.cross(up, vec2))
    vec1 = _normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], 1)


def poses_avg(poses):
    hwf = poses[0, :3, -1:]
    center = poses[:, :3, 3].mean(0)
    vec2 = _normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    return np.concatenate([_viewmatrix(vec2, up, center), hwf], 1)


def recenter_poses(poses):
    """`dataloading/common.py:149-161`."""
    poses_ = poses + 0
    bottom = np.reshape([0, 0, 0, 1.0], [1, 4])
    c2w = poses_avg(poses)
    c2w = np.concatenate([c2w[:3, :4], bottom], -2)
    bottom = np.tile(np.reshape(bottom, [1, 1, 4]), [poses.shape[0], 1, 1])
    poses_h = np.concatenate([poses[:, :3, :4], bottom], -2)
    poses_h = np.linalg.inv(c2w) @ poses_h
    poses_[:, :3, :4] = poses_h[:, :3, :4]
    return poses_


def spherify_poses(poses, bds):
    """`dataloading/common.py:182-238`."""
    p34_to_44 = lambda p: np.concatenate(
        [p, np.tile(np.reshape(np.eye(4)[-1, :], [1, 1, 4]), [p.shape[0], 1, 1])],
        1,
    )
    rays_d = poses[:, :3, 2:3]
    rays_o = poses[:, :3, 3:4]

    def min_line_dist(rays_o, rays_d):
        A_i = np.eye(3) - rays_d * np.transpose(rays_d, [0, 2, 1])
        b_i = -A_i @ rays_o
        return np.squeeze(
            -np.linalg.inv((np.transpose(A_i, [0, 2, 1]) @ A_i).mean(0))
            @ (b_i).mean(0)
        )

    center = min_line_dist(rays_o, rays_d)
    up = (poses[:, :3, 3] - center).mean(0)
    vec0 = _normalize(up)
    vec1 = _normalize(np.cross([0.1, 0.2, 0.3], vec0))
    vec2 = _normalize(np.cross(vec0, vec1))
    c2w = np.stack([vec1, vec2, vec0, center], 1)

    poses_reset = np.linalg.inv(p34_to_44(c2w[None])) @ p34_to_44(poses[:, :3, :4])
    rad = np.sqrt(np.mean(np.sum(np.square(poses_reset[:, :3, 3]), -1)))
    sc = 1.0 / rad
    poses_reset[:, :3, 3] *= sc
    bds = bds * sc
    rad *= sc

    centroid = np.mean(poses_reset[:, :3, 3], 0)
    zh = centroid[2]
    radcircle = np.sqrt(rad**2 - zh**2)
    new_poses = []
    for th in np.linspace(0.0, 2.0 * np.pi, 120):
        camorigin = np.array(
            [radcircle * np.cos(th), radcircle * np.sin(th), zh]
        )
        up = np.array([0, 0, -1.0])
        vec2 = _normalize(camorigin)
        vec0 = _normalize(np.cross(vec2, up))
        vec1 = _normalize(np.cross(vec2, vec0))
        new_poses.append(np.stack([vec0, vec1, vec2, camorigin], 1))
    new_poses = np.stack(new_poses, 0)
    new_poses = np.concatenate(
        [new_poses, np.broadcast_to(poses[0, :3, -1:], new_poses[:, :3, -1:].shape)],
        -1,
    )
    poses_reset = np.concatenate(
        [
            poses_reset[:, :3, :4],
            np.broadcast_to(poses[0, :3, -1:], poses_reset[:, :3, -1:].shape),
        ],
        -1,
    )
    return poses_reset, new_poses, bds


def load_depths_npz(image_list, datadir, H=None, W=None, norm=False):
    """DPT depth maps ``depth_<name>.npz`` (`dataloading/common.py:289-315`)."""
    import cv2

    depths = []
    for image_name in image_list:
        frame_id = image_name.split(".")[0]
        depth = np.load(os.path.join(datadir, f"depth_{frame_id}.npz"))["pred"]
        if depth.ndim == 3 and depth.shape[0] == 1:
            depth = depth[0]
        if H is not None:
            depth = cv2.resize(depth, (W, H))
        depths.append(depth)
    depths = np.stack(depths)
    if norm:
        depths_n = []
        t_all = np.median(depths)
        s_all = np.mean(np.abs(depths - t_all))
        for depth in depths:
            t_i = np.median(depth)
            s_i = np.mean(np.abs(depth - t_i))
            depths_n.append(s_all * (depth - t_i) / s_i + t_all)
        depths = np.stack(depths_n)
    return depths.astype(np.float32)


def load_gt_depths(image_list, datadir, H=None, W=None, crop_ratio=1):
    """16-bit png gt depths in mm (`dataloading/common.py:241-263`)."""
    import cv2

    depths = []
    for image_name in image_list:
        frame_id = image_name.split(".")[0]
        depth_path = os.path.join(datadir, "depth", f"{frame_id}.png")
        depth = cv2.imread(depth_path, cv2.IMREAD_UNCHANGED).astype(np.float32) / 1000
        if crop_ratio != 1:
            h, w = depth.shape
            ch, cw = int(h * crop_ratio), int(w * crop_ratio)
            depth = depth[ch : h - ch, cw : w - cw]
        if H is not None:
            depth = cv2.resize(depth, (W, H), interpolation=cv2.INTER_NEAREST)
        depths.append(depth)
    return np.stack(depths)
