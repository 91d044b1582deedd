"""Synthetic scene generator for tests and benchmarks.

Renders a tiny scene *from a teacher NeRF* (random field, fixed seed) at
known poses, so training on it is exactly realizable — the convergence smoke
tests (SURVEY.md §4c) fit this data from scratch and assert PSNR gains
without any dataset on disk.  Matches the SceneData attribute surface used by
the training loop.
"""
from __future__ import annotations

import random as pyrandom

import jax
import jax.numpy as jnp
import numpy as np

from ..models.nerf import init_nerf_params
from ..ops.rendering import render_image


def lookat_c2w(eye, target, up=(0.0, 1.0, 0.0)):
    """c2w for a camera at ``eye`` looking at ``target``.

    Convention: camera looks down -z (K = diag(fx, -fy, -1, 1) backprojects
    pixel depth d to z_cam = -d).
    """
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    z = -fwd
    up = np.asarray(up, np.float64)
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
    return c2w


class SyntheticScene:
    """Duck-typed SceneData for in-memory synthetic scenes."""

    def __init__(self, n_frames=6, hw=(32, 40), seed=0, radius=2.5,
                 depth_range=(0.5, 6.0), random_ref=1, num_points=32):
        H, W = hw
        self.H, self.W = H, W
        fx = fy = 0.8 * W
        self.K = np.array(
            [
                [2 * fx / W, 0, 0, 0],
                [0, -2 * fy / H, 0, 0],
                [0, 0, -1, 0],
                [0, 0, 0, 1],
            ],
            np.float32,
        )
        self.scale_mat = np.eye(4, dtype=np.float32)
        self.random_ref = random_ref
        self.N_imgs = n_frames

        # poses on an arc around the origin
        c2ws = []
        for i in range(n_frames):
            th = 0.25 * np.pi * (i / max(n_frames - 1, 1) - 0.5)
            eye = radius * np.array([np.sin(th), 0.1, np.cos(th)])
            c2ws.append(lookat_c2w(eye, [0.0, 0.0, 0.0]))
        self.c2ws = np.stack(c2ws)

        # teacher field
        cfg = {
            "model": {
                "hidden_dim": 64,
                "pos_enc_levels": 4,
                "dir_enc_levels": 2,
                "occ_activation": "softplus",
            },
            "rendering": {"white_background": False},
        }
        key = jax.random.PRNGKey(seed + 100)
        teacher = init_nerf_params(key, cfg)
        # give the teacher some structure: scale up first-layer weights
        teacher["trunk0_0"]["w"] = teacher["trunk0_0"]["w"] * 4.0
        render_cfg = {
            "num_points": num_points,
            "depth_range": list(depth_range),
            "sample_option": "uniform",
            "dist_alpha": False,
            "use_ray_dir": True,
            "normalise_ray": True,
            "white_background": False,
            "normal_loss": False,
            "outside_steps": 0,
            "occ_activation": "softplus",
            "pos_enc_levels": 4,
            "dir_enc_levels": 2,
        }
        self.teacher = teacher
        self.teacher_render_cfg = render_cfg

        imgs, depths = [], []
        K = jnp.asarray(self.K)
        for c2w in self.c2ws:
            world_mat = jnp.asarray(np.linalg.inv(c2w))
            rgb, depth = render_image(
                teacher, (H, W), K, world_mat, jnp.eye(4), render_cfg,
                chunk=H * W,
            )
            imgs.append(np.asarray(rgb))
            depths.append(np.asarray(depth))
        self.imgs = np.stack(imgs).astype(np.float32)
        self.dpt_depth = np.stack(depths).astype(np.float32)
        self.i_train = np.arange(n_frames)
        self.i_test = np.array([], dtype=int)
        self.N_imgs_train = n_frames
        self.N_imgs_test = 0
        self.img_list = [f"{i:03d}.png" for i in range(n_frames)]
        self.depth = None
        self.bds = np.array([[depth_range[0], depth_range[1]]] * n_frames).T
        self.hwf = None
        self.c2ws_colmap = self.c2ws.copy()
        self.focal = fx

    def sample_ref_idx(self, idx, rng: pyrandom.Random | None = None):
        rnd = rng or pyrandom
        if idx == self.N_imgs - 1:
            return idx - 1
        ran = rnd.randint(1, min(self.random_ref, self.N_imgs - idx - 1))
        return idx + ran


def tiny_config(scene, out_dir, n_training_points=128, num_points=32,
                depth_range=(0.5, 6.0)):
    """A minimal full config dict for the synthetic scene."""
    from ..config import DEFAULT_CONFIG, load_config, update_recursive

    cfg = load_config(DEFAULT_CONFIG, default_path=None)
    update_recursive(
        cfg,
        {
            "model": {"hidden_dim": 64, "pos_enc_levels": 4,
                      "dir_enc_levels": 2},
            "rendering": {
                "num_points": num_points,
                "depth_range": list(depth_range),
            },
            "training": {
                "out_dir": out_dir,
                "n_training_points": n_training_points,
                "print_every": 0,
                "checkpoint_every": 0,
                "backup_every": 0,
                "visualize_every": 0,
                "eval_pose_every": 1,
                "eval_img_every": 1,
                "scheduling_start": 10000,
                "auto_scheduler": False,
                "pc_ratio": 4,
            },
            "tpu": {"chamfer_block": 256, "epoch_scan": True},
        },
    )
    return cfg
