"""Test-time pose optimisation — part of the evaluated protocol.

Before rendering held-out views, the reference freezes the field and
optimises per-test-frame SE(3) poses by photometric MSE for
``opt_pose_epoch`` epochs (`model/eval_pose_one_epoch.py:25-98`,
`evaluation/eval.py:117-133`).  PSNR parity requires this.

TPU design: a second, smaller fused jit — pose params only, frozen field —
with the step LR (MultiStepLR gamma 0.5 at num_epoch/5 milestones,
`evaluation/eval.py:118-121`) passed as a traced scalar.

Pose initialisation options (`evaluation/eval.py:102-111`):
* 'pre'  — neighbouring learned train poses,
* 'scale'/'ate' — gt test poses aligned to the learned trajectory,
* 'none' — identity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..geometry.align import align_ate_c2b_use_a2b, align_scale_c2b_use_a2b
from ..geometry.rays import arange_pixels
from ..models.pose import all_poses, init_pose_params, pose_c2w
from ..ops.rendering import render_rays


def init_eval_poses(init_method, eval_c2ws_gt, learned_c2ws_train,
                    colmap_c2ws_train, sample_rate, n_eval):
    """-> init_c2w (n_eval, 4, 4) or None (`evaluation/eval.py:102-111`)."""
    if init_method == "none":
        return None
    if init_method == "pre":
        start = int(sample_rate / 2) - 1
        picked = learned_c2ws_train[start :: sample_rate - 1][:n_eval]
        return np.asarray(picked)
    if init_method == "scale":
        init, _ = align_scale_c2b_use_a2b(
            colmap_c2ws_train, learned_c2ws_train, np.array(eval_c2ws_gt)
        )
        return init
    if init_method == "ate":
        return align_ate_c2b_use_a2b(
            colmap_c2ws_train, learned_c2ws_train, eval_c2ws_gt
        )
    raise ValueError(f"unknown init_method {init_method}")


def make_pose_opt_step(nerf_params, cfg, render_cfg, init_c2w, n_points):
    """Jitted photometric-MSE pose step (`model/eval_pose_one_epoch.py:62-98`)."""
    nerf_params = jax.tree.map(jax.lax.stop_gradient, nerf_params)

    def loss_fn(pose_params, img, camera_mat, scale_mat, idx, rng):
        c2w = pose_c2w(pose_params, idx, init_c2w)
        world_mat = jnp.linalg.inv(c2w)
        H, W, _ = img.shape
        ray_idx = jax.random.choice(rng, H * W, shape=(n_points,),
                                    replace=False)
        _, p_full = arange_pixels((H, W))
        p = p_full[ray_idx]
        rgb_gt = img.reshape(-1, 3)[ray_idx]
        depth = jnp.ones(n_points, jnp.float32)
        out = render_rays(
            nerf_params, p, depth, camera_mat, world_mat, scale_mat,
            render_cfg, add_noise=False, eval_mode=True,
        )
        return jnp.mean((out["rgb"] - rgb_gt) ** 2)

    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)

    @jax.jit
    def step(pose_params, opt_state, img, camera_mat, scale_mat, idx, lr, rng):
        loss, grads = jax.value_and_grad(
            lambda pp: loss_fn(pp, img, camera_mat, scale_mat, idx, rng)
        )(pose_params)
        updates, opt_state = tx.update(grads, opt_state, pose_params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        pose_params = optax.apply_updates(pose_params, updates)
        return pose_params, opt_state, loss

    return step, tx


def optimize_eval_poses(nerf_params, camera_mat, cfg, render_cfg, eval_imgs,
                        scale_mat, init_c2w, num_epoch, lr, n_points,
                        logger=None, seed=0):
    """Run the full test-time pose optimisation.

    Args:
        eval_imgs: (N_eval, H, W, 3) device array.
        init_c2w: (N_eval, 4, 4) or None.
    Returns:
        (eval_c2ws (N_eval, 4, 4) numpy, pose_params)
    """
    n_eval = eval_imgs.shape[0]
    pose_params = init_pose_params(n_eval)
    init_c2w_j = None if init_c2w is None else jnp.asarray(init_c2w)
    step, tx = make_pose_opt_step(nerf_params, cfg, render_cfg, init_c2w_j,
                                  n_points)
    opt_state = tx.init(pose_params)
    camera_mat = jnp.asarray(camera_mat)
    scale_mat = jnp.asarray(scale_mat)

    key = jax.random.PRNGKey(seed)
    # MultiStepLR(milestones=range(0, num_epoch, num_epoch/5), gamma=0.5),
    # stepped once per epoch (`evaluation/eval.py:118-121,128`): the LR during
    # epoch e is lr * 0.5^(#milestones <= e).
    import bisect

    milestones = list(range(0, int(num_epoch), max(int(num_epoch / 5), 1)))
    for epoch in range(num_epoch):
        lr_e = lr * (0.5 ** bisect.bisect_right(milestones, epoch))
        losses = []
        for i in range(n_eval):
            key, k = jax.random.split(key)
            pose_params, opt_state, loss = step(
                pose_params, opt_state, eval_imgs[i], camera_mat, scale_mat,
                jnp.int32(i), np.float32(lr_e), k,
            )
            losses.append(loss)
        if logger is not None and (epoch % 50 == 0 or epoch == num_epoch - 1):
            mse = float(np.mean(jax.device_get(losses)))
            psnr = -10.0 * np.log10(max(mse, 1e-10))
            logger.add_scalar("opt/psnr", psnr, epoch)
    eval_c2ws = np.asarray(all_poses(pose_params, init_c2w_j))
    return eval_c2ws, pose_params
