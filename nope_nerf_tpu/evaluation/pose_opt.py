"""Test-time pose optimisation — part of the evaluated protocol.

Before rendering held-out views, the reference freezes the field and
optimises per-test-frame SE(3) poses by photometric MSE for
``opt_pose_epoch`` epochs (`model/eval_pose_one_epoch.py:25-98`,
`evaluation/eval.py:117-133`).  PSNR parity requires this.

TPU design: the whole protocol is fused — a single jit scans over a *block*
of (epoch x frame) steps (pose params only, frozen field), with the
MultiStepLR schedule (gamma 0.5 at num_epoch/5 milestones,
`evaluation/eval.py:118-121`) entering as a traced per-step LR array.  The
reference dispatches num_epoch x n_eval individual steps; through a ~30 ms
device tunnel that is minutes of pure dispatch — here it is
ceil(num_epoch / block) dispatches total.

Adam semantics match torch exactly: the per-frame loss produces a dense
gradient over all frames' (r, t) rows (zeros elsewhere), and the moments of
every row update every step — the reference's single torch.optim.Adam over
the full LearnPose table behaves identically.

Pose initialisation options (`evaluation/eval.py:102-111`):
* 'pre'  — neighbouring learned train poses,
* 'scale'/'ate' — gt test poses aligned to the learned trajectory,
* 'none' — identity.
"""
from __future__ import annotations

import bisect

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from ..geometry.align import align_ate_c2b_use_a2b, align_scale_c2b_use_a2b
from ..geometry.rays import pixels_from_flat_idx, rigid_inv
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


def lr_schedule(num_epoch, lr):
    """Per-epoch LR under MultiStepLR(milestones=range(0, E, E/5), gamma=.5),
    stepped once per epoch (`evaluation/eval.py:118-121,128`)."""
    milestones = list(range(0, int(num_epoch), max(int(num_epoch / 5), 1)))
    return np.array(
        [lr * 0.5 ** bisect.bisect_right(milestones, e)
         for e in range(num_epoch)],
        np.float32,
    )


def make_pose_opt_block(cfg, render_cfg, init_c2w, n_points, hw):
    """Jitted multi-step pose-opt block (`model/eval_pose_one_epoch.py:62-98`).

    Returns run(nerf_params, pose_params, opt_state, eval_imgs, camera_mat,
    scale_mat, lrs_steps, frame_idx, keys) -> (pose_params, opt_state,
    losses) scanning one fused dispatch over all steps in the block.
    """
    H, W = hw
    fast = cfg.get("tpu", {}).get("fast_ray_sampling", True)
    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)

    def loss_fn(pose_params, nerf_params, eval_imgs, camera_mat, scale_mat,
                i, rng):
        c2w = pose_c2w(pose_params, i, init_c2w)
        world_mat = rigid_inv(c2w)
        if fast:
            ray_idx = jax.random.randint(rng, (n_points,), 0, H * W)
        else:
            ray_idx = jax.random.choice(rng, H * W, shape=(n_points,),
                                        replace=False)
        p, _, _ = pixels_from_flat_idx(ray_idx, (H, W))
        rgb_gt = eval_imgs[i].reshape(-1, 3)[ray_idx]
        depth = jnp.ones(n_points, jnp.float32)
        out = render_rays(
            nerf_params, p, depth, camera_mat, world_mat, scale_mat,
            render_cfg, add_noise=False, eval_mode=True,
        )
        return jnp.mean((out["rgb"] - rgb_gt) ** 2)

    @jax.jit
    def run(nerf_params, pose_params, opt_state, eval_imgs, camera_mat,
            scale_mat, lrs_steps, frame_idx, keys):
        nerf_params = jax.tree.map(lax.stop_gradient, nerf_params)

        def body(carry, inp):
            pp, ostate = carry
            lr_s, i, k = inp
            loss, grads = jax.value_and_grad(loss_fn)(
                pp, nerf_params, eval_imgs, camera_mat, scale_mat, i, k
            )
            updates, ostate = tx.update(grads, ostate, pp)
            updates = jax.tree.map(lambda u: -lr_s * u, updates)
            pp = optax.apply_updates(pp, updates)
            return (pp, ostate), loss

        (pose_params, opt_state), losses = lax.scan(
            body, (pose_params, opt_state), (lrs_steps, frame_idx, keys)
        )
        return pose_params, opt_state, losses

    return run, tx


def optimize_eval_poses(nerf_params, camera_mat, cfg, render_cfg, eval_imgs,
                        scale_mat, init_c2w, num_epoch, lr, n_points,
                        logger=None, seed=0, block_epochs=50):
    """Run the full test-time pose optimisation (fused, one dispatch per
    ``block_epochs`` epochs).

    Args:
        eval_imgs: (N_eval, H, W, 3) device array.
        init_c2w: (N_eval, 4, 4) or None.
    Returns:
        (eval_c2ws (N_eval, 4, 4) numpy, pose_params)
    """
    n_eval, H, W = eval_imgs.shape[:3]
    pose_params = init_pose_params(n_eval)
    init_c2w_j = None if init_c2w is None else jnp.asarray(init_c2w)
    run, tx = make_pose_opt_block(cfg, render_cfg, init_c2w_j, n_points,
                                  (H, W))
    opt_state = tx.init(pose_params)
    camera_mat = jnp.asarray(camera_mat)
    scale_mat = jnp.asarray(scale_mat)
    eval_imgs = jnp.asarray(eval_imgs)

    lrs_epoch = lr_schedule(num_epoch, lr)
    key = jax.random.PRNGKey(seed)
    frame_order = np.arange(n_eval, dtype=np.int32)
    step = 0
    for b0 in range(0, num_epoch, block_epochs):
        b1 = min(b0 + block_epochs, num_epoch)
        n_steps = (b1 - b0) * n_eval
        lrs_steps = jnp.asarray(np.repeat(lrs_epoch[b0:b1], n_eval))
        frame_idx = jnp.asarray(np.tile(frame_order, b1 - b0))
        keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(
            jnp.arange(step, step + n_steps)
        )
        step += n_steps
        pose_params, opt_state, losses = run(
            nerf_params, pose_params, opt_state, eval_imgs, camera_mat,
            scale_mat, lrs_steps, frame_idx, keys,
        )
        if logger is not None:
            mse = float(np.mean(np.asarray(losses[-n_eval:])))
            psnr = -10.0 * np.log10(max(mse, 1e-10))
            logger.add_scalar("opt/psnr", psnr, b1 - 1)
    eval_c2ws = np.asarray(all_poses(pose_params, init_c2w_j))
    return eval_c2ws, pose_params
