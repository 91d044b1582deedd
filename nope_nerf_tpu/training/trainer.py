"""Jitted training step: render + all losses + 4-group optimiser update.

TPU-native redesign of ``Trainer`` (`model/training.py:14-378`) and the
four-Adam optimisation (`train.py:58,99,117,140`):

* **One param pytree** {'nerf', 'pose', 'focal', 'distortion'} differentiated
  in a single ``jax.value_and_grad`` (the reference builds one autograd graph
  and steps four optimisers — same math, one pytree here).
* **One fused jit** per (static-flag) variant: pose/focal/distortion
  application, ray sampling, rendering, the reference-pair point-cloud
  branch, every loss, the Adam updates — no host round-trips inside a step.
* **Traced schedule scalars.** Annealed loss weights, the l1/l2 switch and
  all four learning rates enter as traced inputs, so the host-side
  auto-scheduler (`train.py:297-344`) never triggers a recompile.
* **Static-shape ref branch.** The frame-ordering conditional
  (`model/training.py:296-313`) becomes `jnp.where` selects; the
  invalid-reprojection masks stay as weights.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from ..geometry.rays import (
    arange_pixels,
    camera_mat_from_fxfy,
    pixels_from_flat_idx,
    project_to_cam,
    rigid_inv,
    transform_to_world,
)
from ..losses import total_loss
from ..models.distortion import distortion_scale_shift
from ..models.intrinsics import focal_fxfy
from ..models.pose import pose_c2w
from ..ops.interp import grid_sample, resize_bilinear, resize_nearest
from ..ops.rendering import render_rays

_HI = lax.Precision.HIGHEST

GROUPS = ("nerf", "pose", "focal", "distortion")


class TrainState(NamedTuple):
    params: Any
    opt_state: Any


def make_optimizer(params):
    """Per-group Adam direction (torch defaults b1=.9 b2=.999 eps=1e-8);
    learning rates are applied inside the step from traced scalars, so the
    auto-scheduler can change them freely (`train.py:326-340`)."""
    tx = optax.multi_transform(
        {g: optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8) for g in GROUPS},
        param_labels={g: g for g in params},
    )
    return tx


def init_train_state(params):
    tx = make_optimizer(params)
    return TrainState(params=params, opt_state=tx.init(params)), tx


def _apply_distortion(depth, scale, shift, shift_first):
    if shift_first:
        return (depth + shift) * scale
    return depth * scale + shift


def compute_loss(
    params,
    batch,
    scalars,
    rng,
    *,
    cfg,
    static,
    init_c2w=None,
    render_cfg,
    mesh=None,
):
    """Pure loss function — the heart of the framework.

    Mirrors ``Trainer.compute_loss`` (`model/training.py:197-378`).

    Args:
        params: {'nerf','pose','focal','distortion'} pytree.
        batch: dict of device arrays — the whole scene stays HBM-resident
            and frames are gathered *inside* the jit (no host slicing):
            imgs (N, H, W, 3), dpts (N, Hd, Wd), idx (), ref_idx (),
            camera_mat_gt (4, 4), scale_mat (4, 4).
        scalars: dict of traced schedule scalars:
            weights {7 reference keys}, w_l1, w_l2.
        rng: PRNG key.
        cfg: full config dict (static).
        static: dict of static booleans: render_model, use_ref.
        init_c2w: optional (N, 4, 4) initial poses (delta-pose mode).
        render_cfg: merged rendering+model dict for render_rays.
    Returns:
        (loss, aux dict)
    """
    # ``idx`` is a scalar frame index, or a (k,) vector when
    # tpu.rays_per_step_multiplier > 1: the step then renders k frames'
    # ray batches (vmapped over frames — SURVEY.md §2.5's honest
    # "scale rays beyond single-GPU" axis), while the reference-pair
    # branch runs on the first frame exactly as at k = 1.
    idx_all = batch["idx"]
    multi = jnp.ndim(idx_all) > 0
    idx = idx_all[0] if multi else idx_all
    ref_idx = batch["ref_idx"]
    img = batch["imgs"][idx]
    depth_raw = batch["dpts"][idx]  # undistorted prior depth (hd, wd)
    camera_mat_gt = batch["camera_mat_gt"]
    scale_mat = batch["scale_mat"]
    H, W, _ = img.shape
    hd, wd = depth_raw.shape

    tcfg = cfg["training"]
    pcfg = cfg["pose"]
    n_points = tcfg["n_training_points"]
    nl = tcfg["nearest_limit"]
    num_cams = cfg["_num_cams"]
    learn_dist = cfg["distortion"]["learn_distortion"]

    # ---- pose / distortion / intrinsics --------------------------------
    if pcfg["learn_pose"]:
        c2w = pose_c2w(params["pose"], idx, init_c2w,
                       pcfg["learn_R"], pcfg["learn_t"])
        world_mat = rigid_inv(c2w)
    else:
        c2w = jnp.eye(4)
        world_mat = jnp.eye(4)

    if learn_dist:
        scale_input, shift_input = distortion_scale_shift(
            params["distortion"], idx, num_cams,
            cfg["distortion"]["fix_scaleN"],
            cfg["distortion"]["learn_scale"], cfg["distortion"]["learn_shift"],
        )
    else:
        scale_input = jnp.ones((1,))
        shift_input = jnp.zeros((1,))

    aux = {}
    if pcfg["learn_focal"]:
        fxfy = focal_fxfy(
            params["focal"],
            fx_only=pcfg["fx_only"],
            order=pcfg["focal_order"],
            req_grad=pcfg["update_focal"],
        )
        camera_mat = camera_mat_from_fxfy(fxfy)
        # `model/training.py:372-374`: focal ratio vs the gt intrinsics
        aux["focalx"] = fxfy[0] / camera_mat_gt[0, 0]
        aux["focaly"] = fxfy[1] / camera_mat_gt[1, 1]
    else:
        camera_mat = camera_mat_gt

    # ---- ray sampling + render (per frame) ------------------------------
    key_rays, key_noise = jax.random.split(rng)
    fast_sampling = cfg.get("tpu", {}).get("fast_ray_sampling", True)
    # deterministic z sampling for A/B parity harnesses (the reference's
    # stratified jitter `model/rendering.py:186-190` draws from torch's RNG,
    # so exact-value comparison requires disabling it on both sides)
    add_noise = cfg.get("tpu", {}).get("render_add_noise", True)

    def _sample_and_render(f_idx, key_r, key_n):
        img_f = batch["imgs"][f_idx]
        depth_f = batch["dpts"][f_idx]
        if "ray_idx" in batch:
            # injected ray indices (parity/debug): replaces the random draw
            # with the exact indices the reference's randperm produced
            r_idx = batch["ray_idx"]
        elif fast_sampling:
            # with-replacement sampling: E[collisions] = n²/2HW ≈ 1 per step
            # at paper scale — statistically immaterial, and it avoids the
            # 518k-key sort a without-replacement permutation costs on TPU
            # (~10 ms/step).
            r_idx = jax.random.randint(key_r, (n_points,), 0, H * W)
        else:
            # exact reference semantics: randperm[:n] (`model/training.py:257`)
            r_idx = jax.random.choice(key_r, H * W, shape=(n_points,),
                                      replace=False)
        if mesh is not None:
            from ..parallel.mesh import shard_rays

            r_idx = shard_rays(r_idx, mesh)
        rgb_gt_f = img_f.reshape(-1, 3)[r_idx]
        p, rr, rc = pixels_from_flat_idx(r_idx, (H, W))
        # prior depth at the sampled rays (`model/network.py:22-25`): the
        # reference nearest-resizes the depth map to (H, W) then gathers;
        # gather ∘ resize_nearest == gather at floor-mapped indices, and the
        # per-frame affine distortion commutes with both — so only the n
        # sampled depths are ever distorted (the old path materialised a
        # full-res distorted + resized map every step).
        if (hd, wd) == (H, W):
            didx = r_idx
        else:
            # EXACT resize_nearest/torch-F.interpolate index math: source =
            # floor(dst * f32(in/out)). The integer-exact (rr*hd)//H differs
            # on boundary rows where the f32 product rounds across an
            # integer, silently shifting the sampled depth row vs the
            # reference path (ops/interp.py:77-78).
            drr = jnp.floor(
                rr.astype(jnp.float32) * jnp.float32(hd / H)
            ).astype(jnp.int32)
            drc = jnp.floor(
                rc.astype(jnp.float32) * jnp.float32(wd / W)
            ).astype(jnp.int32)
            didx = drr * wd + drc
        d_rays = depth_f.reshape(-1)[didx]
        if pcfg["learn_pose"]:
            world_f = rigid_inv(
                pose_c2w(params["pose"], f_idx, init_c2w,
                         pcfg["learn_R"], pcfg["learn_t"])
            )
        else:
            world_f = jnp.eye(4)
        if learn_dist:
            sc_f, sh_f = distortion_scale_shift(
                params["distortion"], f_idx, num_cams,
                cfg["distortion"]["fix_scaleN"],
                cfg["distortion"]["learn_scale"],
                cfg["distortion"]["learn_shift"],
            )
            d_rays = _apply_distortion(d_rays, sc_f, sh_f,
                                       tcfg["shift_first"])
        out_f = render_rays(
            params["nerf"], p, d_rays, camera_mat, world_f, scale_mat,
            render_cfg, rng=key_n, add_noise=add_noise, eval_mode=False,
        )
        return rgb_gt_f, out_f

    out = {}
    rgb_gt = None
    if static["render_model"]:
        if multi:
            # k frames' ray batches per step, vmapped; per-ray loss terms
            # flatten to (k*n,) — mean-per-ray reductions are unchanged
            k = idx_all.shape[0]
            keys_r = jax.random.split(key_rays, k)
            keys_n = jax.random.split(key_noise, k)
            rgb_gt, out = jax.vmap(_sample_and_render)(idx_all, keys_r,
                                                       keys_n)
            rgb_gt = rgb_gt.reshape(-1, 3)
            out = jax.tree.map(
                lambda v: v.reshape((-1,) + v.shape[2:]), out
            )
        else:
            rgb_gt, out = _sample_and_render(idx, key_rays, key_noise)

    # ---- reference-image branch (`model/training.py:280-366`) ----------
    loss_kwargs = {}
    if static["use_ref"]:
        c2w_ref = pose_c2w(params["pose"], ref_idx, init_c2w,
                           pcfg["learn_R"], pcfg["learn_t"])
        if learn_dist:
            scale_ref, shift_ref = distortion_scale_shift(
                params["distortion"], ref_idx, num_cams,
                cfg["distortion"]["fix_scaleN"],
                cfg["distortion"]["learn_scale"],
                cfg["distortion"]["learn_shift"],
            )
        else:
            scale_ref = jnp.ones((1,))
            shift_ref = jnp.zeros((1,))
        if tcfg["detach_ref_img"]:
            c2w_ref = lax.stop_gradient(c2w_ref)
            scale_ref = lax.stop_gradient(scale_ref)
            shift_ref = lax.stop_gradient(shift_ref)
        ref_Rt = rigid_inv(c2w_ref)

        # frame ordering: pair is (earlier=1, later=2)
        # (`model/training.py:296-313`) — static shapes via where-select.
        # The reference's inverse chains cancel on rigid transforms:
        # inv(world_mat) == c2w and inv(ref_Rt) == c2w_ref, so no 4x4 LU
        # solves survive here (`model/training.py:302,310`).
        swap = idx >= (num_cams - 1)
        rt_fwd = jnp.matmul(ref_Rt, c2w, precision=_HI)
        rt_bwd = jnp.matmul(world_mat, c2w_ref, precision=_HI)
        Rt_rel_12 = jnp.where(swap, rt_bwd, rt_fwd)
        R_rel_12 = Rt_rel_12[:3, :3]
        t_rel_12 = Rt_rel_12[:3, 3]
        scale2 = jnp.where(swap, scale_input, scale_ref)

        ratio = tcfg["pc_ratio"]
        sres = (int(hd / ratio), int(wd / ratio))
        _, p_pc = arange_pixels(sres)
        # The per-frame affine distortion commutes with the nearest resize,
        # and the scalar swap-select commutes with any resize — so the resized
        # *raw* maps can be precomputed once per scene (batch['dpts_small'] /
        # batch['imgs_small'], see loop.scene_device_arrays) instead of
        # resizing two full-res maps every step.
        if "dpts_small" in batch:
            dsm_cur = batch["dpts_small"][idx]
            dsm_ref = batch["dpts_small"][ref_idx]
        else:
            dsm_cur = resize_nearest(depth_raw, sres)
            dsm_ref = resize_nearest(batch["dpts"][ref_idx], sres)
        d1s = jnp.where(swap, dsm_ref, dsm_cur)
        d2s = jnp.where(swap, dsm_cur, dsm_ref)
        if learn_dist:
            scale1 = jnp.where(swap, scale_ref, scale_input)
            shift1 = jnp.where(swap, shift_ref, shift_input)
            shift2 = jnp.where(swap, shift_input, shift_ref)
            d1s = _apply_distortion(d1s, scale1, shift1, tcfg["shift_first"])
            d2s = _apply_distortion(d2s, scale2, shift2, tcfg["shift_first"])
        d1s = jnp.maximum(d1s, nl)
        d2s = jnp.maximum(d2s, nl)
        pc1 = transform_to_world(p_pc, d1s.reshape(-1), camera_mat)
        pc2 = transform_to_world(p_pc, d2s.reshape(-1), camera_mat)
        if mesh is not None:
            from ..parallel.mesh import shard_rays

            pc1 = shard_rays(pc1, mesh)
            pc2 = shard_rays(pc2, mesh)

        if static["use_rgb_s"]:
            if "imgs_small" in batch:
                ism_cur = batch["imgs_small"][idx]
                ism_ref = batch["imgs_small"][ref_idx]
            else:
                ism_cur = resize_bilinear(img, sres)
                ism_ref = resize_bilinear(batch["imgs"][ref_idx], sres)
            img1s = jnp.where(swap, ism_ref, ism_cur)
            img2s = jnp.where(swap, ism_cur, ism_ref)
            # get_tensor_values(img1s, arange_pixels(sres),
            # align_corners=True) lands on exact integer pixel centers —
            # an identity sample (`model/training.py:328`), so no gather
            rgb_pc1 = img1s
            pc1_for_rgb = (
                lax.stop_gradient(pc1) if tcfg["detach_rgbs_scale"] else pc1
            )
            pc1_rot = (
                jnp.matmul(pc1_for_rgb, R_rel_12.T, precision=_HI) + t_rel_12
            )
            # clamp points behind the near limit (`model/training.py:334-335`:
            # the mask is expanded over all 3 coords)
            invalid = -pc1_rot[:, 2:] < nl
            pc1_rot = jnp.where(invalid, nl, pc1_rot)
            p_reproj, valid = project_to_cam(pc1_rot, camera_mat)
            rgb_pc1_proj = grid_sample(img2s, p_reproj, mode="bilinear",
                                       align_corners=True)
            loss_kwargs["rgb_pc1"] = rgb_pc1
            loss_kwargs["rgb_pc1_proj"] = rgb_pc1_proj.reshape(sres[0], sres[1], 3)
            loss_kwargs["valid_points"] = valid.astype(jnp.float32).reshape(
                sres[0], sres[1], 1
            )
            if tcfg.get("with_auto_mask", False):
                # the reference's auto-mask (`model/losses.py:70-72`): keep a
                # point only where the *warped* view-2 colour explains view 1
                # better than the unwarped one; img2s is view 2 at the
                # identity grid (the rgb_ref_ori analogue)
                loss_kwargs["rgb_pc1_ori"] = img2s

        pc1 = jnp.matmul(pc1, R_rel_12.T, precision=_HI) + t_rel_12
        if cfg.get("tpu", {}).get("chamfer_mode", "exact") in ("band",
                                                              "auto"):
            # projection hints for the banded chamfer: each cloud's NN in
            # the other lies near its projected pixel row there. pc1 is
            # already in Y's frame; pc2 maps into X's grid frame via the
            # inverse rigid warp Rᵀ(p - t) (uniform scaling cancels in the
            # perspective divide, so pre-scale clouds are fine).
            from ..ops.pallas.chamfer_band import TILE as _BAND_TILE
            from ..ops.pallas.chamfer_band import rows_to_start_tiles

            # band height targets chamfer_band_rows GRID rows (the
            # validated accuracy band), converted to TILE-point sweeps for
            # the actual grid width — a fixed tile count would thin to ~8
            # rows at pc_ratio 1 widths
            band_rows = cfg["tpu"].get("chamfer_band_rows", 32)
            k_band = cfg["tpu"].get("chamfer_band_tiles") or max(
                2, round(band_rows * sres[1] / _BAND_TILE)
            )
            n_pc = sres[0] * sres[1]
            q21 = jnp.matmul(pc2 - t_rel_12, R_rel_12, precision=_HI)
            loss_kwargs["chamfer_starts"] = (
                rows_to_start_tiles(pc1, n_pc, sres, camera_mat,
                                    project_to_cam, k_band),
                rows_to_start_tiles(q21, n_pc, sres, camera_mat,
                                    project_to_cam, k_band),
            )
            loss_kwargs["chamfer_band_tiles"] = k_band
        if tcfg["scale_pcs"]:
            pc1 = pc1 / scale2
            pc2 = pc2 / scale2
        loss_kwargs["X"] = pc1
        loss_kwargs["Y"] = pc2

    # ---- assemble -------------------------------------------------------
    depth_gt = out.get("depth_gt")
    if static["render_model"] and tcfg["detach_gt_depth"]:
        depth_gt = lax.stop_gradient(depth_gt)

    t_list = params["pose"]["t"] if pcfg["learn_pose"] else None
    loss_dict = total_loss(
        scalars["weights"],
        rgb_pred=out.get("rgb"),
        rgb_gt=rgb_gt if static["render_model"] else None,
        depth_pred=out.get("depth_pred"),
        depth_gt=depth_gt,
        depth_valid=out.get("valid_mask"),
        t_list=t_list,
        w_l1=scalars["w_l1"],
        w_l2=scalars["w_l2"],
        with_ssim=tcfg["with_ssim"],
        depth_loss_type=tcfg["depth_loss_type"],
        chamfer_block=cfg.get("tpu", {}).get("chamfer_block", 2048),
        use_pallas_chamfer=(
            cfg.get("tpu", {}).get("use_pallas", True)
            and _compute_platform(mesh) == "tpu"
        ),
        # 'exact' (reference semantics, default) | 'band' (projection-
        # guided banded NN, fastest on the structured training clouds) |
        # 'grid' (Morton-window NN — PARITY.md "Approximate chamfer")
        chamfer_mode=cfg.get("tpu", {}).get("chamfer_mode", "exact"),
        chamfer_window=cfg.get("tpu", {}).get("chamfer_window", 512),
        # per-generation retune of the 'auto' cost models without a code
        # change (the baked constants are v5e measurements)
        chamfer_auto_costs=(
            cfg.get("tpu", {}).get("chamfer_auto_exact_ms_per_pair"),
            cfg.get("tpu", {}).get("chamfer_auto_grid_ms_per_point"),
        ),
        mesh=mesh,
        with_auto_mask=tcfg.get("with_auto_mask", False),
        **loss_kwargs,
    )
    aux.update(loss_dict)
    aux["scale"] = scale_input[0]
    aux["shift"] = shift_input[0]
    if static.get("pair_images", False) and "rgb_pc1" in loss_kwargs:
        # reprojection-pair debug dumps (`model/training.py:344-354`)
        aux["rgb_pc1"] = loss_kwargs["rgb_pc1"]
        aux["rgb_pc1_proj"] = loss_kwargs["rgb_pc1_proj"]
    return loss_dict["loss"], aux


def _tree_scale_groups(updates, lrs):
    """Multiply each top-level group's update by -lr_group."""
    return {
        g: jax.tree.map(lambda u: -lrs[g] * u, updates[g]) for g in updates
    }


def make_train_step(cfg, render_cfg, init_c2w=None, mesh=None):
    """Build the jitted train step for this config.

    Returns step(state, batch, scalars, rng, static) -> (state, aux).
    ``static`` is a dict of the runtime-static flags (render_model,
    use_ref, use_rgb_s) — flipping them mid-run costs one recompile, which
    is exactly when the reference switches its Python branches
    (`model/training.py:216-217`).

    With ``mesh``, per-ray/per-point tensors are sharded over the mesh's ray
    axis and XLA inserts the gradient all-reduce (see parallel/mesh.py).
    """
    render_cfg = _mesh_safe_render_cfg(render_cfg, mesh)
    tcfg = cfg["training"]
    wd = tcfg.get("weight_decay", 0.0) or 0.0

    def loss_fn(params, batch, scalars, rng, static):
        return compute_loss(
            params, batch, scalars, rng,
            cfg=cfg, static=static, init_c2w=init_c2w, render_cfg=render_cfg,
            mesh=mesh,
        )

    @functools.partial(jax.jit, static_argnames=("static",))
    def step(state, batch, scalars, rng, static):
        tx = make_optimizer(state.params)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, scalars, rng, dict(static)
        )
        if wd > 0.0:
            # torch Adam weight_decay adds wd*param to the gradient
            grads = {
                g: (
                    jax.tree.map(lambda gr, p: gr + wd * p, grads[g],
                                 state.params[g])
                    if g == "nerf"
                    else grads[g]
                )
                for g in grads
            }
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = _tree_scale_groups(updates, scalars["lrs"])
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state), aux

    def run(state, batch, scalars, rng, static):
        return step(state, batch, scalars, rng, tuple(sorted(static.items())))

    return run


def make_epoch_step(cfg, render_cfg, init_c2w=None, mesh=None):
    """A whole epoch as ONE device dispatch (`lax.scan` over the frame order).

    Per-step host dispatch costs ~100 ms through a TPU tunnel — at 1024 rays
    that caps throughput regardless of compute. The schedule scalars and the
    static loss-structure flags are constant within an epoch by construction
    (`train.py:297-344` updates per epoch), so an epoch is the natural scan
    body: N train_steps back-to-back on device, metrics reduced on device,
    one host sync per epoch.

    Returns run(state, scene, idxs, ref_idxs, scalars, rng, static)
      -> (state, aux_means) where idxs/ref_idxs are (N,) int32 arrays (the
      shuffled frame order + sampled reference frames for this epoch).
    """
    render_cfg = _mesh_safe_render_cfg(render_cfg, mesh)
    tcfg = cfg["training"]
    wd = tcfg.get("weight_decay", 0.0) or 0.0

    def loss_fn(params, batch, scalars, rng, static):
        return compute_loss(
            params, batch, scalars, rng,
            cfg=cfg, static=static, init_c2w=init_c2w, render_cfg=render_cfg,
            mesh=mesh,
        )

    @functools.partial(jax.jit, static_argnames=("static",))
    def epoch(state, scene_arrays, idxs, ref_idxs, scalars, rng, static):
        tx = make_optimizer(state.params)
        static_d = dict(static)

        def body(carry, inp):
            st = carry
            idx, ref_idx, i = inp
            batch = dict(scene_arrays)
            batch["idx"] = idx
            batch["ref_idx"] = ref_idx
            key = jax.random.fold_in(rng, i)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                st.params, batch, scalars, key, static_d
            )
            if wd > 0.0:
                grads = {
                    g: (
                        jax.tree.map(lambda gr, p: gr + wd * p, grads[g],
                                     st.params[g])
                        if g == "nerf"
                        else grads[g]
                    )
                    for g in grads
                }
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            updates = _tree_scale_groups(updates, scalars["lrs"])
            params = optax.apply_updates(st.params, updates)
            return TrainState(params=params, opt_state=opt_state), aux

        n = idxs.shape[0]
        state, auxs = lax.scan(
            body, state, (idxs, ref_idxs, jnp.arange(n, dtype=jnp.int32))
        )
        aux_mean = jax.tree.map(lambda x: jnp.mean(x, axis=0), auxs)
        aux_last = jax.tree.map(lambda x: x[-1], auxs)
        # per-step distortion scalars for `log_scale_shift_per_view`
        # (`train.py:195,216-217,225-229`)
        aux_last["scale_steps"] = auxs["scale"]
        aux_last["shift_steps"] = auxs["shift"]
        return state, aux_mean, aux_last

    def run(state, scene_arrays, idxs, ref_idxs, scalars, rng, static):
        return epoch(
            state, scene_arrays, idxs, ref_idxs, scalars, rng,
            tuple(sorted(static.items())),
        )

    return run


def make_render_cfg(cfg):
    """Merge the rendering + model config groups for render_rays.

    The reference's ``n_max_network_queries: 64000`` is a GPU memory bound
    (`model/rendering.py:108`); on TPU a fused 131k-point batch is the fast
    path, so the bound defaults to 2M points here and only kicks in for
    genuinely huge ray batches. Override via ``tpu.n_max_network_queries``.
    """
    tpu_cfg = cfg.get("tpu", {}) or {}
    rc = dict(cfg["rendering"])
    rc.update(
        {
            "occ_activation": cfg["model"]["occ_activation"],
            "pos_enc_levels": cfg["model"]["pos_enc_levels"],
            "dir_enc_levels": cfg["model"]["dir_enc_levels"],
            "hidden_dim": cfg["model"]["hidden_dim"],
            "n_max_network_queries": tpu_cfg.get(
                "n_max_network_queries", 2**21
            ),
            # bf16 MLP matmuls (f32 accumulation): ~3x the f32 fwd+bwd rate on
            # the MXU; defaults on for TPU backends, off elsewhere (CPU tests
            # keep f32). Set tpu.mlp_bf16 explicitly to override.
            "mlp_bf16": tpu_cfg.get(
                "mlp_bf16", jax.default_backend() == "tpu"
            ),
            # fully-fused Pallas MLP (fwd+bwd kernels, activations never
            # leave VMEM). Same bf16/f32-accum numerics as mlp_bf16.
            # Under a mesh it runs per-shard via shard_map
            # (_mesh_safe_render_cfg -> mlp_kernel.fused_mlp_sharded).
            "use_pallas_mlp": tpu_cfg.get(
                "use_pallas_mlp", jax.default_backend() == "tpu"
            ),
            # extend the fused kernel through ray expansion + alpha
            # compositing (ops/pallas/mlp_kernel.fused_mlp_composite):
            # per-RAY tensors at the HBM boundary. Effective only with
            # use_pallas_mlp; measured 60.5k vs 57.3k rays/s at the bench
            # workload (r3: host-baked VMEM-resident selector constants,
            # per-ray direction encoding, 2/3-pass split dots).
            "fuse_compositing": tpu_cfg.get("fuse_compositing", True),
            # MLP matmul precision for the f32 XLA path ("default" |
            # "high" | "highest"); moot when mlp_bf16/use_pallas_mlp is on
            "matmul_precision": tpu_cfg.get("matmul_precision", "default"),
        }
    )
    return rc


def _compute_platform(mesh):
    """Platform the step's arrays actually live on: the mesh's devices when
    sharded, else the default backend. jax.default_backend() alone is wrong
    under a CPU mesh started from a TPU-default session (the driver's
    multichip dryrun) — Pallas kernels would be selected for CPU devices."""
    if mesh is not None:
        return mesh.devices.ravel()[0].platform
    return jax.default_backend()


def _mesh_safe_render_cfg(render_cfg, mesh):
    """Under a mesh, route the fused-MLP custom call through its shard_map
    wrapper (GSPMD cannot partition it directly) — and key the kernel
    choice on the MESH devices' platform, not the session default backend
    (a CPU-mesh dryrun runs inside a TPU-default session)."""
    if mesh is None:
        return render_cfg
    rc = dict(render_cfg)
    rc["use_pallas_mlp"] = (
        rc.get("use_pallas_mlp", False)
        and _compute_platform(mesh) == "tpu"
    )
    rc["pallas_mesh"] = mesh if rc["use_pallas_mlp"] else None
    return rc
