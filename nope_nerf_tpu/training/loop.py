"""Training orchestration: the TPU equivalent of the reference's `train.py`.

Host side: epoch loop, shuffling, ref-frame sampling, schedule state machine,
checkpointing, metrics. Device side: one fused jitted step (see trainer.py).

Mirrors `train.py:18-352`:
* seeds 42 (`train.py:22-23`),
* four checkpoint streams with resume of scheduler scalars (`train.py:61-153`),
* per-epoch ATE/RPE + PSNR logging (`train.py:277-295`),
* auto-scheduler / fixed MultiStep-equivalent decay (`train.py:297-344`),
* `scheduling_mode == 'reset'` re-initialises the field at the phase switch
  (`train.py:341-344`).
"""
from __future__ import annotations

import os
import random as pyrandom
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..dataloading.scene import get_scene
from ..geometry.align import align_ate_c2b_use_a2b, compute_ate, compute_rpe
from ..models.distortion import init_distortion_params
from ..models.intrinsics import init_focal_params
from ..models.nerf import init_nerf_params
from ..models.pose import all_poses, init_pose_params
from ..utils.logging import MetricsLogger, Throughput
from .checkpoints import CheckpointIO
from .scheduler import Scheduler, ScheduleState
from .trainer import (
    TrainState,
    init_train_state,
    make_epoch_step,
    make_render_cfg,
    make_train_step,
)
from ..losses import mse2psnr


def build_params(cfg, scene, key):
    """Initialise the 4-group parameter pytree + init_c2w constant.

    Mirrors `train.py:48-153` (model + LearnPose/LearnFocal/Learn_Distortion
    construction incl. gt-focal init [K00, -K11], `train.py:136`).
    """
    n_views = scene.N_imgs
    params = {"nerf": init_nerf_params(key, cfg)}
    params["pose"] = init_pose_params(n_views)
    if cfg["pose"]["init_focal_type"] == "gt":
        init_focal = [scene.K[0, 0], -scene.K[1, 1]]
    else:
        init_focal = None
    params["focal"] = init_focal_params(
        cfg["pose"]["fx_only"], cfg["pose"]["focal_order"], init_focal
    )
    params["distortion"] = init_distortion_params(n_views)

    init_c2w = None
    if cfg["pose"]["learn_pose"] and cfg["pose"]["init_pose"]:
        if cfg["pose"]["init_pose_type"] == "gt":
            init_c2w = jnp.asarray(scene.c2ws)
        elif cfg["pose"]["init_pose_type"] == "colmap":
            init_c2w = jnp.asarray(scene.c2ws_colmap)
    return params, init_c2w


def scene_device_arrays(scene):
    """Whole scene -> HBM-resident stacked arrays."""
    imgs = jnp.asarray(scene.imgs)  # (N, H, W, 3)
    if scene.dpt_depth is not None:
        dpts = jnp.asarray(scene.dpt_depth)
    else:
        dpts = jnp.ones((scene.N_imgs, scene.H, scene.W), jnp.float32)
    return imgs, dpts


def scene_batch_arrays(scene, cfg):
    """Scene arrays plus the precomputed pc_ratio resize pyramid.

    The reference resizes two full-res images + two depth maps *every step*
    (`model/training.py:317-327`); both resizes are params-independent (the
    per-frame affine distortion commutes with them), so they are computed
    once here and the step gathers from the small maps.
    """
    from ..ops.interp import resize_bilinear, resize_nearest

    imgs, dpts = scene_device_arrays(scene)
    out = {"imgs": imgs, "dpts": dpts}
    ratio = cfg["training"]["pc_ratio"]
    hd, wd = int(dpts.shape[1]), int(dpts.shape[2])
    sres = (int(hd / ratio), int(wd / ratio))
    if sres[0] >= 1 and sres[1] >= 1:
        out["dpts_small"] = jax.vmap(lambda d: resize_nearest(d, sres))(dpts)
        out["imgs_small"] = jax.vmap(lambda im: resize_bilinear(im, sres))(imgs)
    return out


def restore(checkpoint_io, cfg, params, opt_template=None):
    """Try loading the four streams; missing files start fresh
    (`train.py:64-67` semantics). The main stream also carries the bundled
    optimizer state (Adam moments, like `model/checkpoints.py:29-41`) unless
    ``load_ckpt_model_only`` is set."""
    scalars = {}
    opt_state = None
    streams = {
        "nerf": cfg["training"]["load_dir"],
        "pose": cfg["training"]["load_pose_dir"],
        "focal": cfg["training"]["load_focal_dir"],
        "distortion": cfg["training"]["load_distortion_dir"],
    }
    model_only = cfg["training"].get("load_ckpt_model_only", False)
    for group, fname in streams.items():
        try:
            if group == "nerf" and opt_template is not None and not model_only:
                tree, sc, opt_state = checkpoint_io.load(fname, opt_template)
            else:
                tree, sc = checkpoint_io.load(fname)
            params[group] = jax.tree.map(jnp.asarray, tree["params"])
            if group == "nerf":
                scalars = sc
        except FileNotFoundError:
            pass
        except ValueError:
            # optimizer-state mismatch (e.g. different scene size): params
            # load, moments start fresh
            tree, sc = checkpoint_io.load(fname)
            params[group] = jax.tree.map(jnp.asarray, tree["params"])
            if group == "nerf":
                scalars = sc
    return params, scalars, opt_state


def save_all(checkpoint_io, state, sched_state, cfg, suffix=""):
    """Four logical streams (`train.py:249-259`); the main stream bundles the
    optimizer state so resume keeps the Adam moments."""
    sc = sched_state.to_dict()
    checkpoint_io.save(
        f"model{suffix}.npz", {"params": state.params["nerf"]},
        opt_state=state.opt_state, **sc,
    )
    if cfg["pose"]["learn_pose"]:
        checkpoint_io.save(
            f"model_pose{suffix}.npz", {"params": state.params["pose"]},
            epoch_it=sc["epoch_it"], it=sc["it"],
        )
    if cfg["pose"]["learn_focal"]:
        checkpoint_io.save(
            f"model_focal{suffix}.npz", {"params": state.params["focal"]},
            epoch_it=sc["epoch_it"], it=sc["it"],
        )
    if cfg["distortion"]["learn_distortion"]:
        checkpoint_io.save(
            f"model_distortion{suffix}.npz",
            {"params": state.params["distortion"]},
            epoch_it=sc["epoch_it"], it=sc["it"],
        )


def train(cfg, max_epochs=None, scene=None):
    """Run training. ``max_epochs`` caps the loop for tests/smoke runs.

    Returns (state, scheduler, scene) for downstream use.
    """
    from ..config import apply_parity_profile, check_supported

    check_supported(cfg)
    apply_parity_profile(cfg)
    # reference hard-codes 42 (`train.py:22-23`); training.seed is a
    # superset knob for trajectory-variance studies (default = parity)
    seed = int(cfg["training"].get("seed", 42) or 42)
    np.random.seed(seed)
    pyrng = pyrandom.Random(seed)
    key = jax.random.PRNGKey(seed)

    # observability superset (SURVEY.md §5.1-5.2): optional device profiler
    # trace and nan debugging
    tpu_cfg = cfg.get("tpu", {}) or {}
    if tpu_cfg.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)
    profile_dir = tpu_cfg.get("profile_dir")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    out_dir = cfg["training"]["out_dir"]
    os.makedirs(out_dir, exist_ok=True)
    logger = MetricsLogger(os.path.join(out_dir, "logs"))

    if scene is None:
        scene = get_scene(cfg, mode=cfg["training"]["mode"])
    scene_arrs = scene_batch_arrays(scene, cfg)
    n_views = scene.N_imgs

    cfg = dict(cfg)
    cfg["_num_cams"] = n_views
    render_cfg = make_render_cfg(cfg)

    key, init_key = jax.random.split(key)
    params, init_c2w = build_params(cfg, scene, init_key)

    checkpoint_io = CheckpointIO(out_dir)
    state0, _ = init_train_state(params)
    params, ck_scalars, opt_state = restore(
        checkpoint_io, cfg, params, opt_template=state0.opt_state
    )
    sched_state = ScheduleState.from_dict(
        ck_scalars, cfg["training"]["scheduling_start"]
    )
    sched = Scheduler(cfg, sched_state)

    state, _ = init_train_state(params)
    if opt_state is not None:
        state = TrainState(
            params=state.params,
            opt_state=jax.tree.map(jnp.asarray, opt_state),
        )
    epoch_scan = cfg.get("tpu", {}).get("epoch_scan", True)
    # multi-chip: tpu.n_devices > 1 shards rays/points over a 1-D mesh
    # (parallel/mesh.py); params + opt state replicated, XLA inserts the
    # ICI grad all-reduce. n_training_points must divide over the mesh.
    n_dev = int(cfg.get("tpu", {}).get("n_devices", 1) or 1)
    mesh = None
    if n_dev > 1:
        from ..parallel.mesh import make_ray_mesh, replicated

        mesh = make_ray_mesh(
            n_dev, cfg.get("tpu", {}).get("mesh_axis", "rays") or "rays",
            # production: never silently substitute virtual CPU devices
            # for missing chips (tests build their mesh on a CPU backend
            # where jax.devices() itself returns the 8 virtual devices)
            allow_virtual_cpu=False,
        )
        state = jax.device_put(state, replicated(mesh))
        scene_arrs = jax.device_put(scene_arrs, replicated(mesh))
        if init_c2w is not None:
            init_c2w = jax.device_put(init_c2w, replicated(mesh))
    if epoch_scan:
        epoch_fn = make_epoch_step(cfg, render_cfg, init_c2w, mesh=mesh)
    step_fn = make_train_step(cfg, render_cfg, init_c2w, mesh=mesh)

    camera_mat_gt = jnp.asarray(scene.K)
    scale_mat = jnp.asarray(scene.scale_mat)
    scene_arrs["camera_mat_gt"] = camera_mat_gt
    scene_arrs["scale_mat"] = scale_mat

    print_every = cfg["training"]["print_every"]
    checkpoint_every = cfg["training"]["checkpoint_every"]
    backup_every = cfg["training"]["backup_every"]
    visualize_every = cfg["training"]["visualize_every"]
    render_path = os.path.join(out_dir, "rendering")
    eval_pose_every = cfg["training"]["eval_pose_every"]
    eval_img_every = cfg["training"]["eval_img_every"]

    gt_poses = scene.c2ws  # numpy (N, 4, 4) or None
    # with rays_per_step_multiplier k, every step consumes k frame-batches
    # of n_training_points rays — count them all (bench.py's accounting)
    _k_log = max(int(cfg.get("tpu", {}).get("rays_per_step_multiplier", 1)), 1)
    throughput = Throughput(cfg["training"]["n_training_points"] * _k_log)

    # per-view distortion logging + reprojection dumps (`train.py:195,225-229`,
    # `model/training.py:344-354`)
    log_ss_per_view = cfg["training"].get("log_scale_shift_per_view", False)
    vis_reproj_every = cfg["training"].get("vis_reprojection_every", 0) or 0
    scale_dict, shift_dict = {}, {}
    pair_fn_cache = {}

    def dump_pair_images(state, idx, ref_idx, scalars, it):
        """Save the rgb_s pair (view-1 colours / reprojected view-2 colours)
        like the reference's `vis_reprojection_every` dump."""
        if "pair" not in pair_fn_cache:
            static_pair = (
                ("pair_images", True), ("render_model", False),
                ("use_ref", True), ("use_rgb_s", True),
            )
            from .trainer import compute_loss

            def pair_aux(params, batch, scalars, rng):
                # mesh threaded through: the batch/params are committed to
                # the mesh's devices during sharded training, and the
                # kernel-vs-XLA chamfer choice keys on the mesh platform
                return compute_loss(
                    params, batch, scalars, rng, cfg=cfg,
                    static=dict(static_pair), init_c2w=init_c2w,
                    render_cfg=render_cfg, mesh=mesh,
                )[1]

            pair_fn_cache["pair"] = jax.jit(pair_aux)
        batch = dict(scene_arrs)
        batch["idx"] = jnp.int32(idx)
        batch["ref_idx"] = jnp.int32(ref_idx)
        aux = pair_fn_cache["pair"](
            state.params, batch, scalars, jax.random.PRNGKey(0)
        )
        if "rgb_pc1" not in aux:
            return
        from PIL import Image

        os.makedirs(render_path, exist_ok=True)
        for tag, arr in (("img1", aux["rgb_pc1"]),
                         ("img2", aux["rgb_pc1_proj"])):
            a = np.clip(np.asarray(arr) * 255.0, 0, 255).astype(np.uint8)
            Image.fromarray(a).convert("RGB").save(
                os.path.join(render_path, "%d_%04d_%s.png" % (it, idx, tag))
            )

    epoch_budget = max_epochs
    t0b = time.time()
    pending_prev = None

    def _pose_metrics(it, pose_params):
        """Per-epoch pose accuracy (`train.py:277-290`). ``pose_params`` is
        the epoch-end snapshot captured at dispatch time, so pipelined
        processing logs the RIGHT epoch's poses at ``it`` (not the
        one-epoch-ahead live state)."""
        learned = np.asarray(
            all_poses(
                pose_params, init_c2w,
                cfg["pose"]["learn_R"], cfg["pose"]["learn_t"],
            )
        )
        aligned = align_ate_c2b_use_a2b(learned, gt_poses)
        ate = compute_ate(gt_poses, aligned)
        rpe_t, rpe_r = compute_rpe(gt_poses, aligned)
        logger.add_scalar("eval/ate_trans", ate, it)
        logger.add_scalar("eval/rpe_trans", rpe_t * 100, it)
        logger.add_scalar("eval/rpe_rot", np.rad2deg(rpe_r), it)

    def _process_epoch_metrics(pending):
        """Host-side consumption of one finished epoch's metrics: logging,
        PSNR, pose eval, plateau/scheduler update (and the 'reset'-mode field
        re-init). In pipelined mode this runs one epoch behind the device."""
        nonlocal state, key, t0b
        p_epoch, p_it, aux_mean, aux_last, p_order, p_pose = pending
        aux_host = jax.device_get(aux_mean)
        logger.add_scalar("train/loss_pc_epoch",
                          float(aux_host["loss_pc"]), p_it)
        logger.add_scalar("train/loss_rgbs_epoch",
                          float(aux_host["loss_rgb_s"]), p_it)
        if log_ss_per_view:
            ss = jax.device_get(
                (aux_last["scale_steps"], aux_last["shift_steps"])
            )
            for v_idx, sc, sh in zip(p_order, ss[0], ss[1]):
                scale_dict["view %02d" % v_idx] = float(sc)
                shift_dict["view %02d" % v_idx] = float(sh)
        if print_every > 0 and (p_it // n_views) % max(
            print_every // max(n_views, 1), 1
        ) == 0:
            rate = throughput.rate()
            print(
                f"[Epoch {p_epoch:02d}] it={p_it:03d}, "
                f"loss={float(aux_host['loss']):.8f}, "
                f"time={time.time() - t0b:.4f}, rays/s={rate:.0f}"
            )
            t0b = time.time()
            throughput.reset()
            for tag, v in aux_host.items():
                logger.add_scalar(f"train/{tag}", float(np.asarray(v)), p_it)
            logger.add_scalar("perf/rays_per_sec", rate, p_it)
            for vname, v in scale_dict.items():
                logger.add_scalar(f"train/scale{vname}", v, p_it)
            for vname, v in shift_dict.items():
                logger.add_scalar(f"train/shift{vname}", v, p_it)
        if (
            eval_pose_every > 0
            and (p_epoch % eval_pose_every) == 0
            and gt_poses is not None
            and cfg["pose"]["learn_pose"]
        ):
            _pose_metrics(p_it, p_pose)
        psnr = float(mse2psnr(float(aux_host["l2_mean"])))
        if eval_img_every > 0 and (p_epoch % eval_img_every) == 0:
            logger.add_scalar("train/psnr", psnr, p_it)
        switched = sched.update_plateau(p_epoch, psnr)
        if switched and cfg["training"]["scheduling_mode"] == "reset":
            key, reinit_key = jax.random.split(key)
            new_nerf = init_nerf_params(reinit_key, cfg)
            params2 = dict(state.params)
            params2["nerf"] = new_nerf
            state = TrainState(params=params2, opt_state=state.opt_state)
        for g, v in sched.lrs(p_epoch).items():
            logger.add_scalar(f"train/lr_{g}", v, p_it)

    while sched_state.epoch_it < sched.total_epochs:
        sched_state.epoch_it += 1
        epoch = sched_state.epoch_it
        if epoch_budget is not None and epoch >= epoch_budget:
            break

        weights = sched.weights(epoch)
        w_l1, w_l2 = sched.rgb_loss_switch(epoch)
        # applied_lrs, not lrs: the reference rewrites param_groups at the
        # END of each epoch, so epoch e trains at the formula evaluated at
        # e-1 (executed A/B: tests/test_traincli_reference_exec.py). In
        # pipelined scan mode the plateau state itself lags one more epoch
        # (see _process_epoch_metrics) — tpu.parity's eager_metrics removes
        # that lag.
        lrs = sched.applied_lrs(epoch)
        static = sched.static_flags(epoch)
        scalars = {
            "weights": {k: np.float32(v) for k, v in weights.items()},
            "w_l1": np.float32(w_l1),
            "w_l2": np.float32(w_l2),
            "lrs": {k: np.float32(v) for k, v in lrs.items()},
        }

        order = np.random.permutation(n_views)
        ref_order = np.array(
            [scene.sample_ref_idx(int(i), pyrng) for i in order], np.int32
        )
        rays_mult = int(cfg.get("tpu", {}).get("rays_per_step_multiplier", 1))
        if rays_mult > 1:
            # k frames' ray batches per step (VERDICT r1 item 10 /
            # SURVEY §2.5): frame 0 keeps the epoch order (and owns the
            # reference pair); the extra k-1 frames are drawn uniformly
            extra = np.random.randint(
                0, n_views, size=(n_views, rays_mult - 1)
            )
            order = np.concatenate([order[:, None], extra], axis=1).astype(
                np.int32
            )
        order0 = order if order.ndim == 1 else order[:, 0]

        if epoch_scan:
            # whole epoch in ONE device dispatch (lax.scan over steps):
            # amortises the ~100 ms tunnel dispatch. PIPELINED: the metrics
            # sync for epoch e happens while epoch e+1 already runs on
            # device, so the dispatch round-trip vanishes from steady state.
            # The plateau detector therefore sees each epoch's PSNR one
            # epoch late — immaterial against patient=30 (`train.py:309-319`)
            # and documented here.
            it0 = sched_state.it + 1
            epoch_key = jax.random.fold_in(key, epoch)
            state, aux_mean, aux_last = epoch_fn(
                state, scene_arrs, jnp.asarray(order, jnp.int32),
                jnp.asarray(ref_order), scalars, epoch_key, static,
            )
            sched_state.it += n_views
            it = sched_state.it
            throughput.tick(n_views)
            # pose params snapshotted lazily (device array, no sync): this
            # IS epoch e's end state even when processed one epoch later
            pending = (epoch, it, aux_mean, aux_last, order0,
                       state.params["pose"])
            if (cfg["training"]["scheduling_mode"] == "reset"
                    or tpu_cfg.get("eager_metrics", False)):
                # 'reset' re-initialises the field the moment the plateau
                # fires; a pipelined (lagged) reset would silently discard
                # one trained epoch, so this mode syncs eagerly.
                # tpu.eager_metrics forces the same eager sync in any mode
                # (set by the tpu.parity profile: the reference's plateau
                # detector sees each epoch's PSNR the epoch it happened)
                _process_epoch_metrics(pending)
            else:
                # sync + process the PREVIOUS epoch's metrics (device keeps
                # running the epoch just dispatched above)
                if pending_prev is not None:
                    _process_epoch_metrics(pending_prev)
                pending_prev = pending
            if (
                vis_reproj_every > 0
                and static.get("use_rgb_s")
                and ((it0 - 1) // vis_reproj_every) != (it // vis_reproj_every)
            ):
                dump_pair_images(state, int(order0[-1]), int(ref_order[-1]),
                                 scalars, it)
            if checkpoint_every > 0 and ((it0 - 1) // checkpoint_every) != (it // checkpoint_every):
                save_all(checkpoint_io, state, sched_state, cfg)
            if backup_every > 0 and ((it0 - 1) // backup_every) != (it // backup_every):
                save_all(checkpoint_io, state, sched_state, cfg, suffix=f"_{it}")
            if visualize_every > 0 and ((it0 - 1) // visualize_every) != (it // visualize_every):
                from .visualize import render_visdata

                render_visdata(
                    state, cfg, render_cfg, init_c2w, scene,
                    cfg["training"]["vis_resolution"], it,
                    os.path.join(render_path, "%04d_vis" % it), mesh=mesh,
                )
            continue
        else:
            l2_epoch = []
            pc_epoch = []
            rgb_s_epoch = []
            for idx, ref_idx in zip(order, ref_order):
                sched_state.it += 1
                it = sched_state.it
                batch = dict(scene_arrs)
                batch["idx"] = jnp.asarray(idx, jnp.int32)
                batch["ref_idx"] = jnp.int32(ref_idx)
                idx = int(np.ravel(idx)[0])  # frame 0 for host-side logging
                step_key = jax.random.fold_in(key, it)
                state, aux = step_fn(state, batch, scalars, step_key, static)
                throughput.tick()

                if log_ss_per_view:
                    scale_dict["view %02d" % idx] = float(aux["scale"])
                    shift_dict["view %02d" % idx] = float(aux["shift"])
                if (
                    vis_reproj_every > 0
                    and static.get("use_rgb_s")
                    and (it % vis_reproj_every) == 0
                ):
                    dump_pair_images(state, int(idx), int(ref_idx), scalars, it)
                if print_every > 0 and (it % print_every) == 0:
                    aux_host = jax.device_get(aux)
                    l2_epoch.append(float(aux_host["l2_mean"]))
                    pc_epoch.append(float(aux_host["loss_pc"]))
                    rgb_s_epoch.append(float(aux_host["loss_rgb_s"]))
                    rate = throughput.rate()
                    print(
                        f"[Epoch {epoch:02d}] it={it:03d}, "
                        f"loss={float(aux_host['loss']):.8f}, "
                        f"time={time.time() - t0b:.4f}, rays/s={rate:.0f}"
                    )
                    t0b = time.time()
                    throughput.reset()
                    for tag, v in aux_host.items():
                        logger.add_scalar(f"train/{tag}", float(np.asarray(v)), it)
                    logger.add_scalar("perf/rays_per_sec", rate, it)
                    for vname, v in scale_dict.items():
                        logger.add_scalar(f"train/scale{vname}", v, it)
                    for vname, v in shift_dict.items():
                        logger.add_scalar(f"train/shift{vname}", v, it)
                else:
                    l2_epoch.append(float(aux["l2_mean"]))
                    pc_epoch.append(float(aux["loss_pc"]))
                    rgb_s_epoch.append(float(aux["loss_rgb_s"]))

                if checkpoint_every > 0 and (it % checkpoint_every) == 0:
                    save_all(checkpoint_io, state, sched_state, cfg)
                if backup_every > 0 and (it % backup_every) == 0:
                    save_all(checkpoint_io, state, sched_state, cfg,
                             suffix=f"_{it}")
                if visualize_every > 0 and (it % visualize_every) == 0:
                    from .visualize import render_visdata

                    render_visdata(
                        state, cfg, render_cfg, init_c2w, scene,
                        cfg["training"]["vis_resolution"], it,
                        os.path.join(render_path, "%04d_vis" % it),
                        mesh=mesh,
                    )

        # (non-scan path only — the scan path defers this to
        # _process_epoch_metrics with a one-epoch pipeline lag)
        logger.add_scalar("train/loss_pc_epoch", float(np.mean(pc_epoch)), sched_state.it)
        logger.add_scalar("train/loss_rgbs_epoch", float(np.mean(rgb_s_epoch)), sched_state.it)

        # per-epoch pose accuracy (`train.py:277-290`)
        if (
            eval_pose_every > 0
            and (epoch % eval_pose_every) == 0
            and gt_poses is not None
            and cfg["pose"]["learn_pose"]
        ):
            _pose_metrics(sched_state.it, state.params["pose"])

        psnr = float(mse2psnr(np.mean(l2_epoch)))
        if eval_img_every > 0 and (epoch % eval_img_every) == 0:
            logger.add_scalar("train/psnr", psnr, sched_state.it)

        # plateau detection + LR logging (`train.py:297-352`)
        switched = sched.update_plateau(epoch, psnr)
        if switched and cfg["training"]["scheduling_mode"] == "reset":
            key, reinit_key = jax.random.split(key)
            new_nerf = init_nerf_params(reinit_key, cfg)
            params2 = dict(state.params)
            params2["nerf"] = new_nerf
            state = TrainState(params=params2, opt_state=state.opt_state)
        for g, v in sched.lrs(epoch).items():
            logger.add_scalar(f"train/lr_{g}", v, sched_state.it)

    if pending_prev is not None:
        # drain the pipeline: the last epoch's metrics are still pending
        _process_epoch_metrics(pending_prev)
    save_all(checkpoint_io, state, sched_state, cfg)
    if profile_dir:
        jax.profiler.stop_trace()
    logger.close()
    return state, sched, scene
