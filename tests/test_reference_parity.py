"""Executed A/B parity against the ACTUAL reference implementation.

Round-5 VERDICT item 1: every parity claim previously rested on transcription
plus torch-*functional* spot checks; these tests import the reference's own
``Trainer``/``Renderer``/``Loss`` (`model/training.py:197-378`,
`model/rendering.py:36-167`, `model/losses.py:158-218`) via
tools/reference_exec.py (torch-CPU with ``.cuda()`` shims), run its REAL
``compute_loss`` / ``train_step`` on identical synthetic scenes, weights and
ray draws, and assert:

* per-term loss parity (rgb, depth, pc/chamfer, rgb_s, dist 1st/2nd, total)
  on identical inputs, at phase-1 weights, mid-anneal weights, the post-
  switch l2 phase, and the frame-ordering swap branch
  (`model/training.py:296-313`);
* a multi-step optimization trajectory match: N real reference
  ``train_step``s (4 torch Adams) vs N fused jitted steps here, same ray
  indices per step — per-step losses and final pose/focal/distortion/NeRF
  parameters agree.

Stochasticity is pinned on both sides (see tools/reference_exec.py):
torch.randperm replayed / ``batch['ray_idx']`` injected, stratified z jitter
off (``tpu.render_add_noise: False``). ``with_ssim`` stays False as in every
shipped config (the reference's rgb_s SSIM pools over NHWC's (W, C) axes —
the one documented deviation, see ops/ssim.py).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_exec as rx  # noqa: E402

from nope_nerf_tpu.config import apply_parity_profile  # noqa: E402
from nope_nerf_tpu.training.loop import scene_batch_arrays  # noqa: E402
from nope_nerf_tpu.training.scheduler import Scheduler  # noqa: E402
from nope_nerf_tpu.training.trainer import (  # noqa: E402
    compute_loss,
    init_train_state,
    make_render_cfg,
    make_train_step,
)
from nope_nerf_tpu.utils.synthetic import SyntheticScene, tiny_config  # noqa: E402

pytestmark = pytest.mark.skipif(
    not rx.reference_available(), reason="/root/reference not present"
)

# terms compared against the reference loss_dict (same keys)
TERMS = ("loss", "loss_rgb", "loss_depth", "l2_mean", "loss_dist_1st",
         "loss_dist_2nd", "loss_pc", "loss_rgb_s")


@pytest.fixture(scope="module")
def scene():
    return SyntheticScene(n_frames=4, hw=(24, 32), num_points=16)


@pytest.fixture(scope="module")
def cfg(scene, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ref_parity"))
    c = tiny_config(scene, out, n_training_points=128, num_points=24)
    # the reference hard-codes positional-encoding levels 10/4 at its call
    # sites (`model/official_nerf.py:61,87`) while sizing layers from cfg —
    # any other cfg levels CRASH it, so parity runs at the real 10/4
    c["model"].update({"hidden_dim": 64, "pos_enc_levels": 10,
                       "dir_enc_levels": 4})
    # exercise the learned-intrinsics path on both sides (default is gt-K;
    # the reference's Trainer only consults the focal net when its
    # optimizer_focal exists, `model/training.py:250-253`)
    c["pose"]["learn_focal"] = True
    c["training"].update({
        "pc_ratio": 2,
        "with_ssim": False,
        "scheduling_start": 100,
        "annealing_epochs": 50,
        # exercise the dist terms (weighted 0 by default -> reference skips
        # computing them entirely, `model/losses.py:173-176`)
        "weight_dist_1st_loss": [0.1, 0.0],
        "weight_dist_2nd_loss": [0.1, 0.0],
    })
    c["tpu"].update({"parity": True, "render_add_noise": False,
                     "epoch_scan": False})
    apply_parity_profile(c)
    c["_num_cams"] = scene.N_imgs
    return c


@pytest.fixture(scope="module")
def stack(cfg, scene):
    # perturb pose/distortion/focal: zero-init poses make the dist losses
    # non-differentiable in torch and leave branch selects unexercised
    return rx.build_reference_stack(cfg, scene, seed=42, perturb=0.02)


@pytest.fixture(scope="module")
def jparams(stack, cfg):
    return jax.tree.map(jnp.asarray, rx.stack_params_to_jax(stack, cfg))


def _scalars(cfg, epoch):
    sched = Scheduler(cfg)
    w_l1, w_l2 = sched.rgb_loss_switch(epoch)
    return {
        "weights": {k: np.float32(v) for k, v in sched.weights(epoch).items()},
        "w_l1": np.float32(w_l1),
        "w_l2": np.float32(w_l2),
        "lrs": {g: np.float32(cfg["training"][lr]) for g, lr in
                (("nerf", "learning_rate"), ("pose", "pose_lr"),
                 ("focal", "focal_lr"), ("distortion", "distortion_lr"))},
    }


def _my_loss_dict(cfg, scene, params, idx, ref_idx, ray_idx, epoch):
    sched = Scheduler(cfg)
    static = sched.static_flags(epoch)
    batch = scene_batch_arrays(scene, cfg)
    batch.update({
        "idx": jnp.int32(idx),
        "ref_idx": jnp.int32(ref_idx),
        "camera_mat_gt": jnp.asarray(scene.K),
        "scale_mat": jnp.asarray(scene.scale_mat),
        "ray_idx": jnp.asarray(ray_idx, jnp.int32),
    })
    _, aux = compute_loss(
        params, batch, _scalars(cfg, epoch), jax.random.PRNGKey(0),
        cfg=cfg, static=static, init_c2w=None,
        render_cfg=make_render_cfg(cfg),
    )
    return {k: float(v) for k, v in aux.items()
            if k in TERMS or k == "loss"}


# weight key controlling whether the reference COMPUTES each term at all
# (`model/losses.py:162-194`: zero-weight terms are reported as literal 0.0
# without being evaluated, while we compute every requested term — identical
# `loss`, different per-term reporting)
_TERM_WEIGHT = {
    "loss_rgb": "rgb_weight", "l2_mean": "rgb_weight",
    "loss_depth": "depth_weight", "loss_pc": "pc_weight",
    "loss_rgb_s": "rgb_s_weight",
    "loss_dist_1st": "weight_dist_1st_loss",
    "loss_dist_2nd": "weight_dist_2nd_loss",
}


def _assert_terms_close(ref_ld, my_ld, static, rtol, atol=1e-6,
                        weights=None):
    for term in TERMS:
        if term == "loss_rgb_s" and not static.get("use_rgb_s", True):
            continue
        if term == "loss_pc" and not static.get("use_ref", True):
            continue
        if weights is not None and term in _TERM_WEIGHT and \
                float(weights[_TERM_WEIGHT[term]]) == 0.0:
            assert ref_ld[term] == 0.0, (term, ref_ld[term])
            continue
        r, m = ref_ld[term], my_ld[term]
        assert np.isfinite(r) and np.isfinite(m), (term, r, m)
        np.testing.assert_allclose(
            m, r, rtol=rtol, atol=atol,
            err_msg=f"term {term}: reference={r} ours={m}",
        )


class TestPerTermLossParity:
    """One compute_loss forward, identical inputs, per-term comparison."""

    def _run(self, cfg, scene, stack, jparams, *, idx, ref_idx, epoch,
             seed, rtol=3e-4):
        rng = np.random.default_rng(seed)
        H, W = scene.H, scene.W
        n = cfg["training"]["n_training_points"]
        ray_idx = rng.permutation(H * W)[:n]
        batch = rx.make_torch_batch(scene, idx, ref_idx)
        ref_ld = rx.reference_loss_dict(
            stack, batch, it=1, epoch=epoch,
            scheduling_start=cfg["training"]["scheduling_start"],
            ray_idx=ray_idx,
        )
        my_ld = _my_loss_dict(cfg, scene, jparams, idx, ref_idx, ray_idx,
                              epoch)
        sched = Scheduler(cfg)
        static = sched.static_flags(epoch)
        _assert_terms_close(ref_ld, my_ld, static, rtol,
                            weights=sched.weights(epoch))
        return ref_ld, my_ld

    def test_phase1_forward_branch(self, cfg, scene, stack, jparams):
        """epoch 0: start weights, l1 rgb, full ref branch (idx < N-1)."""
        ref_ld, _ = self._run(cfg, scene, stack, jparams, idx=0, ref_idx=1,
                              epoch=0, seed=11)
        # sanity: the interesting terms are actually nonzero
        for t in ("loss_rgb", "loss_depth", "loss_pc", "loss_rgb_s"):
            assert abs(ref_ld[t]) > 1e-8, t

    def test_swap_branch_last_frame(self, cfg, scene, stack, jparams):
        """idx = N-1 flips the pair ordering (`model/training.py:305-313`)
        and hits the fix_scaleN constant-scale branch."""
        self._run(cfg, scene, stack, jparams, idx=scene.N_imgs - 1,
                  ref_idx=scene.N_imgs - 2, epoch=0, seed=12)

    def test_mid_anneal_weights(self, cfg, scene, stack, jparams):
        """epoch inside [scheduling_start, +annealing]: fractional weights
        from the linear anneal (`model/training.py:187-211`)."""
        epoch = cfg["training"]["scheduling_start"] + 25
        self._run(cfg, scene, stack, jparams, idx=1, ref_idx=2, epoch=epoch,
                  seed=13)

    def test_post_switch_l2_phase(self, cfg, scene, stack, jparams):
        """epoch past scheduling_start+annealing: rgb switches l1->l2 and
        pc/rgb_s anneal to 0 (reference skips the ref branch entirely)."""
        epoch = (cfg["training"]["scheduling_start"]
                 + cfg["training"]["annealing_epochs"] + 5)
        ref_ld, my_ld = self._run(cfg, scene, stack, jparams, idx=2,
                                  ref_idx=3, epoch=epoch, seed=14)
        assert ref_ld["loss_pc"] == 0.0  # not computed by the reference
        # the l1/l2 switch actually happened on both sides
        assert ref_ld["loss_rgb"] == pytest.approx(my_ld["l2_mean"] * 3,
                                                   rel=1e-3)

    def test_auto_mask_dormant_in_reference(self, cfg, scene, stack,
                                            jparams):
        """Executed evidence that ``with_auto_mask`` is DEAD config in the
        reference's training loss: the flag is only consulted inside
        ``get_reprojection_loss``/``get_DPT_reprojection_loss``
        (`model/losses.py:70-72,92-95`), and ``Loss.forward`` calls
        ``get_rgb_s_loss`` instead (`model/losses.py:184-187`), which has no
        auto-mask branch.  So reference(flag=True) == reference(flag=False)
        == ours(flag=False); our opt-in auto-mask (an implementation of the
        reference's dormant logic) is covered separately in
        tests/test_round4.py."""
        rng = np.random.default_rng(15)
        H, W = scene.H, scene.W
        ray_idx = rng.permutation(H * W)[:cfg["training"]["n_training_points"]]
        batch = rx.make_torch_batch(scene, 0, 1)
        old_cfg_flag = stack.trainer.loss.cfg["with_auto_mask"]
        stack.trainer.loss.cfg["with_auto_mask"] = True
        try:
            ref_ld_on = rx.reference_loss_dict(
                stack, batch, it=1, epoch=0,
                scheduling_start=cfg["training"]["scheduling_start"],
                ray_idx=ray_idx,
            )
        finally:
            stack.trainer.loss.cfg["with_auto_mask"] = old_cfg_flag
        ref_ld_off = rx.reference_loss_dict(
            stack, batch, it=1, epoch=0,
            scheduling_start=cfg["training"]["scheduling_start"],
            ray_idx=ray_idx,
        )
        assert ref_ld_on["loss_rgb_s"] == ref_ld_off["loss_rgb_s"]
        my_ld = _my_loss_dict(cfg, scene, jparams, 0, 1, ray_idx, 0)
        static = Scheduler(cfg).static_flags(0)
        _assert_terms_close(ref_ld_on, my_ld, static, rtol=3e-4)


class TestTrajectoryParity:
    """N real reference train_steps vs N fused jitted steps."""

    N_STEPS = 12

    def test_optimization_trajectory(self, cfg, scene, stack, jparams):
        rng = np.random.default_rng(21)
        H, W = scene.H, scene.W
        n = cfg["training"]["n_training_points"]
        N = scene.N_imgs
        frame_seq = [int(i % N) for i in range(self.N_STEPS)]
        ref_seq = [i - 1 if i == N - 1 else i + 1 for i in frame_seq]
        ray_perms = [rng.permutation(H * W)[:n] for _ in range(self.N_STEPS)]
        epoch_seq = [0] * self.N_STEPS

        # ---- reference side: 4 torch Adams, real train_step ----
        stack2 = rx.build_reference_stack(cfg, scene, seed=42, perturb=0.02)
        jp0 = jax.tree.map(jnp.asarray, rx.stack_params_to_jax(stack2, cfg))
        ref_lds = rx.run_reference_steps(
            stack2, scene, frame_seq=frame_seq, ref_seq=ref_seq,
            ray_perms=ray_perms, epoch_seq=epoch_seq,
            scheduling_start=cfg["training"]["scheduling_start"],
        )

        # ---- this framework: fused jit step, same params/draws ----
        state, _ = init_train_state(jp0)
        step = make_train_step(cfg, make_render_cfg(cfg), init_c2w=None)
        scalars = _scalars(cfg, 0)
        static = Scheduler(cfg).static_flags(0)
        batch0 = scene_batch_arrays(scene, cfg)
        batch0.update({
            "camera_mat_gt": jnp.asarray(scene.K),
            "scale_mat": jnp.asarray(scene.scale_mat),
        })
        my_losses = []
        for i in range(self.N_STEPS):
            batch = dict(batch0)
            batch["idx"] = jnp.int32(frame_seq[i])
            batch["ref_idx"] = jnp.int32(ref_seq[i])
            batch["ray_idx"] = jnp.asarray(ray_perms[i], jnp.int32)
            state, aux = step(state, batch, scalars, jax.random.PRNGKey(i),
                              static)
            my_losses.append(float(aux["loss"]))

        ref_losses = [ld["loss"] for ld in ref_lds]
        # losses must track each other through all N steps (tolerance grows
        # with accumulated f32 divergence between torch-CPU and XLA-CPU)
        np.testing.assert_allclose(my_losses[0], ref_losses[0], rtol=3e-4)
        np.testing.assert_allclose(my_losses, ref_losses, rtol=5e-3)

        # final parameters: pose/focal/distortion exactly comparable
        p = jax.device_get(state.params)
        np.testing.assert_allclose(
            p["pose"]["r"], stack2.pose_net.r.detach().numpy(),
            rtol=0, atol=5e-5, err_msg="pose r diverged")
        np.testing.assert_allclose(
            p["pose"]["t"], stack2.pose_net.t.detach().numpy(),
            rtol=0, atol=5e-5, err_msg="pose t diverged")
        # distortion gets a looser band: its gradient flows through the
        # chamfer argmin, where f32 reduction-order noise between torch-CPU
        # and XLA-CPU can flip nearest-neighbour indices; Adam's step-1
        # update is ±lr regardless of gradient magnitude, so a single index
        # flip moves a scale by O(lr) once before the trajectories re-lock
        np.testing.assert_allclose(
            p["distortion"]["scales"],
            stack2.dist_net.global_scales.detach().numpy(),
            rtol=0, atol=1e-3)
        np.testing.assert_allclose(
            p["distortion"]["shifts"],
            stack2.dist_net.global_shifts.detach().numpy(),
            rtol=0, atol=1e-3)
        np.testing.assert_allclose(
            p["focal"]["fx"], stack2.focal_net.fx.detach().numpy(),
            rtol=0, atol=5e-5)
        # NeRF trunk: first + last layers within drift tolerance.  Adam's
        # v̂-normalisation makes early steps sign-like (|update| ≈ lr for any
        # gradient), so f32 reduction-order noise between torch-CPU and
        # XLA-CPU bounds per-weight drift at O(lr·steps) worst-case; observed
        # max drift over 12 steps is ~6e-4 ≈ 0.6·lr total, i.e. the
        # trajectories track far inside the chaotic bound
        sd = stack2.field.state_dict()
        np.testing.assert_allclose(
            p["nerf"]["trunk0_0"]["w"],
            sd["layers0.0.weight"].detach().numpy().T,
            rtol=0, atol=1e-3, err_msg="nerf first layer diverged")
        np.testing.assert_allclose(
            p["nerf"]["fc_rgb"]["b"],
            sd["fc_rgb.bias"].detach().numpy(),
            rtol=0, atol=1e-3)


class TestConvertedCheckpointRender:
    """The migration chain, executed end-to-end: the ACTUAL reference
    modules' state_dicts saved in the reference's on-disk checkpoint layout
    (`model/checkpoints.py:45-60` torch.save of module+optimizer dicts),
    through tools/convert_reference_ckpt.py, rendered by THIS framework —
    A/B'd against the reference's own Renderer on the same rays. Stronger
    than test_reference_ckpt_convert.py's synthetic fixtures: the weights
    and the oracle are both the executed reference."""

    def test_converter_output_equals_inmemory_extraction(
            self, cfg, scene, stack, tmp_path_factory):
        import torch as _torch

        from nope_nerf_tpu.training.checkpoints import load_pytree

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from convert_reference_ckpt import main as convert_main

        d = tmp_path_factory.mktemp("ref_ckpt_pt")
        out = tmp_path_factory.mktemp("ref_ckpt_npz")
        opt, opt_pose, opt_focal, opt_dist = stack.optimizers
        _torch.save({"model": stack.net.state_dict(),
                     "optimizer": opt.state_dict(),
                     "epoch_it": 7, "it": 123},
                    str(d / "model.pt"))
        _torch.save({"model": stack.pose_net.state_dict(),
                     "optimizer": opt_pose.state_dict(), "it": 123},
                    str(d / "model_pose.pt"))
        _torch.save({"model": stack.focal_net.state_dict(),
                     "optimizer": opt_focal.state_dict(), "it": 123},
                    str(d / "model_focal.pt"))
        _torch.save({"model": stack.dist_net.state_dict(),
                     "optimizer": opt_dist.state_dict(), "it": 123},
                    str(d / "model_distortion.pt"))
        convert_main([str(d), str(out), "--strict"])

        direct = rx.stack_params_to_jax(stack, cfg)
        nerf_tree, scal = load_pytree(str(out / "model.npz"))
        assert scal["it"] == 123 and scal["epoch_it"] == 7
        for layer, wb in direct["nerf"].items():
            np.testing.assert_array_equal(
                nerf_tree["params"][layer]["w"], wb["w"], err_msg=layer)
            np.testing.assert_array_equal(
                nerf_tree["params"][layer]["b"], wb["b"], err_msg=layer)
        pose_tree, _ = load_pytree(str(out / "model_pose.npz"))
        np.testing.assert_array_equal(pose_tree["params"]["r"],
                                      direct["pose"]["r"])
        np.testing.assert_array_equal(pose_tree["params"]["t"],
                                      direct["pose"]["t"])
        focal_tree, _ = load_pytree(str(out / "model_focal.npz"))
        np.testing.assert_array_equal(focal_tree["params"]["fx"],
                                      direct["focal"]["fx"])
        dist_tree, _ = load_pytree(str(out / "model_distortion.npz"))
        np.testing.assert_array_equal(dist_tree["params"]["scales"],
                                      direct["distortion"]["scales"])
        np.testing.assert_array_equal(dist_tree["params"]["shifts"],
                                      direct["distortion"]["shifts"])

        self._render_ab(cfg, scene, stack, nerf_tree["params"])

    @staticmethod
    def _render_ab(cfg, scene, stack, nerf_params):
        """Converted weights through OUR renderer == the reference's own
        Renderer.forward on the same rays (`model/rendering.py:36-167`)."""
        import torch as _torch

        from nope_nerf_tpu.geometry.rays import arange_pixels
        from nope_nerf_tpu.ops.rendering import render_rays

        n = 96
        pix_all, _ = arange_pixels((scene.H, scene.W))
        sel = np.linspace(0, pix_all.shape[0] - 1, n).astype(np.int64)
        pixels = np.asarray(pix_all)[sel]
        depth = np.asarray(scene.dpt_depth[0]).reshape(-1)[sel]
        K = np.asarray(scene.K, np.float32)
        world = np.eye(4, dtype=np.float32)
        smat = np.asarray(scene.scale_mat, np.float32)

        with _torch.no_grad():
            ref_out = stack.renderer.forward(
                _torch.tensor(pixels, dtype=_torch.float32).unsqueeze(0),
                _torch.tensor(depth, dtype=_torch.float32).reshape(1, -1, 1),
                _torch.tensor(K).unsqueeze(0),
                _torch.tensor(world).unsqueeze(0),
                _torch.tensor(smat).unsqueeze(0),
                "nope_nerf", add_noise=False, eval_=False, it=10 ** 6,
            )
        my_out = render_rays(
            jax.tree.map(jnp.asarray, nerf_params),
            jnp.asarray(pixels, jnp.float32),
            jnp.asarray(depth, jnp.float32),
            jnp.asarray(K), jnp.asarray(world), jnp.asarray(smat),
            make_render_cfg(cfg), add_noise=False, eval_mode=False,
        )
        np.testing.assert_allclose(
            np.asarray(my_out["rgb"]).reshape(-1, 3),
            ref_out["rgb"].reshape(-1, 3).numpy(),
            rtol=3e-4, atol=3e-5, err_msg="rendered rgb diverged")
        np.testing.assert_allclose(
            np.asarray(my_out["depth_pred"]).reshape(-1),
            ref_out["depth_pred"].reshape(-1).numpy(),
            rtol=3e-4, atol=3e-4, err_msg="rendered depth diverged")
