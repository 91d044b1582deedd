"""Trainer tests: scheduler state machine, one fused step, convergence smoke,
checkpoint roundtrip (SURVEY.md §4c)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nope_nerf_tpu.training.scheduler import ScheduleState, Scheduler, anneal
from nope_nerf_tpu.utils.synthetic import SyntheticScene, tiny_config


@pytest.fixture(scope="module")
def scene():
    return SyntheticScene(n_frames=4, hw=(16, 20), num_points=16)


@pytest.fixture()
def cfg(scene, tmp_path):
    return tiny_config(scene, str(tmp_path / "out"), n_training_points=64,
                       num_points=16)


class TestScheduler:
    def test_anneal_edges(self):
        # epoch <= start returns start weight (incl. the ==start edge,
        # `model/training.py:190-191`)
        assert anneal(1.0, 0.0, 10, 5, 10) == 1.0
        assert anneal(1.0, 0.0, 10, 5, 15) == 0.0
        assert anneal(1.0, 0.0, 10, 5, 12) == pytest.approx(0.6)

    def test_weights_before_after(self, cfg):
        sched = Scheduler(cfg)
        w0 = sched.weights(0)
        assert w0["rgb_weight"] == 1.0 and w0["pc_weight"] == 1.0
        w_end = sched.weights(cfg["training"]["scheduling_start"] + 2000)
        assert w_end["pc_weight"] == 0.0 and w_end["depth_weight"] == 0.0

    def test_rgb_switch(self, cfg):
        sched = Scheduler(cfg)
        s = cfg["training"]["scheduling_start"]
        a = cfg["training"]["annealing_epochs"]
        assert sched.rgb_loss_switch(s + a - 1) == (1.0, 0.0)
        assert sched.rgb_loss_switch(s + a) == (0.0, 1.0)

    def test_lr_decay(self, cfg):
        sched = Scheduler(cfg)
        s = sched.state.scheduling_start
        lrs0 = sched.lrs(s - 1)
        assert lrs0["nerf"] == cfg["training"]["learning_rate"]
        lrs1 = sched.lrs(s + 10)
        assert lrs1["nerf"] == pytest.approx(
            cfg["training"]["learning_rate"] * cfg["training"]["scheduler_gamma"]
        )
        lrs2 = sched.lrs(s + 100)
        assert lrs2["pose"] == pytest.approx(
            cfg["training"]["pose_lr"] * cfg["training"]["scheduler_gamma_pose"]
        )

    def test_plateau_switch(self, cfg):
        cfg["training"]["auto_scheduler"] = True
        cfg["training"]["length_smooth"] = 3
        cfg["training"]["patient"] = 2
        sched = Scheduler(cfg)
        # rising psnr: no switch
        for e, p in enumerate([10, 11, 12, 13]):
            assert not sched.update_plateau(e, p)
        # falling: after `patient` non-improvements the phase switches
        switched = []
        for e, p in enumerate([5, 4, 3, 2], start=4):
            switched.append(sched.update_plateau(e, p))
        assert any(switched)
        assert sched.state.scheduling_start <= 7

    def test_static_flags_change(self, cfg):
        sched = Scheduler(cfg)
        f0 = sched.static_flags(1)
        assert f0["use_ref"] is True
        f1 = sched.static_flags(
            cfg["training"]["scheduling_start"]
            + cfg["training"]["annealing_epochs"]
            + 1
        )
        assert f1["use_ref"] is False and f1["render_model"] is True

    def test_state_roundtrip(self):
        st = ScheduleState(epoch_it=5, it=100, metric_val_best=22.5,
                           patient_count=3, scheduling_start=777)
        st2 = ScheduleState.from_dict(st.to_dict(), 10000)
        assert st2 == ScheduleState(5, 100, 22.5, 3, 777, [])


class TestTrainStep:
    def _setup(self, cfg, scene):
        from nope_nerf_tpu.training.loop import build_params, scene_device_arrays
        from nope_nerf_tpu.training.trainer import (
            init_train_state,
            make_render_cfg,
            make_train_step,
        )

        cfg = dict(cfg)
        cfg["_num_cams"] = scene.N_imgs
        params, init_c2w = build_params(cfg, scene, jax.random.PRNGKey(1))
        state, _ = init_train_state(params)
        step = make_train_step(cfg, make_render_cfg(cfg), init_c2w)
        imgs, dpts = scene_device_arrays(scene)
        batch = {
            "imgs": imgs,
            "dpts": dpts,
            "idx": jnp.int32(0),
            "ref_idx": jnp.int32(1),
            "camera_mat_gt": jnp.asarray(scene.K),
            "scale_mat": jnp.asarray(scene.scale_mat),
        }
        scalars = {
            "weights": {
                "rgb_weight": np.float32(1.0),
                "depth_weight": np.float32(0.04),
                "pc_weight": np.float32(1.0),
                "rgb_s_weight": np.float32(1.0),
                "depth_consistency_weight": np.float32(0.0),
                "weight_dist_1st_loss": np.float32(0.0),
                "weight_dist_2nd_loss": np.float32(0.0),
            },
            "w_l1": np.float32(1.0),
            "w_l2": np.float32(0.0),
            "lrs": {g: np.float32(1e-3) for g in
                    ("nerf", "pose", "focal", "distortion")},
        }
        static = {"render_model": True, "use_ref": True, "use_rgb_s": True}
        return state, step, batch, scalars, static

    def test_one_step_all_losses(self, cfg, scene):
        state, step, batch, scalars, static = self._setup(cfg, scene)
        state2, aux = step(state, batch, scalars, jax.random.PRNGKey(0), static)
        aux = jax.device_get(aux)
        for k in ("loss", "loss_rgb", "loss_depth", "loss_pc", "loss_rgb_s"):
            assert np.isfinite(aux[k]), k
        assert aux["loss_pc"] >= 0 and aux["loss_rgb_s"] >= 0
        # params actually moved
        d = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.params["nerf"], state2.params["nerf"],
        )
        assert max(jax.tree.leaves(d)) > 0

    def test_pose_and_distortion_receive_gradients(self, cfg, scene):
        state, step, batch, scalars, static = self._setup(cfg, scene)
        state2, _ = step(state, batch, scalars, jax.random.PRNGKey(0), static)
        dr = float(jnp.abs(state2.params["pose"]["r"] - state.params["pose"]["r"]).max())
        dt = float(jnp.abs(state2.params["pose"]["t"] - state.params["pose"]["t"]).max())
        ds = float(
            jnp.abs(
                state2.params["distortion"]["scales"]
                - state.params["distortion"]["scales"]
            ).max()
        )
        assert dr > 0 and dt > 0 and ds > 0

    def test_vanilla_nerf_converges(self, scene, tmp_path):
        """Fixed gt poses, rgb loss only — PSNR must climb on teacher data."""
        cfg = tiny_config(scene, str(tmp_path / "out2"), n_training_points=128,
                          num_points=16)
        cfg["pose"].update({"learn_R": False, "learn_t": False,
                            "init_pose": True, "init_pose_type": "gt"})
        cfg["training"].update({
            "scheduling_start": 0, "annealing_epochs": 0,
            "auto_scheduler": False,
        })
        from nope_nerf_tpu.training.loop import train

        state, sched, _ = train(cfg, max_epochs=40, scene=scene)
        import json

        events = [
            json.loads(l)
            for l in open(os.path.join(cfg["training"]["out_dir"], "logs",
                                       "events.jsonl"))
        ]
        psnrs = [e["value"] for e in events if e["tag"] == "train/psnr"]
        assert len(psnrs) >= 10
        assert psnrs[-1] > psnrs[0] + 1.0, f"no convergence: {psnrs[:3]}...{psnrs[-3:]}"

    def test_pipelined_epoch_metrics_complete(self, scene, tmp_path):
        """The epoch-scan loop processes metrics one epoch behind the device
        (training/loop.py _process_epoch_metrics). Every epoch must still be
        logged exactly once, including the final epoch via the drain after
        the loop — a missing drain or a double-process shows up here."""
        import json

        cfg = tiny_config(scene, str(tmp_path / "pipe"), n_training_points=64,
                          num_points=16)
        cfg["pose"].update({"learn_R": False, "learn_t": False,
                            "init_pose": True, "init_pose_type": "gt"})
        cfg["training"].update({
            "scheduling_start": 0, "annealing_epochs": 0,
            "auto_scheduler": False, "visualize_every": 0,
            "eval_pose_every": 0, "checkpoint_every": 0,
        })
        from nope_nerf_tpu.training.loop import train

        n_epochs = 7
        train(cfg, max_epochs=n_epochs, scene=scene)
        events = [
            json.loads(l)
            for l in open(os.path.join(cfg["training"]["out_dir"], "logs",
                                       "events.jsonl"))
        ]
        n_views = scene.N_imgs
        psnr_steps = [e["step"] for e in events if e["tag"] == "train/psnr"]
        # n_epochs epochs run (0-based); eval_img_every=1 in tiny_config ->
        # one psnr entry per epoch, in order, at the epoch's last 0-based
        # step it = (epoch+1)*n_views - 1. The last entry exists only if
        # the post-loop drain processed the final pending epoch.
        want = [e * n_views - 1 for e in range(1, n_epochs + 1)]
        assert psnr_steps == want, (psnr_steps, want)
        lr_steps = [e["step"] for e in events if e["tag"] == "train/lr_nerf"]
        assert lr_steps == want

    def test_checkpoint_roundtrip(self, cfg, scene, tmp_path):
        from nope_nerf_tpu.training.checkpoints import CheckpointIO

        state, step, batch, scalars, static = self._setup(cfg, scene)
        io = CheckpointIO(str(tmp_path / "ck"))
        io.save("model.npz", {"params": state.params["nerf"]}, epoch_it=3, it=42)
        tree, sc = io.load("model.npz")
        assert sc["epoch_it"] == 3 and sc["it"] == 42
        for k in state.params["nerf"]:
            np.testing.assert_array_equal(
                tree["params"][k]["w"], state.params["nerf"][k]["w"]
            )

    def test_missing_checkpoint_raises(self, tmp_path):
        from nope_nerf_tpu.training.checkpoints import CheckpointIO

        io = CheckpointIO(str(tmp_path / "ck2"))
        with pytest.raises(FileNotFoundError):
            io.load("nope.npz")
