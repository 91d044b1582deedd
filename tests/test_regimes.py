"""End-to-end regime tests: the LLFF path (NDC + dist_alpha) and
checkpoint/opt-state resume semantics."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nope_nerf_tpu.utils.synthetic import SyntheticScene, tiny_config


class TestNDCRegime:
    def test_llff_path_converges(self, tmp_path):
        """configs/LLFF/fern.yaml regime: sample_option ndc, dist_alpha True,
        depth_range [0,1] — the full training loop must run and fit."""
        scene = SyntheticScene(n_frames=4, hw=(16, 20), num_points=16)
        cfg = tiny_config(scene, str(tmp_path / "out"), n_training_points=128,
                          num_points=16)
        cfg["rendering"].update(
            {"sample_option": "ndc", "dist_alpha": True,
             "depth_range": [0.0, 1.0]}
        )
        cfg["pose"].update({"learn_R": False, "learn_t": False,
                            "init_pose": True, "init_pose_type": "gt"})
        cfg["training"].update({"scheduling_start": 0, "annealing_epochs": 0,
                                "auto_scheduler": False})
        from nope_nerf_tpu.training.loop import train

        train(cfg, max_epochs=30, scene=scene)
        events = [
            json.loads(l)
            for l in open(os.path.join(cfg["training"]["out_dir"], "logs",
                                       "events.jsonl"))
        ]
        psnrs = [e["value"] for e in events if e["tag"] == "train/psnr"]
        assert len(psnrs) == 30
        assert all(np.isfinite(psnrs))
        assert psnrs[-1] > psnrs[0] + 0.5, (psnrs[0], psnrs[-1])


class TestResume:
    def test_opt_state_and_schedule_resume(self, tmp_path):
        """Training twice with an epoch cap must continue — same epoch
        counter, restored Adam moments (non-zero counts)."""
        scene = SyntheticScene(n_frames=4, hw=(16, 20), num_points=16)
        out = str(tmp_path / "out")
        cfg = tiny_config(scene, out, n_training_points=64, num_points=16)
        cfg["pose"].update({"learn_R": False, "learn_t": False,
                            "init_pose": True, "init_pose_type": "gt"})
        cfg["training"].update({"scheduling_start": 0, "annealing_epochs": 0,
                                "auto_scheduler": False})
        from nope_nerf_tpu.training.loop import train

        state1, sched1, _ = train(cfg, max_epochs=5, scene=scene)
        assert sched1.state.epoch_it == 5

        state2, sched2, _ = train(cfg, max_epochs=8, scene=scene)
        # resumed at 5 (saved counter), ran to 8
        assert sched2.state.epoch_it == 8
        # Adam moments were restored, not fresh: counts > 0 before new steps
        # would have been taken anyway; instead verify the nerf params
        # continued from the trained values (loss landscape continuity)
        d = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).mean()),
            state1.params["nerf"], state2.params["nerf"],
        )
        mean_drift = np.mean(jax.tree.leaves(d))
        # 3 more epochs of small steps — params moved a little, not re-init
        assert 0 < mean_drift < 0.01

    def test_opt_state_in_checkpoint_file(self, tmp_path):
        """model.npz carries the optimizer leaves."""
        scene = SyntheticScene(n_frames=4, hw=(16, 20), num_points=16)
        out = str(tmp_path / "out")
        cfg = tiny_config(scene, out, n_training_points=64, num_points=16)
        cfg["pose"].update({"learn_R": False, "learn_t": False,
                            "init_pose": True, "init_pose_type": "gt"})
        cfg["training"].update({"scheduling_start": 0, "annealing_epochs": 0,
                                "auto_scheduler": False})
        from nope_nerf_tpu.training.loop import train

        train(cfg, max_epochs=2, scene=scene)
        data = np.load(os.path.join(out, "model.npz"))
        leaf_keys = [k for k in data.files if k.startswith("__leaf_")]
        assert len(leaf_keys) > 0
