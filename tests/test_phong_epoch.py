"""Tests for the phong/sphere-tracing preview and the epoch-scan train mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nope_nerf_tpu.models.nerf import init_nerf_params
from nope_nerf_tpu.ops.phong import (
    get_sphere_intersection,
    phong_render,
    ray_marching,
)
from nope_nerf_tpu.utils.synthetic import SyntheticScene, tiny_config

CFG_MODEL = {
    "model": {
        "hidden_dim": 32,
        "pos_enc_levels": 4,
        "dir_enc_levels": 2,
        "occ_activation": "softplus",
    },
    "rendering": {"white_background": False},
}
RENDER_CFG = {
    "occ_activation": "softplus",
    "pos_enc_levels": 4,
    "dir_enc_levels": 2,
    "dist_alpha": False,
}


class TestSphereIntersection:
    def test_ray_through_center(self):
        cam = jnp.array([0.0, 0.0, 3.0])
        dirs = jnp.array([[0.0, 0.0, -1.0]])
        inter, mask = get_sphere_intersection(cam, dirs, r=1.0)
        assert bool(mask[0])
        np.testing.assert_allclose(inter[0], [2.0, 4.0], atol=1e-5)

    def test_miss(self):
        cam = jnp.array([0.0, 0.0, 3.0])
        dirs = jnp.array([[1.0, 0.0, 0.0]])
        inter, mask = get_sphere_intersection(cam, dirs, r=1.0)
        assert not bool(mask[0])
        np.testing.assert_allclose(inter[0], [0.0, 0.0])


class TestRayMarching:
    def test_shapes_and_sentinels(self):
        params = init_nerf_params(jax.random.PRNGKey(0), CFG_MODEL)
        cam = jnp.array([0.0, 0.0, 3.0])
        dirs = jnp.array([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        d = ray_marching(params, cam, dirs, RENDER_CFG, n_steps=64, rad=2.0)
        assert d.shape == (2,)
        # results are the reference's sentinel set: finite hit, inf, or 0
        assert np.all(np.isfinite(np.asarray(d)) | np.isinf(np.asarray(d)))

    def test_phong_render_shapes(self):
        params = init_nerf_params(jax.random.PRNGKey(0), CFG_MODEL)
        pixels = jnp.asarray(
            np.stack(np.meshgrid(np.linspace(-1, 1, 4), np.linspace(-1, 1, 4)),
                     -1).reshape(-1, 2),
            jnp.float32,
        )
        K = jnp.diag(jnp.array([1.0, -1.0, -1.0, 1.0]))
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = 3.0
        out = phong_render(
            params, pixels, K, jnp.asarray(np.linalg.inv(c2w)), jnp.eye(4),
            {**RENDER_CFG}, rad=2.0,
        )
        assert out["rgb"].shape == (16, 3)
        assert np.isfinite(np.asarray(out["rgb"])).all()
        assert (np.asarray(out["rgb"]) >= 0).all()
        assert (np.asarray(out["rgb"]) <= 1).all()


class TestEpochScan:
    def test_epoch_scan_trains(self, tmp_path):
        """One epoch-scan dispatch must run N steps and reduce the loss."""
        from nope_nerf_tpu.training.loop import build_params, scene_device_arrays
        from nope_nerf_tpu.training.trainer import (
            init_train_state,
            make_epoch_step,
            make_render_cfg,
        )

        scene = SyntheticScene(n_frames=4, hw=(16, 20), num_points=16)
        cfg = tiny_config(scene, str(tmp_path), n_training_points=64,
                          num_points=16)
        cfg["_num_cams"] = scene.N_imgs
        params, init_c2w = build_params(cfg, scene, jax.random.PRNGKey(1))
        state, _ = init_train_state(params)
        epoch_fn = make_epoch_step(cfg, make_render_cfg(cfg), init_c2w)
        imgs, dpts = scene_device_arrays(scene)
        scene_arrays = {
            "imgs": imgs,
            "dpts": dpts,
            "camera_mat_gt": jnp.asarray(scene.K),
            "scale_mat": jnp.asarray(scene.scale_mat),
        }
        scalars = {
            "weights": {
                k: np.float32(v)
                for k, v in dict(
                    rgb_weight=1.0, depth_weight=0.04, pc_weight=1.0,
                    rgb_s_weight=1.0, depth_consistency_weight=0.0,
                    weight_dist_1st_loss=0.0, weight_dist_2nd_loss=0.0,
                ).items()
            },
            "w_l1": np.float32(1.0),
            "w_l2": np.float32(0.0),
            "lrs": {g: np.float32(1e-3) for g in
                    ("nerf", "pose", "focal", "distortion")},
        }
        static = {"render_model": True, "use_ref": True, "use_rgb_s": True}
        idxs = jnp.arange(4, dtype=jnp.int32)
        refs = jnp.array([1, 2, 3, 2], jnp.int32)
        losses = []
        for e in range(6):
            state, aux_mean, aux_last = epoch_fn(
                state, scene_arrays, idxs, refs, scalars,
                jax.random.fold_in(jax.random.PRNGKey(0), e), static,
            )
            losses.append(float(aux_mean["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_loop_epoch_scan_end_to_end(self, tmp_path):
        """The training loop in epoch-scan mode produces logs and checkpoints."""
        import json
        import os

        from nope_nerf_tpu.training.loop import train

        scene = SyntheticScene(n_frames=4, hw=(16, 20), num_points=16)
        cfg = tiny_config(scene, str(tmp_path / "out"), n_training_points=64,
                          num_points=16)
        cfg["tpu"]["epoch_scan"] = True
        cfg["pose"].update({"learn_R": False, "learn_t": False,
                            "init_pose": True, "init_pose_type": "gt"})
        cfg["training"].update({"scheduling_start": 0, "annealing_epochs": 0,
                                "auto_scheduler": False,
                                "checkpoint_every": 8})
        train(cfg, max_epochs=10, scene=scene)
        out = cfg["training"]["out_dir"]
        assert os.path.exists(os.path.join(out, "model.npz"))
        events = [json.loads(l) for l in
                  open(os.path.join(out, "logs", "events.jsonl"))]
        psnrs = [e["value"] for e in events if e["tag"] == "train/psnr"]
        assert len(psnrs) == 10
        assert all(np.isfinite(psnrs))
