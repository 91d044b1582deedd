"""Unit tests for the field and the learnable camera-parameter modules."""
import jax
import jax.numpy as jnp
import numpy as np

from nope_nerf_tpu.models import (
    all_poses,
    apply_nerf,
    distortion_scale_shift,
    focal_fxfy,
    init_distortion_params,
    init_focal_params,
    init_nerf_params,
    init_pose_params,
    nerf_gradient,
    pose_c2w,
)

CFG = {
    "model": {
        "hidden_dim": 256,
        "pos_enc_levels": 10,
        "dir_enc_levels": 4,
        "occ_activation": "softplus",
    },
    "rendering": {"white_background": False},
}
MODEL_CFG = {
    "occ_activation": "softplus",
    "pos_enc_levels": 10,
    "dir_enc_levels": 4,
    "dist_alpha": False,
}


class TestNerf:
    def test_param_shapes_and_bias_init(self):
        p = init_nerf_params(jax.random.PRNGKey(0), CFG)
        assert p["trunk0_0"]["w"].shape == (63, 256)
        assert p["trunk1_0"]["w"].shape == (256 + 63, 256)
        assert p["rgb_layer"]["w"].shape == (256 + 27, 128)
        # special bias inits (`model/official_nerf.py:39-44`)
        np.testing.assert_allclose(p["fc_density"]["b"], [0.1])
        np.testing.assert_allclose(p["fc_rgb"]["b"], [0.02] * 3)
        cfg_white = {**CFG, "rendering": {"white_background": True}}
        p2 = init_nerf_params(jax.random.PRNGKey(0), cfg_white)
        np.testing.assert_allclose(p2["fc_rgb"]["b"], [0.8] * 3)

    def test_forward_shapes_and_ranges(self):
        p = init_nerf_params(jax.random.PRNGKey(0), CFG)
        pts = jnp.zeros((17, 3))
        dirs = jnp.ones((17, 3))
        rgb, occ = apply_nerf(p, pts, dirs, MODEL_CFG)
        assert rgb.shape == (17, 3) and occ.shape == (17, 1)
        assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()
        # occupancy mode: alpha = 1-exp(-softplus) in (0, 1)
        assert (np.asarray(occ) > 0).all() and (np.asarray(occ) < 1).all()

    def test_dist_alpha_mode_returns_density(self):
        p = init_nerf_params(jax.random.PRNGKey(0), CFG)
        cfg = {**MODEL_CFG, "dist_alpha": True}
        occ = apply_nerf(p, jnp.zeros((4, 3)), None, cfg, only_occupancy=True)
        assert (np.asarray(occ) >= 0).all()  # softplus, unbounded above

    def test_gradient_shape_finite(self):
        p = init_nerf_params(jax.random.PRNGKey(0), CFG)
        g = nerf_gradient(p, jnp.ones((5, 3)) * 0.3, MODEL_CFG)
        assert g.shape == (5, 3)
        assert np.isfinite(np.asarray(g)).all()


class TestPose:
    def test_zero_init_is_identity(self):
        p = init_pose_params(4)
        c2w = pose_c2w(p, 2)
        np.testing.assert_allclose(c2w, np.eye(4), atol=1e-6)

    def test_delta_on_init(self, rng):
        from nope_nerf_tpu.geometry.so3 import make_c2w

        init = jnp.asarray(
            np.stack([np.eye(4, dtype=np.float32)] * 3)
        ).at[1, 0, 3].set(5.0)
        p = init_pose_params(3)
        p["r"] = p["r"].at[1].set(jnp.array([0.0, 0.0, 0.1]))
        c2w = pose_c2w(p, 1, init_c2w=init)
        expected = np.asarray(make_c2w(jnp.array([0.0, 0.0, 0.1]), jnp.zeros(3))) @ np.asarray(init[1])
        np.testing.assert_allclose(c2w, expected, atol=1e-6)

    def test_all_poses_matches_single(self, rng):
        p = init_pose_params(5)
        p["r"] = jnp.asarray(0.2 * rng.normal(size=(5, 3)), jnp.float32)
        p["t"] = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
        batch = np.asarray(all_poses(p))
        for i in range(5):
            np.testing.assert_allclose(
                batch[i], np.asarray(pose_c2w(p, i)), atol=1e-6
            )

    def test_stop_gradient_flags(self):
        p = init_pose_params(2)

        def loss(params, lr, lt):
            c2w = pose_c2w(params, 0, learn_R=lr, learn_t=lt)
            return jnp.sum(c2w)

        g = jax.grad(loss)(p, False, True)
        assert float(jnp.abs(g["r"]).sum()) == 0.0
        assert float(jnp.abs(g["t"]).sum()) > 0.0


class TestFocal:
    def test_order2_squares(self):
        p = init_focal_params(fx_only=False, order=2, init_focal=[4.0, 9.0])
        fxfy = np.asarray(focal_fxfy(p, fx_only=False, order=2))
        np.testing.assert_allclose(fxfy, [4.0, 9.0], rtol=1e-6)

    def test_fx_only_ties(self):
        p = init_focal_params(fx_only=True, order=1, init_focal=2.5)
        fxfy = np.asarray(focal_fxfy(p, fx_only=True, order=1))
        np.testing.assert_allclose(fxfy, [2.5, 2.5])

    def test_default_init_one(self):
        p = init_focal_params(fx_only=False, order=2, init_focal=None)
        fxfy = np.asarray(focal_fxfy(p, fx_only=False, order=2))
        np.testing.assert_allclose(fxfy, [1.0, 1.0])


class TestDistortion:
    def test_init_and_clamp(self):
        p = init_distortion_params(3)
        s, sh = distortion_scale_shift(p, 0, 3, fix_scaleN=False)
        np.testing.assert_allclose(s, [1.0])
        np.testing.assert_allclose(sh, [0.0])
        p["scales"] = p["scales"].at[0].set(-5.0)
        s, _ = distortion_scale_shift(p, 0, 3, fix_scaleN=False)
        np.testing.assert_allclose(s, [0.01])

    def test_fix_scaleN(self):
        p = init_distortion_params(3)
        p["scales"] = p["scales"].at[2].set(7.0)
        s, _ = distortion_scale_shift(p, 2, 3, fix_scaleN=True)
        np.testing.assert_allclose(s, [1.0])
        s, _ = distortion_scale_shift(p, 2, 3, fix_scaleN=False)
        np.testing.assert_allclose(s, [7.0])
