"""Renderer semantics tests: masks, depth outputs, NDC, full-image chunking."""
import jax
import jax.numpy as jnp
import numpy as np

from nope_nerf_tpu.models import init_nerf_params
from nope_nerf_tpu.ops.rendering import render_image, render_rays

CFG_MODEL = {
    "model": {
        "hidden_dim": 32,
        "pos_enc_levels": 4,
        "dir_enc_levels": 2,
        "occ_activation": "softplus",
    },
    "rendering": {"white_background": False},
}


def render_cfg(**over):
    base = {
        "num_points": 16,
        "depth_range": [0.5, 4.0],
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
    base.update(over)
    return base


def setup():
    params = init_nerf_params(jax.random.PRNGKey(0), CFG_MODEL)
    K = jnp.array(
        [[1.0, 0, 0, 0], [0, -1.0, 0, 0], [0, 0, -1.0, 0], [0, 0, 0, 1.0]]
    )
    return params, K


class TestRenderRays:
    def test_shapes_and_mask(self):
        params, K = setup()
        pixels = jnp.array([[0.0, 0.0], [0.5, -0.5], [0.1, 0.2]])
        depth = jnp.array([2.0, 0.0, 3.0])  # second ray invalid (zero prior)
        out = render_rays(
            params, pixels, depth, K, jnp.eye(4), jnp.eye(4), render_cfg()
        )
        assert out["rgb"].shape == (3, 3)
        assert out["depth_pred"].shape == (3,)
        np.testing.assert_array_equal(out["valid_mask"], [1.0, 0.0, 1.0])

    def test_depth_gt_is_prior_distance(self):
        """depth_gt = ||backprojected prior point - camera|| for normalised
        rays (`model/rendering.py:60`)."""
        params, K = setup()
        pixels = jnp.array([[0.0, 0.0]])
        depth = jnp.array([2.0])
        out = render_rays(
            params, pixels, depth, K, jnp.eye(4), jnp.eye(4), render_cfg()
        )
        # center pixel: ray norm 1, distance = prior depth
        np.testing.assert_allclose(out["depth_gt"][0], 2.0, atol=1e-5)

    def test_unnormalised_ray_divides_prior(self):
        params, K = setup()
        pixels = jnp.array([[1.0, 0.0]])  # off-center: ray norm sqrt(2)
        depth = jnp.array([2.0])
        out = render_rays(
            params, pixels, depth, K, jnp.eye(4), jnp.eye(4),
            render_cfg(normalise_ray=False),
        )
        # d_i_gt = ||p_world - cam|| / ||ray|| = 2*sqrt(2)/sqrt(2) = 2
        np.testing.assert_allclose(out["depth_gt"][0], 2.0, atol=1e-5)

    def test_eval_mode_dist_to_depth(self):
        params, K = setup()
        pixels = jnp.array([[1.0, 0.0]])
        depth = jnp.array([2.0])
        out_train = render_rays(
            params, pixels, depth, K, jnp.eye(4), jnp.eye(4), render_cfg()
        )
        out_eval = render_rays(
            params, pixels, depth, K, jnp.eye(4), jnp.eye(4), render_cfg(),
            eval_mode=True,
        )
        norm = np.sqrt(1.0 + 0.0 + 1.0)  # pixel (1,0): dir (1,0,-1)
        np.testing.assert_allclose(
            out_eval["depth_pred"][0],
            out_train["depth_pred"][0] / norm,
            rtol=1e-5,
        )

    def test_ndc_depth_gt_conversion(self):
        params, K = setup()
        pixels = jnp.array([[0.0, 0.0]])
        depth = jnp.array([2.0])
        out = render_rays(
            params, pixels, depth, K, jnp.eye(4), jnp.eye(4),
            render_cfg(sample_option="ndc", depth_range=[0.0, 1.0]),
        )
        np.testing.assert_allclose(out["depth_gt"][0], 1.0 - 1.0 / 2.0, atol=1e-5)
        # z values stay in [0, 1]
        z = np.asarray(out["z_vals"])
        assert z.min() >= 0 and z.max() <= 1

    def test_stratified_noise_stays_in_bins(self):
        params, K = setup()
        pixels = jnp.zeros((4, 2))
        depth = jnp.ones(4)
        out = render_rays(
            params, pixels, depth, K, jnp.eye(4), jnp.eye(4), render_cfg(),
            rng=jax.random.PRNGKey(3), add_noise=True,
        )
        z = np.asarray(out["z_vals"])
        assert (z >= 0.5 - 1e-6).all() and (z <= 4.0 + 1e-6).all()
        assert (np.diff(z, axis=-1) > -1e-6).all()  # still sorted

    def test_white_background(self):
        params, K = setup()
        # empty field far range -> rgb ~ 1 under white bg
        cfg = render_cfg(white_background=True)
        pixels = jnp.zeros((2, 2))
        depth = jnp.ones(2)
        out = render_rays(params, pixels, depth, K, jnp.eye(4), jnp.eye(4), cfg)
        acc = np.asarray(out["alpha"]).sum()
        assert np.asarray(out["rgb"]).min() > 0.0

    def test_dist_alpha_vs_occupancy_paths(self):
        params, K = setup()
        pixels = jnp.zeros((2, 2))
        depth = jnp.ones(2)
        out1 = render_rays(
            params, pixels, depth, K, jnp.eye(4), jnp.eye(4),
            render_cfg(dist_alpha=True),
        )
        out2 = render_rays(
            params, pixels, depth, K, jnp.eye(4), jnp.eye(4), render_cfg()
        )
        a1 = np.asarray(out1["alpha"])
        np.testing.assert_allclose(a1[:, -1], 1.0)  # forced last alpha
        assert not np.allclose(a1, np.asarray(out2["alpha"]))

    def test_normal_loss_branch(self):
        params, K = setup()
        out = render_rays(
            params, jnp.zeros((3, 2)), jnp.ones(3), K, jnp.eye(4), jnp.eye(4),
            render_cfg(normal_loss=True), rng=jax.random.PRNGKey(0),
            add_noise=True,
        )
        assert out["normal_diff"].shape == (3,)
        assert np.isfinite(np.asarray(out["normal_diff"])).all()


class TestRenderImage:
    def test_full_image_consistent_with_rays(self):
        params, K = setup()
        h, w = 6, 8
        rgb, depth = render_image(
            params, (h, w), K, jnp.eye(4), jnp.eye(4), render_cfg(), chunk=16
        )
        assert rgb.shape == (h, w, 3) and depth.shape == (h, w)
        # compare one pixel against direct ray render
        from nope_nerf_tpu.geometry.rays import arange_pixels

        _, pix = arange_pixels((h, w))
        out = render_rays(
            params, pix[:3], jnp.ones(3), K, jnp.eye(4), jnp.eye(4),
            render_cfg(), eval_mode=True,
        )
        np.testing.assert_allclose(
            rgb.reshape(-1, 3)[:3], out["rgb"], atol=1e-5
        )
        np.testing.assert_allclose(
            depth.reshape(-1)[:3], out["depth_pred"], atol=1e-5
        )


class TestNetworkQueryChunking:
    def test_chunked_matches_fused(self):
        """n_max_network_queries splits the field evaluation without changing
        results (reference `model/rendering.py:108-117` memory bound)."""
        params, K = setup()
        pixels = jnp.asarray(
            np.stack(np.meshgrid(np.linspace(-0.5, 0.5, 4),
                                 np.linspace(-0.5, 0.5, 4)), -1).reshape(-1, 2),
            jnp.float32,
        )
        depth = jnp.ones(16)
        out_fused = render_rays(
            params, pixels, depth, K, jnp.eye(4), jnp.eye(4),
            render_cfg(n_max_network_queries=10**9),
        )
        out_chunked = render_rays(
            params, pixels, depth, K, jnp.eye(4), jnp.eye(4),
            render_cfg(n_max_network_queries=64),  # 16*16=256 pts -> 4 chunks
        )
        np.testing.assert_allclose(out_fused["rgb"], out_chunked["rgb"],
                                   atol=1e-6)
        np.testing.assert_allclose(
            out_fused["depth_pred"], out_chunked["depth_pred"], atol=1e-6
        )
