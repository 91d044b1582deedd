"""Unit tests for compute ops: encoding, compositing, chamfer, interp, ssim."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nope_nerf_tpu.ops import (
    chamfer_loss,
    composite,
    encode_position,
    grid_sample,
    nearest_idx,
    resize_bilinear,
    resize_nearest,
    ssim,
    ssim_loss_map,
)
from nope_nerf_tpu.ops.rendering import dist_to_alpha


class TestEncoding:
    def test_shape(self):
        x = jnp.ones((7, 3))
        assert encode_position(x, levels=10).shape == (7, 63)
        assert encode_position(x, levels=4).shape == (7, 27)

    def test_ordering_matches_reference(self, rng):
        """Reference ordering: [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), ...]
        each block covering all channels (`model/official_nerf.py:112-118`)."""
        x = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
        enc = np.asarray(encode_position(x, levels=3))
        ref = [np.asarray(x)]
        for i in range(3):
            ref.append(np.sin(2.0**i * np.asarray(x)))
            ref.append(np.cos(2.0**i * np.asarray(x)))
        ref = np.concatenate(ref, axis=-1)
        np.testing.assert_allclose(enc, ref, atol=1e-6)


class TestCompositing:
    def test_opaque_first_sample(self):
        """alpha=[1,0,...] -> weight 1 on first sample."""
        N, S = 2, 8
        alpha = jnp.zeros((N, S)).at[:, 0].set(1.0)
        rgb = jnp.ones((N, S, 3)) * jnp.arange(S)[None, :, None]
        z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S), (N, S))
        rgb_out, dist, w = composite(rgb, alpha, z)
        np.testing.assert_allclose(rgb_out, 0.0, atol=1e-5)
        np.testing.assert_allclose(dist, 1.0, atol=1e-5)
        np.testing.assert_allclose(w[:, 0], 1.0, atol=1e-5)

    def test_transmittance_epsilon(self):
        """weights = alpha * cumprod(1 - alpha + 1e-6) shifted — exact values
        on an analytic alpha profile (`model/rendering.py:130`)."""
        alpha = jnp.array([[0.5, 0.5, 0.5]])
        rgb = jnp.ones((1, 3, 3))
        z = jnp.array([[1.0, 2.0, 3.0]])
        _, _, w = composite(rgb, alpha, z)
        e = 1e-6
        expected = [0.5, 0.5 * (0.5 + e), 0.5 * (0.5 + e) ** 2]
        np.testing.assert_allclose(w[0], expected, rtol=1e-6)

    def test_white_background(self):
        alpha = jnp.zeros((1, 4))
        rgb = jnp.zeros((1, 4, 3))
        z = jnp.ones((1, 4))
        rgb_out, _, _ = composite(rgb, alpha, z, white_background=True)
        np.testing.assert_allclose(rgb_out, 1.0, atol=1e-5)

    def test_dist_to_alpha(self):
        """alpha = 1 - exp(-sigma·delta), far delta 1e10, last forced 1."""
        density = jnp.array([[1.0, 2.0, 0.0]])
        z = jnp.array([[0.0, 0.5, 1.0]])
        alpha = dist_to_alpha(density, z)
        np.testing.assert_allclose(alpha[0, 0], 1 - np.exp(-0.5), rtol=1e-5)
        np.testing.assert_allclose(alpha[0, 1], 1 - np.exp(-1.0), rtol=1e-5)
        np.testing.assert_allclose(alpha[0, 2], 1.0)


class TestChamfer:
    def test_identical_clouds_zero(self, rng):
        X = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
        assert float(chamfer_loss(X, X, block=64)) < 1e-5

    def test_matches_dense_bruteforce(self, rng):
        X = jnp.asarray(rng.normal(size=(130, 3)), jnp.float32)
        Y = jnp.asarray(rng.normal(size=(75, 3)), jnp.float32)
        loss = float(chamfer_loss(X, Y, block=64))
        d = np.linalg.norm(np.asarray(X)[:, None] - np.asarray(Y)[None], axis=-1)
        ref = d.min(1).mean() + d.min(0).mean()
        assert abs(loss - ref) < 5e-4  # f32 argmin ties vs f64 brute force

    def test_nearest_idx_correct(self, rng):
        X = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
        Y = jnp.asarray(rng.normal(size=(60, 3)), jnp.float32)
        ix, iy = nearest_idx(X, Y, block=32)
        d = np.linalg.norm(np.asarray(X)[:, None] - np.asarray(Y)[None], axis=-1)
        np.testing.assert_array_equal(np.asarray(ix), d.argmin(1))
        np.testing.assert_array_equal(np.asarray(iy), d.argmin(0))

    def test_gradient_flows(self, rng):
        X = jnp.asarray(rng.normal(size=(40, 3)), jnp.float32)
        Y = jnp.asarray(rng.normal(size=(40, 3)), jnp.float32)
        g = jax.grad(lambda x: chamfer_loss(x, Y, block=32))(X)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


class TestSSIMBounds:
    def test_near_constant_images_stay_in_range(self, rng):
        """SSIM must stay in [-1, 1] on near-constant images. On TPU the
        default bf16 conv made E[x²]-μ² err past C2=9e-4, flipping window
        denominators negative (observed mean SSIM of -16.8); the convs now
        run at HIGHEST precision."""
        from nope_nerf_tpu.ops.ssim import ssim

        a = np.full((64, 80, 3), 0.5, np.float32)
        b = a + rng.normal(scale=2e-3, size=a.shape).astype(np.float32)
        v = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        assert -1.0 <= v <= 1.0 + 1e-6, v
        assert v > 0.9  # near-identical near-constant images


class TestInterp:
    def test_trainer_depth_gather_matches_resize_nearest(self, rng):
        """The trainer's inline depth-prior index math must reproduce
        gather(resize_nearest(depth)) EXACTLY — including the f32 floor
        rounding on boundary rows (hd=252, H=480 hits several)."""
        from nope_nerf_tpu.ops.interp import resize_nearest

        hd, wd, H, W = 252, 448, 480, 640
        depth = jnp.asarray(rng.uniform(size=(hd, wd)), jnp.float32)
        big = resize_nearest(depth, (H, W))
        r_idx = jnp.arange(H * W, dtype=jnp.int32)  # every pixel
        rr = r_idx // W
        rc = r_idx % W
        # the exact formula used in trainer.compute_loss
        drr = jnp.floor(rr.astype(jnp.float32) * jnp.float32(hd / H)
                        ).astype(jnp.int32)
        drc = jnp.floor(rc.astype(jnp.float32) * jnp.float32(wd / W)
                        ).astype(jnp.int32)
        got = depth.reshape(-1)[drr * wd + drc]
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(big).reshape(-1))

    def test_grid_sample_centers_align_corners(self, rng):
        img = jnp.asarray(rng.uniform(size=(5, 7, 3)), jnp.float32)
        # align_corners=True: coord -1 -> pixel 0, +1 -> pixel W-1
        coords = jnp.array([[-1.0, -1.0], [1.0, 1.0]])
        out = grid_sample(img, coords, align_corners=True)
        np.testing.assert_allclose(out[0], img[0, 0], atol=1e-6)
        np.testing.assert_allclose(out[1], img[4, 6], atol=1e-6)

    def test_grid_sample_bilinear_midpoint(self):
        img = jnp.zeros((2, 2, 1)).at[1, 1, 0].set(4.0)
        out = grid_sample(img, jnp.array([[0.0, 0.0]]), align_corners=True)
        np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-6)  # mean of corners

    def test_grid_sample_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        img = rng.uniform(size=(6, 9, 3)).astype(np.float32)
        coords = rng.uniform(-1.2, 1.2, size=(50, 2)).astype(np.float32)
        for mode in ["bilinear", "nearest"]:
            for ac in [True, False]:
                ours = np.asarray(
                    grid_sample(jnp.asarray(img), jnp.asarray(coords), mode, ac)
                )
                t_img = torch.from_numpy(img).permute(2, 0, 1)[None]
                t_grid = torch.from_numpy(coords)[None, None]
                theirs = (
                    F.grid_sample(t_img, t_grid, mode=mode, align_corners=ac)
                    .squeeze(2)
                    .squeeze(0)
                    .permute(1, 0)
                    .numpy()
                )
                np.testing.assert_allclose(ours, theirs, atol=1e-5,
                                           err_msg=f"{mode} ac={ac}")

    def test_resize_nearest_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        img = rng.uniform(size=(10, 16)).astype(np.float32)
        ours = np.asarray(resize_nearest(jnp.asarray(img), (3, 5)))
        theirs = (
            F.interpolate(torch.from_numpy(img)[None, None], (3, 5), mode="nearest")
            .squeeze()
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_resize_bilinear_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        img = rng.uniform(size=(10, 16, 3)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(img), (5, 9)))
        theirs = (
            F.interpolate(
                torch.from_numpy(img).permute(2, 0, 1)[None], (5, 9),
                mode="bilinear", align_corners=False,
            )
            .squeeze(0)
            .permute(1, 2, 0)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestSSIM:
    def test_identical_images(self, rng):
        img = jnp.asarray(rng.uniform(size=(32, 32, 3)), jnp.float32)
        assert float(ssim(img, img)) > 0.9999
        assert float(ssim_loss_map(img, img).mean()) < 1e-5

    def test_matches_reference_algorithm(self, rng):
        """Compare against a direct numpy transcription of the
        pytorch_ssim algorithm (gaussian window, zero same-padding,
        mean over everything — `third_party/pytorch_ssim/__init__.py:49-92`)."""
        from scipy.ndimage import convolve

        a = rng.uniform(size=(48, 48)).astype(np.float64)
        b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1)

        g = np.exp(-((np.arange(11) - 5) ** 2) / (2 * 1.5**2))
        g /= g.sum()
        win = np.outer(g, g)
        conv = lambda x: convolve(x, win, mode="constant", cval=0.0)
        mu1, mu2 = conv(a), conv(b)
        s1 = conv(a * a) - mu1**2
        s2 = conv(b * b) - mu2**2
        s12 = conv(a * b) - mu1 * mu2
        C1, C2 = 0.01**2, 0.03**2
        ref = np.mean(
            ((2 * mu1 * mu2 + C1) * (2 * s12 + C2))
            / ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))
        )
        ours = float(
            ssim(jnp.asarray(a, jnp.float32)[..., None],
                 jnp.asarray(b, jnp.float32)[..., None])
        )
        assert abs(ours - ref) < 1e-3
