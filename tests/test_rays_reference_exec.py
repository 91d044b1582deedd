"""Executed A/B of the camera/ray geometry primitives against the reference.

geometry/rays.py re-implements `model/common.py`'s pixel/world transform
toolkit (the math under every render and every loss term). The trainer-level
parity tests (tests/test_reference_parity.py) cover these transitively;
these pin each primitive directly against the reference's executed
functions, including the grid_sample image lookup the rgb_s branch uses.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_exec as rx  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from nope_nerf_tpu.geometry.rays import (  # noqa: E402
    arange_pixels,
    image_points_to_world,
    origin_to_world,
    project_to_cam,
    transform_to_camera_space,
    transform_to_world,
)
from nope_nerf_tpu.ops.interp import grid_sample  # noqa: E402

pytestmark = pytest.mark.skipif(
    not rx.reference_available(), reason="/root/reference not present"
)


@pytest.fixture(scope="module")
def ref():
    return rx.load_reference()


def _random_cams(seed):
    from scipy.spatial.transform import Rotation as R

    rng = np.random.default_rng(seed)
    K = np.diag([1.6, -1.8, -1.0, 1.0]).astype(np.float32)
    world = np.eye(4, dtype=np.float32)
    world[:3, :3] = R.random(rng=rng).as_matrix()
    world[:3, 3] = rng.normal(0, 0.5, 3)
    scale = np.diag([1.3, 1.3, 1.3, 1.0]).astype(np.float32)
    return K, world.astype(np.float32), scale


class TestPixelGrids:
    @pytest.mark.parametrize("hw", [(24, 32), (7, 5)])
    def test_arange_pixels(self, ref, hw):
        loc_r, scaled_r = ref.common.arange_pixels(resolution=hw)
        loc_o, scaled_o = arange_pixels(hw)
        np.testing.assert_array_equal(np.asarray(loc_o),
                                      loc_r[0].numpy())
        np.testing.assert_allclose(np.asarray(scaled_o),
                                   scaled_r[0].numpy(), rtol=1e-6, atol=1e-7)


class TestWorldTransforms:
    def test_transform_to_world_and_back(self, ref):
        K, world, scale = _random_cams(0)
        rng = np.random.default_rng(1)
        _, pix = arange_pixels((12, 16))
        pix = np.asarray(pix)
        depth = rng.uniform(0.5, 4.0, (pix.shape[0],)).astype(np.float32)
        want = ref.common.transform_to_world(
            torch.tensor(pix).unsqueeze(0),
            torch.tensor(depth).reshape(1, -1, 1),
            torch.tensor(K).unsqueeze(0),
            torch.tensor(world).unsqueeze(0),
            torch.tensor(scale).unsqueeze(0),
            device=torch.device("cpu"),
        )[0].numpy()
        got = np.asarray(transform_to_world(
            jnp.asarray(pix), jnp.asarray(depth), jnp.asarray(K),
            jnp.asarray(world), jnp.asarray(scale)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        # and the forward chain back to camera space
        back_ref = ref.common.transform_to_camera_space(
            torch.tensor(want).unsqueeze(0),
            torch.tensor(K).unsqueeze(0),
            torch.tensor(world).unsqueeze(0),
            torch.tensor(scale).unsqueeze(0))[0].numpy()
        back_ours = np.asarray(transform_to_camera_space(
            jnp.asarray(got), jnp.asarray(K), jnp.asarray(world),
            jnp.asarray(scale)))
        np.testing.assert_allclose(back_ours, back_ref, rtol=1e-5, atol=1e-6)

    def test_origin_and_image_points_to_world(self, ref):
        K, world, scale = _random_cams(2)
        n = 40
        want_o = ref.common.origin_to_world(
            n, torch.tensor(K).unsqueeze(0), torch.tensor(world).unsqueeze(0),
            torch.tensor(scale).unsqueeze(0))[0].numpy()
        got_o = np.asarray(origin_to_world(
            jnp.asarray(K), jnp.asarray(world), jnp.asarray(scale)))
        np.testing.assert_allclose(
            np.broadcast_to(got_o, want_o.shape), want_o,
            rtol=1e-5, atol=1e-6)
        _, pix = arange_pixels((5, 8))
        want_i = ref.common.image_points_to_world(
            torch.tensor(np.asarray(pix)).unsqueeze(0),
            torch.tensor(K).unsqueeze(0), torch.tensor(world).unsqueeze(0),
            torch.tensor(scale).unsqueeze(0))[0].numpy()
        got_i = np.asarray(image_points_to_world(
            pix, jnp.asarray(K), jnp.asarray(world), jnp.asarray(scale)))
        np.testing.assert_allclose(got_i, want_i, rtol=1e-5, atol=1e-6)

    def test_project_to_cam(self, ref):
        K, _, _ = _random_cams(3)
        rng = np.random.default_rng(4)
        pts = rng.normal(0, 1, (64, 3)).astype(np.float32)
        pts[:, 2] = -np.abs(pts[:, 2]) - 0.2  # in front of the camera
        xy_r, valid_r = ref.common.project_to_cam(
            torch.tensor(pts).unsqueeze(0), torch.tensor(K).unsqueeze(0),
            torch.device("cpu"))
        xy_o, valid_o = project_to_cam(jnp.asarray(pts), jnp.asarray(K))
        np.testing.assert_allclose(np.asarray(xy_o), xy_r[0].numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(valid_o),
                                      valid_r[0, :, 0].numpy())


class TestGridSample:
    @pytest.mark.parametrize("mode,align", [("bilinear", True),
                                            ("bilinear", False),
                                            ("nearest", False)])
    def test_matches_reference_get_tensor_values(self, ref, mode, align):
        """The rgb_s branch samples warped colors with
        get_tensor_values(..., mode='bilinear', align_corners=True) on
        [-1, 1] coords (`model/training.py:336-340`); pin every mode the
        reference's wrapper exposes."""
        rng = np.random.default_rng(5)
        img = rng.uniform(0, 1, (20, 28, 3)).astype(np.float32)
        coords = rng.uniform(-1.1, 1.1, (150, 2)).astype(np.float32)
        want = ref.common.get_tensor_values(
            torch.tensor(img).permute(2, 0, 1).unsqueeze(0),
            torch.tensor(coords).unsqueeze(0),
            mode=mode, scale=False, align_corners=align)[0].numpy()
        got = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords),
                                     mode=mode, align_corners=align))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
