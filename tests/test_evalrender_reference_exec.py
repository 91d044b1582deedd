"""Executed A/B of the full-image eval render chain against the reference.

The eval/NVS CLIs render whole images through the renderer's ``eval_=True``
path — no density noise, ``dist_pred`` normalised from ray-distance to depth
units (`model/rendering.py:106,150-155`) — chunked by ``points_batch_size``
(`model/eval_images.py:73-88`). Our counterpart is one cached-jit
``render_image`` dispatch (`ops/rendering.py:426`) feeding
``evaluation/eval_images.eval_image``. These tests run the reference's own
``Renderer`` and ``Eval_Images`` on a shared random NeRF and assert the
rendered rgb/depth images and every reported metric match.
"""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_exec as rx  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nope_nerf_tpu.evaluation.eval_images import eval_image  # noqa: E402
from nope_nerf_tpu.ops.rendering import render_image  # noqa: E402
from nope_nerf_tpu.training.trainer import make_render_cfg  # noqa: E402
from nope_nerf_tpu.utils.synthetic import SyntheticScene, tiny_config  # noqa: E402

pytestmark = pytest.mark.skipif(
    not rx.reference_available(), reason="/root/reference not present"
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    scene = SyntheticScene(n_frames=3, hw=(16, 20), num_points=16)
    cfg = tiny_config(scene, str(tmp_path_factory.mktemp("evalrender")),
                      n_training_points=64, num_points=24)
    # the reference hard-codes pos-enc levels 10/4 at its call sites
    # (`model/official_nerf.py:61,87`)
    cfg["model"].update({"hidden_dim": 64, "pos_enc_levels": 10,
                         "dir_enc_levels": 4})
    cfg["extract_images"]["resolution"] = [scene.H, scene.W]
    cfg["_num_cams"] = scene.N_imgs
    stack = rx.build_reference_stack(cfg, scene, seed=3)
    # give the shared field spatial structure (a random init is near-constant
    # in both occupancy and colour, which would make the A/B near-vacuous)
    with torch.no_grad():
        stack.field.layers0[0].weight.mul_(4.0)
    jparams = jax.tree.map(jnp.asarray,
                           rx.stack_params_to_jax(stack, cfg)["nerf"])
    c2w = torch.tensor(np.asarray(scene.c2ws[1], np.float32))
    world = np.asarray(torch.inverse(c2w).numpy(), np.float32)
    return scene, cfg, stack, jparams, world


def _reference_render(stack, scene, world, *, chunk):
    """The Eval_Images inner loop (`model/eval_images.py:64-88`) verbatim."""
    ref = rx.load_reference()
    h, w = scene.H, scene.W
    _, pixels = ref.common.arange_pixels(resolution=(h, w))
    depth_input = torch.ones(1, h * w, 1)
    camera_mat = torch.tensor(np.asarray(scene.K, np.float32)).unsqueeze(0)
    world_mat = torch.tensor(world).unsqueeze(0)
    scale_mat = torch.tensor(
        np.asarray(scene.scale_mat, np.float32)).unsqueeze(0)
    rgb_pred, depth_pred = [], []
    with torch.no_grad():
        for pixels_i, depth_i in zip(torch.split(pixels, chunk, dim=1),
                                     torch.split(depth_input, chunk, dim=1)):
            out = stack.renderer(pixels_i, depth_i, camera_mat, world_mat,
                                 scale_mat, "nope_nerf", eval_=True, it=0,
                                 add_noise=False)
            rgb_pred.append(out["rgb"])
            depth_pred.append(out["depth_pred"])
    rgb = torch.cat(rgb_pred, dim=1).view(h, w, 3).numpy()
    depth = torch.cat(depth_pred, dim=0).view(h, w).numpy()
    return rgb, depth


class TestEvalModeRender:
    def test_full_image_rgb_and_depth_match(self, setup):
        scene, cfg, stack, jparams, world = setup
        rgb_ref, depth_ref = _reference_render(stack, scene, world, chunk=100)

        rcfg = make_render_cfg(cfg)
        rgb, depth = render_image(
            jparams, (scene.H, scene.W), jnp.asarray(scene.K),
            jnp.asarray(world), jnp.asarray(scene.scale_mat), rcfg,
            chunk=128,  # different chunking on purpose: both must be
        )  # chunk-invariant (ref splits at 100, ours lax.maps at 128)
        rgb, depth = np.asarray(rgb), np.asarray(depth)

        assert rgb_ref.std() > 1e-3 and depth_ref.std() > 1e-3, "vacuous"
        np.testing.assert_allclose(rgb, rgb_ref, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(depth, depth_ref, rtol=2e-4, atol=2e-5)


class TestEvalImagesWrapper:
    """The whole Eval_Images.eval_images vs our eval_image: metrics,
    uint8 artifacts, depth masking (`model/eval_images.py:45-137`)."""

    def _reference_eval_images(self, setup, render_dir):
        scene, cfg, stack, jparams, world = setup
        # skimage is absent in this environment and unused inside
        # eval_images(); stub the module so the top-level import resolves
        if "skimage" not in sys.modules:
            sk = types.ModuleType("skimage")
            sk.metrics = types.ModuleType("skimage.metrics")
            sys.modules["skimage"] = sk
            sys.modules["skimage.metrics"] = sk.metrics
        rx.load_reference()
        import model.eval_images as ref_eval_images

        h, w = scene.H, scene.W
        c2w = torch.tensor(np.linalg.inv(world).astype(np.float32))
        gen = ref_eval_images.Eval_Images(
            stack.renderer, cfg, points_batch_size=96, use_learnt_poses=True,
            use_learnt_focal=True, device=torch.device("cpu"),
            render_type="nope_nerf", c2ws=[c2w], img_list=None,
        )
        data = {
            "img": torch.tensor(scene.imgs[1]).permute(2, 0, 1).unsqueeze(0),
            "img.depth": torch.tensor(scene.dpt_depth[1]).unsqueeze(0),
            "img.idx": torch.tensor(0),
            "img.camera_mat": torch.tensor(
                np.asarray(scene.K, np.float32)).unsqueeze(0),
            "img.scale_mat": torch.tensor(
                np.asarray(scene.scale_mat, np.float32)).unsqueeze(0),
        }
        # gt-equivalent fxfy: camera_mat rebuilt from it equals scene.K
        fxfy = [float(scene.K[0, 0]), float(-scene.K[1, 1])]
        lpips_stub = lambda a, b, normalize=True: (a - b).abs().mean()
        return gen.eval_images(data, render_dir, fxfy, lpips_stub,
                               logger=None, min_depth=0.1, max_depth=20.0,
                               it=0)

    def test_metrics_and_artifacts_match(self, setup, tmp_path):
        scene, cfg, stack, jparams, world = setup
        ref_dir = str(tmp_path / "ref")
        my_dir = str(tmp_path / "mine")
        ref_out = self._reference_eval_images(setup, ref_dir)

        my_out = eval_image(
            jparams, make_render_cfg(cfg), (scene.H, scene.W),
            scene.K, world, scene.scale_mat, scene.imgs[1],
            depth_gt=scene.dpt_depth[1],
            lpips_fn=lambda p, g: float(np.abs(p - g).mean()),
            min_depth=0.1, max_depth=20.0, render_dir=my_dir, img_idx=0,
            chunk=128,
        )

        for key, rtol in (("mse", 1e-4), ("psnr", 1e-4), ("ssim", 1e-4),
                          ("lpips", 1e-3)):
            np.testing.assert_allclose(
                my_out[key], ref_out[key], rtol=rtol,
                err_msg=f"metric {key}: ref={ref_out[key]} ours={my_out[key]}")

        # uint8 image artifact: identical up to the 1-count truncation edge
        diff = np.abs(my_out["img"].astype(int) - ref_out["img"].astype(int))
        assert diff.max() <= 1 and (diff == 0).mean() > 0.99

        # masked depth: the reference normalises to uint8 BEFORE masking
        # (`model/eval_images.py:115,122`); apply its normalisation to our
        # float depth map and compare the masked vectors
        d = my_out["depth"]
        d8 = np.clip(255.0 / d.max() * (d - d.min()), 0, 255).astype(np.uint8)
        mask = (scene.dpt_depth[1] > 0.1) & (scene.dpt_depth[1] < 20.0)
        assert mask.any()
        dd = np.abs(d8[mask].astype(int) - ref_out["depth_pred"].astype(int))
        assert dd.max() <= 1 and (dd == 0).mean() > 0.99

        # both sides wrote the same artifact tree
        for sub in ("img_out", "depth_out", "img_gt_out"):
            assert os.path.exists(os.path.join(ref_dir, sub, "0000.png"))
            assert os.path.exists(os.path.join(my_dir, sub, "0000.png"))
