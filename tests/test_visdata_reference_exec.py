"""Executed A/B of ``Trainer.render_visdata`` — the periodic training
visualisation (`model/training.py:100-163`) — against our
``training/visualize.render_visdata``.

The underlying renderers are already executed-A/B'd chunk-invariantly
(eval render, phong); what this pins is the visualisation path itself:
the focal-net camera_mat rebuild (`model/training.py:106-111`), the
pose-net world matrix, the 1024-pixel chunk loop at a DIFFERENT resolution
than training (exercising the prior-depth resize gather at a non-native
size), the artifact names (``%04d_img.png`` / ``%04d_depth.png`` /
``%04d_geo.png``), and the depth-png normalisation quirk — the reference
scales by ``255/d.max()`` AFTER subtracting ``d.min()`` (so the brightest
pixel is only 255 when min==0, `model/training.py:136-137`), which our
writer reproduces verbatim.
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
from nope_nerf_tpu.training.trainer import (  # noqa: E402
    init_train_state,
    make_render_cfg,
)
from nope_nerf_tpu.training.visualize import render_visdata  # noqa: E402
from nope_nerf_tpu.utils.synthetic import SyntheticScene, tiny_config  # noqa: E402

pytestmark = pytest.mark.skipif(
    not rx.reference_available(), reason="/root/reference not present"
)

VIS_RES = (12, 16)  # != the scene's 24x32: the reference resizes the prior
IMG_IDX = 1


@pytest.fixture(scope="module")
def scene():
    return SyntheticScene(n_frames=4, hw=(24, 32), num_points=16)


@pytest.fixture(scope="module")
def cfg(scene, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("visdata_ab"))
    c = tiny_config(scene, out, n_training_points=64, num_points=24)
    c["model"].update({"hidden_dim": 64, "pos_enc_levels": 10,
                       "dir_enc_levels": 4})
    c["pose"]["learn_focal"] = True
    c["training"]["vis_geo"] = True
    c["tpu"].update({"parity": True, "render_add_noise": False})
    apply_parity_profile(c)
    c["_num_cams"] = scene.N_imgs
    return c


@pytest.fixture(scope="module")
def artifacts(cfg, scene, tmp_path_factory):
    import imageio

    stack = rx.build_reference_stack(cfg, scene, seed=42, perturb=0.02)
    ref_dir = str(tmp_path_factory.mktemp("ref_vis"))
    batch = rx.make_torch_batch(scene, IMG_IDX, 2)
    stack.trainer.render_visdata(batch, VIS_RES, 1000, ref_dir)

    params = jax.tree.map(jnp.asarray, rx.stack_params_to_jax(stack, cfg))
    state, _ = init_train_state(params)
    my_dir = str(tmp_path_factory.mktemp("my_vis"))
    render_visdata(state, cfg, make_render_cfg(cfg), None, scene, VIS_RES,
                   1000, my_dir, img_idx=IMG_IDX)

    def read(d, name):
        return np.asarray(
            imageio.imread(os.path.join(d, "%04d_%s.png" % (IMG_IDX, name)))
        ).astype(np.int32)

    return {name: (read(ref_dir, name), read(my_dir, name))
            for name in ("img", "depth", "geo")}


def test_rgb_png_matches(artifacts):
    ref, mine = artifacts["img"]
    assert ref.shape == mine.shape == (*VIS_RES, 3)
    # uint8 quantisation of renders that agree to ~3e-4: off-by-one at most
    assert np.abs(ref - mine).max() <= 1


def test_depth_png_matches_including_normalisation_quirk(artifacts):
    ref, mine = artifacts["depth"]
    assert ref.shape == mine.shape == VIS_RES
    assert np.abs(ref - mine).max() <= 1
    # the quirk is live in this scene: min > 0 so the max-normalised image
    # tops out BELOW 255 — both writers reproduce that, proving neither
    # silently "fixed" the formula to 255/(max-min)
    assert ref.max() < 255


def test_geo_png_matches(artifacts):
    ref, mine = artifacts["geo"]
    assert ref.shape == mine.shape == (*VIS_RES, 3)
    diff = np.abs(ref - mine)
    # sphere-traced surfaces: borderline-tangent rays may flip hit/miss
    # (<=2%, tests/test_phong_reference_exec.py); everything else is tight
    assert (diff > 8).mean() <= 0.03
    assert np.median(diff) <= 1
