"""Executed A/B of the NVS extraction loop against the reference.

``vis/render.py`` renders each novel pose and writes the per-frame artifact
tree + videos; the reference delegates the per-frame work to
``Extract_Images.generate_images`` (`model/extracting_images.py:38-124`):
eval-mode chunked render, raw-depth npy dump, per-frame-normalised depth
png, and (behind ``output_geo``) the phong geometry image placed by integer
pixel locations. These tests run the reference's own ``Extract_Images``
end-to-end (artifacts on disk included) against our
``vis.render.render_novel_views`` on a shared level-set-crossing field.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_exec as rx  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from nope_nerf_tpu.training.trainer import make_render_cfg  # noqa: E402
from nope_nerf_tpu.utils.synthetic import SyntheticScene, tiny_config  # noqa: E402
from vis.render import render_novel_views  # noqa: E402

pytestmark = pytest.mark.skipif(
    not rx.reference_available(), reason="/root/reference not present"
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    scene = SyntheticScene(n_frames=3, hw=(16, 20), num_points=16)
    cfg = tiny_config(scene, str(tmp_path_factory.mktemp("extract")),
                      n_training_points=64, num_points=24)
    cfg["model"].update({"hidden_dim": 64, "pos_enc_levels": 10,
                         "dir_enc_levels": 4})
    cfg["extract_images"]["resolution"] = [scene.H, scene.W]
    cfg["rendering"]["radius"] = 4.0
    cfg["_num_cams"] = scene.N_imgs
    stack = rx.build_reference_stack(cfg, scene, seed=7)
    # the geo pass sphere-traces the tau=0.5 level set; rescale the density
    # head so the set is actually crossed (same probe as the phong A/B)
    field = stack.field
    rng = np.random.default_rng(0)
    pts = torch.tensor(rng.uniform(-3, 3, (2048, 3)).astype(np.float32))
    with torch.no_grad():
        field.fc_density.weight.mul_(60.0)
        lo, hi = -10.0, 10.0
        for _ in range(40):
            mid = 0.5 * (lo + hi)
            field.fc_density.bias.add_(mid)
            occ = field(pts.unsqueeze(0), only_occupancy=True)
            field.fc_density.bias.sub_(mid)
            if float((occ > 0.5).float().mean()) > 0.35:
                hi = mid
            else:
                lo = mid
        field.fc_density.bias.add_(hi)
    jparams = jax.tree.map(jnp.asarray,
                           rx.stack_params_to_jax(stack, cfg)["nerf"])
    c2w = np.asarray(scene.c2ws[1], np.float32)
    return scene, cfg, stack, jparams, c2w


def _reference_extract(setup, render_dir):
    scene, cfg, stack, jparams, c2w = setup
    rx.load_reference()
    import model.extracting_images as ref_extract

    gen = ref_extract.Extract_Images(
        stack.renderer, cfg, use_learnt_poses=True, use_learnt_focal=True,
        device=torch.device("cpu"), render_type="nope_nerf",
    )
    data = {
        "img.idx": torch.tensor(0),
        "img.camera_mat": torch.tensor(
            np.asarray(scene.K, np.float32)).unsqueeze(0),
        "img.scale_mat": torch.tensor(
            np.asarray(scene.scale_mat, np.float32)).unsqueeze(0),
    }
    fxfy = [float(scene.K[0, 0]), float(-scene.K[1, 1])]
    c2ws = [torch.tensor(c2w)]
    return gen.generate_images(data, render_dir, c2ws, fxfy, it=0,
                               output_geo=True)


class TestExtractImagesParity:
    def test_artifacts_and_outputs_match(self, setup, tmp_path):
        scene, cfg, stack, jparams, c2w = setup
        ref_dir, my_dir = str(tmp_path / "ref"), str(tmp_path / "mine")
        os.makedirs(ref_dir)
        ref_out = _reference_extract(setup, ref_dir)

        imgs, depths, geos = render_novel_views(
            jparams, scene.K, c2w[None], make_render_cfg(cfg),
            (scene.H, scene.W), my_dir, output_geo=True, rad=4.0,
        )

        # rgb image: identical up to the 1-count truncation edge
        diff = np.abs(imgs[0].astype(int) - ref_out["img"].astype(int))
        assert diff.max() <= 1 and (diff == 0).mean() > 0.99
        # raw depth npy (reference `extracting_images.py:112-113` saves
        # BEFORE normalisation; ours depth_out/0.npy)
        d_ref = np.load(os.path.join(ref_dir, "depth_out", "0.npy"))
        d_my = np.load(os.path.join(my_dir, "depth_out", "0.npy"))
        np.testing.assert_allclose(d_my, d_ref, rtol=2e-4, atol=2e-5)
        # normalised depth png payloads
        ddiff = np.abs(depths[0].astype(int) - ref_out["depth"].astype(int))
        assert ddiff.max() <= 1 and (ddiff == 0).mean() > 0.99
        # phong geo image: the reference places rows by integer pixel
        # locations (`extracting_images.py:90-96`) — must equal our reshape;
        # allow <=2% borderline-tangent pixel flips (see the phong A/B)
        row_same = np.all(geos[0] == ref_out["geo"], axis=-1)
        assert row_same.mean() >= 0.98
        assert (ref_out["geo"] != 255).any(), "no shaded geo pixels: vacuous"

        # both sides wrote the same artifact tree
        for sub, name in (("img_out", "0000.png"), ("depth_out", "0000.png"),
                          ("depth_out", "0.npy"), ("geo_out", "0000.png")):
            assert os.path.exists(os.path.join(ref_dir, sub, name)), (sub, name)
            assert os.path.exists(os.path.join(my_dir, sub, name)), (sub, name)
