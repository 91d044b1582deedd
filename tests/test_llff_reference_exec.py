"""Executed A/B of the LLFF data layer against the reference.

dataloading/llff.py re-implements the reference's on-disk pipeline
(`dataloading/common.py:59-238`): poses_bounds parsing, image loading,
border-crop preprocessing, pose recentering and spherification. These tests
run the reference's OWN functions (imageio/cv2/torch all present in this
image) on the same synthesized on-disk scene and assert agreement — the
golden-value tests in test_data_eval.py pin our outputs; these pin them to
the executed reference.
"""
import os
import shutil
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_exec as rx  # noqa: E402

from nope_nerf_tpu.dataloading import llff  # noqa: E402

pytestmark = pytest.mark.skipif(
    not rx.reference_available(), reason="/root/reference not present"
)


@pytest.fixture(scope="module")
def ref_common():
    # the reference's dataloading/__init__.py drags in torchvision (absent
    # in this image) via dataloading.dataloading; load common.py by file
    # path instead — its own imports (imageio/cv2/PIL/torch) all exist
    import importlib.util

    rx.load_reference()
    path = os.path.join(rx.REFERENCE_DIR, "dataloading", "common.py")
    spec = importlib.util.spec_from_file_location("ref_dl_common", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # the reference passes imageio's legacy ignoregamma=True for pngs
    # (`dataloading/common.py:135`); imageio >= 2.16 removed it (the
    # reference pins an older imageio in environment.yaml:20). Dropping the
    # kwarg preserves behavior: it suppressed gAMA-chunk correction, and
    # modern imageio never applies it
    import types

    real_imread = mod.imageio.imread

    def _imread(f, **kw):
        kw.pop("ignoregamma", None)
        return real_imread(f, **kw)

    mod.imageio = types.SimpleNamespace(imread=_imread)
    return mod


@pytest.fixture(scope="module")
def disk_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("llff_ab")
    out = str(root / "scene")
    sys.argv = ["x", out, "--frames", "6", "--height", "24", "--width", "32"]
    from tools.make_synthetic_dataset import main as gen

    gen()
    return out


class TestLoadData:
    def test_load_data_matches(self, ref_common, disk_scene):
        ref = ref_common._load_data(disk_scene, factor=None,
                                    load_colmap_poses=True)
        r_poses, r_bds, r_imgs, r_names, r_crop, r_focal = ref
        ours = llff.load_llff_data(disk_scene, factor=None,
                                   load_colmap_poses=True)
        np.testing.assert_allclose(ours["poses"], r_poses, rtol=1e-7)
        np.testing.assert_allclose(ours["bds"], r_bds, rtol=1e-7)
        # reference stacks images (H, W, 3, N); ours (N, H, W, 3)
        np.testing.assert_allclose(
            ours["imgs"], np.moveaxis(r_imgs, -1, 0), rtol=0, atol=1e-7)
        assert ours["img_names"] == r_names
        assert ours["crop_ratio"] == r_crop
        assert ours["focal_crop_factor"] == r_focal

    def test_crop_preprocessing_matches(self, ref_common, disk_scene,
                                        tmp_path_factory):
        """crop_size path: both sides write images_cropped from fresh
        copies of the scene; pixels and crop factors must agree
        (`dataloading/common.py:67-85`)."""
        a = str(tmp_path_factory.mktemp("crop_ref") / "scene")
        b = str(tmp_path_factory.mktemp("crop_ours") / "scene")
        shutil.copytree(disk_scene, a)
        shutil.copytree(disk_scene, b)
        ref = ref_common._load_data(a, factor=None, crop_size=3,
                                    load_colmap_poses=True)
        r_poses, r_bds, r_imgs, r_names, r_crop, r_focal = ref
        ours = llff.load_llff_data(b, factor=None, crop_size=3,
                                   load_colmap_poses=True)
        assert ours["crop_ratio"] == r_crop
        assert ours["focal_crop_factor"] == r_focal
        np.testing.assert_allclose(
            ours["imgs"], np.moveaxis(r_imgs, -1, 0), rtol=0, atol=1e-7)


def _dataset_pose_chain(poses, bds):
    """The axis-flip + bd rescale the reference applies before recentering
    (`dataloading/dataset.py:56-64`), in plain numpy on both sides."""
    poses = np.concatenate(
        [poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1)
    poses = np.moveaxis(poses, -1, 0).astype(np.float32)
    bds = np.moveaxis(bds, -1, 0).astype(np.float32)
    sc = 1.0 / (bds.min() * 0.75)
    poses[:, :3, 3] *= sc
    bds = bds * sc
    return poses, bds


class TestPoseMath:
    def test_recenter_matches(self, ref_common, disk_scene):
        ours = llff.load_llff_data(disk_scene, factor=None,
                                   load_colmap_poses=True)
        poses, bds = _dataset_pose_chain(ours["poses"], ours["bds"])
        ref_rec = ref_common.recenter_poses(poses.copy())
        our_rec = llff.recenter_poses(poses.copy())
        np.testing.assert_allclose(our_rec, ref_rec, rtol=1e-4, atol=1e-5)

    def test_spherify_matches(self, ref_common, disk_scene):
        ours = llff.load_llff_data(disk_scene, factor=None,
                                   load_colmap_poses=True)
        poses, bds = _dataset_pose_chain(ours["poses"], ours["bds"])
        poses = llff.recenter_poses(poses)
        r_poses, r_new, r_bds = ref_common.spherify_poses(poses.copy(),
                                                          bds.copy())
        o_poses, o_new, o_bds = llff.spherify_poses(poses.copy(),
                                                    bds.copy())
        np.testing.assert_allclose(o_poses, r_poses, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(o_new, r_new, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(o_bds, r_bds, rtol=1e-5)
