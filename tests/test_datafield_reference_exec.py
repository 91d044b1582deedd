"""Executed A/B of the DataField scene container against the reference.

``dataloading/scene.py``'s SceneData mirrors the reference DataField
(`dataloading/dataset.py:13-230`): the pose chain, K construction,
train/test split, per-mode frame selection, DPT-prior loading, the
load_field batch dict, and the reference-frame sampler for the pair losses.
These tests construct the reference's OWN DataField on the same synthesized
on-disk scene (dataset.py loaded by file path — its package __init__ drags
torchvision, absent here) and assert every derived quantity matches,
including an exact ref-sampling stream under a shared seeded stdlib
``random`` (both sides draw ``randint(1, min(random_ref, N-idx-1))``,
`dataset.py:168-175`).
"""
import os
import random
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_exec as rx  # noqa: E402

from nope_nerf_tpu.dataloading.scene import SceneData  # noqa: E402

pytestmark = pytest.mark.skipif(
    not rx.reference_available(), reason="/root/reference not present"
)

FRAMES = 10
SAMPLE_RATE = 4  # 10 frames -> i_test [2, 6], i_train the other 8


@pytest.fixture(scope="module")
def disk_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("datafield_ab")
    out = str(root / "scene")
    sys.argv = ["x", out, "--frames", str(FRAMES), "--height", "24",
                "--width", "32"]
    from tools.make_synthetic_dataset import main as gen

    gen()
    return os.path.dirname(out)


def _ref_field(disk_scene, mode):
    _, dataset = rx.load_reference_dataset_module()
    return dataset.DataField(
        model_path=disk_scene, scene_name=["scene"], mode=mode,
        with_camera=True, load_ref_img=True, resize_factor=None,
        random_ref=1, load_colmap_poses=True, sample_rate=SAMPLE_RATE,
    )


def _our_scene(disk_scene, mode):
    return SceneData(
        path=disk_scene, scene_name=["scene"], mode=mode,
        resize_factor=None, random_ref=1, load_colmap_poses=True,
        sample_rate=SAMPLE_RATE,
    )


class TestDataFieldParity:
    @pytest.mark.parametrize("mode", ["train", "eval", "all"])
    def test_splits_images_poses_match(self, disk_scene, mode):
        ref = _ref_field(disk_scene, mode)
        ours = _our_scene(disk_scene, mode)

        np.testing.assert_array_equal(ours.i_train, ref.i_train)
        np.testing.assert_array_equal(ours.i_test, ref.i_test)
        assert ours.img_list == ref.img_list
        assert (ours.N_imgs, ours.N_imgs_train, ours.N_imgs_test) == (
            ref.N_imgs, ref.N_imgs_train, ref.N_imgs_test)
        assert (ours.H, ours.W) == (ref.H, ref.W)
        np.testing.assert_allclose(ours.focal, ref.focal, rtol=1e-6)
        np.testing.assert_allclose(ours.K, ref.K, rtol=1e-6)
        # reference imgs are (N, 3, H, W) (`dataset.py:80-81`); ours NHWC
        np.testing.assert_allclose(
            ours.imgs.transpose(0, 3, 1, 2), ref.imgs, rtol=0, atol=1e-7)
        np.testing.assert_allclose(
            ours.c2ws, np.asarray(ref.c2ws), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            ours.c2ws_colmap, np.asarray(ref.c2ws_colmap), rtol=1e-5,
            atol=1e-6)
        # DPT priors load for the TRAIN list in every mode
        # (`dataset.py:147-148`)
        np.testing.assert_allclose(ours.dpt_depth, np.asarray(ref.dpt_depth),
                                   rtol=0, atol=1e-7)

    def test_load_field_batch_dict(self, disk_scene):
        """The per-frame batch the reference's DataLoader collates
        (`dataset.py:205-230`): img/dpt/ref pair/camera entries."""
        ref = _ref_field(disk_scene, "train")
        ours = _our_scene(disk_scene, "train")
        random.seed(123)
        data = ref.load_field(input_idx_img=2)
        ref_idx = int(data["ref_idxs"])

        np.testing.assert_allclose(
            ours.imgs[2].transpose(2, 0, 1), data[None], atol=1e-7)
        np.testing.assert_allclose(ours.dpt_depth[2], data["dpt"], atol=1e-7)
        np.testing.assert_allclose(
            ours.imgs[ref_idx].transpose(2, 0, 1), data["ref_imgs"],
            atol=1e-7)
        np.testing.assert_allclose(
            ours.dpt_depth[ref_idx], data["ref_dpts"], atol=1e-7)
        np.testing.assert_allclose(ours.K, data["camera_mat"], rtol=1e-6)
        np.testing.assert_allclose(ours.scale_mat, data["scale_mat"],
                                   rtol=0, atol=0)

    def test_ref_sampling_stream_matches(self, disk_scene):
        """Exact draw-stream parity: both samplers consume stdlib random
        identically, so a shared seed must give identical ref_idx sequences
        (incl. the last-frame backwards branch, which draws nothing)."""
        ref = _ref_field(disk_scene, "train")
        ours = _our_scene(disk_scene, "train")
        N = ref.N_imgs
        idx_seq = [i % N for i in range(200)]

        random.seed(7)
        ref_stream = []
        for i in idx_seq:
            d = {}
            ref.load_ref_img(i, d)
            ref_stream.append(int(d["ref_idxs"]))

        rng = random.Random()
        rng.seed(7)
        my_stream = [ours.sample_ref_idx(i, rng) for i in idx_seq]
        assert my_stream == ref_stream
        # the last frame pairs backwards deterministically
        assert ours.sample_ref_idx(N - 1, rng) == N - 2
        # support sanity: every drawn ref is within random_ref of its idx
        assert all(0 < r - i <= 1 for i, r in zip(idx_seq, my_stream)
                   if i != N - 1)
