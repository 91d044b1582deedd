"""Executed A/B of the checkpoint migration chain, reference writer included.

tests/test_reference_ckpt_convert.py drives the converter from checkpoints
synthesized with raw ``torch.save`` in the reference's LAYOUT; these tests
close the last gap by having the reference's OWN ``CheckpointIO``
(`model/checkpoints.py:29-41`) write all four streams exactly as
`train.py:252-259` does — real ``nope_nerf`` wrapper prefixes, optimizer
state, resume scalars — then running ``tools/convert_reference_ckpt.py``
over the directory and asserting the npz params equal the in-memory
extraction of the very same modules.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_exec as rx  # noqa: E402

from convert_reference_ckpt import main as convert_main  # noqa: E402

from nope_nerf_tpu.training.checkpoints import load_pytree  # noqa: E402
from nope_nerf_tpu.utils.synthetic import SyntheticScene, tiny_config  # noqa: E402

pytestmark = pytest.mark.skipif(
    not rx.reference_available(), reason="/root/reference not present"
)


@pytest.fixture(scope="module")
def saved(tmp_path_factory):
    scene = SyntheticScene(n_frames=3, hw=(16, 20), num_points=16)
    cfg = tiny_config(scene, str(tmp_path_factory.mktemp("ckptio")),
                      n_training_points=64, num_points=16)
    cfg["model"].update({"hidden_dim": 64, "pos_enc_levels": 10,
                         "dir_enc_levels": 4})
    cfg["pose"]["learn_focal"] = True
    cfg["_num_cams"] = scene.N_imgs
    stack = rx.build_reference_stack(cfg, scene, seed=11, perturb=0.02)

    ref = rx.load_reference()
    import model.checkpoints as ref_ckpt

    out_dir = str(tmp_path_factory.mktemp("ref_ckpts"))
    opt, opt_pose, opt_focal, opt_dist = stack.optimizers
    # the exact four-stream save of `train.py:61,100,118,141,252-259`
    io = ref_ckpt.CheckpointIO(out_dir, model=stack.net, optimizer=opt)
    io.save("model.pt", epoch_it=3, it=42, loss_val_best=0.25,
            scheduling_start=10000, patient_count=1)
    ref_ckpt.CheckpointIO(out_dir, model=stack.pose_net,
                          optimizer=opt_pose).save("model_pose.pt",
                                                   epoch_it=3, it=42)
    ref_ckpt.CheckpointIO(out_dir, model=stack.focal_net,
                          optimizer=opt_focal).save("model_focal.pt",
                                                    epoch_it=3, it=42)
    ref_ckpt.CheckpointIO(out_dir, model=stack.dist_net,
                          optimizer=opt_dist).save("model_distortion.pt",
                                                   epoch_it=3, it=42)
    del ref  # namespace unused beyond import
    return cfg, scene, stack, out_dir


class TestReferenceCheckpointIO:
    def test_converted_streams_equal_inmemory_extraction(self, saved,
                                                         tmp_path):
        cfg, scene, stack, out_dir = saved
        conv = str(tmp_path / "conv")
        convert_main([out_dir, conv])

        want = rx.stack_params_to_jax(stack, cfg, scene)
        streams = {
            "model.npz": ("nerf",),
            "model_pose.npz": ("pose",),
            "model_focal.npz": ("focal",),
            "model_distortion.npz": ("distortion",),
        }
        for fname, (group,) in streams.items():
            tree, scalars = load_pytree(os.path.join(conv, fname))
            got = tree["params"]
            exp = want[group]
            flat_g = jax_flat(got)
            flat_e = jax_flat(exp)
            assert set(flat_g) == set(flat_e), (fname, group)
            for k in flat_e:
                np.testing.assert_array_equal(
                    flat_g[k], flat_e[k],
                    err_msg=f"{fname}:{k} diverged through the reference's "
                            f"own CheckpointIO.save")
            assert scalars.get("it") == 42, fname
            assert scalars.get("epoch_it") == 3, fname

    def test_resume_scalars_survive(self, saved, tmp_path):
        cfg, scene, stack, out_dir = saved
        conv = str(tmp_path / "conv2")
        convert_main([out_dir, conv])
        _, scalars = load_pytree(os.path.join(conv, "model.npz"))
        assert scalars.get("loss_val_best") == pytest.approx(0.25)
        assert scalars.get("scheduling_start") == 10000
        assert scalars.get("patient_count") == 1


def jax_flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(jax_flat(v, key))
        else:
            out[key] = np.asarray(v)
    return out
