"""Reference-checkpoint converter tests (round-4 VERDICT item 2).

The published pretrained models (reference README.md:42) are torch module
checkpoints saved by ``CheckpointIO`` (`model/checkpoints.py:29-41`). No real
checkpoint exists in this environment, so — exactly like test_dpt_convert —
these tests SYNTHESIZE state_dicts with the reference's exact key layout and
shapes, run ``tools/convert_reference_ckpt.py``, and assert:

* value-level forward parity of the converted NeRF MLP against a hand-rolled
  torch implementation of `model/official_nerf.py:60-96`;
* pose / focal / distortion tables and resume scalars survive conversion;
* a converted checkpoint set drives the REAL ``evaluation/eval.py`` and
  ``evaluation/eval_poses.py`` entry points end to end on a disk scene.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_reference_ckpt import (  # noqa: E402
    _stream_of,
    convert_file,
    main as convert_main,
)

from nope_nerf_tpu.training.checkpoints import load_pytree  # noqa: E402

HIDDEN = 64
L_POS, L_DIR = 4, 2
POS_IN = (2 * L_POS + 1) * 3
DIR_IN = (2 * L_DIR + 1) * 3


# ---------------------------------------------------------------------------
# reference-layout synthesis
# ---------------------------------------------------------------------------

def synth_nerf_state(rng, prefix="renderer.model."):
    """Every key of a ``nope_nerf`` wrapper state_dict with the exact
    torch (out, in) Linear shapes (`model/official_nerf.py:20-44`)."""
    def lin(fi, fo):
        return (
            torch.tensor(rng.normal(0, 0.3, (fo, fi)).astype(np.float32)),
            torch.tensor(rng.normal(0, 0.1, (fo,)).astype(np.float32)),
        )

    sd = {}
    dims0 = [POS_IN] + [HIDDEN] * 4
    dims1 = [HIDDEN + POS_IN] + [HIDDEN] * 4
    for slot, i in enumerate((0, 2, 4, 6)):
        w, b = lin(dims0[slot], dims0[slot + 1])
        sd[f"{prefix}layers0.{i}.weight"], sd[f"{prefix}layers0.{i}.bias"] = w, b
        w, b = lin(dims1[slot], dims1[slot + 1])
        sd[f"{prefix}layers1.{i}.weight"], sd[f"{prefix}layers1.{i}.bias"] = w, b
    for name, (fi, fo) in {
        "fc_density": (HIDDEN, 1),
        "fc_feature": (HIDDEN, HIDDEN),
        "rgb_layers.0": (HIDDEN + DIR_IN, HIDDEN // 2),
        "fc_rgb": (HIDDEN // 2, 3),
    }.items():
        w, b = lin(fi, fo)
        sd[f"{prefix}{name}.weight"], sd[f"{prefix}{name}.bias"] = w, b
    return sd


def torch_reference_forward(sd, pts, dirs, occ="softplus", prefix=""):
    """Hand-rolled torch mirror of `model/official_nerf.py:60-96`
    (softplus density, dist_alpha mode, sigmoid rgb)."""
    def enc(x, L):
        out = [x]
        for i in range(L):
            out += [torch.sin(2.0**i * x), torch.cos(2.0**i * x)]
        return torch.cat(out, dim=-1)

    def lin(name, x):
        return F.linear(x, sd[f"{prefix}{name}.weight"],
                        sd[f"{prefix}{name}.bias"])

    pos = enc(pts, L_POS)
    h = pos
    for i in (0, 2, 4, 6):
        h = torch.relu(lin(f"layers0.{i}", h))
    h = torch.cat([h, pos], dim=-1)
    for i in (0, 2, 4, 6):
        h = torch.relu(lin(f"layers1.{i}", h))
    density = lin("fc_density", h)
    density = F.softplus(density) if occ == "softplus" else torch.relu(density)
    feat = lin("fc_feature", h)
    hd = torch.cat([feat, enc(dirs, L_DIR)], dim=-1)
    hd = torch.relu(lin("rgb_layers.0", hd))
    rgb = torch.sigmoid(lin("fc_rgb", hd))
    return rgb, density


def save_reference_ckpts(dirname, rng, n_cams, init_c2w=None,
                         r=None, t=None, fx=1.2, fy=None):
    """Write all four reference stream files, each with the real save layout
    (module state_dict under 'model', an 'optimizer' blob, resume scalars —
    `model/checkpoints.py:29-41`, `train.py:252-259`)."""
    os.makedirs(dirname, exist_ok=True)
    scal = dict(epoch_it=7, it=123)
    nerf_sd = synth_nerf_state(rng)
    torch.save(
        {"model": nerf_sd, "optimizer": {"state": {}, "param_groups": []},
         **scal, "loss_val_best": 0.25, "patient_count": 3,
         "scheduling_start": 5},
        os.path.join(dirname, "model.pt"),
    )
    pose_sd = {
        "r": torch.tensor(
            r if r is not None
            else rng.normal(0, 0.05, (n_cams, 3)).astype(np.float32)),
        "t": torch.tensor(
            t if t is not None
            else rng.normal(0, 0.05, (n_cams, 3)).astype(np.float32)),
    }
    if init_c2w is not None:
        pose_sd["init_c2w"] = torch.tensor(np.asarray(init_c2w, np.float32))
    torch.save(
        {"model": pose_sd, "optimizer": {}, **scal},
        os.path.join(dirname, "model_pose.pt"),
    )
    focal_sd = {"fx": torch.tensor(np.float32(np.sqrt(fx)))}
    if fy is not None:
        focal_sd["fy"] = torch.tensor(np.float32(np.sqrt(fy)))
    torch.save(
        {"model": focal_sd, "optimizer": {}, **scal},
        os.path.join(dirname, "model_focal.pt"),
    )
    torch.save(
        {"model": {
            "global_scales": torch.tensor(
                1.0 + rng.normal(0, 0.1, (n_cams, 1)).astype(np.float32)),
            "global_shifts": torch.tensor(
                rng.normal(0, 0.1, (n_cams, 1)).astype(np.float32)),
        }, "optimizer": {}, **scal},
        os.path.join(dirname, "model_distortion.pt"),
    )
    return nerf_sd


# ---------------------------------------------------------------------------
# unit tests
# ---------------------------------------------------------------------------

class TestConverter:
    def test_stream_name_inference(self):
        assert _stream_of("model.pt") == "model"
        assert _stream_of("/a/b/model_pose.pt") == "model_pose"
        assert _stream_of("model_50000.pt") == "model"  # numbered backup
        assert _stream_of("model_pose_50000.pt") == "model_pose"
        assert _stream_of("model_distortion.pt") == "model_distortion"
        with pytest.raises(ValueError):
            _stream_of("weights.pt")

    def test_nerf_value_parity(self, tmp_path):
        """Converted MLP weights reproduce the hand-rolled torch forward."""
        rng = np.random.default_rng(0)
        sd = save_reference_ckpts(str(tmp_path / "pt"), rng, n_cams=4)
        out = str(tmp_path / "npz")
        convert_main([str(tmp_path / "pt" / "model.pt"), out])
        tree, scalars = load_pytree(os.path.join(out, "model.npz"))
        assert scalars == {"epoch_it": 7, "it": 123, "loss_val_best": 0.25,
                           "patient_count": 3, "scheduling_start": 5}

        pts = rng.normal(0, 1, (64, 3)).astype(np.float32)
        dirs = rng.normal(0, 1, (64, 3)).astype(np.float32)
        t_rgb, t_density = torch_reference_forward(
            sd, torch.tensor(pts), torch.tensor(dirs),
            prefix="renderer.model.")

        from nope_nerf_tpu.models.nerf import apply_nerf

        cfg = {"pos_enc_levels": L_POS, "dir_enc_levels": L_DIR,
               "occ_activation": "softplus", "dist_alpha": True,
               "mlp_bf16": False, "use_pallas_mlp": False}
        params = jax.tree.map(jnp.asarray, tree["params"])
        j_rgb, j_density = apply_nerf(params, jnp.asarray(pts),
                                      jnp.asarray(dirs), cfg)
        np.testing.assert_allclose(np.asarray(j_rgb), t_rgb.numpy(),
                                   rtol=1e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(j_density), t_density.numpy(),
                                   rtol=1e-5, atol=2e-5)

    def test_pose_focal_distortion_values(self, tmp_path):
        rng = np.random.default_rng(1)
        init = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        init[:, :3, 3] = rng.normal(0, 1, (3, 3))
        save_reference_ckpts(str(tmp_path / "pt"), rng, n_cams=3,
                             init_c2w=init, fx=2.5, fy=1.8)
        out = str(tmp_path / "npz")
        convert_main([str(tmp_path / "pt"), out])

        pose, sc = load_pytree(os.path.join(out, "model_pose.npz"))
        assert pose["params"]["r"].shape == (3, 3)
        assert pose["params"]["t"].shape == (3, 3)
        np.testing.assert_allclose(pose["init_c2w"], init)
        assert sc["epoch_it"] == 7 and sc["it"] == 123

        focal, _ = load_pytree(os.path.join(out, "model_focal.npz"))
        from nope_nerf_tpu.models.intrinsics import focal_fxfy

        fxfy = focal_fxfy(jax.tree.map(jnp.asarray, focal["params"]),
                          fx_only=False, order=2)
        np.testing.assert_allclose(np.asarray(fxfy), [2.5, 1.8], rtol=1e-5)

        dist, _ = load_pytree(os.path.join(out, "model_distortion.npz"))
        assert dist["params"]["scales"].shape == (3, 1)
        assert dist["params"]["shifts"].shape == (3, 1)

    def test_fx_only_and_bare_mlp_prefix(self, tmp_path):
        """fx-only focal and a bare OfficialStaticNerf state_dict (no
        renderer.model. prefix) both convert."""
        rng = np.random.default_rng(2)
        torch.save({"model": {"fx": torch.tensor(np.float32(1.5))}, "it": 1},
                   str(tmp_path / "model_focal.pt"))
        convert_file(str(tmp_path / "model_focal.pt"), str(tmp_path))
        focal, _ = load_pytree(str(tmp_path / "model_focal.npz"))
        assert set(focal["params"]) == {"fx"}

        sd = synth_nerf_state(rng, prefix="")
        torch.save({"model": sd}, str(tmp_path / "model.pt"))
        convert_file(str(tmp_path / "model.pt"), str(tmp_path))
        tree, _ = load_pytree(str(tmp_path / "model.npz"))
        assert tree["params"]["trunk0_0"]["w"].shape == (POS_IN, HIDDEN)

    def test_depth_estimator_subtree_dropped(self, tmp_path):
        rng = np.random.default_rng(3)
        sd = synth_nerf_state(rng)
        sd["depth_estimator.pretrained.model.cls_token"] = torch.zeros(1, 1, 8)
        torch.save({"model": sd}, str(tmp_path / "model.pt"))
        convert_file(str(tmp_path / "model.pt"), str(tmp_path))
        tree, _ = load_pytree(str(tmp_path / "model.npz"))
        assert "depth_estimator" not in str(sorted(tree["params"]))


# ---------------------------------------------------------------------------
# end-to-end: converted checkpoints drive the real eval CLIs
# ---------------------------------------------------------------------------

class TestHardening:
    """Round-5 VERDICT item 6: numbered-backup scan + --strict + loud
    focal-shape errors + corrupted-stream behaviour."""

    def test_numbered_backup_directory_scan(self, tmp_path):
        """A directory holding ONLY numbered backups (`train.py:262-271`
        backup_every layout) converts from the highest-numbered set."""
        rng = np.random.default_rng(0)
        d = tmp_path / "ck"
        save_reference_ckpts(str(d), rng, n_cams=3)
        # turn the live files into two generations of numbered backups
        for s in ("model", "model_pose", "model_focal", "model_distortion"):
            src = d / f"{s}.pt"
            ck = torch.load(str(src), map_location="cpu",
                            weights_only=False)
            torch.save(ck, str(d / f"{s}_5000.pt"))
            ck["it"] = 999
            torch.save(ck, str(d / f"{s}_10000.pt"))
            os.remove(str(src))
        out = tmp_path / "npz"
        convert_main([str(d), str(out)])
        tree, scal = load_pytree(str(out / "model_pose.npz"))
        assert scal["it"] == 999  # the HIGHEST backup won
        # --step picks an exact generation
        out2 = tmp_path / "npz2"
        convert_main([str(d), str(out2), "--step", "5000"])
        _, scal2 = load_pytree(str(out2 / "model_pose.npz"))
        assert scal2["it"] == 123
        # asking for a missing step errors loudly
        with pytest.raises(SystemExit, match="step-7777"):
            convert_main([str(d), str(tmp_path / "npz3"), "--step", "7777"])

    def test_strict_mode_errors_on_unknown_keys(self, tmp_path):
        rng = np.random.default_rng(1)
        d = tmp_path / "ck"
        save_reference_ckpts(str(d), rng, n_cams=3)
        ck = torch.load(str(d / "model.pt"), map_location="cpu",
                        weights_only=False)
        ck["model"]["renderer.model.mystery.weight"] = torch.zeros(3)
        torch.save(ck, str(d / "model.pt"))
        out = tmp_path / "npz"
        with pytest.raises(ValueError, match="strict.*mystery"):
            convert_main([str(d), str(out), "--strict"])
        # non-strict converts with a warning (and frozen DPT subtrees are
        # never an error even under --strict)
        convert_main([str(d), str(out)])
        ck["model"]["depth_estimator.blocks.0.weight"] = torch.zeros(3)
        del ck["model"]["renderer.model.mystery.weight"]
        torch.save(ck, str(d / "model.pt"))
        convert_main([str(d), str(tmp_path / "npz4"), "--strict"])

    def test_focal_shape_error_is_loud(self, tmp_path):
        p = tmp_path / "model_focal.pt"
        torch.save({"model": {"fx": torch.zeros(4)}, "optimizer": {}},
                   str(p))
        with pytest.raises(ValueError, match="focal param 'fx' has 4"):
            convert_file(str(p), str(tmp_path))

    def test_corrupted_stream_fails_loudly_not_partially(self, tmp_path):
        """A truncated .pt must raise, and the other (healthy) streams of
        the directory must still have been converted before the failure."""
        rng = np.random.default_rng(2)
        d = tmp_path / "ck"
        save_reference_ckpts(str(d), rng, n_cams=3)
        with open(str(d / "model_distortion.pt"), "wb") as f:
            f.write(b"\x00corrupted")
        out = tmp_path / "npz"
        with pytest.raises(Exception):
            convert_main([str(d), str(out)])
        # streams converted before the corrupt one are on disk and loadable
        tree, _ = load_pytree(str(out / "model.npz"))
        assert "params" in tree
        assert not os.path.exists(str(out / "model_distortion.npz"))


@pytest.fixture(scope="module")
def disk_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("refckpt_data")
    out = str(root / "synth")
    sys.argv = ["x", out, "--frames", "5", "--height", "24", "--width", "32"]
    from tools.make_synthetic_dataset import main as gen

    gen()
    return out


class TestEndToEnd:
    def _cfg(self, disk_scene, out_dir):
        from nope_nerf_tpu.config import DEFAULT_CONFIG, load_config, \
            update_recursive

        cfg = load_config(DEFAULT_CONFIG, default_path=None)
        update_recursive(cfg, {
            "dataloading": {"path": os.path.dirname(disk_scene),
                            "scene": [os.path.basename(disk_scene)],
                            "customized_poses": False,
                            "resize_factor": None},
            "model": {"hidden_dim": HIDDEN, "pos_enc_levels": L_POS,
                      "dir_enc_levels": L_DIR},
            "rendering": {"num_points": 16, "depth_range": [0.5, 6.0]},
            "pose": {"learn_pose": True, "init_pose": True,
                     "learn_focal": True, "fx_only": False,
                     "focal_order": 2},
            "training": {"out_dir": out_dir},
            "extract_images": {"resolution": [24, 32],
                               "model_file": "model.npz",
                               "model_file_pose": "model_pose.npz",
                               "model_file_focal": "model_focal.npz"},
            "eval_pose": {"opt_pose_epoch": 2, "n_points": 64,
                          "init_method": "pre", "type_to_eval": "eval"},
            "tpu": {"use_pallas_mlp": False, "mlp_bf16": False},
        })
        return cfg

    def test_converted_ckpts_drive_eval_clis(self, disk_scene, tmp_path):
        """The VERDICT-r3 'done' bar: synthesized reference checkpoints ->
        convert -> evaluation/eval.py + evaluation/eval_poses.py run the full
        protocol. Pose stream is zeros-on-init_c2w (= the scene's COLMAP
        poses), so eval_poses must report ATE ~ 0 — a value-level assertion
        that the converted tables flow through unchanged."""
        rng = np.random.default_rng(4)
        out_dir = str(tmp_path / "out")
        os.makedirs(out_dir, exist_ok=True)

        from nope_nerf_tpu.dataloading.scene import get_scene

        cfg = self._cfg(disk_scene, out_dir)
        scene = get_scene(cfg, mode="train")
        fx, fy = float(scene.K[0, 0]), float(scene.K[1, 1])
        save_reference_ckpts(
            str(tmp_path / "pt"), rng, n_cams=scene.N_imgs,
            init_c2w=scene.c2ws,
            r=np.zeros((scene.N_imgs, 3), np.float32),
            t=np.zeros((scene.N_imgs, 3), np.float32),
            fx=fx, fy=-fy,  # reference inits focal as [K00, -K11] (train.py:136)
        )
        convert_main([str(tmp_path / "pt"), out_dir])

        import importlib

        eval_poses_mod = importlib.import_module("evaluation.eval_poses")
        stats = eval_poses_mod.main(self._cfg(disk_scene, out_dir))
        assert stats["ate"] < 1e-5, stats

        eval_mod = importlib.import_module("evaluation.eval")
        res = eval_mod.main(self._cfg(disk_scene, out_dir))
        assert np.isfinite(res["psnr"]) and np.isfinite(res["ssim"])
