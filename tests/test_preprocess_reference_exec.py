"""Executed A/B of the reference's ``preprocess/dpt_depth.py`` CLI — the
last of the six reference CLIs without executed-oracle evidence.

The reference CLI (`preprocess/dpt_depth.py:13-47`) builds the full stack
(``get_model`` with a real ``DPTDepthModel`` — executable since
`tools/timm_stub.py`), iterates ``get_dataloader(cfg, mode='all')`` whose
``use_DPT`` path applies the ``ResizeImage_mvs`` transform (keep-aspect
'minimal' resize to 32-multiples + (x-.5)/.5, `dataloading/dataloading.py:
80-100`), runs the frozen depth net per frame and writes
``depth_<name>.npz`` (``pred`` (1,H,W)) + ``<name>.png`` previews.

Our ``preprocess/dpt_depth.py`` runs on the SAME synthesized scene with the
SAME weights migrated through ``tools/convert_dpt.py`` and must reproduce
every artifact: file names, npz shapes/values, and the reference's png
normalisation (scaled by max AFTER subtracting min).

This A/B executed first contact caught a real divergence: our transform
used ``min(384/H, 384/W)`` while the reference's 'minimal' method picks the
per-axis scale CLOSEST TO 1 (`DPT/dpt/transforms.py:125-132`) — a different
output resolution for any image larger than 384 (every production scene).
"""
import os
import sys

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_exec as rx  # noqa: E402
from convert_dpt import convert  # noqa: E402

pytestmark = pytest.mark.skipif(
    not rx.reference_available(), reason="/root/reference not present")

FRAMES, H, W = 3, 24, 32
SCALE, SHIFT = 0.000305, 0.1378


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("preprocess_ab")
    out = str(root / "scene")
    old_argv = sys.argv
    sys.argv = ["x", out, "--frames", str(FRAMES), "--height", str(H),
                "--width", str(W)]
    try:
        from tools.make_synthetic_dataset import main as gen

        gen()
    finally:
        sys.argv = old_argv

    # synthetic weights through the reference's own module tree
    dpt_models = rx.load_reference_dpt()
    torch.manual_seed(0)
    model = dpt_models.DPTDepthModel(
        backbone="vitb_rn50_384", non_negative=True,
        scale=SCALE, shift=SHIFT, invert=True, freeze=True)
    gen_t = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0.0, 0.05, generator=gen_t)
        model.scratch.output_conv[4].bias.fill_(0.3)

    pt_path = str(root / "dpt_synth.pt")
    torch.save(model.state_dict(), pt_path)

    # the converter CLI path: .pt -> npz pytree
    npz_path = str(root / "dpt_synth.npz")
    params = convert({k: v.numpy() for k, v in model.state_dict().items()})
    from nope_nerf_tpu.training.checkpoints import save_pytree

    save_pytree(npz_path, {"params": params})

    return {
        "data_dir": os.path.dirname(out),
        "root": str(root),
        "pt": pt_path,
        "npz": npz_path,
    }


def _overrides(setup, depth_path, depth_net):
    return {
        "dataloading": {
            "path": setup["data_dir"],
            "scene": ["scene"],
            "n_workers": 0,
            "sample_rate": 2,
            "depth_net": depth_net,
        },
        "depth": {"type": "DPT", "path": depth_path},
        "training": {"out_dir": os.path.join(setup["root"], "out"),
                     "mode": "all"},
    }


def test_preprocess_cli_matches(setup, tmp_path):
    # ---- reference CLI on the .pt ----------------------------------------
    _, dl = rx.load_reference_train()
    ref_yaml = str(tmp_path / "ref.yaml")
    with open(ref_yaml, "w") as f:
        yaml.safe_dump(_overrides(setup, setup["pt"], "dpt"), f)
    ref_cfg = dl.load_config(
        ref_yaml, os.path.join(rx.REFERENCE_DIR, "configs", "default.yaml"))
    ref_dir = str(tmp_path / "ref_out")
    ref_files = rx.run_reference_preprocess_cli(ref_cfg, ref_dir)

    # ---- our CLI on the converted npz ------------------------------------
    from nope_nerf_tpu.config import DEFAULT_CONFIG, load_config

    ours_yaml = str(tmp_path / "ours.yaml")
    with open(ours_yaml, "w") as f:
        yaml.safe_dump(_overrides(setup, setup["npz"], "dpt_tpu"), f)
    our_cfg = load_config(ours_yaml, DEFAULT_CONFIG)

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "preprocess"))
    try:
        import dpt_depth as our_cli
    finally:
        sys.path.pop(0)
    our_cli.main(our_cfg)
    our_dir = os.path.join(setup["data_dir"], "scene", "dpt_tpu")

    # ---- artifact-tree A/B ------------------------------------------------
    assert sorted(os.listdir(our_dir)) == ref_files
    npzs = [f for f in ref_files if f.endswith(".npz")]
    assert len(npzs) == FRAMES

    import imageio.v2 as imageio

    for f in npzs:
        want = np.load(os.path.join(ref_dir, f))["pred"]
        got = np.load(os.path.join(our_dir, f))["pred"]
        # the reference saves the torch (1, H', W') tensor; H', W' are the
        # ResizeImage_mvs output dims — shape equality pins the 'minimal'
        # resize semantics
        assert got.shape == want.shape
        assert want.std() > 1e-5, "constant reference depth; weak fixture"
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)

    for f in ref_files:
        if not f.endswith(".png"):
            continue
        want = imageio.imread(os.path.join(ref_dir, f))
        got = imageio.imread(os.path.join(our_dir, f))
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
