"""LPIPS weight-converter fixture + torch parity (VERDICT r1 item 9).

Mirror of the DPT converter test: synthesize state dicts with the exact
torchvision-vgg16.features / lpips linear-head layouts, run the converter,
load through the production loader and assert the full metric agrees with a
hand-rolled torch LPIPS (the reference computes eval LPIPS with the lpips
pip package, `evaluation/eval.py:157-169`).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import sys, os  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_lpips import CONV_IDX, convert  # noqa: E402

from nope_nerf_tpu.models import lpips as jlp  # noqa: E402

# (cout, cin) per conv of vgg16.features, in tap order
_VGG_CONVS = [
    (64, 3), (64, 64),
    (128, 64), (128, 128),
    (256, 128), (256, 256), (256, 256),
    (512, 256), (512, 512), (512, 512),
    (512, 512), (512, 512), (512, 512),
]
_TAP_CH = [64, 128, 256, 512, 512]


def synth_dicts(rng):
    vgg_sd = {}
    for idx, (cout, cin) in zip(CONV_IDX, _VGG_CONVS):
        vgg_sd[f"{idx}.weight"] = rng.normal(
            size=(cout, cin, 3, 3)).astype(np.float32) * 0.08
        vgg_sd[f"{idx}.bias"] = rng.normal(size=(cout,)).astype(np.float32) * 0.1
    lin_sd = {
        f"lin{i}.model.1.weight": np.abs(
            rng.normal(size=(1, c, 1, 1))
        ).astype(np.float32)
        for i, c in enumerate(_TAP_CH)
    }
    return vgg_sd, lin_sd


def _torch_lpips(vgg_sd, lin_sd, a, b):
    """Reference-faithful torch LPIPS (lpips pip semantics, normalize=True)."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(img):
        x = torch.from_numpy(img.transpose(2, 0, 1))[None] * 2.0 - 1.0
        x = (x - shift) / scale
        taps = []
        ci = 0
        for bi, n in enumerate((2, 2, 3, 3, 3)):
            for _ in range(n):
                w = torch.from_numpy(vgg_sd[f"{CONV_IDX[ci]}.weight"])
                bb = torch.from_numpy(vgg_sd[f"{CONV_IDX[ci]}.bias"])
                x = F.relu(F.conv2d(x, w, bb, padding=1))
                ci += 1
            taps.append(x)
            if bi < 4:
                x = F.max_pool2d(x, 2)
        return taps

    fa, fb = feats(a), feats(b)
    total = 0.0
    for i, (t0, t1) in enumerate(zip(fa, fb)):
        n0 = t0 / torch.sqrt((t0**2).sum(1, keepdim=True) + 1e-10)
        n1 = t1 / torch.sqrt((t1**2).sum(1, keepdim=True) + 1e-10)
        diff = (n0 - n1) ** 2
        w = torch.from_numpy(
            np.maximum(lin_sd[f"lin{i}.model.1.weight"], 0.0)
        )
        total = total + F.conv2d(diff, w).mean()
    return float(total)


def test_lpips_converter_and_parity(tmp_path):
    rng = np.random.default_rng(7)
    vgg_sd, lin_sd = synth_dicts(rng)
    params = convert(vgg_sd, lin_sd)

    # structure matches the model's own init
    ref = jlp.init_lpips_params(jax.random.PRNGKey(0))
    assert len(params["convs"]) == len(ref["convs"]) == 13
    assert len(params["lins"]) == len(ref["lins"]) == 5
    for i in range(13):
        assert params["convs"][str(i)]["w"].shape == ref["convs"][i]["w"].shape
    for i in range(5):
        assert params["lins"][str(i)]["w"].shape == ref["lins"][i]["w"].shape

    # round trip through the production save/load path
    from nope_nerf_tpu.training.checkpoints import save_pytree

    path = str(tmp_path / "lpips_vgg.npz")
    save_pytree(path, {"params": params})
    metric = jlp.load_lpips(path)

    a = rng.uniform(size=(40, 48, 3)).astype(np.float32)
    b = rng.uniform(size=(40, 48, 3)).astype(np.float32)
    got_ab = metric(a, b)
    want_ab = _torch_lpips(vgg_sd, lin_sd, a, b)
    assert got_ab == pytest.approx(want_ab, rel=2e-4, abs=1e-6)
    assert metric(a, a) == pytest.approx(0.0, abs=1e-8)


def test_load_lpips_missing_file_raises(tmp_path):
    """eval.py tolerates ONLY FileNotFoundError (VERDICT r1 item 9)."""
    with pytest.raises(FileNotFoundError):
        jlp.load_lpips(str(tmp_path / "nope.npz"))
