"""Executed A/B of both SSIM variants against the reference.

* evaluation SSIM: ops/ssim.ssim vs the reference's vendored
  `third_party/pytorch_ssim` (the number in the eval LaTeX row);
* rgb_s-loss SSIM: ops/ssim.ssim_loss_map vs the reference's monodepth2
  SSIM module (`model/losses.py:222-253`) — including executed evidence
  for the documented deviation: the reference feeds (H, W, C) tensors
  through the NCHW module, silently pooling over the (W, C) axes, so our
  correct (H, W)-pooled op only matches it when given NCHW inputs.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_exec as rx  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from nope_nerf_tpu.ops.ssim import ssim, ssim_loss_map  # noqa: E402

pytestmark = pytest.mark.skipif(
    not rx.reference_available(), reason="/root/reference not present"
)


@pytest.fixture(scope="module")
def ref():
    return rx.load_reference()


class TestEvalSSIM:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_pytorch_ssim(self, ref, seed):
        import importlib

        pytorch_ssim = importlib.import_module("third_party.pytorch_ssim")
        rng = np.random.default_rng(seed)
        a = rng.uniform(0, 1, (40, 56, 3)).astype(np.float32)
        # correlated pair (uncorrelated noise gives SSIM ~0 where the
        # metric is insensitive); clip keeps [0, 1]
        b = np.clip(a + rng.normal(0, 0.08, a.shape), 0, 1).astype(np.float32)
        want = pytorch_ssim.ssim(
            torch.tensor(a).permute(2, 0, 1).unsqueeze(0),
            torch.tensor(b).permute(2, 0, 1).unsqueeze(0)).item()
        got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestRgbSLossSSIM:
    def test_matches_reference_module_on_nchw(self, ref):
        """Fed proper NCHW input, the reference SSIM module == our op
        (same 3x3 reflect-pad average pools and clamp)."""
        SSIM = ref.losses.SSIM
        rng = np.random.default_rng(2)
        a = rng.uniform(0, 1, (32, 48, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
        m = SSIM()
        want = m(
            torch.tensor(a).permute(2, 0, 1).unsqueeze(0),
            torch.tensor(b).permute(2, 0, 1).unsqueeze(0),
        )[0].permute(1, 2, 0).numpy()
        got = np.asarray(ssim_loss_map(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_reference_call_site_pools_wrong_axes(self, ref):
        """Executed evidence for the PARITY.md deviation note: the
        reference's rgb_s call sites (`model/losses.py:97-99,153-155`)
        pass (n, 3) / (H, W, 3)-shaped tensors straight into the NCHW
        module, so its AvgPool2d(3, 1) windows slide over the LAST TWO
        axes — (W, C) for an image — not the spatial (H, W). The result
        therefore differs from the correctly-pooled map; with_ssim is
        False in every shipped config, so this never fires there."""
        SSIM = ref.losses.SSIM
        rng = np.random.default_rng(3)
        a = rng.uniform(0, 1, (32, 48, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
        m = SSIM()
        # as called by get_rgb_s_loss: no permute, no batch dim
        ref_asis = m(torch.tensor(a), torch.tensor(b)).numpy()
        correct = np.asarray(ssim_loss_map(jnp.asarray(a), jnp.asarray(b)))
        assert ref_asis.shape == correct.shape
        # the wrong-axis pooling is NOT the correct map (executed proof
        # that the deviation is the reference's, not ours)
        assert float(np.abs(ref_asis - correct).max()) > 1e-3
