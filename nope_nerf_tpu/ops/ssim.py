"""SSIM — both variants used by the reference.

* :func:`ssim_loss_map` — the monodepth2-style 3x3 average-pool SSIM used in
  the photometric surface loss (`model/losses.py:222-253`): reflection pad 1,
  3x3 mean pools, returns the elementwise map clamp((1 - SSIM)/2, 0, 1).
  NOTE: the reference feeds it NHWC tensors through an NCHW module, silently
  pooling over the wrong axes; since ``with_ssim`` defaults to False this
  never fires in published configs.  Here the op is implemented correctly for
  (H, W, C) images.
* :func:`ssim` — the evaluation SSIM (`third_party/pytorch_ssim`):
  11x11 Gaussian window (sigma 1.5), per-channel depthwise conv with
  same-padding, scalar mean.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _avg_pool3(x):
    """3x3 stride-1 mean pool on (H, W, C), valid padding."""
    k = jnp.ones((3, 3, 1, 1), x.dtype) / 9.0
    x = x.transpose(2, 0, 1)[None]  # (1, C, H, W)
    C = x.shape[1]
    out = jax.lax.conv_general_dilated(
        x, jnp.tile(k.transpose(2, 3, 0, 1), (C, 1, 1, 1)),
        window_strides=(1, 1), padding="VALID",
        feature_group_count=C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0].transpose(1, 2, 0)


def _reflect_pad1(x):
    return jnp.pad(x, ((1, 1), (1, 1), (0, 0)), mode="reflect")


def ssim_loss_map(x, y, C1=0.01**2, C2=0.03**2):
    """Elementwise SSIM-loss map for (H, W, C) images in [0, 1]."""
    x = _reflect_pad1(x)
    y = _reflect_pad1(y)
    mu_x = _avg_pool3(x)
    mu_y = _avg_pool3(y)
    sigma_x = _avg_pool3(x * x) - mu_x**2
    sigma_y = _avg_pool3(y * y) - mu_y**2
    sigma_xy = _avg_pool3(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x**2 + mu_y**2 + C1) * (sigma_x + sigma_y + C2)
    return jnp.clip((1.0 - n / d) / 2.0, 0.0, 1.0)


def _gaussian_window(size=11, sigma=1.5):
    g = jnp.exp(-((jnp.arange(size) - size // 2) ** 2) / (2.0 * sigma**2))
    g = g / g.sum()
    return g[:, None] @ g[None, :]  # (size, size)


def ssim(img1, img2, window_size: int = 11):
    """Scalar SSIM between (H, W, C) images (pytorch_ssim semantics:
    Gaussian window, same zero-padding, mean over everything)."""
    C = img1.shape[-1]
    win = _gaussian_window(window_size)
    k = jnp.tile(win[None, None], (C, 1, 1, 1))  # (C, 1, s, s)
    pad = window_size // 2

    def conv(x):
        x = x.transpose(2, 0, 1)[None]
        # HIGHEST precision is load-bearing on TPU: the default bf16 MXU
        # conv makes E[x²] − μ² err by ~1e-3, which exceeds C2 = 9e-4 on
        # near-constant images — window denominators go NEGATIVE and the
        # "mean SSIM" leaves [-1, 1] entirely (observed -16.8 on a flat
        # held-out view). The reference computes these convs in f32 CUDA.
        out = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(pad, pad), (pad, pad)],
            feature_group_count=C,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )
        return out[0].transpose(1, 2, 0)

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu12
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return m.mean()
