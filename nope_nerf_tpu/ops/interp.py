"""Image sampling / resizing ops with torch-compatible semantics.

The reference leans on ``F.grid_sample`` (`model/common.py:75-109`) and
``F.interpolate`` (`model/training.py:318-327`, `model/network.py:22`).  These
are reimplemented as pure gather/weighted-gather jnp ops (XLA fuses them into
the surrounding loss kernels):

* :func:`grid_sample` — bilinear/nearest point sampling, coords in [-1, 1],
  zero padding outside, align_corners switchable (torch semantics).
* :func:`resize_nearest` — torch ``F.interpolate(mode='nearest')``:
  src = floor(dst * in/out).
* :func:`resize_bilinear` — torch ``F.interpolate(mode='bilinear',
  align_corners=False)``: half-pixel centers, edge clamped.
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample(img, coords, mode="bilinear", align_corners=False):
    """Sample ``img`` (H, W, C) at ``coords`` (N, 2) in [-1, 1] ([x, y]).

    Out-of-bounds samples contribute 0 (torch ``padding_mode='zeros'``).
    Returns (N, C).
    """
    H, W, C = img.shape
    x, y = coords[:, 0], coords[:, 1]
    if align_corners:
        fx = (x + 1.0) / 2.0 * (W - 1)
        fy = (y + 1.0) / 2.0 * (H - 1)
    else:
        fx = ((x + 1.0) * W - 1.0) / 2.0
        fy = ((y + 1.0) * H - 1.0) / 2.0

    if mode == "nearest":
        # torch grid_sample nearest rounds half away from... it uses
        # round-to-nearest-even via floor(x+0.5) on the unnormalised coord.
        ix = jnp.floor(fx + 0.5).astype(jnp.int32)
        iy = jnp.floor(fy + 0.5).astype(jnp.int32)
        inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        vals = img[iyc, ixc]
        return vals * inb[:, None].astype(img.dtype)

    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = fx - x0
    wy1 = fy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    out = jnp.zeros((coords.shape[0], C), img.dtype)
    for xi, wxi in ((x0, wx0), (x1, wx1)):
        for yi, wyi in ((y0, wy0), (y1, wy1)):
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
            out = out + v * (wxi * wyi * inb.astype(img.dtype))[:, None]
    return out


def resize_nearest(img, out_hw):
    """Nearest-neighbour resize, torch ``F.interpolate`` semantics.

    img: (H, W) or (H, W, C) -> (h, w[, C]).

    Identity shapes short-circuit (the common Tanks case: depth priors at
    image resolution — a full-image gather costs ~35 ms/step on TPU), and the
    2-D gather is split into two axis-wise ``take``s, which XLA lowers far
    better than one advanced-index gather.
    """
    H, W = img.shape[:2]
    h, w = out_hw
    if (H, W) == (h, w):
        return img
    ys = jnp.floor(jnp.arange(h) * (H / h)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(w) * (W / w)).astype(jnp.int32)
    out = jnp.take(img, ys, axis=0)
    return jnp.take(out, xs, axis=1)


def resize_bilinear(img, out_hw):
    """Bilinear resize, torch align_corners=False semantics.

    img: (H, W, C) -> (h, w, C).
    """
    H, W = img.shape[:2]
    h, w = out_hw
    fy = (jnp.arange(h) + 0.5) * (H / h) - 0.5
    fx = (jnp.arange(w) + 0.5) * (W / w) - 0.5
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy1 = (fy - y0)[:, None, None]
    wx1 = (fx - x0)[None, :, None]
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    # clamp the weights at the borders (edge replication)
    wy1 = jnp.clip(wy1, 0.0, 1.0)
    wx1 = jnp.clip(wx1, 0.0, 1.0)
    wy0, wx0 = 1.0 - wy1, 1.0 - wx1
    v00 = img[y0[:, None], x0[None, :]]
    v01 = img[y0[:, None], x1[None, :]]
    v10 = img[y1[:, None], x0[None, :]]
    v11 = img[y1[:, None], x1[None, :]]
    return (v00 * wy0 * wx0 + v01 * wy0 * wx1 + v10 * wy1 * wx0 + v11 * wy1 * wx1)
