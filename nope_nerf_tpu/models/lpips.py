"""LPIPS perceptual metric (VGG16 backbone) in pure JAX.

The reference computes eval LPIPS with the ``lpips`` pip package
(`evaluation/eval.py:157-169`, net='vgg', normalize=True).  This module
reimplements it: VGG16 conv features at the 5 standard taps
(relu1_2, relu2_2, relu3_3, relu4_3, relu5_3), unit-normalised along
channels, squared differences reduced by the learned 1x1 linear heads,
spatially averaged, summed over taps.

Weights must be converted once from the torch packages with
`tools/convert_lpips.py` (needs torchvision+lpips, or any torch checkpoint
of VGG16 features + LPIPS linear heads).  Everything gates cleanly when the
npz is absent: callers get None and report nan (the metric, not the
framework, is unavailable offline).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# VGG16 feature config: (out_channels, n_convs) per block
VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# imagenet normalisation used by lpips ScalingLayer (after [0,1] -> [-1,1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHTS = os.path.join(
    os.path.expanduser("~"), ".cache", "nope_nerf_tpu", "lpips_vgg.npz"
)


def _conv(x, w, b):
    # HIGHEST precision: the default TPU bf16 conv drifts the metric a few
    # percent over 13 chained layers; the reference computes f32 (eval-only
    # cost, LPIPS runs once per eval image)
    out = lax.conv_general_dilated(
        x[None], w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )[0]
    return out + b


def _max_pool(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (2, 2, 1), (2, 2, 1), "VALID"
    )


def vgg_features(params, img):
    """img (H, W, 3) in [-1, 1] (lpips normalize=True maps [0,1]→[-1,1]).

    Returns the 5 tap activations (post-relu at the end of each block).
    """
    x = (img - _SHIFT) / _SCALE
    taps = []
    ci = 0
    for bi, (cout, n) in enumerate(VGG_BLOCKS):
        for k in range(n):
            p = params["convs"][ci]
            x = jax.nn.relu(_conv(x, p["w"], p["b"]))
            ci += 1
        taps.append(x)
        if bi < len(VGG_BLOCKS) - 1:
            x = _max_pool(x)
    return taps


def lpips_distance(params, img0, img1):
    """Scalar LPIPS between (H, W, 3) images in [0, 1]."""
    img0 = img0 * 2.0 - 1.0
    img1 = img1 * 2.0 - 1.0
    f0 = vgg_features(params, img0)
    f1 = vgg_features(params, img1)
    total = 0.0
    for t0, t1, lin in zip(f0, f1, params["lins"]):
        n0 = t0 / jnp.sqrt(jnp.sum(t0**2, -1, keepdims=True) + 1e-10)
        n1 = t1 / jnp.sqrt(jnp.sum(t1**2, -1, keepdims=True) + 1e-10)
        diff = (n0 - n1) ** 2
        # learned 1x1 conv head (C, 1) with non-negative weights; f32
        # matmul like the convs (default TPU bf16 would re-enter here)
        val = jnp.matmul(diff, jnp.maximum(lin["w"], 0.0),
                         precision=lax.Precision.HIGHEST)
        total = total + jnp.mean(val)
    return total


def load_lpips(path: str | None = None):
    """-> callable(img0, img1 numpy [0,1] HWC) -> float, or raises."""
    from ..training.checkpoints import load_pytree

    path = path or DEFAULT_WEIGHTS
    tree, _ = load_pytree(path)
    params = jax.tree.map(jnp.asarray, tree["params"])
    # npz round-trip restores digit-keyed dicts as lists; accept either
    def _as_list(node, n):
        if isinstance(node, list):
            return node
        return [node[str(i)] for i in range(n)]

    params = {
        "convs": _as_list(params["convs"], 13),
        "lins": _as_list(params["lins"], 5),
    }
    fn = jax.jit(lambda a, b: lpips_distance(params, a, b))

    def metric(img0, img1):
        return float(fn(jnp.asarray(img0, jnp.float32),
                        jnp.asarray(img1, jnp.float32)))

    return metric


def init_lpips_params(key):
    """Random init (shape tests only — real use requires converted weights)."""
    convs = []
    cin = 3
    keys = jax.random.split(key, 20)
    ki = 0
    for cout, n in VGG_BLOCKS:
        for _ in range(n):
            k = keys[ki]
            ki += 1
            w = jax.random.normal(k, (3, 3, cin, cout)) * 0.05
            convs.append({"w": w, "b": jnp.zeros((cout,))})
            cin = cout
    lins = [
        {"w": jnp.ones((c, 1)) / c} for c, _ in VGG_BLOCKS
    ]
    return {"convs": convs, "lins": lins}
