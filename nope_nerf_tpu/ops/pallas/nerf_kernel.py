"""Fused NeRF-MLP forward as a Pallas TPU kernel.

XLA runs the 10-matmul field chain as separate MXU ops with every (M, 256)
activation round-tripping HBM (~1.3 GB per 131k-point batch).  This kernel
keeps the whole chain — positional encoding, trunk, skip concat, heads,
activations — in VMEM per point-tile: HBM traffic collapses to the (M, 3)
inputs and (M, 4) outputs, and the weights stay VMEM-resident across grid
steps.

Forward-only by design: gradients go through the plain XLA path (the
backward needs dW accumulation across tiles — planned follow-up); eval-side
rendering (full-image eval, novel-view synthesis, visualisation) is where
forward throughput dominates, so that is where this kernel plugs in
(``tpu.use_pallas`` + eval paths).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512


def _encode(x, levels):
    """In-kernel positional encoding, reference channel order."""
    parts = [x]
    for i in range(levels):
        sx = x * (2.0**i)
        parts.append(jnp.sin(sx))
        parts.append(jnp.cos(sx))
    return jnp.concatenate(parts, axis=-1)


def _make_kernel(L_pos, L_dir, occ_softplus, occupancy_mode):
    def kernel(
        pts_ref, dirs_ref,
        t00w, t00b, t01w, t01b, t02w, t02b, t03w, t03b,
        t10w, t10b, t11w, t11b, t12w, t12b, t13w, t13b,
        dw, db, fw, fb, rw, rb, cw, cb,
        rgb_ref, sigma_ref,
    ):
        f32 = jnp.float32
        enc = _encode(pts_ref[:], L_pos)
        h = enc
        for w, b in ((t00w, t00b), (t01w, t01b), (t02w, t02b), (t03w, t03b)):
            h = jnp.maximum(
                jnp.dot(h, w[:], preferred_element_type=f32) + b[:], 0.0
            )
        h = jnp.concatenate([h, enc], axis=-1)
        for w, b in ((t10w, t10b), (t11w, t11b), (t12w, t12b), (t13w, t13b)):
            h = jnp.maximum(
                jnp.dot(h, w[:], preferred_element_type=f32) + b[:], 0.0
            )
        sigma = jnp.dot(h, dw[:], preferred_element_type=f32) + db[:]
        if occ_softplus:
            sigma = jax.nn.softplus(sigma)
        else:
            sigma = jnp.maximum(sigma, 0.0)
        if occupancy_mode:
            sigma = 1.0 - jnp.exp(-sigma)

        feat = jnp.dot(h, fw[:], preferred_element_type=f32) + fb[:]
        denc = _encode(dirs_ref[:], L_dir)
        hr = jnp.concatenate([feat, denc], axis=-1)
        hr = jnp.maximum(
            jnp.dot(hr, rw[:], preferred_element_type=f32) + rb[:], 0.0
        )
        rgb = jax.nn.sigmoid(
            jnp.dot(hr, cw[:], preferred_element_type=f32) + cb[:]
        )
        rgb_ref[:] = rgb
        sigma_ref[:] = sigma

    return kernel


@functools.partial(jax.jit, static_argnames=("l_pos", "l_dir", "occ_softplus",
                                             "occupancy_mode"))
def fused_nerf_forward(params, pts, dirs, *, l_pos=10, l_dir=4,
                       occ_softplus=True, occupancy_mode=True):
    """pts/dirs (M, 3), M a multiple of TILE -> (rgb (M, 3), sigma (M, 1)).

    Numerically equivalent to `models.nerf.apply_nerf` at f32 precision.
    """
    M = pts.shape[0]
    assert M % TILE == 0, f"pad points to a multiple of {TILE}"

    weights = []
    w_specs = []
    for name in ("trunk0_0", "trunk0_1", "trunk0_2", "trunk0_3",
                 "trunk1_0", "trunk1_1", "trunk1_2", "trunk1_3",
                 "fc_density", "fc_feature", "rgb_layer", "fc_rgb"):
        w = params[name]["w"]
        b = params[name]["b"]
        weights += [w, b]
        w_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM),
        ]

    kernel = _make_kernel(l_pos, l_dir, occ_softplus, occupancy_mode)
    grid = (M // TILE,)
    rgb, sigma = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=[
            pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, 3), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ],
    )(pts, dirs, *weights)
    return rgb, sigma
