"""Fused two-direction Chamfer argmin as a Pallas TPU kernel.

The XLA formulation (ops/chamfer.py) evaluates the (block, D) score tile per
direction and lets XLA reduce it — at Tanks scale that materialises GBs of
HBM traffic per step and computes the x·yᵀ dot twice.  This kernel walks the
(S/T, D/T) tile grid once (j fastest): each (T, T) dot tile is computed on
the MXU once and reduced in VMEM for BOTH directions —

* row argmin of ``yy - 2 x·y`` (X→Y) carried in a (T,) scratch across the
  j sweep, flushed at j == nj-1;
* column argmin of ``xx - 2 x·y`` (Y→X) carried in an (nj, T) scratch row
  per j block across the i sweeps, flushed at i == ni-1.

HBM traffic collapses to the point clouds themselves.  Forward-only (argmin
indices carry no gradient — `model/losses.py:137-141` semantics); the
differentiable distance-to-gathered-point happens outside.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024      # X rows per tile
TILE_Y = 2048    # Y columns per tile (8 MB f32 score tile)
_BIG = 1e10


def _make_kernel():
    def kernel(x_ref, y_ref, xv_ref, yv_ref, xx_ref, yy_ref,
               idx_x_ref, idx_y_ref,
               row_min, row_idx, col_min, col_idx):
        i = pl.program_id(0)
        j = pl.program_id(1)
        ni = pl.num_programs(0)
        nj = pl.num_programs(1)

        # (T, T) dot tile on the MXU, computed once for both directions
        dot = lax.dot_general(
            x_ref[:], y_ref[:], (((1,), (1,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

        # --- direction X -> Y: row argmin of yy_j - 2 x·y ------------------
        scores_x = yy_ref[0, :][None, :] - 2.0 * dot
        scores_x = jnp.where(yv_ref[0, :][None, :] > 0.0, scores_x, _BIG)
        tile_min = jnp.min(scores_x, axis=1)
        tile_arg = jnp.argmin(scores_x, axis=1).astype(jnp.int32) + j * TILE_Y

        @pl.when(j == 0)
        def _():
            row_min[:] = jnp.full((TILE,), _BIG, jnp.float32)
            row_idx[:] = jnp.zeros((TILE,), jnp.int32)

        better = tile_min < row_min[:]
        row_min[:] = jnp.where(better, tile_min, row_min[:])
        row_idx[:] = jnp.where(better, tile_arg, row_idx[:])

        @pl.when(j == nj - 1)
        def _():
            idx_x_ref[i, :] = row_idx[:]

        # --- direction Y -> X: column argmin of xx_i - 2 x·y ---------------
        scores_y = xx_ref[0, :][:, None] - 2.0 * dot
        scores_y = jnp.where(xv_ref[0, :][:, None] > 0.0, scores_y, _BIG)
        tile_min_y = jnp.min(scores_y, axis=0)
        tile_arg_y = jnp.argmin(scores_y, axis=0).astype(jnp.int32) + i * TILE

        @pl.when(i == 0)
        def _():
            col_min[j, :] = jnp.full((TILE_Y,), _BIG, jnp.float32)
            col_idx[j, :] = jnp.zeros((TILE_Y,), jnp.int32)

        better_y = tile_min_y < col_min[j, :]
        col_min[j, :] = jnp.where(better_y, tile_min_y, col_min[j, :])
        col_idx[j, :] = jnp.where(better_y, tile_arg_y, col_idx[j, :])

        @pl.when(i == ni - 1)
        def _():
            idx_y_ref[j, :] = col_idx[j, :]

    return kernel


def _pad_pts(x, n):
    pad = n - x.shape[0]
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


def _pad_vec(x, n, fill=0.0):
    pad = n - x.shape[0]
    return jnp.pad(x, (0, pad), constant_values=fill) if pad else x


def nearest_idx_pallas(X, Y, x_valid=None, y_valid=None, interpret=False):
    """Pallas drop-in for ops.chamfer.nearest_idx (same contract)."""
    X = lax.stop_gradient(X)
    Y = lax.stop_gradient(Y)
    S, D = X.shape[0], Y.shape[0]
    Sp = -(-S // TILE) * TILE
    Dp = -(-D // TILE_Y) * TILE_Y
    Xp = _pad_pts(X, Sp)
    Yp = _pad_pts(Y, Dp)
    xv = _pad_vec(jnp.ones(S) if x_valid is None else x_valid, Sp)
    yv = _pad_vec(jnp.ones(D) if y_valid is None else y_valid, Dp)
    xx = jnp.sum(Xp * Xp, axis=-1)[None, :]
    yy = jnp.sum(Yp * Yp, axis=-1)[None, :]
    xv2 = xv[None, :]
    yv2 = yv[None, :]

    ni, nj = Sp // TILE, Dp // TILE_Y
    idx_x, idx_y = pl.pallas_call(
        _make_kernel(),
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((TILE, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Y, 3), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Y), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Y), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        # full-array output blocks (VMEM-resident for the whole kernel):
        # written with dynamic row indices at the flush steps
        out_specs=[
            pl.BlockSpec((ni, TILE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nj, TILE_Y), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ni, TILE), jnp.int32),
            jax.ShapeDtypeStruct((nj, TILE_Y), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE,), jnp.float32),
            pltpu.VMEM((TILE,), jnp.int32),
            pltpu.VMEM((nj, TILE_Y), jnp.float32),
            pltpu.VMEM((nj, TILE_Y), jnp.int32),
        ],
        interpret=interpret,
    )(Xp, Yp, xv2, yv2, xx, yy)
    return idx_x.reshape(-1)[:S], idx_y.reshape(-1)[:D]


def chamfer_loss_pallas(X, Y, x_valid=None, y_valid=None, interpret=False):
    """Symmetric Chamfer with the fused Pallas argmin (same contract as
    ops.chamfer.chamfer_loss)."""
    idx_x, idx_y = nearest_idx_pallas(X, Y, x_valid, y_valid, interpret=interpret)
    dxv = X - Y[idx_x]
    dyv = Y - X[idx_y]
    dx = jnp.sqrt(jnp.maximum(jnp.sum(dxv * dxv, axis=-1), 1e-24))
    dy = jnp.sqrt(jnp.maximum(jnp.sum(dyv * dyv, axis=-1), 1e-24))
    if x_valid is None:
        loss_x = jnp.mean(dx)
    else:
        loss_x = jnp.sum(dx * x_valid) / jnp.maximum(jnp.sum(x_valid), 1.0)
    if y_valid is None:
        loss_y = jnp.mean(dy)
    else:
        loss_y = jnp.sum(dy * y_valid) / jnp.maximum(jnp.sum(y_valid), 1.0)
    return loss_x + loss_y
