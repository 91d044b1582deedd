"""Tiled symmetric Chamfer distance on the MXU.

The reference's point-cloud loss (`model/losses.py:114-148`) materialises the
dense (S, D) pairwise-distance matrix in 500k-row splits — ~4 GB of traffic
per step at Tanks resolution (S = D = 135*240 = 32 400).  The TPU version
never materialises it: squared distances come from one
``||x||² + ||y||² - 2 x·yᵀ`` matmul per (block, block) tile (MXU work), and
both direction-wise running argmins are folded inside a `lax.scan`, keeping
live memory at one tile.

Differentiation matches the reference exactly (`model/losses.py:143-148`):
the nearest-neighbour *index* is found without gradient (torch ``argmin`` has
none either), then the loss is the differentiable distance to the gathered
nearest point — so the expensive tiled search needs no VJP at all and the
backward pass is a cheap gather.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_BIG = 1e10


def _pad_to(x, n, fill=0.0):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1), constant_values=fill)


def _nearest_one_direction(X, Y, block, y_valid):
    """argmin_j ||x - y_j|| for every x, blocked over rows of X.

    The ``||x||²`` term is constant per row and drops out of the argmin, so
    each block needs only ``||y||² - 2 x·yᵀ`` — one (block, D) fused
    matmul+reduce per `lax.map` iteration (a handful of iterations total,
    vs the 256-tile nested scan this replaces, whose per-tile overhead
    dominated at ~20-40 ms/step).
    """
    S, D = X.shape[0], Y.shape[0]
    Sp = -(-S // block) * block
    Xb = _pad_to(X, Sp).reshape(-1, block, 3)
    yy = jnp.sum(Y * Y, axis=-1)
    scores_mask = jnp.where(y_valid > 0, 0.0, _BIG)

    def blk(xb):
        scores = (
            yy[None, :]
            - 2.0
            * lax.dot_general(
                xb, Y, (((1,), (1,)), ((), ())),
                # full-f32 passes: bf16 cancels catastrophically for nearby
                # points
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            + scores_mask[None, :]
        )
        return jnp.argmin(scores, axis=1).astype(jnp.int32)

    idx = lax.map(blk, Xb)
    return idx.reshape(-1)[:S]


def nearest_idx(X, Y, block: int = 2048, x_valid=None, y_valid=None):
    """Index of the nearest (valid) point of ``Y`` for every point of ``X``
    and vice versa. Forward-only (wrapped in stop_gradient).

    Args:
        X: (S, 3); Y: (D, 3).
        block: rows per map iteration (the (block, D) score tile is fused
            with its argmin by XLA).
        x_valid / y_valid: optional (S,)/(D,) float masks — invalid points
            never win an argmin.
    Returns:
        (idx_x (S,) int32 into Y, idx_y (D,) int32 into X)
    """
    X = lax.stop_gradient(X)
    Y = lax.stop_gradient(Y)
    xv = jnp.ones(X.shape[0]) if x_valid is None else x_valid
    yv = jnp.ones(Y.shape[0]) if y_valid is None else y_valid
    idx_x = _nearest_one_direction(X, Y, block, yv)
    idx_y = _nearest_one_direction(Y, X, block, xv)
    return idx_x, idx_y


def chamfer_loss(X, Y, block: int = 2048, x_valid=None, y_valid=None):
    """Symmetric Chamfer: mean_x ||x - y_nn(x)|| + mean_y ||y - x_nn(y)||.

    Matches ``get_pc_loss`` + ``comp_point_point_error``
    (`model/losses.py:114-148`): argmin without gradient, differentiable
    Euclidean distance to the gathered nearest point, mean per direction,
    directions summed.
    """
    idx_x, idx_y = nearest_idx(X, Y, block, x_valid, y_valid)
    # safe sqrt: coincident nearest points (e.g. clamped depths) would give
    # nan gradients through d(sqrt)/dx at 0
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
