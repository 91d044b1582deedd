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


def nearest_idx(X, Y, block: int = 2048, x_valid=None, y_valid=None):
    """Index of the nearest (valid) point of ``Y`` for every point of ``X``
    and vice versa. Forward-only (wrapped in stop_gradient).

    Args:
        X: (S, 3); Y: (D, 3).
        block: tile edge; the (block, block) fp32 tile is the only live
            intermediate (16 MB at 2048).
        x_valid / y_valid: optional (S,)/(D,) float masks — invalid points
            never win an argmin.
    Returns:
        (idx_x (S,) int32 into Y, idx_y (D,) int32 into X)
    """
    X = lax.stop_gradient(X)
    Y = lax.stop_gradient(Y)
    S, D = X.shape[0], Y.shape[0]
    Sp = -(-S // block) * block
    Dp = -(-D // block) * block
    Xb = _pad_to(X, Sp).reshape(-1, block, 3)
    Yb = _pad_to(Y, Dp).reshape(-1, block, 3)
    xv = _pad_to(jnp.ones(S) if x_valid is None else x_valid, Sp).reshape(-1, block)
    yv = _pad_to(jnp.ones(D) if y_valid is None else y_valid, Dp).reshape(-1, block)
    nx, ny = Xb.shape[0], Yb.shape[0]

    xx = jnp.sum(Xb * Xb, axis=-1)
    yy = jnp.sum(Yb * Yb, axis=-1)

    def tile_d2(i, j):
        d2 = (
            xx[i][:, None]
            + yy[j][None, :]
            - 2.0
            * lax.dot_general(
                Xb[i], Yb[j], (((1,), (1,)), ((), ())),
                # full-f32 passes: the xx+yy-2xy form cancels catastrophically
                # at bf16 for nearby points
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        )
        return jnp.maximum(d2, 0.0)

    col = jnp.arange(block, dtype=jnp.int32)

    def scan_i(carry, i):
        min_y, idx_y = carry

        def scan_j(carry_j, j):
            (mx, ix), (min_y_a, idx_y_a) = carry_j
            d2 = tile_d2(i, j)
            d2x = jnp.where(yv[j][None, :] > 0, d2, _BIG)
            tmx = jnp.min(d2x, axis=1)
            tix = jnp.argmin(d2x, axis=1).astype(jnp.int32) + j * block
            better = tmx < mx
            mx = jnp.where(better, tmx, mx)
            ix = jnp.where(better, tix, ix)

            d2y = jnp.where(xv[i][:, None] > 0, d2, _BIG)
            tmy = jnp.min(d2y, axis=0)
            tiy = jnp.argmin(d2y, axis=0).astype(jnp.int32) + i * block
            better_y = tmy < min_y_a[j]
            min_y_a = min_y_a.at[j].set(jnp.where(better_y, tmy, min_y_a[j]))
            idx_y_a = idx_y_a.at[j].set(jnp.where(better_y, tiy, idx_y_a[j]))
            return ((mx, ix), (min_y_a, idx_y_a)), None

        init_x = (jnp.full((block,), _BIG), jnp.zeros((block,), jnp.int32))
        ((_, idx_x_i), (min_y, idx_y)), _ = lax.scan(
            scan_j, (init_x, (min_y, idx_y)), jnp.arange(ny)
        )
        return (min_y, idx_y), idx_x_i

    init_y = (jnp.full((ny, block), _BIG), jnp.zeros((ny, block), jnp.int32))
    (_, idx_y), idx_x = lax.scan(scan_i, init_y, jnp.arange(nx))
    return idx_x.reshape(-1)[:S], idx_y.reshape(-1)[:D]


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
