"""Projection-guided banded Chamfer argmin (``tpu.chamfer_mode: band``).

The production clouds of the pc loss are NOT unstructured: X and Y are
backprojected depth-map GRIDS (`model/training.py:316-323` builds them from
``arange_pixels(sample_resolution)``), X already warped into Y's camera
frame. The nearest neighbour of a query X[q] in Y therefore lies near the
pixel where X[q] *projects* in Y's image — information the trainer has for
free. Instead of sweeping all D candidates per query (the exact kernel's
O(S·D) VPU passes, 77% of whose cost is the distance computation itself —
BASELINE.md r4/r5), each group of QB=1024 row-major-consecutive queries
sweeps only a BAND of Y rows centred on the group's median projected row:
O(S·band·ws) work, ~3.5x less at Tanks scale for band=32 of 135 rows.

Accuracy: this is approximate in principle (a query whose true NN lies
outside the band gets a nearby-but-not-nearest match) but validated on the
production distribution: depth-map pairs from the synthetic training scenes
measure <=1.2%% argmin mismatch and <=3e-6 relative error on the directional
Chamfer mean at band=32 (tests/test_chamfer_band.py pins this, plus a
convergence gate vs exact mode). The mismatches concentrate at occlusion
boundaries where the found neighbour is still nearby; mismatched distances
are always >= the true ones (argmin over a subset), so the loss error is
one-sided. ``tpu.parity: True`` pins ``chamfer_mode: exact``.

Kernel layout: grid over query groups; per grid step the group's 1024
queries live lane-major ((3, QB) block of the transposed cloud), the whole
Y cloud is VMEM-resident ((Dp, 3), 0.4 MB at Tanks scale), and an inner
``fori_loop`` sweeps K TILE-row slices of Y starting at a per-group
scalar-prefetched tile offset (``pl.dslice`` with dynamic start — band
starts are quantised to TILE rows so no sublane alignment issues). The
min/argmin carries are loop-carried values (not scratch): each grid step
finishes its own group, unlike the exact kernel's cross-grid carries
(`chamfer_kernel.py`). Same sublane-reduction orientation as the v4 exact
kernel — both directions reduce over sublanes (~0.8 ms vreg trees, never
the ~6 ms lane shuffle trees).

Band-start hints come from the caller as a per-query estimated Y-ROW
(float; NaN/out-of-range entries are fine — the per-group median is robust
to <50%% outliers and starts are clamped to the valid tile range).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024      # Y rows per inner sweep slice
QB = 1024        # queries (lanes) per grid step
_BIG = 1e10
_SENTINEL = 1e5  # padded X rows -> +S, padded Y rows -> -S (never win)


def band_start_tiles(row_hint, n_y, ws_y, k_tiles, qb=QB):
    """Per-query-group Y start TILE from per-query row hints.

    Args:
        row_hint: (S,) float — estimated Y-grid row per query (may contain
            out-of-range / non-finite entries; median-robust).
        n_y: Y cloud size (hs*ws before padding).
        ws_y: Y grid width (points per row).
        k_tiles: tiles each group sweeps.
    Returns:
        (nb,) int32 start tile indices into the TILE-padded Y, clamped so
        start + k_tiles stays inside ceil(n_y/TILE) tiles.
    """
    S = row_hint.shape[0]
    Sp = -(-S // qb) * qb
    if Sp != S:
        row_hint = jnp.pad(row_hint, (0, Sp - S), constant_values=jnp.nan)
    groups = row_hint.reshape(-1, qb)
    # nan-median: non-finite hints (behind-camera projections) sort to the
    # end; take the median of the finite prefix per group
    finite = jnp.isfinite(groups)
    big = jnp.where(finite, groups, jnp.float32(3.4e38))
    srt = jnp.sort(big, axis=1)
    n_fin = jnp.sum(finite, axis=1)
    med_i = jnp.clip((n_fin - 1) // 2, 0, qb - 1)
    med = jnp.take_along_axis(srt, med_i[:, None], axis=1)[:, 0]
    med = jnp.where(n_fin > 0, med, 0.0)
    # centre the band (k_tiles*TILE points = k_tiles*TILE/ws rows) on med
    centre_pt = med * ws_y
    n_tiles = -(-n_y // TILE)
    start = jnp.round(centre_pt / TILE).astype(jnp.int32) - k_tiles // 2
    return jnp.clip(start, 0, max(n_tiles - k_tiles, 0))


def _band_kernel():
    """Grid (nb, k_tiles), k fastest. The Y band tile for step (g, k) is
    DMA'd by the pipeline itself — its BlockSpec index_map reads the
    prefetched per-group start tile — so the (TILE, 3) slab fetch is
    double-buffered like the exact kernel's block stream instead of a
    lane-sparse in-kernel dynamic VMEM read (measured 2.1 -> ~1.2 ms)."""

    def kernel(s_ref, y_ref, xt_ref, idx_ref, col_min, col_idx):
        g = pl.program_id(0)
        k = pl.program_id(1)
        nk = pl.num_programs(1)

        @pl.when(k == 0)
        def _():
            col_min[:] = jnp.full(col_min.shape, _BIG, jnp.float32)
            col_idx[:] = jnp.zeros(col_idx.shape, jnp.int32)

        row0 = (s_ref[g] + k) * TILE
        d0 = y_ref[:, 0:1] - xt_ref[0:1, :]
        d1 = y_ref[:, 1:2] - xt_ref[1:2, :]
        d2 = y_ref[:, 2:3] - xt_ref[2:3, :]
        dist = d0 * d0 + d1 * d1 + d2 * d2              # (TILE, QB) VPU
        tmin = jnp.min(dist, axis=0)
        targ = jnp.argmin(dist, axis=0).astype(jnp.int32) + row0
        cm = col_min[:]
        bet = tmin < cm
        col_min[:] = jnp.where(bet, tmin, cm)
        col_idx[:] = jnp.where(bet, targ, col_idx[:])

        @pl.when(k == nk - 1)
        def _():
            idx_ref[0, :] = col_idx[:]

    return kernel


def _prep(pts, n, sentinel):
    pad = n - pts.shape[0]
    if pad:
        pts = jnp.pad(pts, ((0, pad), (0, 0)), constant_values=sentinel)
    return pts


def nearest_idx_banded(X, Y, starts, k_tiles=8, interpret=False):
    """Banded one-direction NN: for each X query group, argmin over the
    k_tiles*TILE Y rows starting at its prefetched start tile.
    Forward-only.

    Args:
        X: (S, 3) queries (any order; groups = consecutive QB rows).
        Y: (D, 3) candidates, a row-major grid cloud.
        starts: (ceil(S/QB),) int32 per-group start TILE into the padded Y
            — from :func:`band_start_tiles`.
        k_tiles: TILE-row slices per group (band = k_tiles*1024 points,
            i.e. k_tiles*1024/ws_y grid rows).
    Returns:
        (S,) int32 indices into Y.
    """
    X = lax.stop_gradient(X)
    Y = lax.stop_gradient(Y)
    S, D = X.shape[0], Y.shape[0]
    n_tiles = -(-D // TILE)
    k_tiles = min(k_tiles, n_tiles)
    Sp = -(-S // QB) * QB
    Dp = n_tiles * TILE
    Xp = _prep(X, Sp, _SENTINEL)
    Yp = _prep(Y, Dp, -_SENTINEL)
    nb = Sp // QB

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, k_tiles),
        in_specs=[
            # the band tile itself: dynamic block index from the prefetched
            # starts — pipelined HBM->VMEM DMA per (g, k) step
            pl.BlockSpec((TILE, 3), lambda g, k, s: (s[g] + k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, QB), lambda g, k, s: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, QB), lambda g, k, s: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((QB,), jnp.float32),
            pltpu.VMEM((QB,), jnp.int32),
        ],
    )
    (idx,) = pl.pallas_call(
        _band_kernel(),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, Sp), jnp.int32)],
        interpret=interpret,
    )(starts, Yp, Xp.T)
    return idx.reshape(-1)[:S]


def nearest_idx_banded_xla(X, Y, starts, k_tiles):
    """XLA reference/CPU fallback with IDENTICAL band semantics: for each
    query group, argmin over Y[start*TILE : (start+k)*TILE]. Used on
    non-TPU platforms and as the kernel's correctness oracle in tests."""
    X = lax.stop_gradient(X)
    Y = lax.stop_gradient(Y)
    S, D = X.shape[0], Y.shape[0]
    n_tiles = -(-D // TILE)
    k_tiles = min(k_tiles, n_tiles)
    Sp = -(-S // QB) * QB
    Dp = n_tiles * TILE
    Xp = _prep(X, Sp, _SENTINEL)
    Yp = _prep(Y, Dp, -_SENTINEL)
    W = k_tiles * TILE

    def group(args):
        xb, s = args                                  # (QB, 3), scalar
        yb = lax.dynamic_slice(Yp, (s * TILE, 0), (W, 3))
        # direct squared distances (same per-pair arithmetic as the kernel
        # — the score form rounds differently and can flip near-ties)
        d = jnp.sum(
            (xb[:, None, :] - yb[None, :, :]) ** 2, axis=-1
        )
        return jnp.argmin(d, axis=1).astype(jnp.int32) + s * TILE

    idx = lax.map(group, (Xp.reshape(-1, QB, 3), starts))
    return idx.reshape(-1)[:S]


def rows_to_start_tiles(X_warped, Y_count, grid_hw, camera_mat,
                        project_to_cam, k_tiles):
    """Estimated Y-grid row per query -> per-group band start tiles.

    ``X_warped`` must already be in Y's camera frame (uniform scaling is
    fine — perspective rows are scale-invariant). ``project_to_cam`` is
    geometry.rays.project_to_cam (passed in to avoid a circular import);
    its [-1, 1] y coordinate maps to rows via the ``arange_pixels``
    convention row = (y+1)/2*(hs-1)."""
    hs, ws = grid_hw
    xy, _ = project_to_cam(lax.stop_gradient(X_warped), camera_mat)
    row = (xy[:, 1] + 1.0) * 0.5 * (hs - 1)
    return band_start_tiles(row, Y_count, ws, k_tiles)


def chamfer_loss_banded(X, Y, starts_x, starts_y, k_tiles=8,
                        use_pallas=True, interpret=False):
    """Symmetric Chamfer with the banded argmin (same differentiable
    gather-distance form as ops.chamfer.chamfer_loss; the argmin itself is
    gradient-free, matching `model/losses.py:137-148`)."""
    if use_pallas:
        idx_x = nearest_idx_banded(X, Y, starts_x, k_tiles,
                                   interpret=interpret)
        idx_y = nearest_idx_banded(Y, X, starts_y, k_tiles,
                                   interpret=interpret)
    else:
        idx_x = nearest_idx_banded_xla(X, Y, starts_x, k_tiles)
        idx_y = nearest_idx_banded_xla(Y, X, starts_y, k_tiles)
    dxv = X - Y[idx_x]
    dyv = Y - X[idx_y]
    dx = jnp.sqrt(jnp.maximum(jnp.sum(dxv * dxv, axis=-1), 1e-24))
    dy = jnp.sqrt(jnp.maximum(jnp.sum(dyv * dyv, axis=-1), 1e-24))
    return jnp.mean(dx) + jnp.mean(dy)


def chamfer_loss_banded_sharded(X, Y, starts_x, starts_y, mesh, k_tiles=8,
                                interpret=False):
    """Banded Chamfer under a ray mesh: queries (and their group starts)
    shard over the mesh axis, each device sweeps its groups against the
    all-gathered other cloud — the same collective layout as
    chamfer_kernel.chamfer_loss_pallas_sharded, with the banded kernel per
    shard. Query padding goes to N*QB multiples so every shard owns whole
    query groups."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    S, D = X.shape[0], Y.shape[0]
    Sp = -(-S // (n_dev * QB)) * (n_dev * QB)
    Dp = -(-D // (n_dev * QB)) * (n_dev * QB)
    xv = jnp.pad(jnp.ones(S), (0, Sp - S))
    yv = jnp.pad(jnp.ones(D), (0, Dp - D))
    Xp = _prep(X, Sp, _SENTINEL)
    Yp = _prep(Y, Dp, -_SENTINEL)
    # one start per QB queries; pad with clamped zeros for padded groups
    sxp = jnp.pad(starts_x, (0, Sp // QB - starts_x.shape[0]))
    syp = jnp.pad(starts_y, (0, Dp // QB - starts_y.shape[0]))

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def f(xs, xvs, sxs, ys, yvs, sys_):
        Yf = lax.all_gather(ys, axis, tiled=True)
        Xf = lax.all_gather(xs, axis, tiled=True)
        idx_x = nearest_idx_banded(xs, Yf, sxs, k_tiles, interpret=interpret)
        idx_y = nearest_idx_banded(ys, Xf, sys_, k_tiles, interpret=interpret)
        dxv = xs - Yf[idx_x]
        dyv = ys - Xf[idx_y]
        dx = jnp.sqrt(jnp.maximum(jnp.sum(dxv * dxv, axis=-1), 1e-24))
        dy = jnp.sqrt(jnp.maximum(jnp.sum(dyv * dyv, axis=-1), 1e-24))
        sx = lax.psum(jnp.sum(dx * xvs), axis)
        sy = lax.psum(jnp.sum(dy * yvs), axis)
        nx = lax.psum(jnp.sum(xvs), axis)
        ny = lax.psum(jnp.sum(yvs), axis)
        return sx / jnp.maximum(nx, 1.0) + sy / jnp.maximum(ny, 1.0)

    return f(Xp, xv, sxp, Yp, yv, syp)
