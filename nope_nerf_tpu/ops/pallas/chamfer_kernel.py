"""Fused Chamfer argmin as a Pallas TPU kernel (v4: sublane-only sweeps).

The XLA formulation (ops/chamfer.py) evaluates the (block, D) score tile per
direction and lets XLA reduce it — at Tanks scale that materialises GBs of
HBM traffic per step and computes the x·yᵀ dot twice.

Kernel layout (v4): each direction is ONE sweep in which the cloud being
REDUCED OVER lives in the sublane (block/grid) dimension and the cloud whose
nearest-neighbour indices we want lives in the LANE dimension, transposed and
VMEM-resident for the whole kernel (32,400 x 3 f32 = 389 KB at Tanks scale).
The grid runs over reduced-cloud blocks (TILE rows); each grid step sweeps
the lane cloud in CHUNK slices with an in-kernel ``fori_loop``, updating
per-lane running (min, argmin) carries in VMEM scratch, flushed at the last
grid step.

Why this beats v3's shared-tile two-direction kernel (10.3 -> 7.3 ms at
32,400² on v5e): a lane-axis (axis=1) min/argmin reduction lowers to
intra-register shuffle trees and costs ~6 ms/sweep at this scale, while the
sublane-axis (axis=0) reduction is a plain vreg tree costing ~0.8 ms.
v3 computed the distance tile once and paid one cheap sublane reduction
(Y→X) plus one expensive lane reduction (X→Y); v4 recomputes the distance
tile per direction (the 3-sub/3-fma broadcast sweep is only ~2.8 ms) so BOTH
directions reduce over sublanes. Measured r4: two directions 10.32 -> 7.34 ms,
one direction (the per-shard sharded path) 9.60 -> 4.25 ms; indices bitwise
identical (same per-pair arithmetic; min is order-insensitive and both
formulations keep first-occurrence tie semantics — argmin over sublanes picks
the lowest index inside a block, the strict ``<`` carry update keeps the
earliest block).

Rejected (v5 experiment, measured r4): a single bidirectional sweep that
computes each tile once and recovers the lane-direction argmin with
value-only reductions (``min(where(dist == lane_min(dist), iota, INT_MAX))``,
lane mins as explicit halving folds to dodge Mosaic's generic cross-lane
reduction) ran 12.3 vs 10.1 ms at 32,400² and 135 vs 97 ms at 129,600²
(indices identical): once the 4 MB tile lives in VMEM rather than vregs,
every extra pass over it (compare, select, each fold's copy) is VMEM-traffic
that costs MORE than v4's fused recompute of the tile, which streams
compute+reduce in one pass. Don't retry tile-sharing here.

The squared-distance tile is computed DIRECTLY on the VPU:

    D_ij = Σ_k (r_ik − q_jk)²   (3 sub + 3 fma broadcasts per tile)

not as the rr − 2·r·qᵀ + qq MXU dot of v1/v2: a (TILE, CHUNK) matmul with
K=3 is systolic-latency bound — the MXU emits a 128x128 output tile per pass
regardless of K, so the "free FLOPs" formulation ran slower than the VPU
broadcast (measured again r4: score-form dist was 9.8 vs 9.7 ms — the
distance passes are NOT the bottleneck; and subtracting near-equal products
also loses precision). A *VPU* score-form was also measured (r4): hoisting
``rr`` and the pre-scaled ``−2·r`` columns per grid step and computing the
tile as ``rr + Σ m_k·q_k`` — nominally 3 broadcasts vs this form's 6 — ran
10.9 vs 9.7 ms at 32,400² and 118 vs 96 ms at 129,600²: Mosaic does not fuse
the multiply-add chain into fmas, and a (TILE,1)×(1,CHUNK) broadcast
*multiply* is no cheaper than a broadcast subtract, so the "fewer ops"
accounting is wrong on this hardware. Keep the direct-distance form.

Validity and padding cost ZERO in-kernel work: invalid/padded X points are
moved to the (+1e5,...) sentinel and Y points to (−1e5,...) on the host side,
so any pairing that involves an invalid point has squared distance ≥ 1e10 —
about 6 orders of magnitude beyond any real scene distance — and never wins
an argmin against a valid pair. (v2 carried +BIG bias vectors instead, which
cost two extra full (TILE, CHUNK) VPU passes per tile.) Indices returned
for *invalid* query lanes are arbitrary valid-region indices; callers mask
them out of the loss, matching the reference's semantics where invalid
points are dropped before the distance matrix (`model/losses.py:127-141`).

Live VMEM: resident transposed cloud (0.4 MB) + distance slab (4 MB) +
carries — far under the ~16 MB/core scoped limit. HBM traffic collapses to
the point clouds themselves. Forward-only (argmin indices carry no gradient —
`model/losses.py:137-141` semantics); the differentiable
distance-to-gathered-point happens outside.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024      # reduced-cloud rows per grid step (sublane dimension)
CHUNK = 1024     # lane-cloud columns per inner-loop slice (4 MB f32 slab)
_BIG = 1e10      # any invalid pairing scores >= (sentinel distance)^2 = 1e10
_SENTINEL = 1e5  # X moved to +S, Y to -S: valid<->invalid >= S^2, inv<->inv 4S^2


def _make_kernel(nj):
    """One sweep: for every lane point q of the resident transposed cloud,
    the argmin over ALL rows r of the block cloud."""

    def kernel(r_ref, qt_ref, idx_ref, col_min, col_idx):
        i = pl.program_id(0)
        ni = pl.num_programs(0)

        @pl.when(i == 0)
        def _():
            col_min[:] = jnp.full(col_min.shape, _BIG, jnp.float32)
            col_idx[:] = jnp.zeros(col_idx.shape, jnp.int32)

        # (TILE, 1) coordinate columns — broadcast against the lane-major
        # (1, CHUNK) resident-cloud rows below
        r0 = r_ref[:, 0:1]
        r1 = r_ref[:, 1:2]
        r2 = r_ref[:, 2:3]

        def body(j, _):
            sl = pl.dslice(j * CHUNK, CHUNK)
            d0 = r0 - qt_ref[0:1, sl]
            d1 = r1 - qt_ref[1:2, sl]
            d2 = r2 - qt_ref[2:3, sl]
            dist = d0 * d0 + d1 * d1 + d2 * d2   # (TILE, CHUNK) on VPU

            # sublane (axis=0) min+argmin per lane; running carries in VMEM
            tmin = jnp.min(dist, axis=0)
            targ = jnp.argmin(dist, axis=0).astype(jnp.int32) + i * TILE
            cm = col_min[sl]
            ci = col_idx[sl]
            bet = tmin < cm
            col_min[sl] = jnp.where(bet, tmin, cm)
            col_idx[sl] = jnp.where(bet, targ, ci)
            return 0

        # fori_loop (not unrolled): an unrolled sweep keeps several 4 MB
        # distance slabs live at once and blows the 16 MB scoped-VMEM limit
        lax.fori_loop(0, nj, body, 0)

        @pl.when(i == ni - 1)
        def _():
            idx_ref[0, :] = col_idx[:]

    return kernel


def _pad_vec(v, n):
    """Pad a 1-D validity vector to n entries with zeros (invalid)."""
    pad = n - v.shape[0]
    return jnp.pad(v, (0, pad)) if pad else v


def _prep(pts, valid, n, sentinel):
    """Move invalid points to the sentinel and pad to n rows with it."""
    if valid is not None:
        pts = jnp.where(valid[:, None] > 0.0, pts, sentinel)
    pad = n - pts.shape[0]
    if pad:
        pts = jnp.pad(pts, ((0, pad), (0, 0)), constant_values=sentinel)
    return pts


def _nearest_sweep(blocks, lanes_t, interpret):
    """One direction: argmin over `blocks` rows for every column of the
    transposed lane cloud ``lanes_t`` (3, Qp). Shapes pre-padded."""
    ni = blocks.shape[0] // TILE
    nq = lanes_t.shape[1]
    (idx,) = pl.pallas_call(
        _make_kernel(nq // CHUNK),
        grid=(ni,),
        in_specs=[
            pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # whole lane cloud resident in VMEM, transposed so coordinate
            # rows are lane-major (constant index -> one DMA)
            pl.BlockSpec((3, nq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nq), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, nq), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((nq,), jnp.float32),
            pltpu.VMEM((nq,), jnp.int32),
        ],
        interpret=interpret,
    )(blocks, lanes_t)
    return idx.reshape(-1)


def nearest_idx_pallas(X, Y, x_valid=None, y_valid=None, interpret=False,
                       two_dir=True):
    """Pallas drop-in for ops.chamfer.nearest_idx (same contract; indices at
    invalid rows are arbitrary — callers mask them).

    PRECONDITION — coordinate magnitude: invalid/padded points are moved to
    the +-1e5 sentinels (``_SENTINEL``), so a valid pairing only reliably
    beats an invalid one when cloud extents are far below 1e5. That holds
    for the scale_mat-normalised clouds in the loss path (extent ~1), but
    un-normalised (raw metric / COLMAP-scale) clouds with coordinates
    approaching 1e5 would silently mis-pair; a debug assert below guards
    this outside jit.

    ``two_dir=False`` returns only idx_x (X -> Y) in one sweep."""
    if not isinstance(X, jax.core.Tracer):  # debug-mode magnitude guard
        m = max(float(jnp.max(jnp.abs(X))), float(jnp.max(jnp.abs(Y))))
        assert m < _SENTINEL / 10.0, (
            f"nearest_idx_pallas: max |coord| {m:.3g} too close to the "
            f"padding sentinel {_SENTINEL:.0g}; normalise the clouds "
            "(scale_mat) or use ops.chamfer.nearest_idx"
        )
    X = lax.stop_gradient(X)
    Y = lax.stop_gradient(Y)
    S, D = X.shape[0], Y.shape[0]
    Sp = -(-S // TILE) * TILE
    Dp = -(-D // TILE) * TILE
    Xp = _prep(X, x_valid, Sp, _SENTINEL)
    Yp = _prep(Y, y_valid, Dp, -_SENTINEL)

    # X -> Y: X in lanes, Y in blocks (reduced over sublanes)
    idx_x = _nearest_sweep(Yp, Xp.T, interpret)[:S]
    if not two_dir:
        return idx_x
    # Y -> X: mirrored sweep
    idx_y = _nearest_sweep(Xp, Yp.T, interpret)[:D]
    return idx_x, idx_y


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


def chamfer_loss_pallas_sharded(X, Y, mesh, interpret=False):
    """Symmetric Chamfer with the Pallas argmin under a ray mesh.

    The GSPMD partitioner cannot split a custom call, so the kernel runs
    per-shard under ``shard_map``: each device owns a slice of X (and of Y)
    and sweeps it against the **all-gathered** other cloud — Y is ~0.4 MB at
    Tanks scale, so the gather is noise on ICI while the O(S·D) distance
    work divides by the mesh size. Each direction is one single-sweep kernel
    call (``two_dir=False``) with the shard's points in the lane dimension
    and the gathered full cloud in blocks. Differentiable exactly like
    :func:`chamfer_loss_pallas` — argmin is gradient-free, the
    distance-to-gathered-point is autodiffed, and ``all_gather``'s
    transpose (reduce-scatter) routes the Y-side gradients home.

    Pads both clouds to the mesh size with sentinel coordinates (masked out
    of the means). Replaces VERDICT r1 item 8's ``mesh is None`` fallback.
    """
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    S, D = X.shape[0], Y.shape[0]
    Sp = -(-S // n_dev) * n_dev
    Dp = -(-D // n_dev) * n_dev
    xv = _pad_vec(jnp.ones(S), Sp)
    yv = _pad_vec(jnp.ones(D), Dp)
    Xp = _prep(X, None, Sp, _SENTINEL)
    Yp = _prep(Y, None, Dp, -_SENTINEL)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        # pallas_call's out_shape carries no varying-mesh-axes info, which
        # trips jax>=0.8's vma checker; the collectives here are explicit
        check_vma=False,
    )
    def f(xs, xvs, ys, yvs):
        Yf = jax.lax.all_gather(ys, axis, tiled=True)
        Xf = jax.lax.all_gather(xs, axis, tiled=True)
        idx_x = nearest_idx_pallas(xs, Yf, interpret=interpret,
                                   two_dir=False)
        idx_y = nearest_idx_pallas(ys, Xf, interpret=interpret,
                                   two_dir=False)
        dxv = xs - Yf[idx_x]
        dyv = ys - Xf[idx_y]
        dx = jnp.sqrt(jnp.maximum(jnp.sum(dxv * dxv, axis=-1), 1e-24))
        dy = jnp.sqrt(jnp.maximum(jnp.sum(dyv * dyv, axis=-1), 1e-24))
        sx = jax.lax.psum(jnp.sum(dx * xvs), axis)
        sy = jax.lax.psum(jnp.sum(dy * yvs), axis)
        nx = jax.lax.psum(jnp.sum(xvs), axis)
        ny = jax.lax.psum(jnp.sum(yvs), axis)
        return sx / jnp.maximum(nx, 1.0) + sy / jnp.maximum(ny, 1.0)

    return f(Xp, xv, Yp, yv)
