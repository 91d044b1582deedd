"""Fused two-direction Chamfer argmin as a Pallas TPU kernel.

The XLA formulation (ops/chamfer.py) evaluates the (block, D) score tile per
direction and lets XLA reduce it — at Tanks scale that materialises GBs of
HBM traffic per step and computes the x·yᵀ dot twice.

Kernel layout (v3): at Tanks scale the whole Y cloud is tiny
(32,400 x 3 f32 = 389 KB), so Y (stored transposed, (3, D)) and the column
carries stay **resident in VMEM** for the entire kernel. The grid runs over
X blocks only (ni = S/TILE_X steps); each grid step sweeps Y in CHUNK_Y
slices with an in-kernel ``fori_loop``.

The squared-distance tile is computed DIRECTLY on the VPU:

    D_ij = Σ_k (x_ik − y_jk)²   (3 sub + 3 fma broadcasts per tile)

not as the xx − 2·x·yᵀ + yy MXU dot of v1/v2: a (TILE_X, CHUNK_Y) matmul with
K=3 is systolic-latency bound — the MXU emits a 128x128 output tile per pass
regardless of K, so the "free FLOPs" formulation ran slower than the VPU
broadcast (and subtracting near-equal products also loses precision). The
tile is shared by BOTH argmin directions.

Validity and padding cost ZERO in-kernel work: invalid/padded X points are
moved to the (+1e5,...) sentinel and Y points to (−1e5,...) on the host side,
so any pairing that involves an invalid point has squared distance ≥ 1e10 —
about 6 orders of magnitude beyond any real scene distance — and never wins
an argmin against a valid pair. (v2 carried +BIG bias vectors instead, which
cost two extra full (TILE_X, CHUNK_Y) VPU passes per tile.) Indices returned
for *invalid* X rows / Y columns are arbitrary valid-region indices; callers
mask them out of the loss, matching the reference's semantics where invalid
points are dropped before the distance matrix (`model/losses.py:127-141`).

* row argmin of D (X→Y) carried through the fori_loop;
* column argmin of D (Y→X) carried in (Dp,) VMEM scratch across grid steps,
  flushed at i == ni-1.

Live VMEM: Yᵀ (0.4 MB) + distance slab (4 MB) + carries — far under the
~16 MB/core scoped limit. HBM traffic collapses to the point clouds
themselves. Forward-only (argmin indices carry no gradient —
`model/losses.py:137-141` semantics); the differentiable
distance-to-gathered-point happens outside.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_X = 1024    # X rows per grid step
CHUNK_Y = 1024   # Y columns per inner-loop slice (4 MB f32 distance slab)
_BIG = 1e10      # any invalid pairing scores >= (sentinel distance)^2 = 1e10
_SENTINEL = 1e5  # X moved to +S, Y to -S: valid<->invalid >= S^2, inv<->inv 4S^2


def _make_kernel(nj, two_dir=True):
    """``two_dir=False`` builds the row-only (X -> Y) variant: no column
    scratch, no per-tile column min/argmin passes — the per-shard sharded
    loss sweeps each direction with its own call and would otherwise pay
    the unused reduction on every tile."""

    def kernel(x_ref, yt_ref, idx_x_ref, *rest):
        i = pl.program_id(0)
        ni = pl.num_programs(0)
        if two_dir:
            idx_y_ref, col_min, col_idx = rest

            @pl.when(i == 0)
            def _():
                col_min[:] = jnp.full(col_min.shape, _BIG, jnp.float32)
                col_idx[:] = jnp.zeros(col_idx.shape, jnp.int32)

        # (TILE_X, 1) coordinate columns — broadcast against the lane-major
        # (1, CHUNK_Y) Y rows below
        x0 = x_ref[:, 0:1]
        x1 = x_ref[:, 1:2]
        x2 = x_ref[:, 2:3]

        def body(j, carry):
            row_min, row_idx = carry
            sl = pl.dslice(j * CHUNK_Y, CHUNK_Y)
            d0 = x0 - yt_ref[0:1, sl]
            d1 = x1 - yt_ref[1:2, sl]
            d2 = x2 - yt_ref[2:3, sl]
            dist = d0 * d0 + d1 * d1 + d2 * d2   # (TILE_X, CHUNK_Y) on VPU

            # --- direction X -> Y: row argmin ------------------------------
            tmin = jnp.min(dist, axis=1)
            targ = jnp.argmin(dist, axis=1).astype(jnp.int32) + j * CHUNK_Y
            better = tmin < row_min
            row_min = jnp.where(better, tmin, row_min)
            row_idx = jnp.where(better, targ, row_idx)

            if two_dir:
                # --- direction Y -> X: column argmin -----------------------
                tmin_y = jnp.min(dist, axis=0)
                targ_y = jnp.argmin(dist, axis=0).astype(jnp.int32) \
                    + i * TILE_X
                cm = col_min[sl]
                ci = col_idx[sl]
                bet = tmin_y < cm
                col_min[sl] = jnp.where(bet, tmin_y, cm)
                col_idx[sl] = jnp.where(bet, targ_y, ci)
            return row_min, row_idx

        row_min0 = jnp.full((TILE_X,), _BIG, jnp.float32)
        row_idx0 = jnp.zeros((TILE_X,), jnp.int32)
        # fori_loop (not unrolled): an unrolled sweep keeps several 4 MB
        # distance slabs live at once and blows the 16 MB scoped-VMEM limit
        _, row_idx = lax.fori_loop(0, nj, body, (row_min0, row_idx0))
        idx_x_ref[i, :] = row_idx

        if two_dir:
            @pl.when(i == ni - 1)
            def _():
                idx_y_ref[0, :] = col_idx[:]

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


def nearest_idx_pallas(X, Y, x_valid=None, y_valid=None, interpret=False,
                       two_dir=True):
    """Pallas drop-in for ops.chamfer.nearest_idx (same contract; indices at
    invalid rows/columns are arbitrary — callers mask them).

    PRECONDITION — coordinate magnitude: invalid/padded points are moved to
    the +-1e5 sentinels (``_SENTINEL``), so a valid pairing only reliably
    beats an invalid one when cloud extents are far below 1e5. That holds
    for the scale_mat-normalised clouds in the loss path (extent ~1), but
    un-normalised (raw metric / COLMAP-scale) clouds with coordinates
    approaching 1e5 would silently mis-pair; a debug assert below guards
    this outside jit.

    ``two_dir=False`` returns only idx_x (X -> Y) and skips the column
    reduction entirely."""
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
    Sp = -(-S // TILE_X) * TILE_X
    Dp = -(-D // CHUNK_Y) * CHUNK_Y
    Xp = _prep(X, x_valid, Sp, _SENTINEL)
    Yp = _prep(Y, y_valid, Dp, -_SENTINEL)

    ni, nj = Sp // TILE_X, Dp // CHUNK_Y
    # full-array output blocks (VMEM-resident for the whole kernel):
    # written with dynamic row indices at the flush steps
    out_specs = [
        pl.BlockSpec((ni, TILE_X), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((ni, TILE_X), jnp.int32)]
    scratch = []
    if two_dir:
        out_specs.append(
            pl.BlockSpec((1, Dp), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((1, Dp), jnp.int32))
        scratch = [
            pltpu.VMEM((Dp,), jnp.float32),
            pltpu.VMEM((Dp,), jnp.int32),
        ]
    outs = pl.pallas_call(
        _make_kernel(nj, two_dir),
        grid=(ni,),
        in_specs=[
            pl.BlockSpec((TILE_X, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # whole Y cloud resident in VMEM, transposed so coordinate rows
            # are lane-major (constant index -> one DMA)
            pl.BlockSpec((3, Dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(Xp, Yp.T)
    if not two_dir:
        return outs[0].reshape(-1)[:S]
    idx_x, idx_y = outs
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


def chamfer_loss_pallas_sharded(X, Y, mesh, interpret=False):
    """Symmetric Chamfer with the Pallas argmin under a ray mesh.

    The GSPMD partitioner cannot split a custom call, so the kernel runs
    per-shard under ``shard_map``: each device owns a slice of X (and of Y)
    and sweeps it against the **all-gathered** other cloud — Y is ~0.4 MB at
    Tanks scale, so the gather is noise on ICI while the O(S·D) distance
    work divides by the mesh size. Each direction is one ROW-ONLY kernel
    call (``two_dir=False``) on its owner's rows — the combined
    two-direction kernel would need a cross-device argmin merge, and its
    column passes would be dead work here. Differentiable exactly like
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
