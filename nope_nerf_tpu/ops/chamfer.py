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

# Fitted v5e cost models for ``tpu.chamfer_mode: auto`` (r4/r5 standalone
# measurements, equal clouds). Exact cost scales with S·D (dense VPU
# sweeps, `ops/pallas/chamfer_kernel.py`): 8.7 ms at 32,400². Grid cost
# scales roughly with S+D (merge-rank sort + fixed Morton windows): 10.1 ms
# at 32,400+32,400. Band cost scales with S·band (projection-guided sweeps,
# `ops/pallas/chamfer_band.py`): 1.8 ms dual-direction at 32,400². The
# per-unit constants are v5e measurements — retune via
# ``tpu.chamfer_auto_exact_ms`` / ``chamfer_auto_grid_ms`` on other
# generations (the RATIO is what decides, so modest drift is harmless).
_EXACT_MS_PER_PAIR = 8.7 / (32400.0 * 32400.0)
_GRID_MS_PER_POINT = 10.1 / 64800.0

_warned_auto = set()


def resolve_chamfer_mode(mode: str, n_x: int, n_y: int,
                         n_devices: int = 1, sharded_exact: bool = True,
                         hints_available: bool = False,
                         exact_ms_per_pair: float | None = None,
                         grid_ms_per_point: float | None = None) -> str:
    """Resolve ``'auto'`` to ``'band'``/``'exact'``/``'grid'`` from static
    cloud sizes.

    ``n_x``/``n_y`` are trace-time constants ((h/pc_ratio)·(w/pc_ratio) per
    cloud), so the choice is made once per compilation, never per step.

    Preference order: ``band`` whenever projection hints exist (the
    training pc loss always has them — linear cost, <=2%% argmin deviation
    gated on the production distribution, tests/test_chamfer_band.py);
    otherwise the cheaper of ``exact`` (bitwise reference semantics,
    cost ~ S·D) and ``grid`` (Morton windows, cost ~ S+D) by the fitted
    v5e cost models — each on its own scaling law, not a single product
    threshold (a 10k x 150k asymmetric pair is exact-cheap but
    product-large).

    The exact kernel's cost divides by ``n_devices`` ONLY when the
    per-shard Pallas path will actually run (``sharded_exact`` — i.e.
    use_pallas on a TPU mesh, `chamfer_loss_pallas_sharded`); the grid
    sort runs unsharded either way. Resolving to the approximate ``grid``
    emits a one-time warning so the parity deviation is visible.
    """
    if mode != "auto":
        return mode
    if hints_available:
        return "band"
    eff_dev = max(int(n_devices), 1) if sharded_exact else 1
    e_ms = (exact_ms_per_pair or _EXACT_MS_PER_PAIR)
    g_ms = (grid_ms_per_point or _GRID_MS_PER_POINT)
    exact_cost = float(n_x) * float(n_y) * e_ms / eff_dev
    grid_cost = (float(n_x) + float(n_y)) * g_ms
    if exact_cost <= grid_cost:
        return "exact"
    key = (n_x, n_y, eff_dev)
    if key not in _warned_auto:
        _warned_auto.add(key)
        import warnings

        warnings.warn(
            f"chamfer_mode 'auto' picked the APPROXIMATE Morton-window "
            f"mode for cloud sizes ({n_x}, {n_y}) (est. exact "
            f"{exact_cost:.1f} ms vs grid {grid_cost:.1f} ms/step); "
            "~1-3% of points get a nearby-but-not-nearest match "
            "(PARITY.md). Set tpu.chamfer_mode: exact to pin reference "
            "semantics.")
    return "grid"


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


def _morton_code(P, lo, inv_extent, probe=0):
    """30-bit Morton (Z-order) code per point: quantise each axis to 10 bits
    and interleave. Integer bit-spread runs on the VPU; no gathers.

    ``probe`` selects a different space-filling curve (origin shift + axis
    interleave permutation): Z-order misses neighbours that straddle a cell
    boundary, and a second probe with shifted boundaries / different axis
    priority recovers most of them (min-distance combine in the caller).
    """
    # 768 bins with 0.3-extent headroom so the probe-1 origin shift stays
    # inside the 10-bit range
    q = jnp.clip((((P - lo) * inv_extent + 0.3 * probe) * 768.0)
                 .astype(jnp.int32), 0, 1023)

    def spread(v):
        # classic 10-bit spread: b9..b0 -> bits 27,24,...,0
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    a, b, c = (0, 1, 2) if probe == 0 else (1, 2, 0)
    return (
        (spread(q[:, c]) << 2) | (spread(q[:, b]) << 1) | spread(q[:, a])
    )


def _window_direction(Xs, Ys, pos_sorted, window, block):
    """Nearest index into ``Ys`` for every row of ``Xs`` (both Morton-sorted),
    searching only a ``window`` of Morton-consecutive Ys shared per ``block``
    of consecutive Xs.

    Consecutive sorted Xs have nearly identical candidate windows, so each
    block reads ONE contiguous (window, 3) slab and the (block, window)
    score tile is a single MXU matmul — no per-point gathers.
    """
    S, D = Xs.shape[0], Ys.shape[0]
    nb = S // block
    # window start per block: centre on the block's median insertion rank
    mid = pos_sorted.reshape(nb, block)[:, block // 2]
    start = jnp.clip(mid - window // 2, 0, max(D - window, 0))
    widx = start[:, None] + jnp.arange(window)[None, :]          # (nb, W)
    Yw = Ys[widx]                                                # (nb, W, 3)
    yy = jnp.sum(Yw * Yw, axis=-1)                               # (nb, W)
    Xb = Xs.reshape(nb, block, 3)
    scores = yy[:, None, :] - 2.0 * lax.dot_general(
        Xb, Yw, (((2,), (2,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                                            # (nb, B, W)
    a = jnp.argmin(scores, axis=-1).astype(jnp.int32)            # (nb, B)
    return (start[:, None] + a).reshape(-1)                      # idx into Ys


def nearest_idx_window(X, Y, window: int = 512, block: int = 128):
    """APPROXIMATE nearest neighbours via Morton-order sorted windows
    (``tpu.chamfer_mode: grid``).

    Both clouds are sorted along a Z-order space-filling curve; each point
    searches only the ``window`` Morton-consecutive candidates around its own
    insertion rank, with the window shared per ``block`` of consecutive
    queries so the candidate slab is one contiguous read and the score tile
    one batched MXU matmul — O(S·window) work instead of the exact kernel's
    O(S·D) VPU passes (`ops/pallas/chamfer_kernel.py`). Measured (r4, v5e,
    standalone): 10.1 vs the v4 exact kernel's 8.7 ms at 32,400² (exact wins
    at Tanks defaults), 18.3 vs 26.7 at 64,800², 35.9 vs 96.3 at 129,600² —
    grid wins above the ~37.6k-point crossover and scales linearly where
    exact grows quadratically (``chamfer_mode: auto`` picks accordingly).
    Z-order discontinuities can miss the true NN for a small
    fraction of points (measured ~1–3% on depth-map surface clouds, with the
    found neighbour still nearby), which perturbs the Chamfer mean by <1%%;
    convergence parity vs exact mode is pinned by
    tests/test_round3.py::test_chamfer_grid_convergence.

    Same contract as :func:`nearest_idx` (without validity masks — the
    production loss path passes full clouds): returns
    (idx_x (S,) int32 into Y, idx_y (D,) int32 into X). Forward-only.
    """
    X = lax.stop_gradient(X)
    Y = lax.stop_gradient(Y)
    S, D = X.shape[0], Y.shape[0]
    allp = jnp.concatenate([X, Y], axis=0)
    lo = jnp.min(allp, axis=0)
    inv_extent = 1.0 / jnp.maximum(jnp.max(allp, axis=0) - lo, 1e-12)

    # pad the QUERY side to a block multiple (padded rows reuse the last
    # row's rank; their results are dropped on unsort)
    def pad_q(a, n):
        p = (-a.shape[0]) % n
        if p == 0:
            return a
        return jnp.concatenate([a, jnp.repeat(a[-1:], p, axis=0)], axis=0)

    # ONE batched merge-sort for both probes, positions by merge-rank.
    # TPU cost model (r3 traces): the sort itself is cheap once batched
    # (0.23 ms/step for a (4, 32k) lax.sort), but jnp.searchsorted is NOT —
    # each call lowers to a 15-pass binary-search gather chain, and the four
    # calls cost 13.3 ms/step, more than the exact kernel's whole argmin.
    # Both are replaced by sorting the tagged CONCATENATION of the two
    # clouds' codes (X tagged 0, Y tagged 1, tag in the LSB below the
    # 30-bit code): after the sort, a prefix count of X-membership gives
    # every element its rank within its own cloud, and
    #   pos_x[i] = combined_position - own_rank = #{cy < cx[i]}
    # falls out as arithmetic — the per-cloud orderings AND both
    # searchsorted results from one (2, S+D) sort plus cumsums/scatters.
    n2 = S + D
    # Tagged keys sort as UNSIGNED: the 30-bit Morton code shifted by the
    # 1-bit tag peaks at exactly 2^31-1, which is INT32_MAX with zero
    # headroom — any future widening of the code (more bins, a larger probe
    # shift) would overflow a signed key to negative and corrupt the merge
    # order. uint32 doubles the headroom to 31 code bits; codes must stay
    # <= 31 bits (currently 30, _morton_code).
    comb = jnp.stack([
        jnp.concatenate([
            _morton_code(X, lo, inv_extent, p).astype(jnp.uint32) << 1,
            (_morton_code(Y, lo, inv_extent, p).astype(jnp.uint32) << 1) | 1,
        ]) for p in (0, 1)
    ])                                                       # (2, n2) uint32
    iota = jnp.broadcast_to(jnp.arange(n2, dtype=jnp.int32), (2, n2))
    _, perm_c = lax.sort((comb, iota), dimension=1, num_keys=1)

    def one_probe(probe):
        pc = perm_c[probe]                       # combined order -> concat idx
        is_x = pc < S
        i_rank = jnp.cumsum(is_x) - 1            # X-rank at each combined pos
        j_rank = jnp.cumsum(~is_x) - 1           # Y-rank likewise
        p_pos = jnp.arange(n2, dtype=jnp.int32)
        # scatter combined-order rows to per-cloud sorted slots ('drop'
        # discards the other cloud's rows via an out-of-bounds index)
        def split(rank, mask, src, size):
            tgt = jnp.where(mask, rank, size)
            return jnp.zeros((size,), jnp.int32).at[tgt].set(
                src, mode="drop")

        perm_x = split(i_rank, is_x, pc, S)                   # sorted X order
        perm_y = split(j_rank, ~is_x, pc - S, D)
        pos_x = split(i_rank, is_x, p_pos - i_rank, S)        # #Y before
        pos_y = split(j_rank, ~is_x, p_pos - j_rank, D)       # #X before
        Xs = X[perm_x]
        Ys = Y[perm_y]
        idx_xs = _window_direction(pad_q(Xs, block), Ys,
                                   pad_q(pos_x, block),
                                   min(window, D), block)[:S]
        idx_ys = _window_direction(pad_q(Ys, block), Xs,
                                   pad_q(pos_y, block),
                                   min(window, S), block)[:D]
        # map back to original orderings: result row i must describe X[i]
        idx_x = jnp.zeros((S,), jnp.int32).at[perm_x].set(perm_y[idx_xs])
        idx_y = jnp.zeros((D,), jnp.int32).at[perm_y].set(perm_x[idx_ys])
        return idx_x, idx_y

    def d2(A, B, idx):
        diff = A - B[idx]
        return jnp.sum(diff * diff, axis=-1)

    # two space-filling-curve probes, min-distance combine: recovers the
    # neighbours probe 0 loses across Z-order cell boundaries
    ix0, iy0 = one_probe(0)
    ix1, iy1 = one_probe(1)
    idx_x = jnp.where(d2(X, Y, ix0) <= d2(X, Y, ix1), ix0, ix1)
    idx_y = jnp.where(d2(Y, X, iy0) <= d2(Y, X, iy1), iy0, iy1)
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


def chamfer_loss_window(X, Y, window: int = 512, block: int = 128):
    """Symmetric Chamfer with the approximate Morton-window NN
    (:func:`nearest_idx_window`); same differentiable gather-distance form
    as :func:`chamfer_loss`."""
    idx_x, idx_y = nearest_idx_window(X, Y, window=window, block=block)
    dxv = X - Y[idx_x]
    dyv = Y - X[idx_y]
    dx = jnp.sqrt(jnp.maximum(jnp.sum(dxv * dxv, axis=-1), 1e-24))
    dy = jnp.sqrt(jnp.maximum(jnp.sum(dyv * dyv, axis=-1), 1e-24))
    return jnp.mean(dx) + jnp.mean(dy)
