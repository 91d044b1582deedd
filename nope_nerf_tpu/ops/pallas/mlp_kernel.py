"""Fused NeRF-MLP forward AND backward as Pallas TPU kernels.

XLA runs the 10-matmul field chain as separate MXU ops with every (M, 256)
activation round-tripping HBM; at the training batch (131k points) the chain
is HBM-bandwidth bound even with bf16 activations (~5.5 ms/step fwd+bwd,
profiler r2). These kernels keep the whole chain — positional encoding,
trunk, skip concat, heads — in VMEM per point-tile:

* **forward**: HBM traffic collapses to the raw (M, 3) points/directions
  and the (M, 4) raw head outputs; weights (1.2 MB bf16) stay VMEM-resident
  across grid steps.
* **backward**: one kernel recomputes the forward per tile (activations
  held in VMEM as bf16 — exactly the operands the MXU consumed in forward)
  and produces the encoding-input cotangents per tile plus all weight/bias
  gradients, accumulated f32 in VMEM across grid steps and flushed once.
  The dx and dW matmuls read each activation from VMEM instead of HBM,
  which is the whole win: in the XLA path each backward matmul re-streamed
  134 MB.

**Positional encoding lives in-kernel**: a constant (3, 63) selector matmul
(iota-built; frequencies are powers of two, so the expansion is exact in
f32) spreads the 3 coordinates over the scaled channels on the MXU, then
``enc = raw_mask * p + sin_mask * sin(p) + cos_mask * cos(p)`` with
iota-built 0/1 masks — no (M, L, C) stacks, concats or reshapes, f32 sin
arguments (sin(2^9 x) in bf16 would be garbage), and the encoding backward
(cos/sin chain) reuses the forward's sin/cos in the same kernel. The
reference channel order [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), ...]
(`model/official_nerf.py:99-119`, ops/encoding.py) is reproduced by the
mask layout.

All matmuls run with bf16 operands and f32 MXU accumulation; biases are
added in f32 (a bf16 bias shifts relu boundaries and the flipped backward
masks compound through the chain). Same numerics as the XLA ``mlp_bf16``
path, so switching kernels does not change the training trajectory beyond
bf16 round-off.

**Head activations run in the kernel epilogue** (``_act_fwd``): softplus or
relu (optionally occupancy-alpha) on density and the rgb sigmoid are applied
f32 in-kernel fused with the head matmuls, so ``fused_mlp`` returns
post-activation rgb/density and the backward consumes cotangents of the
activated heads (selected via the ``act``/``occ_alpha`` arguments).

Reference semantics being accelerated: the 8-layer skip MLP + heads of
`model/official_nerf.py:8-97`, evaluated at `model/rendering.py:108-117`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 1024  # points per grid step

# test hook: run the kernels in interpreter mode (CPU parity tests)
INTERPRET = False

# parameter layout: (name, (fan_in, fan_out)) in kernel argument order
W_NAMES = (
    "trunk0_0", "trunk0_1", "trunk0_2", "trunk0_3",
    "trunk1_0", "trunk1_1", "trunk1_2", "trunk1_3",
    "fc_density", "fc_feature", "rgb_layer", "fc_rgb",
)

_BF = jnp.bfloat16
_F32 = jnp.float32


def _enc_masks(levels, c=3):
    """(raw, sin, cos) 0/1 masks of shape (1, c*(2*levels+1)) matching the
    reference channel order [x, sin_0, cos_0, sin_1, cos_1, ...].

    Built from an in-kernel iota (Pallas kernels may not capture non-scalar
    constants): channel block b = k // c is raw at b == 0, sin at odd b,
    cos at even b > 0."""
    n = c * (2 * levels + 1)
    blk = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) // c
    raw = (blk == 0).astype(_F32)
    sin = ((blk > 0) & (blk % 2 == 1)).astype(_F32)
    cos = ((blk > 0) & (blk % 2 == 0)).astype(_F32)
    return raw, sin, cos


def _enc_selector(levels, c=3):
    """(c, c*(2*levels+1)) channel-expansion matrix built from iotas:
    S[r, k] = freq(k) if k % c == r else 0, freq = 1 for the raw block and
    2^level for the sin/cos blocks. ``pts @ S`` replaces the host-side
    tile-and-scale (the expansion rides the MXU; exact — frequencies are
    powers of two)."""
    n = c * (2 * levels + 1)
    k = jax.lax.broadcasted_iota(jnp.int32, (c, n), 1)
    r = jax.lax.broadcasted_iota(jnp.int32, (c, n), 0)
    blk = k // c
    lvl = jnp.maximum((blk - 1) // 2, 0)
    freq = jnp.exp2(lvl.astype(_F32))
    return jnp.where(k % c == r, freq, 0.0)


def _split3(v):
    """Exact 3-way bf16 split of an f32 array: v = v0 + v1 + v2 to within
    2^-27 relative (24 = 3x8 mantissa bits; each residual v - rn8(v) is
    f32-representable by Sterbenz), so a dot against a bf16-EXACT operand
    in three bf16 passes matches HIGHEST to ~1 ulp at half its MXU cost."""
    v0 = v.astype(_BF)
    e0 = v - v0.astype(_F32)
    v1 = e0.astype(_BF)
    v2 = (e0 - v1.astype(_F32)).astype(_BF)
    return v0, v1, v2


def _encode_fwd(pts, levels):
    """(BM, c) points -> (enc (BM, n) f32, pt (BM, n), sin, cos) with the
    scaled-channel expansion exact on the MXU: positions feed sin(2^9 x),
    so anything short of f32 accuracy here is amplified 512x. The selector
    is bf16-exact (0 / powers of two), so the 3-pass :func:`_split3` dot
    matches 6-pass HIGHEST to ~1 ulp; on-device A/B traces (r3) showed it
    0.06 ms/step faster (17.106 vs 17.164) — wall-clock bench runs could
    NOT resolve this (session noise ±1.3%%)."""
    sel = _enc_selector(levels, pts.shape[1]).astype(_BF)
    pt = sum(
        jax.lax.dot_general(p, sel, (((1,), (0,)), ((), ())),
                            preferred_element_type=_F32)
        for p in _split3(pts)
    )
    s = jnp.sin(pt)
    c = jnp.cos(pt)
    raw, sinm, cosm = _enc_masks(levels, pts.shape[1])
    return raw * pt + sinm * s + cosm * c, s, c


def _encode_bwd(g, s, c, levels, nc):
    """d(pts) from d(enc), reusing the forward's sin/cos."""
    raw, sinm, cosm = _enc_masks(levels, nc)
    g_pt = g * (raw + sinm * c - cosm * s)
    sel = _enc_selector(levels, nc).astype(_BF)
    return sum(
        jax.lax.dot_general(p, sel, (((1,), (1,)), ((), ())),
                            preferred_element_type=_F32)
        for p in _split3(g_pt)
    )


def _mm(a, b):
    """a @ b, bf16 operands, f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(_BF), b.astype(_BF), (((1,), (0,)), ((), ())),
        preferred_element_type=_F32,
    )


def _mm_t(g, w):
    """g @ w.T (dx): contract on w's output dim."""
    return jax.lax.dot_general(
        g.astype(_BF), w.astype(_BF), (((1,), (1,)), ((), ())),
        preferred_element_type=_F32,
    )


def _mm_acc(a, g):
    """a.T @ g (dW): contract on the point dim."""
    return jax.lax.dot_general(
        a.astype(_BF), g.astype(_BF), (((0,), (0,)), ((), ())),
        preferred_element_type=_F32,
    )


def _fwd_chain(enc, denc, W):
    """Shared forward: returns (activations dict, raw_sigma, raw_rgb).

    Activations are kept bf16 — the exact matmul operands — so the backward
    recomputation reproduces the forward bit-for-bit.
    """
    a = {}
    h = enc
    for i in range(4):
        w, b = W[f"trunk0_{i}"]
        h = jnp.maximum(_mm(h, w) + b[0], 0.0).astype(_BF)
        a[f"a0{i}"] = h
    cat = jnp.concatenate([h, enc], axis=-1)
    a["cat"] = cat
    h = cat
    for i in range(4):
        w, b = W[f"trunk1_{i}"]
        h = jnp.maximum(_mm(h, w) + b[0], 0.0).astype(_BF)
        a[f"a1{i}"] = h
    wd, bd = W["fc_density"]
    raw_sigma = _mm(h, wd) + bd[0]
    wf, bf = W["fc_feature"]
    feat = (_mm(h, wf) + bf[0]).astype(_BF)
    a["feat"] = feat
    catr = jnp.concatenate([feat, denc], axis=-1)
    a["catr"] = catr
    wr, br = W["rgb_layer"]
    hr = jnp.maximum(_mm(catr, wr) + br[0], 0.0).astype(_BF)
    a["hr"] = hr
    wc, bc = W["fc_rgb"]
    raw_rgb = _mm(hr, wc) + bc[0]
    return a, raw_sigma, raw_rgb


def _weights_dict(args):
    W = {}
    for i, name in enumerate(W_NAMES):
        W[name] = (args[2 * i], args[2 * i + 1])
    return W


def _softplus(x):
    """Numerically stable softplus for in-kernel f32 use."""
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _act_fwd(raw_sigma, raw_rgb, act, occ_alpha):
    """Head activations in the kernel epilogue (VPU, fused with the matmul
    chain — XLA would otherwise run them on (M, 1)/(M, 3) HBM arrays where
    125+/128 lanes idle): density softplus/relu (+ optional occupancy alpha
    1 - exp(-d), `model/official_nerf.py:69-96`), rgb sigmoid."""
    d = _softplus(raw_sigma) if act == "softplus" else jnp.maximum(
        raw_sigma, 0.0)
    if occ_alpha:
        d = 1.0 - jnp.exp(-d)
    return jax.nn.sigmoid(raw_rgb), d


def _act_bwd(raw_sigma, raw_rgb, g_rgb, g_d, act, occ_alpha):
    """Cotangents w.r.t. the raw head outputs, recomputed from the raw
    values already in VMEM."""
    s = jax.nn.sigmoid(raw_rgb)
    g_raw_rgb = g_rgb * s * (1.0 - s)
    if act == "softplus":
        dd = jax.nn.sigmoid(raw_sigma)          # softplus'
        d0 = _softplus(raw_sigma)
    else:
        dd = (raw_sigma > 0.0).astype(_F32)
        d0 = jnp.maximum(raw_sigma, 0.0)
    if occ_alpha:
        dd = dd * jnp.exp(-d0)                  # chain through 1 - exp(-d)
    return g_raw_rgb, g_d * dd


def _make_fwd_kernel(l_pos, l_dir, act, occ_alpha):
    def kernel(pt_ref, dt_ref, *wrefs):
        rgb_ref, sigma_ref = wrefs[-2:]
        W = _weights_dict([r[:] for r in wrefs[:-2]])
        enc = _encode_fwd(pt_ref[:], l_pos)[0].astype(_BF)
        denc = _encode_fwd(dt_ref[:], l_dir)[0].astype(_BF)
        _, raw_sigma, raw_rgb = _fwd_chain(enc, denc, W)
        rgb, d = _act_fwd(raw_sigma, raw_rgb, act, occ_alpha)
        rgb_ref[:] = rgb
        sigma_ref[:] = d

    return kernel


def _make_bwd_kernel(l_pos, l_dir, act, occ_alpha):
    def kernel(pt_ref, dt_ref, grgb_ref, gsig_ref, *rest):
        # rest = 24 weight refs, then outputs:
        #   dpt_out, ddt_out, 24 dW/db accumulators
        wrefs = rest[:24]
        dpt_out, ddt_out = rest[24], rest[25]
        grads = rest[26:]
        W = _weights_dict([r[:] for r in wrefs])

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for g in grads:
                g[:] = jnp.zeros(g.shape, _F32)

        enc_f, sin_p, cos_p = _encode_fwd(pt_ref[:], l_pos)
        denc_f, sin_d, cos_d = _encode_fwd(dt_ref[:], l_dir)
        enc = enc_f.astype(_BF)
        denc = denc_f.astype(_BF)
        a, raw_sigma, raw_rgb = _fwd_chain(enc, denc, W)

        def gidx(name):
            k = W_NAMES.index(name)
            return grads[2 * k], grads[2 * k + 1]

        def acc(name, x, g):
            gw, gb = gidx(name)
            gw[:] += _mm_acc(x, g)
            gb[:] += jnp.sum(g, axis=0, keepdims=True)

        g_rgb, g_sig = _act_bwd(raw_sigma, raw_rgb, grgb_ref[:],
                                gsig_ref[:], act, occ_alpha)

        def relu_mask(x):
            # Mosaic has no cmpf on packed bf16 vectors — compare in f32
            return x.astype(_F32) > 0

        # fc_rgb
        acc("fc_rgb", a["hr"], g_rgb)
        g_hr = _mm_t(g_rgb, W["fc_rgb"][0]) * relu_mask(a["hr"])
        # rgb_layer
        acc("rgb_layer", a["catr"], g_hr)
        g_catr = _mm_t(g_hr, W["rgb_layer"][0])
        g_feat = g_catr[:, : a["feat"].shape[1]]
        g_denc = g_catr[:, a["feat"].shape[1]:]
        ddt_out[:] = _encode_bwd(g_denc, sin_d, cos_d, l_dir,
                                 dt_ref.shape[1])
        # fc_feature + fc_density both feed a13
        acc("fc_feature", a["a13"], g_feat)
        acc("fc_density", a["a13"], g_sig)
        g_h = (
            _mm_t(g_feat, W["fc_feature"][0])
            + _mm_t(g_sig, W["fc_density"][0])
        ) * relu_mask(a["a13"])
        # trunk1 back
        for j in (3, 2, 1, 0):
            x_in = a["cat"] if j == 0 else a[f"a1{j-1}"]
            acc(f"trunk1_{j}", x_in, g_h)
            g_h = _mm_t(g_h, W[f"trunk1_{j}"][0])
            if j > 0:
                g_h = g_h * relu_mask(x_in)
        # split skip concat: g_h is d(cat) = [d a03, d enc_skip]
        d_a03 = g_h[:, : a["a03"].shape[1]] * relu_mask(a["a03"])
        g_enc = g_h[:, a["a03"].shape[1]:]
        g_h = d_a03
        for j in (3, 2, 1, 0):
            x_in = enc if j == 0 else a[f"a0{j-1}"]
            acc(f"trunk0_{j}", x_in, g_h)
            g_h = _mm_t(g_h, W[f"trunk0_{j}"][0])
            if j > 0:
                g_h = g_h * relu_mask(x_in)
        dpt_out[:] = _encode_bwd(g_enc + g_h, sin_p, cos_p, l_pos,
                                 pt_ref.shape[1])

    return kernel


def _wspecs(shapes):
    specs = []
    for s in shapes:
        specs.append(
            pl.BlockSpec(s, (lambda i: (0, 0)), memory_space=pltpu.VMEM)
        )
    return specs


def collect_weights(params):
    """params pytree -> flat f32 tuple in kernel order (biases as (1, n))."""
    ws = []
    for name in W_NAMES:
        ws += [params[name]["w"], params[name]["b"].reshape(1, -1)]
    return tuple(ws)


def _cast_weights(weights):
    """Matrices -> bf16 (MXU operands); biases stay f32 — a bf16 bias shifts
    pre-activations enough to flip relu boundaries vs the XLA path, and the
    flipped backward masks compound exponentially through the chain."""
    return [w.astype(_BF) if i % 2 == 0 else w
            for i, w in enumerate(weights)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_mlp(weights, pts, dirs, l_pos=10, l_dir=4, act="softplus",
              occ_alpha=False):
    """Full encoded-field chain: (24 f32 weight arrays from
    :func:`collect_weights`, pts (M, 3) f32, dirs (M, 3) f32)
    -> (rgb (M, 3) f32 post-sigmoid, density (M, 1) f32 post-activation).

    Positional encoding happens in-kernel (channel expansion on the MXU,
    sin/cos on the VPU, f32); the head activations (``act`` softplus/relu,
    optional occupancy alpha ``occ_alpha``, rgb sigmoid) run in the kernel
    epilogue. Weights are cast to bf16 at the kernel boundary; their
    gradients come back f32 for the Adam update.
    M must be a multiple of BM (callers pad).
    """
    out, _ = _fused_mlp_fwd(weights, pts, dirs, l_pos, l_dir, act, occ_alpha)
    return out


def _fused_mlp_call(weights, pts, dirs, l_pos, l_dir, act="softplus",
                    occ_alpha=False, interpret=None):
    if interpret is None:
        interpret = INTERPRET
    M = pts.shape[0]
    weights = _cast_weights(weights)
    shapes = [w.shape for w in weights]
    grid = (M // BM,)
    rgb, density = pl.pallas_call(
        _make_fwd_kernel(l_pos, l_dir, act, occ_alpha),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + _wspecs(shapes),
        out_specs=[
            pl.BlockSpec((BM, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, 3), _F32),
            jax.ShapeDtypeStruct((M, 1), _F32),
        ],
        interpret=interpret,
    )(pts, dirs, *weights)
    return rgb, density


def _fused_mlp_fwd(weights, pts, dirs, l_pos, l_dir, act, occ_alpha):
    out = _fused_mlp_call(weights, pts, dirs, l_pos, l_dir, act, occ_alpha)
    return out, (weights, pts, dirs)


def _fused_mlp_bwd_call(weights, pts, dirs, g_rgb, g_sigma,
                        l_pos, l_dir, act="softplus", occ_alpha=False,
                        interpret=None):
    if interpret is None:
        interpret = INTERPRET
    M = pts.shape[0]
    weights = _cast_weights(weights)
    shapes = [w.shape for w in weights]
    grid = (M // BM,)
    out_specs = [
        pl.BlockSpec((BM, 3), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BM, 3), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(pts.shape, _F32),
        jax.ShapeDtypeStruct(dirs.shape, _F32),
    ]
    # weight-gradient accumulators: full-array blocks revisited every grid
    # step (zeroed at i == 0), flushed to HBM once at kernel end
    for s in shapes:
        out_specs.append(
            pl.BlockSpec(s, (lambda i: (0, 0)), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct(s, _F32))
    outs = pl.pallas_call(
        _make_bwd_kernel(l_pos, l_dir, act, occ_alpha),
        grid=grid,
        # the recomputed activations + f32 gradient accumulators need ~17 MB;
        # raise the 16 MB default scoped-VMEM limit (v5e has 128 MB VMEM)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        in_specs=[
            pl.BlockSpec((BM, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + _wspecs(shapes),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(pts, dirs, g_rgb, g_sigma, *weights)
    d_pts, d_dirs = outs[0], outs[1]
    d_weights = tuple(outs[2:])
    return d_weights, d_pts, d_dirs


def _fused_mlp_bwd(l_pos, l_dir, act, occ_alpha, res, g):
    weights, pts, dirs = res
    g_rgb, g_sigma = g
    d_weights, d_pts, d_dirs = _fused_mlp_bwd_call(
        weights, pts, dirs,
        g_rgb.astype(_F32), g_sigma.astype(_F32), l_pos, l_dir, act,
        occ_alpha,
    )
    return d_weights, d_pts, d_dirs


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


# ---------------------------------------------------------------------------
# MLP + volume-compositing fusion (round 3)
#
# The r2 step profile showed ~1.1 ms/step of XLA ops around the MLP kernel
# that exist only to feed/drain it: the (N, S, 3) point/direction broadcasts
# (`ops/rendering.py:174-176`, 2x ~105 us), the compositing forward/backward
# reduces (~0.5 ms), and (M, 1) layout artifacts (squeeze-as-reduce + T(1,128)
# relayout copies, ~0.2 ms). This variant moves RAY EXPANSION (pts = origin +
# ray*z) and ALPHA COMPOSITING (`model/rendering.py:119-147` semantics:
# dist_to_alpha, eps-cumprod transmittance, weighted sums, white background)
# into the same kernel, so HBM sees only per-RAY tensors: (R, 3) geometry in,
# (R, 3)+(R, 1)+(R, S) composited results out.
#
# In-kernel layout bridges (Mosaic cannot shape-cast (R*S, 1) <-> (R, S)
# directly — the lane dim changes — but 3-D reshapes that preserve the lane
# dim, (R*S, c) <-> (R, S, c), ARE supported):
# * per-ray <-> per-point moves are sublane broadcasts / tree reductions on
#   the VPU (:func:`_expand_rays` / :func:`_ray_sum` / :func:`_flat_to_2d` /
#   :func:`_2d_to_flat`) — f32-exact and free of MXU passes. The first cut
#   used 0/1 selector MATMULS for all of these; the r4 trace showed those
#   skinny latency-bound passes (16 serial K-tiles at M=R for each
#   K=R*S contraction) dominating the epilogue — the rewrite cut the bwd
#   kernel 4.11 -> 3.62 and the fwd 1.78 -> 1.49 ms/step (r4 trace);
# * per-ray cumprod as a triangular matmul in log space:
#   T = exp(log(1-alpha+eps) @ U), U strictly upper-triangular ones — the
#   (R, S) @ (S, S) dot replaces XLA's lane-serial scan;
#
# The mask/triangular constants are NOT iota-built per grid step: the first
# cut did that and per-tile construction cost more than the fused
# XLA ops it replaced (r3 trace: fwd 1.64->2.27 ms, bwd 3.88->5.00 ms,
# bench 57.3k->55.0k rays/s). They are baked host-side (numpy) and passed
# as constant-index-map inputs, so the pipeline fetches them into VMEM once
# and every later grid step reuses the resident copy — the same mechanism
# that keeps the weights VMEM-resident.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _composite_consts(R, S):
    """Host-built constants: mask (R*S, S) sample selector, U (S, S)
    strictly-upper ones (exclusive log-cumsum), L (S, S) strictly-lower
    ones (the backward's suffix sums)."""
    m = np.arange(R * S)
    s = np.arange(S)
    mask = (m[:, None] % S == s[None, :]).astype(np.float32)
    U = (s[:, None] < s[None, :]).astype(np.float32)
    L = (s[:, None] > s[None, :]).astype(np.float32)
    return mask, U, L


_N_CONSTS = 3


def _const_specs(R, S):
    """BlockSpecs for (mask, U, L): whole-array blocks at a constant
    index, fetched once and VMEM-resident across grid steps."""
    zero = lambda i: (0, 0)  # noqa: E731
    return [
        pl.BlockSpec((R * S, S), zero, memory_space=pltpu.VMEM),
        pl.BlockSpec((S, S), zero, memory_space=pltpu.VMEM),
        pl.BlockSpec((S, S), zero, memory_space=pltpu.VMEM),
    ]


def _bf_dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=_F32)


def _split_hi_lo(x):
    hi = x.astype(_BF)
    lo = (x - hi.astype(_F32)).astype(_BF)
    return hi, lo


def _sel_dot(sel, v, dims, sel_first=True):
    """Two-pass f32 dot for the triangular cumsum contractions (Mosaic has
    no Precision.HIGH): ``sel`` entries are exactly bf16-representable (0/1
    selectors), so only ``v`` needs the hi/lo split — sel@v = sel@v_hi +
    sel@v_lo, accurate to ~2^-18, far below the bf16 MLP's own noise, at
    1/3 the MXU passes of HIGHEST."""
    sb = sel.astype(_BF)
    v_hi, v_lo = _split_hi_lo(v)
    if sel_first:
        return _bf_dot(sb, v_hi, dims) + _bf_dot(sb, v_lo, dims)
    return _bf_dot(v_hi, sb, dims) + _bf_dot(v_lo, sb, dims)


# ---------------------------------------------------------------------------
# Per-ray <-> per-point bridges (r4 rewrite). These relayouts were selector
# MATMULS in the first cut (the (R*S, 1) column layout cannot be shape-cast
# to (R, S) — Mosaic rejects relayouts that change the lane dim). But 3-D
# reshapes that PRESERVE the lane dim ((R*S, c) <-> (R, S, c)) are supported,
# so every bridge is now a sublane broadcast / tree reduction on the VPU:
# EXACT in f32 (the old bf16-split dots matched HIGHEST only to ~1 ulp) and
# free of the latency-bound skinny MXU passes that dominated the epilogue
# (each K=R*S contraction cost 16 serial passes at M=R).
# ---------------------------------------------------------------------------


def _expand_rays(x, S):
    """(R, c) per-ray -> (R*S, c) per-point: sublane broadcast + reshape."""
    R, c = x.shape
    return jnp.reshape(
        jnp.broadcast_to(x[:, None, :], (R, S, c)), (R * S, c))


def _ray_sum(x, S):
    """(R*S, c) per-point -> (R, c) per-ray sums (transpose of
    :func:`_expand_rays`): full-f32 tree reduction over each ray's S rows."""
    M, c = x.shape
    return jnp.sum(jnp.reshape(x, (M // S, S, c)), axis=1)


def _flat_to_2d(v, mask):
    """(R*S, 1) per-point -> (R, S). Exact: the 0/1 mask keeps one lane per
    row, the reduction sums S single-hit rows."""
    M, S = mask.shape
    return jnp.sum(jnp.reshape(v * mask, (M // S, S, S)), axis=1)


def _2d_to_flat(w2, mask):
    """(R, S) -> (R*S, 1). Exact single-hit selection."""
    R, S = w2.shape
    u = jnp.reshape(jnp.broadcast_to(w2[:, None, :], (R, S, S)), (R * S, S))
    return jnp.sum(u * mask, axis=1, keepdims=True)


def _composite_fwd(rgb, d, z, deltas, mask, U, S, dist_alpha, white_bg,
                   heads=True):
    """In-kernel compositing: per-point (rgb (R*S,3), d (R*S,1)) + per-ray
    z/deltas (R, S) -> (rgb_values (R,3), dist (R,1), alpha (R,S), w (R,S),
    trans (R,S), sig2d (R,S)).

    ``heads=False`` (the backward's recompute) skips the rgb/dist epilogue
    dots explicitly — the backward only consumes alpha/w/trans/sig2d.
    (Measured r4: Mosaic does DCE the dead dots, so this is documentation,
    not a perf win — it keeps the recompute's cost model visible.)"""
    R = z.shape[0]
    sig2d = _flat_to_2d(d, mask)
    if dist_alpha:
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
        alpha = 1.0 - jnp.exp(-sig2d * deltas)
        alpha = jnp.where(lane == S - 1, 1.0, alpha)
    else:
        alpha = sig2d
    # transmittance: exclusive cumprod of (1 - alpha + eps) in log space
    trans = jnp.exp(
        _sel_dot(U, jnp.log1p(1e-6 - alpha), ((1,), (0,)), sel_first=False))
    w = alpha * trans
    if not heads:
        return None, None, alpha, w, trans, sig2d
    # weighted rgb sum: flatten w to per-point, multiply, per-ray tree sum
    # (full f32 — the first cut's HIGHEST skinny dot, without the passes)
    rgbv = _ray_sum(_2d_to_flat(w, mask) * rgb, S)      # (R, 3)
    dist = jnp.sum(w * z, axis=1, keepdims=True)        # (R, 1)
    if white_bg:
        acc = jnp.sum(w, axis=1, keepdims=True)
        rgbv = rgbv + (1.0 - acc)
    return rgbv, dist, alpha, w, trans, sig2d


def _composite_bwd(g_rgbv, g_dist, g_alpha, rgb, z, deltas, alpha, w,
                   trans, sig2d, mask, L, S, dist_alpha, white_bg):
    """Cotangents of the composite: -> (g_rgb (R*S,3), g_d (R*S,1)) at the
    post-activation kernel heads."""
    g_rgbv_flat = _expand_rays(g_rgbv, S)               # (R*S, 3)
    # dL/dw
    t = jnp.sum(g_rgbv_flat * rgb, axis=1, keepdims=True)   # (R*S, 1)
    gw = _flat_to_2d(t, mask)                           # (R, S)
    gw = gw + g_dist * z                                # dist = sum w*z
    if white_bg:
        gw = gw - jnp.sum(g_rgbv, axis=1, keepdims=True)
    # dL/dalpha: gw*T direct term minus the transmittance chain
    rsum = _sel_dot(L, gw * w, ((1,), (0,)),
                    sel_first=False)                    # sum_{s>j} gw_s w_s
    ga = gw * trans - rsum / (1.0 - alpha + 1e-6) + g_alpha
    if dist_alpha:
        R = z.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
        # alpha[:, -1] was forced to 1 (no gradient); elsewhere
        # dalpha/dsigma = deltas * exp(-sigma*deltas)
        g_sig2d = jnp.where(
            lane == S - 1, 0.0,
            ga * deltas * jnp.exp(-sig2d * deltas),
        )
    else:
        g_sig2d = ga
    g_d = _2d_to_flat(g_sig2d, mask)                    # (R*S, 1)
    g_rgb = _2d_to_flat(w, mask) * g_rgbv_flat          # (R*S, 3)
    return g_rgb, g_d


def _make_fwd_composite_kernel(l_pos, l_dir, act, occ_alpha, S,
                               dist_alpha, white_bg):
    def kernel(o_ref, r_ref, dt_ref, z_ref, de_ref,
               mask_ref, U_ref, L_ref, *rest):
        del L_ref  # forward only needs the upper-triangular cumsum
        wrefs = rest[:-3]
        rgbv_ref, dist_ref, alpha_ref = rest[-3:]
        W = _weights_dict([r[:] for r in wrefs])
        mask = mask_ref[:]
        # in-kernel (R, S) -> (R*S, 1) bridge: a (R*S, 1) HBM input would
        # occupy 1 of 128 lanes per tile (64x inflated traffic — measured
        # +0.9 ms/step as an input)
        z_flat = _2d_to_flat(z_ref[:], mask)
        pts = (_expand_rays(o_ref[:], S)
               + _expand_rays(r_ref[:], S) * z_flat)
        enc = _encode_fwd(pts, l_pos)[0].astype(_BF)
        # directions are constant along a ray: encode R rows, THEN expand
        # the encoded channels (rowwise encoding commutes with row
        # duplication) — S x fewer transcendentals and no frequency
        # amplification of the bridge error
        denc = _expand_rays(
            _encode_fwd(dt_ref[:], l_dir)[0], S).astype(_BF)
        _, raw_sigma, raw_rgb = _fwd_chain(enc, denc, W)
        rgb, d = _act_fwd(raw_sigma, raw_rgb, act, occ_alpha)
        rgbv, dist, alpha, _, _, _ = _composite_fwd(
            rgb, d, z_ref[:], de_ref[:], mask, U_ref[:], S,
            dist_alpha, white_bg)
        rgbv_ref[:] = rgbv
        dist_ref[:] = dist
        alpha_ref[:] = alpha

    return kernel


def _make_bwd_composite_kernel(l_pos, l_dir, act, occ_alpha, S,
                               dist_alpha, white_bg):
    def kernel(o_ref, r_ref, dt_ref, z_ref, de_ref,
               mask_ref, U_ref, L_ref,
               grgbv_ref, gdist_ref, galpha_ref, *rest):
        wrefs = rest[:24]
        do_out, dr_out, ddt_out = rest[24], rest[25], rest[26]
        grads = rest[27:]
        W = _weights_dict([r[:] for r in wrefs])

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for g in grads:
                g[:] = jnp.zeros(g.shape, _F32)

        mask = mask_ref[:]
        z_flat = _2d_to_flat(z_ref[:], mask)
        pts = (_expand_rays(o_ref[:], S)
               + _expand_rays(r_ref[:], S) * z_flat)
        enc_f, sin_p, cos_p = _encode_fwd(pts, l_pos)
        # per-RAY dir encoding (see forward kernel); sin_d/cos_d stay (R, nd)
        denc_r, sin_d, cos_d = _encode_fwd(dt_ref[:], l_dir)
        enc = enc_f.astype(_BF)
        denc = _expand_rays(denc_r, S).astype(_BF)
        a, raw_sigma, raw_rgb = _fwd_chain(enc, denc, W)
        rgb, d = _act_fwd(raw_sigma, raw_rgb, act, occ_alpha)
        _, _, alpha, w, trans, sig2d = _composite_fwd(
            rgb, d, z_ref[:], de_ref[:], mask, U_ref[:], S,
            dist_alpha, white_bg, heads=False)

        g_rgb, g_sig = _composite_bwd(
            grgbv_ref[:], gdist_ref[:], galpha_ref[:], rgb, z_ref[:],
            de_ref[:], alpha, w, trans, sig2d, mask, L_ref[:], S,
            dist_alpha, white_bg)
        g_rgb, g_sig = _act_bwd(raw_sigma, raw_rgb, g_rgb, g_sig, act,
                                occ_alpha)

        def gidx(name):
            k = W_NAMES.index(name)
            return grads[2 * k], grads[2 * k + 1]

        def acc(name, x, g):
            gw, gb = gidx(name)
            gw[:] += _mm_acc(x, g)
            gb[:] += jnp.sum(g, axis=0, keepdims=True)

        def relu_mask(x):
            # Mosaic has no cmpf on packed bf16 vectors — compare in f32
            return x.astype(_F32) > 0

        # identical weight/input chain to _make_bwd_kernel
        acc("fc_rgb", a["hr"], g_rgb)
        g_hr = _mm_t(g_rgb, W["fc_rgb"][0]) * relu_mask(a["hr"])
        acc("rgb_layer", a["catr"], g_hr)
        g_catr = _mm_t(g_hr, W["rgb_layer"][0])
        g_feat = g_catr[:, : a["feat"].shape[1]]
        g_denc = g_catr[:, a["feat"].shape[1]:]
        # contract the per-point denc cotangents to per-ray BEFORE the
        # encoding backward (the expansion's transpose), so the sin/cos
        # chain runs on (R, nd) instead of (R*S, nd)
        d_dirs_r = _encode_bwd(_ray_sum(g_denc, S), sin_d, cos_d, l_dir, 3)
        acc("fc_feature", a["a13"], g_feat)
        acc("fc_density", a["a13"], g_sig)
        g_h = (
            _mm_t(g_feat, W["fc_feature"][0])
            + _mm_t(g_sig, W["fc_density"][0])
        ) * relu_mask(a["a13"])
        for j in (3, 2, 1, 0):
            x_in = a["cat"] if j == 0 else a[f"a1{j-1}"]
            acc(f"trunk1_{j}", x_in, g_h)
            g_h = _mm_t(g_h, W[f"trunk1_{j}"][0])
            if j > 0:
                g_h = g_h * relu_mask(x_in)
        d_a03 = g_h[:, : a["a03"].shape[1]] * relu_mask(a["a03"])
        g_enc = g_h[:, a["a03"].shape[1]:]
        g_h = d_a03
        for j in (3, 2, 1, 0):
            x_in = enc if j == 0 else a[f"a0{j-1}"]
            acc(f"trunk0_{j}", x_in, g_h)
            g_h = _mm_t(g_h, W[f"trunk0_{j}"][0])
            if j > 0:
                g_h = g_h * relu_mask(x_in)
        d_pts = _encode_bwd(g_enc + g_h, sin_p, cos_p, l_pos, 3)

        # chain through the in-kernel ray expansion:
        # pts = expand(o) + expand(r) * z_flat ; dirs already per-ray
        do_out[:] = _ray_sum(d_pts, S)
        dr_out[:] = _ray_sum(d_pts * z_flat, S)
        ddt_out[:] = d_dirs_r

    return kernel


def _rays_per_block(S, target=1024):
    """Rays per grid step: R*S ~ target points, R a multiple of 8 (f32
    sublane tile) and at least 8. target=2048 was measured WORSE (bwd
    5.43 vs 5.00 ms/step pre-bridge-rewrite; re-measured after the r4 VPU
    bridge rewrite: 4.22 vs 3.62 — the conclusion holds): the epilogue
    intermediates scale with the tile and the bigger recompute loses more
    to VMEM pressure than the halved tile count saves."""
    return max(8, (target // S) // 8 * 8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def fused_mlp_composite(weights, origins, rays, dirs, z, deltas,
                        l_pos, l_dir, act, occ_alpha, dist_alpha,
                        white_bg, S):
    """Fully fused render: per-RAY inputs (origins/rays/dirs (N, 3), z/deltas
    (N, S)) -> (rgb_values (N, 3), dist_pred (N, 1), alpha (N, S)).

    Covers `model/rendering.py:108-147` in one kernel per direction: point
    expansion, positional encoding, MLP, head activations, dist_to_alpha and
    alpha compositing (eps=1e-6 cumprod, optional white background).
    N must be a multiple of ``_rays_per_block(S)`` (callers pad).

    The cumprod runs in log space (exp of a triangular-matmul cumsum), so
    transmittance matches the XLA scan to ~1e-6 relative rather than
    bitwise; z and deltas are treated as non-differentiable (their
    cotangents are structurally zero in this model: z never depends on
    params — `ops/rendering.py:161-174`)."""
    out, _ = _fused_mlp_composite_fwd(
        weights, origins, rays, dirs, z, deltas,
        l_pos, l_dir, act, occ_alpha, dist_alpha, white_bg, S)
    return out


def _composite_specs(R, S, shapes):
    in_specs = [
        pl.BlockSpec((R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + _const_specs(R, S) + _wspecs(shapes)
    return in_specs


def _fused_mlp_composite_call(weights, origins, rays, dirs, z, deltas,
                              l_pos, l_dir, act, occ_alpha, dist_alpha,
                              white_bg, S, interpret=None):
    if interpret is None:
        interpret = INTERPRET
    N = origins.shape[0]
    R = _rays_per_block(S)
    weights = _cast_weights(weights)
    shapes = [w.shape for w in weights]
    grid = (N // R,)
    consts = _composite_consts(R, S)
    rgbv, dist, alpha = pl.pallas_call(
        _make_fwd_composite_kernel(l_pos, l_dir, act, occ_alpha, S,
                                   dist_alpha, white_bg),
        grid=grid,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        in_specs=_composite_specs(R, S, shapes),
        out_specs=[
            pl.BlockSpec((R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 3), _F32),
            jax.ShapeDtypeStruct((N, 1), _F32),
            jax.ShapeDtypeStruct((N, S), _F32),
        ],
        interpret=interpret,
    )(origins, rays, dirs, z, deltas, *consts, *weights)
    return rgbv, dist, alpha


def _fused_mlp_composite_fwd(weights, origins, rays, dirs, z, deltas,
                             l_pos, l_dir, act, occ_alpha, dist_alpha,
                             white_bg, S):
    out = _fused_mlp_composite_call(
        weights, origins, rays, dirs, z, deltas,
        l_pos, l_dir, act, occ_alpha, dist_alpha, white_bg, S)
    return out, (weights, origins, rays, dirs, z, deltas)


def _fused_mlp_composite_bwd(l_pos, l_dir, act, occ_alpha, dist_alpha,
                             white_bg, S, res, g, interpret=None):
    if interpret is None:
        interpret = INTERPRET
    weights, origins, rays, dirs, z, deltas = res
    g_rgbv, g_dist, g_alpha = (x.astype(_F32) for x in g)
    N = origins.shape[0]
    R = _rays_per_block(S)
    weights_c = _cast_weights(weights)
    shapes = [w.shape for w in weights_c]
    grid = (N // R,)
    out_specs = [
        pl.BlockSpec((R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N, 3), _F32),
        jax.ShapeDtypeStruct((N, 3), _F32),
        jax.ShapeDtypeStruct((N, 3), _F32),
    ]
    for s in shapes:
        out_specs.append(
            pl.BlockSpec(s, (lambda i: (0, 0)), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct(s, _F32))
    consts = _composite_consts(R, S)
    outs = pl.pallas_call(
        _make_bwd_composite_kernel(l_pos, l_dir, act, occ_alpha, S,
                                   dist_alpha, white_bg),
        grid=grid,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        in_specs=_composite_specs(R, S, shapes)[:5 + _N_CONSTS] + [
            pl.BlockSpec((R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + _wspecs(shapes),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(origins, rays, dirs, z, deltas, *consts,
      g_rgbv, g_dist, g_alpha, *weights_c)
    d_origins, d_rays, d_dirs = outs[0], outs[1], outs[2]
    d_weights = tuple(outs[3:])
    # z/deltas: structurally zero cotangents (see docstring)
    return (d_weights, d_origins, d_rays, d_dirs,
            jnp.zeros_like(z), jnp.zeros_like(deltas))


fused_mlp_composite.defvjp(_fused_mlp_composite_fwd, _fused_mlp_composite_bwd)


def fused_mlp_composite_sharded(weights, origins, rays, dirs, z, deltas,
                                l_pos, l_dir, act, occ_alpha, dist_alpha,
                                white_bg, S, mesh):
    """:func:`fused_mlp_composite` under a ray mesh (same recipe as
    :func:`fused_mlp_sharded`): rays sharded on the leading axis, weights
    replicated, dW psum'd by shard_map's transpose.

    N must be a multiple of n_devices * _rays_per_block(S) (callers pad).
    """
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    @partial(
        shard_map, mesh=mesh,
        in_specs=(tuple(P() for _ in weights), P(axis), P(axis), P(axis),
                  P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    def f(ws, o, r, dt, zz, de):
        return fused_mlp_composite(ws, o, r, dt, zz, de, l_pos, l_dir,
                                   act, occ_alpha, dist_alpha, white_bg, S)

    return f(tuple(weights), origins, rays, dirs, z, deltas)


def fused_mlp_sharded(weights, pts, dirs, l_pos, l_dir, act, occ_alpha,
                      mesh):
    """:func:`fused_mlp` under a ray mesh: GSPMD cannot partition the
    custom call, so the kernel runs per-shard under ``jax.shard_map`` —
    points/dirs sharded on the leading axis, weights replicated. Autodiff
    composes: ``shard_map``'s transpose psums the replicated weights'
    cotangents over the mesh (each device contributes its shard's dW) and
    keeps the per-point cotangents sharded.

    M must be a multiple of n_devices * BM (callers pad).
    """
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    @partial(
        shard_map, mesh=mesh,
        in_specs=(tuple(P() for _ in weights), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        # pallas_call's out_shape carries no varying-mesh-axes info (same
        # situation as the sharded chamfer kernel)
        check_vma=False,
    )
    def f(ws, p, d):
        return fused_mlp(ws, p, d, l_pos, l_dir, act, occ_alpha)

    return f(tuple(weights), pts, dirs)
