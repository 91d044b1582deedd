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


def _encode_fwd(pts, levels):
    """(BM, c) points -> (enc (BM, n) f32, pt (BM, n), sin, cos) with the
    scaled-channel expansion done on the MXU at full f32 precision."""
    sel = _enc_selector(levels, pts.shape[1])
    pt = jax.lax.dot_general(
        pts, sel, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=_F32,
    )
    s = jnp.sin(pt)
    c = jnp.cos(pt)
    raw, sinm, cosm = _enc_masks(levels, pts.shape[1])
    return raw * pt + sinm * s + cosm * c, s, c


def _encode_bwd(g, s, c, levels, nc):
    """d(pts) from d(enc), reusing the forward's sin/cos."""
    raw, sinm, cosm = _enc_masks(levels, nc)
    g_pt = g * (raw + sinm * c - cosm * s)
    sel = _enc_selector(levels, nc)
    return jax.lax.dot_general(
        g_pt, sel, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=_F32,
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
