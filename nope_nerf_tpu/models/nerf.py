"""NeRF field: 8-layer MLP with skip connection, density + view-dependent RGB.

TPU-native re-design of the reference's ``OfficialStaticNerf``
(`model/official_nerf.py:8-97`):

* parameters are a flat pytree of (weight, bias) arrays — no module objects —
  so the whole field is one jit-traced function the compiler can fuse with
  ray generation and compositing;
* all matmuls carry ``preferred_element_type=float32`` and are shaped
  (n_rays*n_samples, features), ideal MXU tiles at the default 1024x128 ray
  batch (131072 x 256);
* initialisation matches torch ``nn.Linear`` defaults (kaiming-uniform bound
  1/sqrt(fan_in)) plus the reference's special bias inits
  (`model/official_nerf.py:39-44`): density bias 0.1, rgb bias 0.8
  (white background) or 0.02.

Architecture (hidden D=256, pos-enc L=10 -> 63 dims, dir-enc L=4 -> 27 dims):
  trunk0: 4 x Linear+ReLU (63 -> D)
  skip:   concat pos_enc
  trunk1: 4 x Linear+ReLU (D+63 -> D)
  heads:  fc_density D->1, fc_feature D->D,
          rgb_layer (D+27)->D/2 +ReLU, fc_rgb D/2->3 +sigmoid
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.encoding import encode_position


def _linear_init(key, fan_in, fan_out, dtype=jnp.float32):
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def init_nerf_params(key, cfg: dict) -> dict:
    """Build the parameter pytree.

    cfg is the full config dict (uses model.hidden_dim, model.pos_enc_levels,
    model.dir_enc_levels, rendering.white_background).
    """
    D = cfg["model"]["hidden_dim"]
    L_pos = cfg["model"]["pos_enc_levels"]
    L_dir = cfg["model"]["dir_enc_levels"]
    pos_dim = (2 * L_pos + 1) * 3
    dir_dim = (2 * L_dir + 1) * 3
    white_bkgd = cfg["rendering"]["white_background"]

    keys = jax.random.split(key, 12)
    params = {}
    dims0 = [pos_dim, D, D, D, D]
    for i in range(4):
        params[f"trunk0_{i}"] = _linear_init(keys[i], dims0[i], dims0[i + 1])
    dims1 = [D + pos_dim, D, D, D, D]
    for i in range(4):
        params[f"trunk1_{i}"] = _linear_init(keys[4 + i], dims1[i], dims1[i + 1])
    params["fc_density"] = _linear_init(keys[8], D, 1)
    params["fc_density"]["b"] = jnp.array([0.1], jnp.float32)
    params["fc_feature"] = _linear_init(keys[9], D, D)
    params["rgb_layer"] = _linear_init(keys[10], D + dir_dim, D // 2)
    params["fc_rgb"] = _linear_init(keys[11], D // 2, 3)
    rgb_bias = 0.8 if white_bkgd else 0.02
    params["fc_rgb"]["b"] = jnp.full((3,), rgb_bias, jnp.float32)
    return params


def _dot_f32(a, b, precision=None):
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )


@jax.custom_vjp
def _matmul_bf16(x, w):
    """x @ w with BOTH operands in bf16 and f32 MXU accumulation — forward
    AND backward. Without the custom vjp the cotangent is f32, so XLA
    promotes the two backward matmuls (dx = g wᵀ, dw = xᵀ g) to f32
    convolutions at ~1/3 the MXU rate — the profiler showed them dominating
    the MLP's step time. dx comes back in x's dtype (bf16 activations stay
    bf16 through the backward chain); dw is f32 for the Adam update."""
    return _dot_f32(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))


def _matmul_bf16_fwd(x, w):
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    # zero-size dtype witnesses: the cotangents must come back in the
    # primal dtypes (residuals must be arrays, not dtype objects)
    wit_x = jnp.zeros((0,), x.dtype)
    wit_w = jnp.zeros((0,), w.dtype)
    return _dot_f32(xb, wb), (xb, wb, wit_x, wit_w)


def _matmul_bf16_bwd(res, g):
    xb, wb, wit_x, wit_w = res
    gb = g.astype(jnp.bfloat16)
    dx = _dot_f32(gb, wb.T).astype(wit_x.dtype)
    dw = _dot_f32(xb.T, gb).astype(wit_w.dtype)
    return dx, dw


_matmul_bf16.defvjp(_matmul_bf16_fwd, _matmul_bf16_bwd)


def _dense(p, x, precision=None, dtype=None):
    """Linear layer. With ``dtype=bfloat16`` all three matmuls (fwd, dx, dw)
    run with bf16 operands and f32 MXU accumulation (~4x the f32 matmul
    rate), and the OUTPUT is cast back to bf16: at 131k-point batches the
    MLP is HBM-bandwidth bound on its (M, 256) activations (profiler:
    268 MB ≈ 0.33 ms per layer fusion in f32), so activations stay bf16
    end-to-end and only the per-point head outputs return to f32."""
    if dtype == jnp.bfloat16:
        y = _matmul_bf16(x, p["w"]) + p["b"]
        return y.astype(jnp.bfloat16)
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    return _dot_f32(x, w, precision) + p["b"]


def _trunk(params, pts, L_pos, precision, dtype=None):
    pos_enc = encode_position(pts, levels=L_pos, inc_input=True)
    if dtype is not None:
        pos_enc = pos_enc.astype(dtype)
    x = pos_enc
    for i in range(4):
        x = jax.nn.relu(_dense(params[f"trunk0_{i}"], x, precision, dtype))
    x = jnp.concatenate([x, pos_enc], axis=-1)
    for i in range(4):
        x = jax.nn.relu(_dense(params[f"trunk1_{i}"], x, precision, dtype))
    return x


def raw_density(params, pts, L_pos=10, precision=None, dtype=None):
    """Pre-activation density head output (reference ``infer_occ``,
    `model/official_nerf.py:60-67`). Returns (features (M, D), density (M, 1));
    the density scalar returns to f32 (the features stay in the compute
    dtype for the rgb head)."""
    x = _trunk(params, pts, L_pos, precision, dtype)
    density = _dense(params["fc_density"], x, precision, dtype)
    return x, density.astype(jnp.float32)


def apply_nerf(params, pts, dirs, cfg_model, *, only_occupancy=False,
               precision=None):
    """Evaluate the field.

    Args:
        params: pytree from :func:`init_nerf_params`.
        pts: (M, 3) sample points.
        dirs: (M, 3) view directions (the reference passes -ray per sample;
            ignored when only_occupancy).
        cfg_model: dict with keys occ_activation, pos_enc_levels,
            dir_enc_levels, dist_alpha.
    Returns:
        only_occupancy: density (M, 1)
        otherwise: (rgb (M, 3), density (M, 1))

    Semantics mirror `model/official_nerf.py:69-96`: density activation is
    softplus or relu; when dist_alpha is False the field itself emits
    occupancy alpha = 1 - exp(-density).
    """
    L_pos = cfg_model["pos_enc_levels"]
    L_dir = cfg_model["dir_enc_levels"]
    if cfg_model.get("use_pallas_mlp", False) and not only_occupancy:
        return _apply_nerf_fused(params, pts, dirs, cfg_model, L_pos, L_dir)
    # bf16 matmul inputs / f32 accumulation when the config asks for it
    # (tpu.mlp_bf16, default on for TPU backends — see make_render_cfg)
    dtype = jnp.bfloat16 if cfg_model.get("mlp_bf16", False) else None
    x, density = raw_density(params, pts, L_pos, precision, dtype)
    if cfg_model["occ_activation"] == "softplus":
        density = jax.nn.softplus(density)
    else:
        density = jax.nn.relu(density)
    if not cfg_model["dist_alpha"]:
        density = 1.0 - jnp.exp(-density)
    if only_occupancy:
        return density
    dir_enc = encode_position(dirs, levels=L_dir, inc_input=True)
    if dtype is not None:
        dir_enc = dir_enc.astype(dtype)
    feat = _dense(params["fc_feature"], x, precision, dtype)
    h = jnp.concatenate([feat, dir_enc], axis=-1)
    h = jax.nn.relu(_dense(params["rgb_layer"], h, precision, dtype))
    rgb = jax.nn.sigmoid(
        _dense(params["fc_rgb"], h, precision, dtype).astype(jnp.float32)
    )
    return rgb, density


def _apply_nerf_fused(params, pts, dirs, cfg_model, L_pos, L_dir):
    """Fused Pallas MLP path (ops/pallas/mlp_kernel.py): the whole chain —
    positional encoding, trunk, skip concat, heads — runs in one kernel per
    direction (fwd / bwd) with activations VMEM-resident; only the
    pre-scaled (M, 63)/(M, 27) inputs and the raw (M, 4) head outputs touch
    HBM. Numerics match the ``mlp_bf16`` XLA path (bf16 operands, f32
    accumulation, f32 sin/cos arguments)."""
    from ..ops.pallas.mlp_kernel import (
        BM,
        collect_weights,
        fused_mlp,
        fused_mlp_sharded,
    )

    mesh = cfg_model.get("pallas_mesh")
    M = pts.shape[0]
    quantum = BM * (mesh.devices.size if mesh is not None else 1)
    pad = (-M) % quantum
    if pad:
        pts = jnp.pad(pts, ((0, pad), (0, 0)))
        dirs = jnp.pad(dirs, ((0, pad), (0, 0)))
    # head activations (softplus/relu, occupancy alpha, rgb sigmoid) run in
    # the kernel epilogue — XLA would schedule them on (M, 1)/(M, 3) HBM
    # arrays where 125+/128 VPU lanes idle (~0.6 ms/step fwd+bwd)
    if mesh is not None:
        rgb, density = fused_mlp_sharded(
            collect_weights(params), pts, dirs, L_pos, L_dir,
            cfg_model["occ_activation"], not cfg_model["dist_alpha"], mesh,
        )
    else:
        rgb, density = fused_mlp(
            collect_weights(params), pts, dirs, L_pos, L_dir,
            cfg_model["occ_activation"], not cfg_model["dist_alpha"],
        )
    if pad:
        rgb = rgb[:M]
        density = density[:M]
    return rgb, density


def nerf_gradient(params, pts, cfg_model, precision=None):
    """-∇_p density(p): outward surface normals (pre-activation density).

    Replaces the reference's double-backprop autograd trick
    (`model/official_nerf.py:46-58`) with a direct jacobian-vector transpose;
    returns (M, 3).
    """
    L_pos = cfg_model["pos_enc_levels"]

    def density_sum(p):
        return raw_density(params, p, L_pos, precision)[1].sum()

    return -jax.grad(density_sum)(pts)
