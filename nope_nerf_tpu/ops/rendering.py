"""Differentiable volume renderer — the hot path.

TPU-native re-design of ``Renderer.nope_nerf`` (`model/rendering.py:36-197`).
Key departures from the reference, all in service of XLA/TPU:

* **No chunk loop.** The reference streams 64k-point chunks through the MLP
  (`model/rendering.py:108-117`); on TPU the full 1024x128 = 131k-point batch
  is a single set of MXU-shaped matmuls, fused end-to-end (ray-gen ->
  pos-enc -> MLP -> compositing) under one jit. Whole-image rendering chunks
  via `lax.map` instead (see :func:`render_image`).
* **Static shapes.** The reference's boolean-mask gathers for valid rays
  (`model/rendering.py:149-158`) become a returned ``valid_mask`` that the
  loss applies as weights — identical optimisation trajectory, no dynamic
  shapes.
* **Stateless RNG.** Stratified sampling jitter takes a `jax.random` key
  (replaces `torch.rand`, `model/rendering.py:189`).

Semantics intentionally preserved bit-for-bit where they matter:
epsilon=1e-6 in the transmittance cumprod (`model/rendering.py:9,130`),
delta_far=1e10 and alpha[:, -1]=1 in dist_alpha mode (`:122-128`),
white-background compositing (`:145-147`), the NDC `1 - 1/d` prior-depth
conversion (`:158`), and the eval-time dist->depth division (`:150-154`).
"""
from __future__ import annotations

from typing import Optional

import functools

import jax
import jax.numpy as jnp

from ..geometry.rays import (
    get_ndc_rays_fxfy,
    image_points_to_world,
    origin_to_world,
    to_world_transform,
    transform_to_world,
)
EPS = 1e-6


def stratified_zvals(z_val, key):
    """Jitter z values within their bins (reference `model/rendering.py:185-190`)."""
    mid = 0.5 * (z_val[..., 1:] + z_val[..., :-1])
    hi = jnp.concatenate([mid, z_val[..., -1:]], axis=-1)
    lo = jnp.concatenate([z_val[..., :1], mid], axis=-1)
    noise = jax.random.uniform(key, z_val.shape, z_val.dtype)
    return lo + (hi - lo) * noise


def composite(rgb, alpha, z_val, white_background=False):
    """Alpha compositing: weights, rgb, expected depth.

    Args:
        rgb: (N, S, 3); alpha: (N, S); z_val: (N, S).
    Returns:
        (rgb_values (N, 3), dist_pred (N,), weights (N, S))

    Matches `model/rendering.py:130-147`: weights = alpha * shifted-cumprod of
    (1 - alpha + 1e-6); white background adds (1 - acc).
    """
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + EPS], -1),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans
    rgb_values = jnp.sum(weights[..., None] * rgb, axis=-2)
    dist_pred = jnp.sum(weights * z_val, axis=-1)
    if white_background:
        acc = jnp.sum(weights, axis=-1)
        rgb_values = rgb_values + (1.0 - acc[..., None])
    return rgb_values, dist_pred, weights


def dist_to_alpha(density, z_val):
    """dist_alpha mode: alpha = 1 - exp(-sigma * delta), last delta 1e10,
    alpha[:, -1] forced to 1 (`model/rendering.py:122-128`)."""
    deltas = z_val[..., 1:] - z_val[..., :-1]
    far = jnp.full_like(deltas[..., :1], 1e10)
    deltas = jnp.concatenate([deltas, far], axis=-1)
    alpha = 1.0 - jnp.exp(-density * deltas)
    return alpha.at[..., -1].set(1.0)


def render_rays(
    nerf_params,
    pixels,
    depth_prior,
    camera_mat,
    world_mat,
    scale_mat,
    cfg,
    *,
    rng: Optional[jax.Array] = None,
    add_noise: bool = False,
    eval_mode: bool = False,
    precision=None,
):
    """Render a batch of rays.

    Args:
        nerf_params: field pytree.
        pixels: (N, 2) pixel coords scaled to [-1, 1].
        depth_prior: (N,) monocular-depth prior at those pixels (enters
            training as ``depth_gt``, reference `model/rendering.py:60-64`).
        camera_mat / world_mat / scale_mat: (4, 4).
        cfg: dict with the reference's ``rendering`` group merged with the
            ``model`` group (num_points, depth_range, sample_option,
            dist_alpha, use_ray_dir, normalise_ray, white_background,
            normal_loss, occ_activation, pos/dir_enc_levels).
        rng: PRNG key for stratified jitter (required when add_noise).
        add_noise: stratified sampling (training).
        eval_mode: eval-time dist->depth conversion.
    Returns:
        dict with rgb (N, 3), depth_pred (N,), depth_gt (N,),
        valid_mask (N,) float, z_vals (N, S), alpha (N, S),
        normal_diff (N,) or None, points_surface (N, 3).
    """
    S = cfg["num_points"] - cfg.get("outside_steps", 0)
    N = pixels.shape[0]
    depth_range = cfg["depth_range"]
    sample_option = cfg["sample_option"]
    if precision is None:
        # tpu.matmul_precision ("default"/"high"/"highest"), plumbed through
        # make_render_cfg; applies to the f32 XLA MLP path
        precision = {
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }.get(cfg.get("matmul_precision", "default"))

    from ..models.nerf import apply_nerf  # local import: avoids models<->ops cycle

    transform = to_world_transform(camera_mat, world_mat, scale_mat)
    camera_world = origin_to_world(camera_mat, world_mat, scale_mat,
                                   transform=transform)  # (3,)
    points_world = transform_to_world(pixels, depth_prior, camera_mat,
                                      transform=transform)  # (N, 3)
    diff = points_world - camera_world[None]
    d_sq = jnp.sum(diff * diff, axis=-1)
    # safe sqrt: a zero prior depth puts the point exactly at the camera and
    # d(sqrt)/dx at 0 would poison every gradient with nan (masking the loss
    # value does not mask nan gradients).
    d_i_gt = jnp.sqrt(jnp.maximum(d_sq, 1e-24))

    pixels_world = image_points_to_world(pixels, camera_mat, world_mat,
                                         scale_mat, transform=transform)
    ray_vector = pixels_world - camera_world[None]
    ray_norm = jnp.sqrt(
        jnp.maximum(jnp.sum(ray_vector * ray_vector, axis=-1), 1e-24)
    )
    if cfg["normalise_ray"]:
        ray_vector = ray_vector / ray_norm[..., None]
    else:
        d_i_gt = d_i_gt / ray_norm

    # Valid-ray mask (zero or non-finite prior depth), reference :74-87.
    valid_mask = (jnp.isfinite(d_i_gt) & (d_sq > 0.0)).astype(jnp.float32)
    dists = jnp.where(valid_mask > 0, d_i_gt, 0.0)

    z_base = jnp.linspace(0.0, 1.0, S, dtype=jnp.float32)
    z_val = jnp.broadcast_to(z_base, (N, S))

    if sample_option == "ndc":
        focal = jnp.stack([camera_mat[0, 0], camera_mat[1, 1]])
        ndc_o, ndc_d = get_ndc_rays_fxfy(focal, 1.0, camera_world[None].repeat(N, 0),
                                         ray_vector)
        # depth_range fixed to [0, 1] in NDC (reference :99)
        pts = ndc_o[:, None, :] + ndc_d[:, None, :] * z_val[..., None]
    else:
        z_val = depth_range[0] * (1.0 - z_val) + depth_range[1] * z_val
        if add_noise:
            z_val = stratified_zvals(z_val, rng)
        pts = camera_world[None, None, :] + ray_vector[:, None, :] * z_val[..., None]

    dir_per_ray = -ray_vector
    if not cfg["use_ray_dir"]:
        dir_per_ray = jnp.ones_like(dir_per_ray)

    n_pts = N * S
    n_max = cfg.get("n_max_network_queries") or n_pts
    if cfg.get("use_pallas_mlp", False) and cfg.get("fuse_compositing", False):
        # Fully fused render path (round 3): point expansion, pos-enc, MLP,
        # head activations, dist_to_alpha AND alpha compositing in one
        # Pallas kernel per direction — per-RAY tensors at the HBM boundary
        # (the r2 profile showed ~1.1 ms/step of XLA broadcast/reduce/
        # relayout ops around the point-level kernel).
        if sample_option == "ndc":
            origins, rays_in = ndc_o, ndc_d
        else:
            origins = jnp.broadcast_to(camera_world[None], (N, 3))
            rays_in = ray_vector
        if n_pts <= n_max:
            rgb_values, dist_pred, alpha = _render_fused_composite(
                nerf_params, origins, rays_in, dir_per_ray, z_val, cfg, N, S
            )
        else:
            # honour the n_max_network_queries memory bound by chunking over
            # RAYS through the same fused kernel (the pre-r4 fallback dropped
            # to the point-level path, where the plain fused_mlp forward is
            # ~1.7x slower than XLA for eval-sized batches)
            rays_chunk = max(n_max // S, 1)
            n_pad = (-N) % rays_chunk

            def _cpad(a):
                pads = ((0, n_pad),) + ((0, 0),) * (a.ndim - 1)
                return jnp.pad(a, pads) if n_pad else a

            o_c = _cpad(origins).reshape(-1, rays_chunk, 3)
            r_c = _cpad(rays_in).reshape(-1, rays_chunk, 3)
            d_c = _cpad(dir_per_ray).reshape(-1, rays_chunk, 3)
            # pad z with 1.0 so padded rays keep monotone (zero-delta) depths
            z_c = (jnp.concatenate(
                [z_val, jnp.ones((n_pad, S), z_val.dtype)]) if n_pad
                else z_val).reshape(-1, rays_chunk, S)

            def _one_chunk(args):
                o_, r_, d_, z_ = args
                return _render_fused_composite(
                    nerf_params, o_, r_, d_, z_, cfg, rays_chunk, S
                )

            rgb_c, dist_c, alpha_c = jax.lax.map(
                _one_chunk, (o_c, r_c, d_c, z_c))
            rgb_values = rgb_c.reshape(-1, 3)[:N]
            dist_pred = dist_c.reshape(-1)[:N]
            alpha = alpha_c.reshape(-1, S)[:N]
        return _render_outputs(
            cfg, rng, eval_mode, nerf_params, precision, N, valid_mask,
            dists, z_val, alpha, rgb_values, dist_pred, camera_world,
            ray_vector, ray_norm, d_i_gt, sample_option,
        )

    dirs = jnp.broadcast_to(dir_per_ray[:, None, :], (N, S, 3))

    # Field evaluation. One fused batch when it fits (the TPU-native default:
    # 1024x128 points are ideal MXU tiles); for giant ray batches the
    # reference's n_max_network_queries memory bound (`model/rendering.py:108`)
    # is honoured with a lax.map chunk loop.
    pts_flat = pts.reshape(-1, 3)
    dirs_flat = dirs.reshape(-1, 3)
    if n_pts > n_max:
        chunk = max(1, n_max)
        n_pad = (-n_pts) % chunk
        pts_c = jnp.pad(pts_flat, ((0, n_pad), (0, 0))).reshape(-1, chunk, 3)
        dirs_c = jnp.pad(dirs_flat, ((0, n_pad), (0, 0))).reshape(-1, chunk, 3)

        def _chunk(args):
            p_, d_ = args
            return apply_nerf(nerf_params, p_, d_, cfg, precision=precision)

        rgb, density = jax.lax.map(_chunk, (pts_c, dirs_c))
        rgb = rgb.reshape(-1, 3)[:n_pts]
        density = density.reshape(-1, 1)[:n_pts]
    else:
        rgb, density = apply_nerf(
            nerf_params, pts_flat, dirs_flat, cfg, precision=precision
        )
    rgb = rgb.reshape(N, S, 3)
    alpha = density.reshape(N, S)

    if cfg["dist_alpha"]:
        alpha = dist_to_alpha(alpha, z_val)

    rgb_values, dist_pred, weights = composite(
        rgb, alpha, z_val, cfg["white_background"]
    )
    return _render_outputs(
        cfg, rng, eval_mode, nerf_params, precision, N, valid_mask, dists,
        z_val, alpha, rgb_values, dist_pred, camera_world, ray_vector,
        ray_norm, d_i_gt, sample_option,
    )


def _render_fused_composite(nerf_params, origins, rays_in, dir_per_ray,
                            z_val, cfg, N, S):
    """Dispatch to the MLP+compositing Pallas kernel (optionally sharded);
    handles ray padding and the deltas precompute."""
    from ..ops.pallas.mlp_kernel import (
        _rays_per_block,
        collect_weights,
        fused_mlp_composite,
        fused_mlp_composite_sharded,
    )

    deltas = jnp.concatenate(
        [z_val[..., 1:] - z_val[..., :-1],
         jnp.full_like(z_val[..., :1], 1e10)],
        axis=-1,
    )
    mesh = cfg.get("pallas_mesh")
    quantum = _rays_per_block(S) * (
        mesh.devices.size if mesh is not None else 1
    )
    pad = (-N) % quantum
    if pad:
        origins = jnp.pad(origins, ((0, pad), (0, 0)))
        rays_in = jnp.pad(rays_in, ((0, pad), (0, 0)))
        dir_per_ray = jnp.pad(dir_per_ray, ((0, pad), (0, 0)))
        z_val_p = jnp.pad(z_val, ((0, pad), (0, 0)), constant_values=1.0)
        deltas = jnp.pad(deltas, ((0, pad), (0, 0)), constant_values=1.0)
    else:
        z_val_p = z_val
    args = (
        collect_weights(nerf_params), origins, rays_in, dir_per_ray,
        z_val_p, deltas, cfg["pos_enc_levels"], cfg["dir_enc_levels"],
        cfg["occ_activation"], not cfg["dist_alpha"], cfg["dist_alpha"],
        cfg["white_background"], S,
    )
    if mesh is not None:
        rgb_values, dist_pred, alpha = fused_mlp_composite_sharded(
            *args, mesh)
    else:
        rgb_values, dist_pred, alpha = fused_mlp_composite(*args)
    if pad:
        rgb_values = rgb_values[:N]
        dist_pred = dist_pred[:N]
        alpha = alpha[:N]
    return rgb_values, dist_pred[:, 0], alpha


def _render_outputs(cfg, rng, eval_mode, nerf_params, precision, N,
                    valid_mask, dists, z_val, alpha, rgb_values, dist_pred,
                    camera_world, ray_vector, ray_norm, d_i_gt,
                    sample_option):
    """Shared tail of :func:`render_rays`: normal-smoothness term, eval-time
    dist->depth conversion, NDC prior-depth transform, output dict."""
    normal_diff = None
    points_surface = camera_world[None] + ray_vector * dists[..., None]
    if (not eval_mode) and cfg.get("normal_loss", False):
        # Surface-normal smoothness at prior-depth surface points + jittered
        # neighbours in a 0.01 cube (reference :133-143); invalid rays are
        # masked by the caller via valid_mask.
        key_n = jax.random.fold_in(rng, 1) if rng is not None else jax.random.PRNGKey(0)
        neigh = points_surface + (
            jax.random.uniform(key_n, points_surface.shape) - 0.5
        ) * 0.01
        from ..models.nerf import nerf_gradient

        pp = jnp.concatenate([points_surface, neigh], axis=0)
        g = nerf_gradient(nerf_params, pp, cfg, precision)
        normals = g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-5)
        normal_diff = jnp.linalg.norm(normals[:N] - normals[N:], axis=-1)

    if eval_mode and cfg["normalise_ray"]:
        # dist -> depth for evaluation (reference :150-154)
        dist_pred = dist_pred / ray_norm
        d_i_gt = d_i_gt / ray_norm
    depth_gt = d_i_gt
    if sample_option == "ndc":
        depth_gt = 1.0 - 1.0 / jnp.where(depth_gt == 0, 1.0, depth_gt)
        depth_gt = jnp.where(valid_mask > 0, depth_gt, 0.0)

    return {
        "rgb": rgb_values,
        "depth_pred": dist_pred,
        "depth_gt": depth_gt,
        "valid_mask": valid_mask,
        "z_vals": z_val,
        "alpha": alpha,
        "normal_diff": normal_diff,
        "points_surface": points_surface,
    }


def _freeze(obj):
    """Config dict -> hashable key for the jit cache."""
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


@functools.lru_cache(maxsize=32)
def _render_image_jit(resolution, chunk, cfg_key, precision, mesh_key=None):
    cfg = {k: (list(v) if isinstance(v, tuple) else v) for k, v in cfg_key}
    mesh = _MESH_REGISTRY.get(mesh_key) if mesh_key is not None else None
    if (mesh is not None and cfg.get("use_pallas_mlp", False)
            and cfg.get("fuse_compositing", False)):
        # re-attach the mesh for the fused composite path (stripped before
        # the cache key — a Mesh is unhashable): render_rays then routes
        # each chunk through fused_mlp_composite_sharded's shard_map, which
        # composes with the shard_rays constraints below
        cfg = dict(cfg, pallas_mesh=mesh)

    def impl(nerf_params, camera_mat, world_mat, scale_mat):
        from ..geometry.rays import arange_pixels

        h, w = resolution
        _, pixels = arange_pixels((h, w))
        n = pixels.shape[0]
        n_pad = (-n) % chunk
        pixels_p = jnp.pad(pixels, ((0, n_pad), (0, 0)))
        depth_p = jnp.ones(n + n_pad, jnp.float32)
        pix_chunks = pixels_p.reshape(-1, chunk, 2)
        dep_chunks = depth_p.reshape(-1, chunk)

        def _one(args):
            pix, dep = args
            if mesh is not None:
                # shard each chunk's rays over the mesh (SURVEY.md §2.5:
                # data parallelism over pixels for eval rendering)
                from ..parallel.mesh import shard_rays

                pix = shard_rays(pix, mesh)
                dep = shard_rays(dep, mesh)
            out = render_rays(
                nerf_params, pix, dep, camera_mat, world_mat, scale_mat, cfg,
                add_noise=False, eval_mode=True, precision=precision,
            )
            return out["rgb"], out["depth_pred"]

        rgb, depth = jax.lax.map(_one, (pix_chunks, dep_chunks))
        rgb = rgb.reshape(-1, 3)[:n].reshape(h, w, 3)
        depth = depth.reshape(-1)[:n].reshape(h, w)
        return rgb, depth

    return jax.jit(impl)


# meshes aren't hashable for the lru_cache: register by id
_MESH_REGISTRY = {}


def render_image(nerf_params, resolution, camera_mat, world_mat, scale_mat,
                 cfg, chunk: int = 16384, precision=None, mesh=None):
    """Full-image eval render: ONE jitted dispatch per image (cached per
    resolution/cfg), chunked inside with `lax.map` (static chunk count).

    Replaces the reference's Python chunk loops (`model/eval_images.py:73-88`,
    `model/training.py:118-131`); an un-jitted chunk loop dispatches every
    surrounding op through the device tunnel (~36 ms each) — the cached jit
    makes whole-image rendering one round-trip.
    Returns (rgb (h, w, 3), depth (h, w)).
    """
    chunk = min(chunk, resolution[0] * resolution[1])
    if cfg.get("pallas_mesh") is not None:
        # train-step-only plumbing (a Mesh is unhashable for the jit cache);
        # eval rendering shards via its own mesh argument below
        cfg = dict(cfg, pallas_mesh=None)
    if cfg.get("use_pallas_mlp", False):
        if cfg.get("fuse_compositing", False):
            # r3: the MLP+compositing kernel wins the eval FORWARD too
            # (147 vs 175 ms per 65k rays x 128 samples on v5e — the
            # compositing and layout traffic it absorbs outweigh the
            # kernel overhead that made the plain fused_mlp forward a
            # loss, r2: 6.7 vs 4.0 s/image). Under a mesh the kernel
            # rides fused_mlp_composite_sharded's shard_map (re-attached
            # inside _render_image_jit).
            pass
        else:
            # plain fused_mlp's win is the BACKWARD (VMEM-resident
            # activations); forward-only, XLA's own fusion is faster
            cfg = dict(cfg, use_pallas_mlp=False)
    mesh_key = None
    if mesh is not None:
        # semantic key (axes + device ids), NOT id(mesh): a dead mesh's id
        # can be reused by a new object, silently resurrecting a stale
        # cached jit. Two meshes with equal keys are interchangeable here.
        mesh_key = (
            tuple(mesh.axis_names),
            mesh.devices.shape,
            tuple(d.id for d in mesh.devices.ravel()),
        )
        _MESH_REGISTRY[mesh_key] = mesh
        if chunk % len(mesh.devices.ravel()) != 0:
            raise ValueError("chunk must divide evenly over mesh devices")
    fn = _render_image_jit(tuple(resolution), chunk, _freeze(cfg), precision,
                           mesh_key)
    return fn(nerf_params, jnp.asarray(camera_mat), jnp.asarray(world_mat),
              jnp.asarray(scale_mat))
