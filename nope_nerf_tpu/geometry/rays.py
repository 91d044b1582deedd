"""Camera / ray math: pixel grids, world transforms, NDC rays.

TPU-native reimplementation of `model/common.py:13-237` and `:632-675` from
the reference.  Differences from the reference (deliberate, for XLA):

* Functions are unbatched — pixels are (N, 2) and matrices (4, 4).  The
  reference hard-codes batch_size==1 everywhere (`model/training.py:257`);
  here the batch dim is simply dropped and `jax.vmap` re-adds it when needed.
* No in-place mutation, no `.cuda()` — pure jnp.
* The homogeneous 4x4 inverse chain `scale⁻¹·world⁻¹·camera⁻¹` is composed as
  a single (4, 4) matmul on the host side of the ray batch, so per-ray work is
  one small matvec that XLA fuses into the surrounding kernel.

Pixel convention (identical to reference `model/common.py:13-40`): pixel
coordinates are scaled to [-1, 1]; x maps width, y maps height; the camera
matrix is K = [[2fx/w,0,0,0],[0,-2fy/h,0,0],[0,0,-1,0],[0,0,0,1]]
(`dataloading/dataset.py:101-104`), i.e. an OpenGL-style camera looking down
-z with a flipped y.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST  # full-f32 passes for tiny, error-critical matmuls


def arange_pixels(resolution, image_range=(-1.0, 1.0)):
    """Full-image pixel grid: integer locations + scaled float coordinates.

    Args:
        resolution: (h, w).
        image_range: output float range, default [-1, 1].
    Returns:
        (pixel_locations (N, 2) int32 [x, y], pixel_scaled (N, 2) float32)
        with N = h*w, rows in row-major (y-fastest-last) order — identical to
        reference `model/common.py:13-40` (meshgrid then stack [x, y]).
    """
    h, w = resolution
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    loc = jnp.stack([xs, ys], axis=-1).reshape(-1, 2)
    scale = image_range[1] - image_range[0]
    shift = (image_range[1] - image_range[0]) / 2.0
    scaled = jnp.stack(
        [
            scale * loc[:, 0].astype(jnp.float32) / (w - 1) - shift,
            scale * loc[:, 1].astype(jnp.float32) / (h - 1) - shift,
        ],
        axis=-1,
    )
    return loc.astype(jnp.int32), scaled


def pixels_from_flat_idx(idx, hw):
    """Scaled [-1, 1] pixel coordinates straight from flat row-major pixel
    indices — the O(n_rays) equivalent of ``arange_pixels(hw)[1][idx]``
    (building the full (H*W, 2) grid per step costs ~2 ms at 540x960).
    Shared by the train step and test-time pose opt so the pixel convention
    cannot desynchronise between them.

    Returns (pixel_scaled (n, 2) [x, y] float32, rows (n,), cols (n,)).
    """
    H, W = hw
    rr = idx // W
    rc = idx % W
    px = 2.0 * rc.astype(jnp.float32) / (W - 1) - 1.0
    py = 2.0 * rr.astype(jnp.float32) / (H - 1) - 1.0
    return jnp.stack([px, py], axis=-1), rr, rc


def rigid_inv(M):
    """Closed-form inverse of a rigid 4x4 [[R, t], [0, 1]]: [[Rᵀ, -Rᵀt], [0, 1]].

    Replaces ``jnp.linalg.inv`` on camera poses in hot paths (the LU solve
    costs ~10x the two small matmuls and lowers poorly on TPU). Only valid
    for rigid transforms — all learned c2w matrices here are (exp_so3 ∘ t).
    """
    R = M[:3, :3]
    t = M[:3, 3]
    top = jnp.concatenate([R.T, -jnp.matmul(R.T, t[:, None], precision=_HI)],
                          axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=M.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def to_world_transform(camera_mat, world_mat, scale_mat):
    """Composite pixel→world homogeneous transform scale⁻¹·world⁻¹·camera⁻¹.

    One 4x4 inverse chain shared across the whole ray batch (the reference
    re-inverts inside every call, `model/common.py:137-141`).
    """
    si = jnp.linalg.inv(scale_mat)
    wi = jnp.linalg.inv(world_mat)
    ci = jnp.linalg.inv(camera_mat)
    return jnp.matmul(jnp.matmul(si, wi, precision=_HI), ci, precision=_HI)


def transform_to_world(pixels, depth, camera_mat, world_mat=None, scale_mat=None,
                       transform=None):
    """Pixels (N, 2) at depth (N,) or (N, 1) -> world points (N, 3).

    Homogeneous coordinates are [x*d, y*d, d, 1], matching reference
    `model/common.py:143-156`.

    Pass a precomputed ``transform`` (from :func:`to_world_transform`) to skip
    the matrix inverses in hot paths.
    """
    if transform is None:
        eye = jnp.eye(4, dtype=pixels.dtype)
        world_mat = eye if world_mat is None else world_mat
        scale_mat = eye if scale_mat is None else scale_mat
        transform = to_world_transform(camera_mat, world_mat, scale_mat)
    depth = depth.reshape(-1)
    ones = jnp.ones_like(depth)
    p_hom = jnp.stack(
        [pixels[:, 0] * depth, pixels[:, 1] * depth, depth, ones], axis=-1
    )  # (N, 4)
    p_world = jnp.matmul(p_hom, transform.T, precision=_HI)
    return p_world[:, :3]


def origin_to_world(camera_mat, world_mat, scale_mat, transform=None):
    """Camera origin in world coordinates, (3,).

    Reference `model/common.py:186-215` (which tiles it to (B, N, 3); we
    return one point and broadcast at the call site).
    """
    if transform is None:
        transform = to_world_transform(camera_mat, world_mat, scale_mat)
    p = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=transform.dtype)
    return jnp.matmul(transform, p, precision=_HI)[:3]


def image_points_to_world(pixels, camera_mat, world_mat, scale_mat,
                          transform=None):
    """Pixels on the image plane (depth 1) -> world points (N, 3).

    Reference `model/common.py:218-237`.
    """
    depth = jnp.ones(pixels.shape[0], dtype=pixels.dtype)
    return transform_to_world(pixels, depth, camera_mat, world_mat, scale_mat,
                              transform=transform)


def transform_to_camera_space(p_world, camera_mat, world_mat, scale_mat):
    """World points (N, 3) -> camera space (N, 3).

    Reference `model/common.py:163-183` (forward chain, no inverses).
    """
    ones = jnp.ones((p_world.shape[0], 1), dtype=p_world.dtype)
    p_hom = jnp.concatenate([p_world, ones], axis=-1)
    m = jnp.matmul(jnp.matmul(camera_mat, world_mat, precision=_HI),
                   scale_mat, precision=_HI)
    p_cam = jnp.matmul(p_hom, m.T, precision=_HI)
    return p_cam[:, :3]


def project_to_cam(points, camera_mat):
    """Perspective-project camera-frame points to scaled pixel coords.

    Args:
        points: (N, 3) points already in the target camera frame.
        camera_mat: (4, 4).
    Returns:
        (xy (N, 2) in [-1, 1] scale, valid (N,) bool for |xy| <= 1).

    Reference `model/common.py:436-457`.
    """
    ones = jnp.ones((points.shape[0], 1), dtype=points.dtype)
    p_hom = jnp.concatenate([points, ones], axis=-1)
    xy = jnp.matmul(p_hom, camera_mat.T, precision=_HI)
    xy = xy[:, :2] / xy[:, 2:3]
    valid = jnp.max(jnp.abs(xy), axis=-1) <= 1.0
    return xy, valid


def camera_mat_from_fxfy(fxfy):
    """Learned-focal camera matrix [[fx,0,0,0],[0,-fy,0,0],[0,0,-1,0],[0,0,0,1]].

    Matches the construction at `model/training.py:247-252`; fx, fy here are
    already in normalised pixel units (2f/w, 2f/h — see
    `dataloading/dataset.py:101-104` and `train.py:136`).
    """
    fx, fy = fxfy[0], fxfy[1]
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    return jnp.stack(
        [
            jnp.stack([fx, z, z, z]),
            jnp.stack([z, -fy, z, z]),
            jnp.stack([z, z, -o, z]),
            jnp.stack([z, z, z, o]),
        ]
    )


def get_ndc_rays_fxfy(fxfy, near, rays_o, rays_d):
    """World rays -> NDC rays (LLFF forward-facing scenes).

    Args:
        fxfy: (2,) normalised focal lengths.
        near: scalar near-plane depth.
        rays_o: (N, 3) ray origins (world).
        rays_d: (N, 3) ray directions (world).
    Returns:
        (rays_o_ndc (N, 3), rays_d_ndc (N, 3)).

    Identical math to reference `model/common.py:632-675`.
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]

    o0 = -fxfy[0] * ox_oz
    o1 = -fxfy[1] * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -fxfy[0] * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -fxfy[1] * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def reprojection(pixels, depth, Rt_ref, world_mat, camera_mat):
    """Reproject pixels+depth of one view into a reference view.

    Reference `model/common.py:405-435`.
    Returns (xy_ref (N, 2), valid (N,) float mask for |xy| <= 1).
    """
    depth = depth.reshape(-1)
    ones = jnp.ones_like(depth)
    p_hom = jnp.stack(
        [pixels[:, 0] * depth, pixels[:, 1] * depth, depth, ones], axis=-1
    )
    m = jnp.matmul(camera_mat, Rt_ref, precision=_HI)
    m = jnp.matmul(m, jnp.linalg.inv(world_mat), precision=_HI)
    m = jnp.matmul(m, jnp.linalg.inv(camera_mat), precision=_HI)
    xy = jnp.matmul(p_hom, m.T, precision=_HI)
    xy = xy[:, :2] / xy[:, 2:3]
    valid = (jnp.max(jnp.abs(xy), axis=-1) <= 1.0).astype(pixels.dtype)
    return xy, valid
