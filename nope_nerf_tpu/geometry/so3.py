"""SO(3) / SE(3) primitives for learnable camera poses.

TPU-native reimplementation of the pose math in the reference
(`model/common.py:277-330` — ``vec2skew``, ``Exp``, ``make_c2w``,
``convert3x4_4x4``).  Everything here is a pure, batched jnp function so the
whole pose table can be materialised in one fused op per train step instead
of the reference's per-index Python calls (`model/poses.py:23-30`).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Geometry matmuls are tiny (3x3 / 4x4) but error-critical for pose
# optimisation: pin them to full-f32 MXU passes. (On TPU, default-precision
# f32 matmuls run as bf16 passes with ~1e-3 error — fine for the MLP, not for
# SE(3) chains.)
_HI = lax.Precision.HIGHEST


def vec2skew(v: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vector(s) -> skew-symmetric matrix(es).

    Args:
        v: (..., 3) axis-angle vectors.
    Returns:
        (..., 3, 3) skew-symmetric matrices such that skew(v) @ x = v × x.

    Mirrors `model/common.py:277-287` but batched.
    """
    zero = jnp.zeros_like(v[..., 0])
    rows = jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def exp_so3(r: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula: so(3) vector(s) -> SO(3) matrix(es).

    Args:
        r: (..., 3) axis-angle.
    Returns:
        (..., 3, 3) rotation matrices.

    Matches `model/common.py:290-299` including the 1e-15 norm guard, so the
    zero-rotation init of the pose table is exactly the identity (up to the
    same epsilon behaviour as the reference).
    """
    skew_r = vec2skew(r)
    sq = jnp.sum(r * r, axis=-1)[..., None, None]
    # Double-where trick for a differentiable zero limit: near zero the
    # closed-form coefficients sin(n)/n and (1-cos n)/n² have derivatives of
    # the form (n·…)/n⁴ whose numerator AND denominator underflow -> 0/0 = nan
    # in the VJP (and nan·0 stays nan).  Substitute a safe value inside the
    # unused branch and select 4th-order Taylor series there instead.
    small = sq < 1e-8  # angle < 1e-4 rad
    sq_safe = jnp.where(small, 1.0, sq)
    n = jnp.sqrt(sq_safe)
    sin_term = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(n) / n)
    cos_term = jnp.where(small, 0.5 - sq / 24.0, (1.0 - jnp.cos(n)) / sq_safe)
    eye = jnp.eye(3, dtype=r.dtype)
    skew_sq = jnp.matmul(skew_r, skew_r, precision=_HI)
    return eye + sin_term * skew_r + cos_term * skew_sq


def make_c2w(r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle + translation -> homogeneous 4x4 camera-to-world.

    Args:
        r: (..., 3) axis-angle.
        t: (..., 3) translation.
    Returns:
        (..., 4, 4).

    Mirrors `model/common.py:301-310`, batched.
    """
    R = exp_so3(r)
    rt = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (..., 3, 4)
    return convert3x4_4x4(rt)


def convert3x4_4x4(m: jnp.ndarray) -> jnp.ndarray:
    """Append the homogeneous [0,0,0,1] row to (..., 3, 4) matrices.

    Mirrors `model/common.py:312-330` (jnp variant, arbitrary batch dims).
    """
    bottom = jnp.zeros(m.shape[:-2] + (1, 4), dtype=m.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([m, bottom], axis=-2)


def so3_log(R: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """SO(3) matrix(es) -> axis-angle vector(s). Inverse of :func:`exp_so3`.

    Used by trajectory tooling and tests; the reference keeps an equivalent in
    its vendored transform library (`ATE/transformations.py`).
    """
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    scale = theta / (2.0 * jnp.sin(theta) + eps)
    return scale[..., None] * w


def rotation_matrix_to_quat(R):
    """Rotation matrices (N, 3, 3) -> quaternions (N, 4) in (x, y, z, w) order.

    Numpy-free batched analogue of scipy's `Rotation.as_quat`, used by the
    Sim(3) trajectory alignment (`utils_poses/lie_group_helper.py`).
    Implemented with the numerically-stable Shepperd method.
    """
    import numpy as np

    R = np.asarray(R, dtype=np.float64)
    N = R.shape[0]
    q = np.zeros((N, 4))
    t = np.trace(R, axis1=-2, axis2=-1)

    for i in range(N):
        m = R[i]
        if t[i] > 0:
            s = np.sqrt(t[i] + 1.0) * 2
            q[i] = [(m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s,
                    (m[1, 0] - m[0, 1]) / s, 0.25 * s]
        elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
            s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
            q[i] = [0.25 * s, (m[0, 1] + m[1, 0]) / s,
                    (m[0, 2] + m[2, 0]) / s, (m[2, 1] - m[1, 2]) / s]
        elif m[1, 1] > m[2, 2]:
            s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
            q[i] = [(m[0, 1] + m[1, 0]) / s, 0.25 * s,
                    (m[1, 2] + m[2, 1]) / s, (m[0, 2] - m[2, 0]) / s]
        else:
            s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
            q[i] = [(m[0, 2] + m[2, 0]) / s, (m[1, 2] + m[2, 1]) / s,
                    0.25 * s, (m[1, 0] - m[0, 1]) / s]
    return q
