"""Learnable per-frame SE(3) camera poses.

Reference: ``LearnPose`` (`model/poses.py:6-33`).  TPU redesign: the pose
table is a pytree {'r': (N, 3), 't': (N, 3)}; forward is a vectorised gather
+ batched Rodrigues so a whole trajectory (or any index batch) materialises
in one fused op, and single-index lookup stays jit-friendly (no Python int
conversion, unlike `model/poses.py:24`).

``init_c2w`` (delta-pose mode, `model/poses.py:29-30`) is carried as a
non-trainable constant alongside the params.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST

from ..geometry.so3 import make_c2w


def init_pose_params(num_cams: int) -> dict:
    """Zero-init axis-angle + translation (reference `model/poses.py:20-21`)."""
    return {
        "r": jnp.zeros((num_cams, 3), jnp.float32),
        "t": jnp.zeros((num_cams, 3), jnp.float32),
    }


def _maybe_stop(x, learn: bool):
    return x if learn else lax.stop_gradient(x)


def pose_c2w(params, idx, init_c2w=None, learn_R=True, learn_t=True):
    """c2w for camera ``idx`` (scalar or (B,) int array).

    Mirrors `model/poses.py:23-30` incl. the delta-on-init composition
    ``make_c2w(r, t) @ init_c2w[idx]``. ``learn_R=False`` / ``learn_t=False``
    stop gradients, matching requires_grad=False in the reference.
    """
    r = _maybe_stop(params["r"], learn_R)[idx]
    t = _maybe_stop(params["t"], learn_t)[idx]
    c2w = make_c2w(r, t)
    if init_c2w is not None:
        c2w = jnp.matmul(c2w, init_c2w[idx], precision=_HI)
    return c2w


def all_poses(params, init_c2w=None, learn_R=True, learn_t=True):
    """All N c2w matrices, (N, 4, 4), in one batched op.

    Replaces the reference's per-index Python loop
    (`train.py:279`: ``torch.stack([pose_param_net(i) for i in range(n)])``).
    """
    r = _maybe_stop(params["r"], learn_R)
    t = _maybe_stop(params["t"], learn_t)
    c2w = make_c2w(r, t)
    if init_c2w is not None:
        c2w = jnp.matmul(c2w, init_c2w, precision=_HI)
    return c2w
