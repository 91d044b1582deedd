"""Learnable per-frame depth distortion (scale & shift).

Reference: ``Learn_Distortion`` (`model/distortions.py:4-26`).  Rectifies
monocular-depth priors as d·scale+shift (or (d+shift)·scale when
``shift_first``).  Scale floor 0.01; optionally the last frame's scale is
pinned to 1 (``fix_scaleN``).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def init_distortion_params(num_cams: int) -> dict:
    """scales init 1, shifts init 0 (`model/distortions.py:15-16`)."""
    return {
        "scales": jnp.ones((num_cams, 1), jnp.float32),
        "shifts": jnp.zeros((num_cams, 1), jnp.float32),
    }


def distortion_scale_shift(params, idx, num_cams: int, fix_scaleN: bool = True,
                           learn_scale: bool = True, learn_shift: bool = True):
    """-> (scale (1,), shift (1,)) for camera ``idx`` (traced scalar OK).

    Mirrors `model/distortions.py:19-26`: hard floor at 0.01 (zero gradient
    when clamped, same as the reference's branch-replace) and the
    ``fix_scaleN`` pin of the last frame's scale to exactly 1.
    """
    scales = params["scales"] if learn_scale else lax.stop_gradient(params["scales"])
    shifts = params["shifts"] if learn_shift else lax.stop_gradient(params["shifts"])
    scale = scales[idx]
    scale = jnp.maximum(scale, 0.01)
    if fix_scaleN:
        scale = jnp.where(jnp.equal(idx, num_cams - 1), 1.0, scale)
    shift = shifts[idx]
    return scale, shift
