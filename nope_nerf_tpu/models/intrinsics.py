"""Learnable focal length (intrinsics).

Reference: ``LearnFocal`` (`model/intrinsics.py:5-70`).  Order-2
parametrisation stores a = sqrt(f) so f = a² stays positive; order-1 stores f
directly.  ``fx_only`` ties fy to fx.  Focal values are in normalised pixel
units (2f/w etc., see `dataloading/dataset.py:101-104`; the init from the gt
K at `train.py:136` passes [K00, -K11]).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def init_focal_params(fx_only: bool, order: int = 2, init_focal=None) -> dict:
    """Build {'fx': scalar[, 'fy': scalar]} params.

    ``init_focal`` may be None (init 1.0), a scalar, or [fx, fy].
    Mirrors `model/intrinsics.py:10-57`.
    """
    def _coe(f):
        f = jnp.asarray(f, jnp.float32)
        if order == 2:
            return jnp.sqrt(f)
        elif order == 1:
            return f
        raise ValueError("Focal init order must be 1 or 2")

    if init_focal is None:
        params = {"fx": jnp.asarray(1.0, jnp.float32)}
        if not fx_only:
            params["fy"] = jnp.asarray(1.0, jnp.float32)
        return params
    if fx_only:
        f = init_focal[0] if isinstance(init_focal, (list, tuple)) else init_focal
        return {"fx": _coe(f)}
    if isinstance(init_focal, (list, tuple)):
        return {"fx": _coe(init_focal[0]), "fy": _coe(init_focal[1])}
    return {"fx": _coe(init_focal), "fy": _coe(init_focal)}


def focal_fxfy(params, fx_only: bool, order: int = 2, req_grad: bool = True):
    """-> (2,) [fx, fy]. Mirrors `model/intrinsics.py:59-69`."""
    fx = params["fx"]
    fy = params.get("fy", fx) if not fx_only else fx
    if not req_grad:
        fx = lax.stop_gradient(fx)
        fy = lax.stop_gradient(fy)
    if order == 2:
        return jnp.stack([fx**2, fy**2])
    return jnp.stack([fx, fy])
