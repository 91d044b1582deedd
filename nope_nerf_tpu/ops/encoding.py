"""Sinusoidal positional encoding.

Reference: `model/official_nerf.py:99-119` (``encode_position``).  The TPU
version computes all frequency bands in one broadcasted op (no Python loop of
cat's) so XLA emits a single fused VPU kernel.
"""
from __future__ import annotations

import jax.numpy as jnp


def encode_position(x: jnp.ndarray, levels: int, inc_input: bool = True) -> jnp.ndarray:
    """Encode each scalar with L sin/cos pairs at frequencies 2^0 .. 2^(L-1).

    Args:
        x: (..., C) input.
        levels: number of frequency octaves L.
        inc_input: prepend the raw input (reference always passes True).
    Returns:
        (..., C*(2L+1)) if inc_input else (..., C*2L).

    Channel ordering matches the reference exactly:
    [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...] where each block
    spans all C channels.
    """
    if levels == 0:
        return x
    freqs = 2.0 ** jnp.arange(levels, dtype=x.dtype)  # (L,)
    xb = x[..., None, :] * freqs[:, None]  # (..., L, C)
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    # interleave to [sin_l, cos_l] per level, preserving reference ordering
    enc = jnp.stack([sin, cos], axis=-2)  # (..., L, 2, C)
    enc = enc.reshape(x.shape[:-1] + (2 * levels * x.shape[-1],))
    if inc_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
