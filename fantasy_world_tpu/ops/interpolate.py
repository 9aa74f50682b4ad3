"""Bilinear interpolation with align_corners=True semantics.

torch F.interpolate(..., mode='bilinear', align_corners=True) maps output
index i to input coordinate i * (in-1)/(out-1); jax.image.resize uses
half-pixel centers, so this is a small separable gather+lerp instead.
Used by the DPT fusion pyramid (vggt/heads/dpt_head.py custom_interpolate).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _axis_weights(n_in: int, n_out: int):
    if n_out == 1 or n_in == 1:
        idx = np.zeros((n_out,), np.int32)
        return idx, idx, np.zeros((n_out,), np.float32)
    coords = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(coords).astype(np.int32)
    lo = np.minimum(lo, n_in - 2)
    frac = (coords - lo).astype(np.float32)
    return lo, lo + 1, frac


def bilinear_align_corners(x: jnp.ndarray, size) -> jnp.ndarray:
    """x: (..., H, W) -> (..., h_out, w_out), computed in f32."""
    h_out, w_out = size
    H, W = x.shape[-2:]
    dtype = x.dtype
    xf = x.astype(jnp.float32)

    lo_h, hi_h, fh = _axis_weights(H, h_out)
    lo_w, hi_w, fw = _axis_weights(W, w_out)

    top = jnp.take(xf, lo_h, axis=-2)
    bot = jnp.take(xf, hi_h, axis=-2)
    fh_b = jnp.asarray(fh)[..., :, None]
    rows = top * (1 - fh_b) + bot * fh_b

    left = jnp.take(rows, lo_w, axis=-1)
    right = jnp.take(rows, hi_w, axis=-1)
    fw_b = jnp.asarray(fw)
    out = left * (1 - fw_b) + right * fw_b
    return out.astype(dtype)
