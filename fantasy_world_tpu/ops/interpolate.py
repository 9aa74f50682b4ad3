"""Bilinear interpolation with align_corners=True semantics.

torch F.interpolate(..., mode='bilinear', align_corners=True) maps output
index i to input coordinate i * (in-1)/(out-1); jax.image.resize uses
half-pixel centers, so this is a small separable resample instead.
Used by the DPT fusion pyramid (vggt/heads/dpt_head.py custom_interpolate).

TPU formulation (round 4): the resample is applied as two dense matmuls
with banded interpolation matrices (out = A_h @ x @ A_w^T) instead of the
previous take()-based gather+lerp. A gather along the minormost (lane)
axis de-vectorizes on TPU; the FLOOR_ANALYSIS.json profile of the heads
showed the DPT pyramid running ~25x above its structural floor with these
resizes on every fusion level. The matrices encode exactly the same
two-tap weights ((1-f) at floor, f at floor+1), so values match the old
path to f32 rounding; each row sums to 1.0 by construction.
"""
from __future__ import annotations

import functools

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


@functools.lru_cache(maxsize=256)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) f32 matrix applying the align_corners two-tap lerp."""
    lo, hi, frac = _axis_weights(n_in, n_out)
    A = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    np.add.at(A, (rows, lo), 1.0 - frac)
    np.add.at(A, (rows, hi), frac)
    return A


def bilinear_align_corners(x: jnp.ndarray, size) -> jnp.ndarray:
    """x: (..., H, W) -> (..., h_out, w_out), computed in f32."""
    h_out, w_out = size
    H, W = x.shape[-2:]
    if (h_out, w_out) == (H, W):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    out = xf
    if h_out != H:
        ah = jnp.asarray(_interp_matrix(H, h_out))          # (h_out, H)
        out = jnp.einsum("oh,...hw->...ow", ah, out,
                         preferred_element_type=jnp.float32)
    if w_out != W:
        aw = jnp.asarray(_interp_matrix(W, w_out))          # (w_out, W)
        out = jnp.einsum("pw,...hw->...hp", aw, out,
                         preferred_element_type=jnp.float32)
    return out.astype(dtype)
