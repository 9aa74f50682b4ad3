"""torch-exact bicubic interpolation (host-side numpy).

torch F.interpolate(mode='bicubic', align_corners=False) uses the Keys
cubic kernel (a = -0.75), half-pixel coordinate mapping src = (dst+0.5)/s -
0.5 (with s given explicitly when scale_factor is passed -- DINOv2's
interpolate_offset kludge), and edge clamping. jax.image.resize only
supports shape-ratio scales, so position-embedding interpolation (a fixed
host-side computation) uses this implementation for exact parity.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax ** 2, ax ** 3
    w = np.where(ax <= 1, (a + 2) * ax3 - (a + 3) * ax2 + 1,
                 np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a,
                          0.0))
    return w


def _axis_weights(n_in: int, n_out: int, scale: Optional[float]):
    if scale is None:
        scale = n_out / n_in
    dst = np.arange(n_out, dtype=np.float64)
    src = (dst + 0.5) / scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    idx = np.stack([base - 1, base, base + 1, base + 2], axis=1)
    w = _cubic_kernel(np.stack([frac + 1, frac, 1 - frac, 2 - frac], axis=1))
    idx = np.clip(idx, 0, n_in - 1)
    return idx, w


def bicubic_matrix(n_in: int, n_out: int, scale: Optional[float] = None
                   ) -> np.ndarray:
    """Dense (n_out, n_in) one-axis resample matrix of the torch bicubic
    kernel: ``out = A @ x``. Edge-clamped taps accumulate onto the clamped
    index (np.add.at), so A @ x == the gather/sum in bicubic_resize_2d
    exactly. Lets device code run the torch-exact resize as two small
    matmuls (the TPU-friendly form -- cf. ops/interpolate.py, where the
    same banded-matmul trick measured 32x over a lane-axis gather)."""
    idx, w = _axis_weights(n_in, n_out, scale)
    A = np.zeros((n_out, n_in), np.float64)
    np.add.at(A, (np.arange(n_out)[:, None], idx), w)
    return A


def bicubic_resize_2d(x: np.ndarray, out_hw: Tuple[int, int],
                      scales: Optional[Tuple[float, float]] = None
                      ) -> np.ndarray:
    """x: (..., H, W) -> (..., h_out, w_out), float64 accumulation."""
    H, W = x.shape[-2:]
    h_out, w_out = out_hw
    sy, sx = scales if scales is not None else (None, None)
    iy, wy = _axis_weights(H, h_out, sy)
    ix, wx = _axis_weights(W, w_out, sx)
    xf = x.astype(np.float64)
    rows = (xf[..., iy, :] * wy[:, :, None]).sum(-2)       # (..., h_out, W)
    out = (rows[..., ix] * wx).sum(-1)                     # (..., h_out, w_out)
    return out.astype(x.dtype)
