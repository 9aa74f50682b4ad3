"""Temporal latent tiling for long-video denoising.

Re-design of the reference TemporalTiler_BCTHW
(diffsynth_wan22/pipelines/wan_video_new.py:1433-1484): slide a window over
the latent-frame axis, run the denoiser per window, and blend overlapping
outputs with 0.5-shifted linear ramps. This is the long-context mechanism
for >81-frame generation where the full token sequence would not fit.

TPU notes: each window is a separate jit invocation with a static window
shape; all windows except a possibly-clamped final one share one compiled
program. Pick ``stride`` such that windows land on equal sizes to avoid a
second compile. Blending runs on host in f32 (one pass over the output).
"""
from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax.numpy as jnp
import numpy as np


def build_1d_mask(length: int, left_bound: bool, right_bound: bool,
                  border_width: int) -> np.ndarray:
    """0.5-shifted linear ramp (wan_video_new.py:1437-1447). Unlike the
    spatial VAE masks, the temporal ramp starts at 0.5/border so two
    overlapping windows sum to 1 everywhere."""
    x = np.ones((length,), np.float32)
    if border_width == 0:
        return x
    ramp = (np.arange(border_width) + 0.5) / border_width
    if not left_bound:
        x[:border_width] = ramp
    if not right_bound:
        x[-border_width:] = ramp[::-1]
    return x


def window_plan(T: int, size: int, stride: int):
    """The reference's task split (wan_video_new.py:1464-1467): start every
    ``stride`` frames, skip windows fully covered by their predecessor."""
    plan = []
    for t in range(0, T, stride):
        if t - stride >= 0 and t - stride + size >= T:
            continue
        plan.append((t, min(t + size, T)))
    return plan


def temporal_tiled_forward(model_fn: Callable[..., jnp.ndarray],
                           tensors: Dict[str, jnp.ndarray],
                           sliding_window_size: int,
                           sliding_window_stride: int,
                           slice_names: Sequence[str] = ("latents", "y"),
                           **static_kwargs) -> jnp.ndarray:
    """Run ``model_fn(**tensors, **static_kwargs)`` over sliding temporal
    windows of the (B, C, T, H, W) tensors named in ``slice_names``
    (others pass through whole), blending overlaps.

    Mirrors TemporalTiler_BCTHW.run(): only latent-shaped tensors are
    sliced; conditioning that is not frame-indexed (context, clip) passes
    through, matching the reference's tensor_names=["latents", "y"].
    """
    names = [n for n in slice_names if tensors.get(n) is not None]
    ref = tensors[names[0]]
    B, C, T = ref.shape[:3]
    value = None
    weight = np.zeros((1, 1, T, 1, 1), np.float32)
    border = sliding_window_size - sliding_window_stride
    for t0, t1 in window_plan(T, sliding_window_size, sliding_window_stride):
        kwargs = dict(tensors)
        for n in names:
            kwargs[n] = tensors[n][:, :, t0:t1]
        out = np.asarray(model_fn(**kwargs, **static_kwargs), np.float32)
        if value is None:
            value = np.zeros((out.shape[0], out.shape[1], T) + out.shape[3:],
                             np.float32)
        mask = build_1d_mask(t1 - t0, t0 == 0, t1 == T,
                             border)[None, None, :, None, None]
        value[:, :, t0:t1] += out * mask
        weight[:, :, t0:t1] += mask
    return jnp.asarray(value / weight).astype(ref.dtype)
