"""Normalization primitives with f32 statistics.

Mirrors the numerics of the reference (RMSNorm computes in float32 then
casts back -- wan_video_dit.py:135-146; LayerNorm statistics are fp32 in
torch regardless of input dtype).

These are deliberately plain jnp: XLA's convert+reduce fusion runs the
norm(+AdaLN-modulate) at ~3.0 ms at the production (2, 16317, 5120) shape
on a v5e -- within ~1.4x of achievable HBM bandwidth -- and a hand-written
fused Pallas kernel measured SLOWER at every legal block size (4.5-6 ms;
PERF.md "What did win" section). That kernel was deleted in round 4 rather
than shipped disabled-by-default (it is in git history of this file if a
future TPU generation's VPU:HBM ratio warrants re-evaluation).
"""
from __future__ import annotations

from typing import Optional

import jax.lax as lax
import jax.numpy as jnp


def _rms_norm_jnp(x, scale, eps):
    xf = x.astype(jnp.float32)
    y = xf * lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y.astype(x.dtype) * scale).astype(x.dtype)


def _layer_norm_jnp(x, params, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + eps)
    if params:
        if "scale" in params:
            y = y * params["scale"].astype(jnp.float32)
        if "bias" in params:
            y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """AdaLN modulation x * (1 + scale) + shift (wan_video_dit.py:69-70)."""
    return x * (1 + scale) + shift


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    return _rms_norm_jnp(x, scale, eps)


def layer_norm(x: jnp.ndarray, params: Optional[dict] = None, eps: float = 1e-6
               ) -> jnp.ndarray:
    """LayerNorm over the last axis; ``params`` may hold 'scale'/'bias'
    (affine) or be empty/None (elementwise_affine=False)."""
    return _layer_norm_jnp(x, params, eps)


def layer_norm_modulate(x: jnp.ndarray, shift: jnp.ndarray,
                        scale_mod: jnp.ndarray,
                        params: Optional[dict] = None, eps: float = 1e-6,
                        ) -> jnp.ndarray:
    """``modulate(layer_norm(x, params), shift, scale_mod)`` returning
    x.dtype. shift/scale_mod: (B, 1, D), broadcast over tokens.

    Matches the composed reference semantics bit-for-bit: the normed
    (affine-applied) value is rounded to x.dtype before the f32 modulation
    (DiT: modulate(layer_norm(x)), wan_video_dit.py:69-70; VGGT:
    norm1(x) * (1 + e[1]) + e[0], vggt/layers/block.py).
    """
    B = x.shape[0]
    if shift.shape[0] != B:                       # e0 batch < frame-folded B
        reps = B // shift.shape[0]
        shift = jnp.repeat(shift, reps, axis=0)
        scale_mod = jnp.repeat(scale_mod, reps, axis=0)
    y = _layer_norm_jnp(x, params, eps)
    return modulate(y.astype(jnp.float32), shift.astype(jnp.float32),
                    scale_mod.astype(jnp.float32)).astype(x.dtype)
