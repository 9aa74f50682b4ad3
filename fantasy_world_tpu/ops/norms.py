"""Normalization primitives with f32 statistics.

Mirrors the numerics of the reference (RMSNorm computes in float32 then
casts back -- wan_video_dit.py:135-146; LayerNorm statistics are fp32 in
torch regardless of input dtype). XLA fuses these elementwise chains into
the surrounding matmuls, so no Pallas kernels are needed here.
"""
from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    y = xf * jax_rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y.astype(x.dtype) * scale).astype(x.dtype)


def layer_norm(x: jnp.ndarray, params: dict | None = None, eps: float = 1e-6
               ) -> jnp.ndarray:
    """LayerNorm over the last axis; ``params`` may hold 'scale'/'bias'
    (affine) or be empty/None (elementwise_affine=False)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax_rsqrt(var + eps)
    if params:
        if "scale" in params:
            y = y * params["scale"].astype(jnp.float32)
        if "bias" in params:
            y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def jax_rsqrt(x):
    import jax.lax as lax
    return lax.rsqrt(x)


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """AdaLN modulation x * (1 + scale) + shift (wan_video_dit.py:69-70)."""
    return x * (1 + scale) + shift
