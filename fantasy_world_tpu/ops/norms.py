"""Normalization primitives with f32 statistics.

Mirrors the numerics of the reference (RMSNorm computes in float32 then
casts back -- wan_video_dit.py:135-146; LayerNorm statistics are fp32 in
torch regardless of input dtype).

A fused Pallas kernel (bf16 read -> f32 stats in VMEM -> optional affine +
AdaLN-modulate epilogue -> bf16 write) is implemented below but OFF by
default: measured on a v5e at the production (2, 16317, 5120) shape inside
a dependency-chained on-device loop, the XLA path costs ~3.0 ms/norm vs
~4.5-6 ms for the kernel (block_l 64/128/256; 512 exceeds the 16 MB scoped
VMEM). XLA's convert+reduce fusion is already within ~1.4x of achievable
HBM bandwidth here, and Mosaic's lane-minor reductions lose to it. Set
``FW_FUSED_NORM_KERNEL=1`` to opt in (e.g. to re-evaluate on v5p/v6e where
the VPU:HBM ratio differs). The jnp path is the parity oracle; kernel
numerics match except reduction association order.

The AdaLN-modulate epilogue covers both users of the pattern:
  * DiT: modulate(layer_norm(x), shift, scale)   (wan_video_dit.py:69-70)
  * VGGT: norm1(x) * (1 + e[1]) + e[0]           (vggt/layers/block.py)
both of which are y_bf16 -> f32 * (1 + scale) + shift -> bf16.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# jnp reference path (CPU fallback + parity oracle)
# ---------------------------------------------------------------------------

def _rms_norm_jnp(x, scale, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax_rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y.astype(x.dtype) * scale).astype(x.dtype)


def _layer_norm_jnp(x, params, eps):
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


# ---------------------------------------------------------------------------
# Pallas fused path
# ---------------------------------------------------------------------------

def _use_pallas(x) -> bool:
    import os
    return (os.environ.get("FW_FUSED_NORM_KERNEL") == "1"
            and jax.default_backend() == "tpu" and x.ndim >= 2
            and x.shape[-1] % 128 == 0 and x.shape[-1] <= 8192)


def _norm_kernel(*refs, kind: str, eps: float, has_affine: bool,
                 has_bias: bool, has_mod: bool):
    i = 0
    x_ref = refs[i]; i += 1
    scale_ref = bias_ref = shift_ref = mscale_ref = None
    if has_affine:
        scale_ref = refs[i]; i += 1
        if has_bias:
            bias_ref = refs[i]; i += 1
    if has_mod:
        shift_ref = refs[i]; i += 1
        mscale_ref = refs[i]; i += 1
    o_ref = refs[i]

    x = x_ref[0]
    xf = x.astype(jnp.float32)                       # registers, not HBM
    if kind == "rms":
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(ms + eps)
        y = y.astype(o_ref.dtype)
        if has_affine:
            y = (y * scale_ref[0].astype(o_ref.dtype)).astype(o_ref.dtype)
        o_ref[0] = y
        return
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if has_affine:
        y = y * scale_ref[0].astype(jnp.float32)
        if has_bias:
            y = y + bias_ref[0].astype(jnp.float32)
    if has_mod:
        # both DiT and VGGT round the normed value to the activation dtype
        # before modulating in f32 -- keep that rounding for parity
        y = y.astype(o_ref.dtype).astype(jnp.float32)
        y = y * (1 + mscale_ref[0, 0]) + shift_ref[0, 0]
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kind", "eps", "block_l"))
def _fused_norm(x, scale=None, bias=None, shift=None, mscale=None, *,
                kind: str, eps: float, block_l: int = 64):
    """x: (B, L, D) -> same. scale/bias: (D,) or None; shift/mscale:
    (B, 1, D) f32 or None."""
    from jax.experimental import pallas as pl

    B, L, D = x.shape
    lp = -(-L // block_l) * block_l
    if lp != L:
        x = jnp.pad(x, ((0, 0), (0, lp - L), (0, 0)))
    grid = (B, lp // block_l)

    in_specs = [pl.BlockSpec((1, block_l, D), lambda b, il: (b, il, 0))]
    args = [x]
    if scale is not None:
        in_specs.append(pl.BlockSpec((1, D), lambda b, il: (0, 0)))
        args.append(scale.reshape(1, D))
        if bias is not None:
            in_specs.append(pl.BlockSpec((1, D), lambda b, il: (0, 0)))
            args.append(bias.reshape(1, D))
    if shift is not None:
        for m in (shift, mscale):
            in_specs.append(pl.BlockSpec((1, 1, D), lambda b, il: (b, 0, 0)))
            args.append(m.astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(_norm_kernel, kind=kind, eps=eps,
                          has_affine=scale is not None,
                          has_bias=bias is not None,
                          has_mod=shift is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_l, D), lambda b, il: (b, il, 0)),
        out_shape=jax.ShapeDtypeStruct((B, lp, D), x.dtype),
    )(*args)
    return out[:, :L] if lp != L else out


def _flatten_to_3d(x):
    if x.ndim == 3:
        return x, None
    lead = x.shape[:-1]
    return x.reshape(1, -1, x.shape[-1]), lead


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    if _use_pallas(x):
        x3, lead = _flatten_to_3d(x)
        out = _fused_norm(x3, scale=scale, kind="rms", eps=eps)
        return out.reshape(*lead, x.shape[-1]) if lead else out
    return _rms_norm_jnp(x, scale, eps)


def layer_norm(x: jnp.ndarray, params: Optional[dict] = None, eps: float = 1e-6
               ) -> jnp.ndarray:
    """LayerNorm over the last axis; ``params`` may hold 'scale'/'bias'
    (affine) or be empty/None (elementwise_affine=False)."""
    if _use_pallas(x):
        scale = params.get("scale") if params else None
        bias = params.get("bias") if params else None
        if bias is None or scale is not None:     # kernel needs scale w/ bias
            x3, lead = _flatten_to_3d(x)
            out = _fused_norm(x3, scale=scale, bias=bias, kind="ln", eps=eps)
            return out.reshape(*lead, x.shape[-1]) if lead else out
    return _layer_norm_jnp(x, params, eps)


def layer_norm_modulate(x: jnp.ndarray, shift: jnp.ndarray,
                        scale_mod: jnp.ndarray,
                        params: Optional[dict] = None, eps: float = 1e-6,
                        ) -> jnp.ndarray:
    """Fused ``modulate(layer_norm(x, params), shift, scale_mod)`` returning
    x.dtype. shift/scale_mod: (B, 1, D), broadcast over tokens.

    Matches the composed reference semantics bit-for-bit on the jnp path:
    the normed (affine-applied) value is rounded to x.dtype before the f32
    modulation.
    """
    B = x.shape[0]
    if shift.shape[0] != B:                       # e0 batch < frame-folded B
        reps = B // shift.shape[0]
        shift = jnp.repeat(shift, reps, axis=0)
        scale_mod = jnp.repeat(scale_mod, reps, axis=0)
    if _use_pallas(x) and x.ndim == 3:
        scale = params.get("scale") if params else None
        bias = params.get("bias") if params else None
        if bias is None or scale is not None:
            return _fused_norm(x, scale=scale, bias=bias, shift=shift,
                               mscale=scale_mod, kind="ln", eps=eps)
    y = _layer_norm_jnp(x, params, eps)
    return modulate(y.astype(jnp.float32), shift.astype(jnp.float32),
                    scale_mod.astype(jnp.float32)).astype(x.dtype)
