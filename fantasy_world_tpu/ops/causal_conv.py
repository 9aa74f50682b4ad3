"""Causal 3D convolutions and the Wan temporal upsampling stage.

The reference streams these ops frame-by-frame with a feature cache
(wan/modules/vae_modified.py CausalConv3d/Resample; wan_video_vae.py) purely
to bound GPU memory. On TPU the whole latent sequence fits in HBM, so every
op here processes the full sequence in one fused XLA conv -- mathematically
identical to the streamed version (the cache is exactly the causal-padding
window). Verified against the torch streaming oracle in tests/test_vggt.py.

Derived streaming equivalences (vae_modified.py:66-130 Resample 'upsample3d'
under per-frame decode, the 'Rep' first-frame path):
  * frame 0 bypasses the time conv entirely and is passed through;
  * frames 1..T-1 go through a zero-history causal conv (the reference
    replaces the would-be frame-0 history with zeros), whose 2C outputs are
    split into two consecutive frames;
so  out = concat([x[:, :, :1]], time_double(causal_conv(x[:, :, 1:]))),
giving 1 + 2*(T-1) frames per stage.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def conv3d(kernel: jnp.ndarray, bias, x: jnp.ndarray, *,
           stride=(1, 1, 1), padding=((0, 0), (0, 0), (0, 0))) -> jnp.ndarray:
    """NCDHW conv with torch-layout kernel (O, I, kt, kh, kw).

    Output dtype == input dtype, bias added at that dtype: the TPU MXU
    accumulates convs in f32 regardless, and requesting an f32 OUTPUT
    materialized a 2x-size tensor that a separate convert pass then
    re-read -- the r4 xprof of the VAE tile decode showed 21% of device
    time in convert_element_type from exactly this. bf16 bias-add also
    matches the torch bf16 reference closer than the previous
    f32-bias-then-round (torch adds conv bias at the layer dtype); the
    f32 parity suites see no change at all (x.dtype is f32 there)."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    if bias is not None:
        y = y + bias.astype(y.dtype)[None, :, None, None, None]
    return y


def causal_conv3d(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """CausalConv3d (vae_modified.py:17-36): time padded 2*pad_t on the left
    only, spatial padded symmetrically."""
    kt, kh, kw = p["kernel"].shape[2:]
    pad_t, pad_h, pad_w = kt // 2, kh // 2, kw // 2
    return conv3d(p["kernel"], p.get("bias"), x,
                  padding=((2 * pad_t, 0), (pad_h, pad_h), (pad_w, pad_w)))


def conv2d(kernel: jnp.ndarray, bias, x: jnp.ndarray, *, stride=(1, 1),
           padding="SAME") -> jnp.ndarray:
    """NCHW conv with torch-layout kernel (O, I, kh, kw). Same
    output-dtype/bias-dtype policy as conv3d (see its docstring)."""
    if padding == "SAME":
        kh, kw = kernel.shape[2:]
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if bias is not None:
        y = y + bias.astype(y.dtype)[None, :, None, None]
    return y


def _time_double(y: jnp.ndarray) -> jnp.ndarray:
    """(B, 2C, T, H, W) -> (B, C, 2T, H, W) interleaving the channel halves
    as consecutive frames (vae_modified.py:121-124)."""
    B, C2, T, H, W = y.shape
    C = C2 // 2
    y = y.reshape(B, 2, C, T, H, W)
    y = jnp.stack([y[:, 0], y[:, 1]], axis=3)        # (B, C, T, 2, H, W)
    return y.reshape(B, C, T * 2, H, W)


def resample_up3d(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Streaming-equivalent temporal 2x upsample: T -> 1 + 2*(T-1)."""
    first = x[:, :, :1]
    rest = x[:, :, 1:]
    y = causal_conv3d(p["time_conv"], rest)          # (B, 2C, T-1, H, W)
    return jnp.concatenate([first, _time_double(y)], axis=2)


def rms_norm_channel(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """RMS_norm with channel_first=True, images=False
    (vae_modified.py:39-54): F.normalize over channel dim * sqrt(C) * gamma.
    gamma shape (C,1,1,1) broadcasts over (B,C,T,H,W).

    Only the reduction statistics run in f32; the rescale multiplies in the
    input dtype against the C-times-smaller f32 stats tensor cast once. The
    previous full-tensor f32 round-trip emitted standalone
    convert_element_type passes XLA did not fuse around the neighbouring
    convs -- an r5 xprof of the strip-tiled VAE decode measured 1.07 s of
    5.73 s (19%) in exactly those converts (~174 GB of pure dtype traffic
    per tile). f32 inputs see identical math modulo one associativity
    reorder (scale/norm folded into one factor)."""
    ss = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1, keepdims=True)
    inv = x.shape[1] ** 0.5 / jnp.maximum(jnp.sqrt(ss), 1e-12)
    y = x * inv.astype(x.dtype) * p["gamma"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def residual_block_half(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """ResidualBlock_Half (vae_modified.py:193-225): RMSnorm -> SiLU ->
    CausalConv3d, plus (1x1 causal conv | identity) shortcut."""
    h = causal_conv3d(p["shortcut"], x) if "shortcut" in p else x
    y = rms_norm_channel(p["norm"], x)
    y = jax.nn.silu(y.astype(jnp.float32)).astype(x.dtype)
    y = causal_conv3d(p["conv"], y)
    return y + h


def wan_vae_dpt_upsampler(p: Dict, z: jnp.ndarray) -> jnp.ndarray:
    """WanVAE_(location='DPT').decode (vae_modified.py:443-476): 1x1 causal
    conv then [up3d, ResBlockHalf, up3d, ResBlockHalf]; T -> 1 + 4*(T-1)."""
    x = causal_conv3d(p["conv2"], z)
    x = resample_up3d(p["up1"], x)
    x = residual_block_half(p["res1"], x)
    x = resample_up3d(p["up2"], x)
    x = residual_block_half(p["res2"], x)
    return x


def channel_expand_reshape(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """ChannelExpandAndReshape (vae_modified.py:558-572): Conv1d C -> 4C
    (kernel 1) then a *blocked* (not interleaved) reshape to 4x the token
    count -- replicated exactly as trained."""
    B, N, C = x.shape
    w = p["kernel"]          # (4C, C, 1) torch conv1d layout
    y = jnp.einsum("bnc,oc->bno", x, w[:, :, 0].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    y = (y + p["bias"].astype(jnp.float32)).astype(x.dtype)   # (B, N, 4C)
    # torch: (B, 4C, N).reshape(B, C, 4N): out[c, j*N + n] = in[4c + j, n]
    y = y.transpose(0, 2, 1).reshape(B, C, 4, N)
    y = y.reshape(B, C, 4 * N)
    return y.transpose(0, 2, 1)
