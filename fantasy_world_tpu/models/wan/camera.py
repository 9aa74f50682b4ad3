"""Camera conditioning encoders, TPU-native.

  * CameraPoseEncoder (AC3D-style, pose_adaptor_ac3d.py:8-109): Plucker
    video (B, F, H, W, C) -> pixel-unshuffle(8) -> two 1x1-conv/GroupNorm
    stages each followed by 2x temporal average pooling (81 -> 41 -> 21
    frames) -> Conv3d patchify to the DiT width -> MLP to plucker features
    consumed by the per-layer AdaLN adapters.
  * SimpleAdapter (wan22 control-camera, wan_video_camera_controller.py:
    8-44): pixel-unshuffle(8) + stride-2 conv to the DiT width + residual
    blocks, added to the patch embedding.

Both are small hosts of MXU-friendly matmuls; the pixel-unshuffle and
patchify are pure reshapes.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.causal_conv import conv2d


@dataclasses.dataclass(frozen=True)
class CameraPoseEncoderConfig:
    in_channels: int = 6          # plucker; 4 for rgb_conf; 12 for 'all'
    downscale: int = 8
    dim: int = 5120
    context_dim: int = 2048
    patch_size: Tuple[int, int, int] = (1, 2, 2)

    @property
    def start_channels(self) -> int:
        return self.in_channels * self.downscale ** 2


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(N, C, H, W) -> (N, C*r*r, H/r, W/r), torch channel ordering
    out[c*r*r + i*r + j] = in[c, h*r+i, w*r+j]."""
    N, C, H, W = x.shape
    x = x.reshape(N, C, H // r, r, W // r, r)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(N, C * r * r, H // r, W // r)


def group_norm(p: Dict, x: jnp.ndarray, groups: int, eps: float = 1e-5
               ) -> jnp.ndarray:
    N, C, H, W = x.shape
    xf = x.astype(jnp.float32).reshape(N, groups, C // groups * H * W)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(N, C, H, W)
    y = y * p["scale"].astype(jnp.float32)[None, :, None, None]
    y = y + p["bias"].astype(jnp.float32)[None, :, None, None]
    return y.astype(x.dtype)


def compress_time(x: jnp.ndarray, frames: int) -> jnp.ndarray:
    """(B*F, C, H, W) -> temporal 2x average pool keeping frame 0 when F is
    odd (pose_adaptor_ac3d.py:60-74)."""
    BF, C, H, W = x.shape
    B = BF // frames
    x = x.reshape(B, frames, C, H, W)
    if frames % 2 == 1:
        first, rest = x[:, :1], x[:, 1:]
        rest = rest.reshape(B, (frames - 1) // 2, 2, C, H, W).mean(axis=2)
        x = jnp.concatenate([first, rest.astype(x.dtype)], axis=1)
    else:
        x = x.reshape(B, frames // 2, 2, C, H, W).mean(axis=2).astype(x.dtype)
    return x.reshape(-1, C, H, W)


def _linear(p, x):
    y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _layer_norm_affine(p, x, eps=1e-5):
    from ...ops.norms import layer_norm
    return layer_norm(x, p, eps)


def camera_pose_encoder_apply(p: Dict, cfg: CameraPoseEncoderConfig,
                              plucker: jnp.ndarray) -> jnp.ndarray:
    """plucker: (B, F, H, W, C) -> plucker features (B, L, context_dim)."""
    B, F, H, W, C = plucker.shape
    x = plucker.transpose(0, 1, 4, 2, 3).reshape(B * F, C, H, W)
    x = pixel_unshuffle(x, cfg.downscale)

    e1 = p["encode_first"]
    x = conv2d(e1["conv1"]["kernel"], e1["conv1"]["bias"], x,
               padding=((0, 0), (0, 0)))
    x = group_norm(e1["norm1"], x, 2)
    x = conv2d(e1["conv2"]["kernel"], e1["conv2"]["bias"], x,
               padding=((0, 0), (0, 0)))
    x = group_norm(e1["norm2"], x, 2)
    x = jax.nn.relu(x.astype(jnp.float32)).astype(x.dtype)
    x = compress_time(x, F)
    F2 = x.shape[0] // B

    e2 = p["encode_second"]
    x = conv2d(e2["conv1"]["kernel"], e2["conv1"]["bias"], x,
               padding=((0, 0), (0, 0)))
    x = group_norm(e2["norm1"], x, 2)
    x = jax.nn.relu(x.astype(jnp.float32)).astype(x.dtype)
    x = compress_time(x, F2)
    F3 = x.shape[0] // B

    # Conv3d patchify with kernel==stride (1,2,2): reshape + matmul
    Cc, Hh, Ww = x.shape[1:]
    pt, ph, pw = cfg.patch_size
    x = x.reshape(B, F3, Cc, Hh, Ww)
    x = x.reshape(B, F3, Cc, Hh // ph, ph, Ww // pw, pw)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6)
    x = x.reshape(B, F3 * (Hh // ph) * (Ww // pw), Cc * pt * ph * pw)
    x = _linear(p["patch_embedding"], x)

    fc = p["fc"]
    x = _layer_norm_affine(fc["norm1"], _linear(fc["fc1"], x))
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    x = _layer_norm_affine(fc["norm2"], _linear(fc["fc2"], x))
    return x


# ---------------------------------------------------------------------------
# SimpleAdapter (wan2.2 control-camera)
# ---------------------------------------------------------------------------

def simple_adapter_apply(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, C, F, H, W) control-camera latents -> (B, dim, F, H/16, W/16)
    feature map added to the patch embedding (SimpleAdapter.forward)."""
    B, C, F, H, W = x.shape
    h = x.transpose(0, 2, 1, 3, 4).reshape(B * F, C, H, W)
    h = pixel_unshuffle(h, 8)
    h = conv2d(p["conv"]["kernel"], p["conv"]["bias"], h, stride=(2, 2),
               padding=((0, 0), (0, 0)))
    for rb in p["residual_blocks"]:
        r = conv2d(rb["conv1"]["kernel"], rb["conv1"]["bias"], h)
        r = jax.nn.relu(r.astype(jnp.float32)).astype(h.dtype)
        r = conv2d(rb["conv2"]["kernel"], rb["conv2"]["bias"], r)
        h = h + r
    h = h.reshape(B, F, h.shape[1], h.shape[2], h.shape[3])
    return h.transpose(0, 2, 1, 3, 4)
