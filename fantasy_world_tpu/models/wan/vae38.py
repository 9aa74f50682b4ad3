"""Wan 2.2 38-block video VAE (16x spatial, 4x temporal, z=48), TPU-native.

Re-design of the wan22 additions to wan_video_vae.py: VideoVAE38_
(:1278-1362), Encoder3d_38 (:629-744), Decoder3d_38 (:851-958),
Down_/Up_ResidualBlock (:451-524), AvgDown3D/DupUp3D (:354-449),
Resample38 (:227-265), WanVideoVAE38 stats (:1363-1390).

Differences vs the 2.1 VAE (models/wan/vae.py):
  * input is pixel-unshuffled 2x2 before the network (12ch in / out), for
    16x total spatial reduction;
  * every stage is a residual MACRO block: a plain conv path plus a
    parameter-free AvgDown3D (encode) / DupUp3D (decode) shortcut;
  * upsample convs keep the channel count (2.1 halves it);
  * encoder and decoder widths differ (dim=160 enc, dec_dim=256 dec).

As with the 2.1 VAE, the reference's per-frame feature-cache streaming is
replaced by full-sequence causal convs (ops/causal_conv.py equivalences);
AvgDown3D/DupUp3D are frame-local reshapes, so streamed == full-sequence
by construction, with DupUp3D's ``first_chunk`` trim becoming a global
leading-frame trim.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.causal_conv import causal_conv3d, conv2d, conv3d, rms_norm_channel
from .vae import (_nearest_up2, _silu, _spatial, attention_block,
                  residual_block, tiled_blend)

LATENT38_MEAN = np.array([
    -0.2289, -0.0052, -0.1323, -0.2339, -0.2799, 0.0174, 0.1838, 0.1557,
    -0.1382, 0.0542, 0.2813, 0.0891, 0.1570, -0.0098, 0.0375, -0.1825,
    -0.2246, -0.1207, -0.0698, 0.5109, 0.2665, -0.2108, -0.2158, 0.2502,
    -0.2055, -0.0322, 0.1109, 0.1567, -0.0729, 0.0899, -0.2799, -0.1230,
    -0.0313, -0.1649, 0.0117, 0.0723, -0.2839, -0.2083, -0.0520, 0.3748,
    0.0152, 0.1957, 0.1433, -0.2944, 0.3573, -0.0548, -0.1681, -0.0667,
], np.float32)
LATENT38_STD = np.array([
    0.4765, 1.0364, 0.4514, 1.1677, 0.5313, 0.4990, 0.4818, 0.5013,
    0.8158, 1.0344, 0.5894, 1.0901, 0.6885, 0.6165, 0.8454, 0.4978,
    0.5759, 0.3523, 0.7135, 0.6804, 0.5833, 1.4146, 0.8986, 0.5659,
    0.7069, 0.5338, 0.4889, 0.4917, 0.4069, 0.4999, 0.6866, 0.4093,
    0.5709, 0.6065, 0.6415, 0.4944, 0.5726, 1.2042, 0.5458, 1.6887,
    0.3971, 1.0600, 0.3943, 0.5537, 0.5444, 0.4089, 0.7468, 0.7744,
], np.float32)


@dataclasses.dataclass(frozen=True)
class VAE38Config:
    dim: int = 160
    dec_dim: int = 256
    z_dim: int = 48
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temperal_downsample: Tuple[bool, ...] = (False, True, True)

    @property
    def temperal_upsample(self):
        return tuple(reversed(self.temperal_downsample))

    # 2x patchify2 front-end x 8x encoder stages (vae38_encode: H/16)
    spatial_down: int = 16


# ---------------------------------------------------------------------------
# pixel (un)shuffle and the parameter-free shortcuts
# ---------------------------------------------------------------------------

def patchify2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, F, 2h, 2w) -> (B, 4C, F, h, w), channel order (c, r, q) with
    q = height phase, r = width phase (wan_video_vae.py:199-211)."""
    B, C, F, H, W = x.shape
    x = x.reshape(B, C, F, H // 2, 2, W // 2, 2)        # ... h q w r
    x = x.transpose(0, 1, 6, 4, 2, 3, 5)                # B C r q F h w
    return x.reshape(B, C * 4, F, H // 2, W // 2)


def unpatchify2(x: jnp.ndarray) -> jnp.ndarray:
    B, C4, F, h, w = x.shape
    C = C4 // 4
    x = x.reshape(B, C, 2, 2, F, h, w)                  # B C r q F h w
    x = x.transpose(0, 1, 4, 5, 3, 6, 2)                # B C F h q w r
    return x.reshape(B, C, F, h * 2, w * 2)


def avg_down3d(x: jnp.ndarray, out_channels: int, factor_t: int,
               factor_s: int = 1) -> jnp.ndarray:
    """AvgDown3D (wan_video_vae.py:354-404): front zero-pad time to a
    multiple of factor_t, space-time-to-depth, grouped channel mean."""
    B, C, T, H, W = x.shape
    pad_t = (factor_t - T % factor_t) % factor_t
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, 0), (pad_t, 0), (0, 0), (0, 0)))
        T += pad_t
    factor = factor_t * factor_s * factor_s
    x = x.reshape(B, C, T // factor_t, factor_t, H // factor_s, factor_s,
                  W // factor_s, factor_s)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)   # B C ft fsh fsw T' H' W'
    x = x.reshape(B, C * factor, T // factor_t, H // factor_s, W // factor_s)
    group = C * factor // out_channels
    x = x.reshape(B, out_channels, group, *x.shape[2:])
    return jnp.mean(x.astype(jnp.float32), axis=2).astype(x.dtype)


def dup_up3d(x: jnp.ndarray, out_channels: int, factor_t: int,
             factor_s: int = 1, first_chunk: bool = False) -> jnp.ndarray:
    """DupUp3D (wan_video_vae.py:407-449): channel repeat-interleave,
    depth-to-space-time. first_chunk trims the causally-invalid leading
    factor_t-1 frames (full-sequence equivalent of the reference's
    per-chunk flag, which is set only for the first latent frame)."""
    B, C, T, H, W = x.shape
    factor = factor_t * factor_s * factor_s
    repeats = out_channels * factor // C
    x = jnp.repeat(x, repeats, axis=1)
    x = x.reshape(B, out_channels, factor_t, factor_s, factor_s, T, H, W)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)   # B C T ft H fsh W fsw
    x = x.reshape(B, out_channels, T * factor_t, H * factor_s, W * factor_s)
    if first_chunk and factor_t > 1:
        x = x[:, :, factor_t - 1:]
    return x


# ---------------------------------------------------------------------------
# Resample38: like 2.1's Resample but channel-preserving on upsample
# ---------------------------------------------------------------------------

# The 38-block VAE's resamplers share the 2.1 math exactly (the channel
# behavior differs only through the conv kernel shapes in the param tree),
# so the apply is the 2.1 function, not a copy.
from .vae import resample_apply as resample38_apply  # noqa: E402


# ---------------------------------------------------------------------------
# macro blocks + plans
# ---------------------------------------------------------------------------

def encoder38_stages(cfg: VAE38Config) -> List[dict]:
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    stages = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        t_down = (cfg.temperal_downsample[i]
                  if i < len(cfg.temperal_downsample) else False)
        stages.append({"in": din, "out": dout, "t_down": t_down,
                       "down": i != len(cfg.dim_mult) - 1})
    return stages


def decoder38_stages(cfg: VAE38Config) -> List[dict]:
    dims = [cfg.dec_dim * u
            for u in (cfg.dim_mult[-1],) + tuple(cfg.dim_mult[::-1])]
    stages = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        t_up = (cfg.temperal_upsample[i]
                if i < len(cfg.temperal_upsample) else False)
        stages.append({"in": din, "out": dout, "t_up": t_up,
                       "up": i != len(cfg.dim_mult) - 1})
    return stages


def down_residual_block(p: Dict, stage: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Down_ResidualBlock (:451-483): conv main path + AvgDown3D shortcut."""
    h = avg_down3d(x, stage["out"],
                   factor_t=2 if stage["t_down"] else 1,
                   factor_s=2 if stage["down"] else 1)
    for rp in p["res"]:
        x = residual_block(rp, x)
    if stage["down"]:
        kind = "down3d" if stage["t_down"] else "down2d"
        x = resample38_apply(kind, p["resample"], x)
    return x + h


def up_residual_block(p: Dict, stage: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Up_ResidualBlock (:486-524): conv main path + DupUp3D shortcut
    (shortcut only when the stage upsamples)."""
    h = None
    if stage["up"]:
        h = dup_up3d(x, stage["out"],
                     factor_t=2 if stage["t_up"] else 1,
                     factor_s=2, first_chunk=True)
    for rp in p["res"]:
        x = residual_block(rp, x)
    if stage["up"]:
        kind = "up3d" if stage["t_up"] else "up2d"
        x = resample38_apply(kind, p["resample"], x)
    return x if h is None else x + h


# ---------------------------------------------------------------------------
# encoder / decoder / public API
# ---------------------------------------------------------------------------

def encoder38_apply(p: Dict, cfg: VAE38Config, x: jnp.ndarray) -> jnp.ndarray:
    x = causal_conv3d(p["conv1"], x)
    for sp, stage in zip(p["downsamples"], encoder38_stages(cfg)):
        x = down_residual_block(sp, stage, x)
    x = residual_block(p["middle_res1"], x)
    x = attention_block(p["middle_attn"], x)
    x = residual_block(p["middle_res2"], x)
    return causal_conv3d(p["head_conv"],
                         _silu(rms_norm_channel(p["head_norm"], x)))


def decoder38_apply(p: Dict, cfg: VAE38Config, z: jnp.ndarray) -> jnp.ndarray:
    x = causal_conv3d(p["conv1"], z)
    x = residual_block(p["middle_res1"], x)
    x = attention_block(p["middle_attn"], x)
    x = residual_block(p["middle_res2"], x)
    for sp, stage in zip(p["upsamples"], decoder38_stages(cfg)):
        x = up_residual_block(sp, stage, x)
    return causal_conv3d(p["head_conv"],
                         _silu(rms_norm_channel(p["head_norm"], x)))


def vae38_encode(p: Dict, cfg: VAE38Config, video: jnp.ndarray) -> jnp.ndarray:
    """video (B, 3, T, H, W) in [-1,1] -> latents (B, 48, (T-1)/4+1, H/16, W/16)."""
    x = patchify2(video)
    out = encoder38_apply(p["encoder"], cfg, x)
    mu = causal_conv3d(p["conv1"], out)[:, :cfg.z_dim]
    mean = jnp.asarray(LATENT38_MEAN, mu.dtype)[None, :, None, None, None]
    inv_std = jnp.asarray(1.0 / LATENT38_STD, mu.dtype)[None, :, None, None,
                                                        None]
    return (mu - mean) * inv_std


def vae38_decode(p: Dict, cfg: VAE38Config, latents: jnp.ndarray,
                 clamp: bool = True) -> jnp.ndarray:
    mean = jnp.asarray(LATENT38_MEAN, latents.dtype)[None, :, None, None, None]
    std = jnp.asarray(LATENT38_STD, latents.dtype)[None, :, None, None, None]
    z = latents * std + mean
    z = causal_conv3d(p["conv2"], z)
    x = decoder38_apply(p["decoder"], cfg, z)
    video = unpatchify2(x)
    return jnp.clip(video, -1, 1) if clamp else video


# ---------------------------------------------------------------------------
# tiled wrappers (WanVideoVAE38 inherits the 2.1 tiling with
# upsampling_factor 16 -- wan_video_vae.py:1363-1390, 1112-1259)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1, 3))
def _vae38_decode_jit(p, cfg, latents, clamp):
    return vae38_decode(p, cfg, latents, clamp)


@functools.partial(jax.jit, static_argnums=(1,))
def _vae38_encode_jit(p, cfg, video):
    return vae38_encode(p, cfg, video)


def vae38_decode_tiled(p: Dict, cfg: VAE38Config, latents: jnp.ndarray,
                       tile_size=(34, 34), tile_stride=(18, 16)) -> jnp.ndarray:
    return tiled_blend(lambda t: _vae38_decode_jit(p, cfg, t, False),
                       latents, tile_size, tile_stride, out_scale=16,
                       out_C=3, out_T=latents.shape[2] * 4 - 3, clamp=True)


def vae38_encode_tiled(p: Dict, cfg: VAE38Config, video: jnp.ndarray,
                       tile_size=(34, 34), tile_stride=(18, 16)) -> jnp.ndarray:
    up = 16
    return tiled_blend(lambda t: _vae38_encode_jit(p, cfg, t), video,
                       (tile_size[0] * up, tile_size[1] * up),
                       (tile_stride[0] * up, tile_stride[1] * up),
                       out_scale=1 / up, out_C=cfg.z_dim,
                       out_T=(video.shape[2] + 3) // 4, clamp=False)
