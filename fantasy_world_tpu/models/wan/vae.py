"""Wan 2.1 3D-causal video VAE, TPU-native full-sequence implementation.

Re-design of diffsynth_wan21/models/wan_video_vae.py. The reference streams
the causal convs frame-by-frame with a feature cache and stages spatial
tiles through CPU -- both GPU-memory workarounds. Here the entire clip runs
as fused XLA convolutions over the full time axis, using the streaming
equivalences derived in ops/causal_conv.py:

  * plain CausalConv3d chains (conv1/residual/head)  == left-padded conv;
  * Resample 'downsample3d' == passthrough frame 0 ++ no-pad stride-2 conv;
  * Resample 'upsample3d'   == passthrough frame 0 ++ zero-history causal
    conv over frames 1.. with channel-split time doubling.

A spatially tiled mode with the reference's linear blend masks
(wan_video_vae.py:619-745) is provided for parity testing and very large
resolutions.

Architecture (z=16, dim=96, mult [1,2,4,4], 2 res blocks, no attn scales):
encoder 8x spatial + 4x temporal down to 16ch latents with per-channel
mean/std normalization; decoder mirrors with channel halving at each
upsample.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.causal_conv import (causal_conv3d, conv2d, resample_up3d,
                                rms_norm_channel, conv3d)

LATENT_MEAN = np.array([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
], np.float32)
LATENT_STD = np.array([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
], np.float32)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temperal_downsample: Tuple[bool, ...] = (False, True, True)

    @property
    def temperal_upsample(self):
        return tuple(reversed(self.temperal_downsample))

    # 8x spatial encode factor (vae_encode: H/8); the 38-block VAE
    # overrides with 16 (extra 2x patchify front-end)
    spatial_down: int = 8


# ---------------------------------------------------------------------------
# layer plans: ordered (kind, meta) lists mirroring the torch nn.Sequential
# indices, shared by apply and the checkpoint converter.
# ---------------------------------------------------------------------------

def encoder_downsample_plan(cfg: VAEConfig) -> List[Tuple[str, dict]]:
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    plan, scale = [], 1.0
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        d = din
        for _ in range(cfg.num_res_blocks):
            plan.append(("res", {"in": d, "out": dout}))
            if scale in cfg.attn_scales:
                plan.append(("attn", {"dim": dout}))
            d = dout
        if i != len(cfg.dim_mult) - 1:
            mode = "down3d" if cfg.temperal_downsample[i] else "down2d"
            plan.append((mode, {"dim": dout}))
            scale /= 2.0
    return plan


def decoder_upsample_plan(cfg: VAEConfig) -> List[Tuple[str, dict]]:
    dims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(cfg.dim_mult[::-1])]
    plan = []
    scale = 1.0 / 2 ** (len(cfg.dim_mult) - 2)
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        d = din // 2 if i in (1, 2, 3) else din
        for _ in range(cfg.num_res_blocks + 1):
            plan.append(("res", {"in": d, "out": dout}))
            if scale in cfg.attn_scales:
                plan.append(("attn", {"dim": dout}))
            d = dout
        if i != len(cfg.dim_mult) - 1:
            mode = "up3d" if cfg.temperal_upsample[i] else "up2d"
            plan.append((mode, {"dim": dout}))
            scale *= 2.0
    return plan


# ---------------------------------------------------------------------------
# init (tree structure identical to convert/wan_vae.py:convert_wan_vae --
# pinned against the reference module census by tests/test_census.py)
# ---------------------------------------------------------------------------

def init_wan_vae(rng, cfg: VAEConfig = VAEConfig(),
                 dtype=jnp.float32) -> Dict:
    """Random-init VAE tree (torch conv layout (out, in, kt, kh, kw), RMS
    gammas at the reference's broadcast shapes, wan_video_vae.py:55-65)."""
    from ...core.params import np_normal, np_zeros, prng_split

    state = {"r": rng}

    def _r():
        state["r"], out = prng_split(state["r"])
        return out

    def conv(cin, cout, k):
        k = (k,) * 3 if isinstance(k, int) else tuple(k)
        fan = cin * int(np.prod(k))
        return {"kernel": np_normal(_r(), (cout, cin) + k, fan ** -0.5, dtype),
                "bias": np_zeros((cout,), dtype)}

    def conv2(cin, cout, k):
        fan = cin * k * k
        return {"kernel": np_normal(_r(), (cout, cin, k, k), fan ** -0.5,
                                    dtype),
                "bias": np_zeros((cout,), dtype)}

    def gamma(c, images=False):
        shape = (c, 1, 1) if images else (c, 1, 1, 1)
        return {"gamma": np_normal(_r(), shape, 0.02, dtype)}

    def res(cin, cout):
        p = {"norm1": gamma(cin), "conv1": conv(cin, cout, 3),
             "norm2": gamma(cout), "conv2": conv(cout, cout, 3)}
        if cin != cout:
            p["shortcut"] = conv(cin, cout, 1)
        return p

    def attn(c):
        return {"norm": gamma(c, images=True),
                "to_qkv": conv2(c, 3 * c, 1), "proj": conv2(c, c, 1)}

    def plan_params(plan):
        out = []
        for kind, meta in plan:
            if kind == "res":
                out.append(res(meta["in"], meta["out"]))
            elif kind == "attn":
                out.append(attn(meta["dim"]))
            else:
                d = meta["dim"]
                p = {"resample_conv":
                     conv2(d, d // 2 if kind.startswith("up") else d, 3)}
                if kind == "down3d":
                    p["time_conv"] = conv(d, d, (3, 1, 1))
                elif kind == "up3d":
                    p["time_conv"] = conv(d, 2 * d, (3, 1, 1))
                out.append(p)
        return out

    top = cfg.dim * cfg.dim_mult[-1]
    last = cfg.dim * cfg.dim_mult[0]
    z = cfg.z_dim
    return {
        "encoder": {
            "conv1": conv(3, cfg.dim, 3),
            "downsamples": plan_params(encoder_downsample_plan(cfg)),
            "middle_res1": res(top, top),
            "middle_attn": attn(top),
            "middle_res2": res(top, top),
            "head_norm": gamma(top),
            "head_conv": conv(top, 2 * z, 3),
        },
        "conv1": conv(2 * z, 2 * z, 1),
        "conv2": conv(z, z, 1),
        "decoder": {
            "conv1": conv(z, top, 3),
            "middle_res1": res(top, top),
            "middle_attn": attn(top),
            "middle_res2": res(top, top),
            "upsamples": plan_params(decoder_upsample_plan(cfg)),
            "head_norm": gamma(last),
            "head_conv": conv(last, 3, 3),
        },
    }


# ---------------------------------------------------------------------------
# layer applies
# ---------------------------------------------------------------------------

def _silu(x):
    # f32 math, one fused pass (r5 xprof: this already compiles to a single
    # bandwidth-bound elementwise pass; a native-dtype variant measured
    # identical, so the f32 math -- torch's internal precision -- stays)
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


def residual_block(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    h = causal_conv3d(p["shortcut"], x) if "shortcut" in p else x
    y = causal_conv3d(p["conv1"], _silu(rms_norm_channel(p["norm1"], x)))
    y = causal_conv3d(p["conv2"], _silu(rms_norm_channel(p["norm2"], y)))
    return y + h


def attention_block(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Single-head per-frame spatial attention (wan_video_vae.py:236-272)."""
    B, C, T, H, W = x.shape
    h = x.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
    # RMS_norm channel_first images=True: gamma (C,1,1)
    hf = h.astype(jnp.float32)
    n = hf / jnp.maximum(jnp.sqrt(jnp.sum(hf * hf, axis=1, keepdims=True)),
                         1e-12) * (C ** 0.5)
    n = (n * p["norm"]["gamma"].astype(jnp.float32)).astype(x.dtype)
    qkv = conv2d(p["to_qkv"]["kernel"], p["to_qkv"]["bias"], n,
                 padding=((0, 0), (0, 0)))
    qkv = qkv.reshape(B * T, 3, C, H * W)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]     # (BT, C, HW)
    logits = jnp.einsum("bcq,bck->bqk", q, k,
                        preferred_element_type=jnp.float32) * (C ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bqk,bck->bcq", probs, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.reshape(B * T, C, H, W)
    o = conv2d(p["proj"]["kernel"], p["proj"]["bias"], o,
               padding=((0, 0), (0, 0)))
    return x + o.reshape(B, T, C, H, W).transpose(0, 2, 1, 3, 4)


def _spatial(fn, x):
    B, C, T, H, W = x.shape
    y = fn(x.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H, W))
    return y.reshape(B, T, y.shape[1], y.shape[2], y.shape[3]).transpose(
        0, 2, 1, 3, 4)


def _nearest_up2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)


def resample_apply(kind: str, p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    if kind == "up3d":
        x = resample_up3d(p, x)
        return _spatial(lambda h: conv2d(p["resample_conv"]["kernel"],
                                         p["resample_conv"]["bias"],
                                         _nearest_up2(h)), x)
    if kind == "up2d":
        return _spatial(lambda h: conv2d(p["resample_conv"]["kernel"],
                                         p["resample_conv"]["bias"],
                                         _nearest_up2(h)), x)
    if kind in ("down2d", "down3d"):
        # ZeroPad2d (left 0, right 1, top 0, bottom 1) + 3x3 stride-2 conv
        x = _spatial(lambda h: conv2d(p["resample_conv"]["kernel"],
                                      p["resample_conv"]["bias"], h,
                                      stride=(2, 2),
                                      padding=((0, 1), (0, 1))), x)
        if kind == "down3d":
            # streaming equivalence: frame 0 passthrough ++ stride-2 no-pad
            # causal window conv over the full sequence
            first = x[:, :, :1]
            y = conv3d(p["time_conv"]["kernel"], p["time_conv"]["bias"], x,
                       stride=(2, 1, 1), padding=((0, 0), (0, 0), (0, 0)))
            x = jnp.concatenate([first, y], axis=2)
        return x
    raise ValueError(kind)


def _run_plan(plan, params_list, x):
    for (kind, _), p in zip(plan, params_list):
        if kind == "res":
            x = residual_block(p, x)
        elif kind == "attn":
            x = attention_block(p, x)
        else:
            x = resample_apply(kind, p, x)
    return x


# ---------------------------------------------------------------------------
# encoder / decoder / public API
# ---------------------------------------------------------------------------

def encoder_apply(p: Dict, cfg: VAEConfig, x: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, T, H, W) video in [-1, 1] -> (B, 2*z, T', H/8, W/8)."""
    x = causal_conv3d(p["conv1"], x)
    x = _run_plan(encoder_downsample_plan(cfg), p["downsamples"], x)
    x = residual_block(p["middle_res1"], x)
    x = attention_block(p["middle_attn"], x)
    x = residual_block(p["middle_res2"], x)
    x = causal_conv3d(p["head_conv"], _silu(rms_norm_channel(p["head_norm"], x)))
    return x


def decoder_apply(p: Dict, cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    x = causal_conv3d(p["conv1"], z)
    x = residual_block(p["middle_res1"], x)
    x = attention_block(p["middle_attn"], x)
    x = residual_block(p["middle_res2"], x)
    x = _run_plan(decoder_upsample_plan(cfg), p["upsamples"], x)
    x = causal_conv3d(p["head_conv"], _silu(rms_norm_channel(p["head_norm"], x)))
    return x


def vae_encode(p: Dict, cfg: VAEConfig, video: jnp.ndarray) -> jnp.ndarray:
    """video (B, 3, T, H, W) -> normalized latents (B, z, (T-1)/4+1, ...)."""
    out = encoder_apply(p["encoder"], cfg, video)
    mu = causal_conv3d(p["conv1"], out)[:, :cfg.z_dim]
    mean = jnp.asarray(LATENT_MEAN, mu.dtype)[None, :, None, None, None]
    inv_std = jnp.asarray(1.0 / LATENT_STD, mu.dtype)[None, :, None, None, None]
    return (mu - mean) * inv_std


def vae_decode(p: Dict, cfg: VAEConfig, latents: jnp.ndarray,
               clamp: bool = True) -> jnp.ndarray:
    """latents (B, z, T', h, w) -> video (B, 3, 4*T'-3, 8h, 8w) in [-1,1]."""
    mean = jnp.asarray(LATENT_MEAN, latents.dtype)[None, :, None, None, None]
    std = jnp.asarray(LATENT_STD, latents.dtype)[None, :, None, None, None]
    z = latents * std + mean
    z = causal_conv3d(p["conv2"], z)
    video = decoder_apply(p["decoder"], cfg, z)
    return jnp.clip(video, -1, 1) if clamp else video


# ---------------------------------------------------------------------------
# tiled encode/decode (parity/huge-resolution option; wan_video_vae.py:619-744)
# ---------------------------------------------------------------------------

def _build_1d_mask(length, left_bound, right_bound, border):
    x = np.ones((length,), np.float32)
    ramp = (np.arange(border) + 1) / border
    if not left_bound:
        x[:border] = ramp
    if not right_bound:
        x[-border:] = ramp[::-1]
    return x


@functools.partial(jax.jit, static_argnums=(1, 3))
def _vae_decode_jit(p, cfg, latents, clamp):
    return vae_decode(p, cfg, latents, clamp)


@functools.partial(jax.jit, static_argnums=(1,))
def _vae_encode_jit(p, cfg, video):
    return vae_encode(p, cfg, video)


@functools.partial(jax.jit, donate_argnums=(0,))
def _canvas_add(values, patch, oh, ow):
    """values[..., oh:oh+ph, ow:ow+pw] += patch, donating the canvas so the
    blend holds ONE fp32 canvas in HBM, not two."""
    start = (0, 0, 0, oh, ow)
    cur = jax.lax.dynamic_slice(values, start, patch.shape)
    return jax.lax.dynamic_update_slice(values, cur + patch, start)


def tiled_blend(fn_one, x: jnp.ndarray, tile_size, tile_stride,
                out_scale: float, out_C: int, out_T: int,
                clamp: bool) -> jnp.ndarray:
    """Run ``fn_one`` over the reference's spatial tile grid and blend the
    results with its linear border masks (wan_video_vae.py:619-692),
    accumulating ON DEVICE.

    The reference stages every decoded tile through CPU -- a GPU-memory
    workaround that on this platform costs more than the decode itself
    (measured 2026-08-19 on the tunneled v5e: one (30,52)-tile decode is
    1.40 s of device time but 4.4 s wall when the result is fetched, so the
    4-tile 480P decode read 13.7-19.6 s instead of ~5.6 s). Here the fp32
    accumulation runs on device in the reference's tile order -- same mask
    math, same add order -- and only the caller decides when to fetch.

    ``tile_size``/``tile_stride`` are in input pixels; ``out_scale`` maps
    input to output pixels (8 for decode, 1/8 for encode; exact ints after
    scaling). ``fn_one`` maps one input tile to (B, out_C, out_T, h*, w*).

    HBM: the fp32 output canvas lives on device for the whole blend
    (decode 480P/81f: ~1.0 GB; vae38's x16 upsample: ~4 GB). Each tile add
    is a donated jitted dynamic-slice update, so peak is ONE canvas plus a
    tile -- not the two copies an undonated scatter would hold.
    """
    B, _, _, H, W = x.shape
    sh, sw = tile_size
    th, tw = tile_stride
    oH, oW = round(H * out_scale), round(W * out_scale)
    values = jnp.zeros((B, out_C, out_T, oH, oW), jnp.float32)
    weight = jnp.zeros((oH, oW), jnp.float32)
    for h in range(0, H, th):
        if h - th >= 0 and h - th + sh >= H:
            continue
        for w in range(0, W, tw):
            if w - tw >= 0 and w - tw + sw >= W:
                continue
            dec = fn_one(x[:, :, :, h:h + sh, w:w + sw]).astype(jnp.float32)
            hm = _build_1d_mask(dec.shape[3], h == 0, h + sh >= H,
                                round((sh - th) * out_scale))
            wm = _build_1d_mask(dec.shape[4], w == 0, w + sw >= W,
                                round((sw - tw) * out_scale))
            mask = jnp.asarray(np.minimum(hm[:, None], wm[None, :]))
            oh, ow = round(h * out_scale), round(w * out_scale)
            values = _canvas_add(values, dec * mask, oh, ow)
            weight = weight.at[oh:oh + dec.shape[3],
                               ow:ow + dec.shape[4]].add(mask)
    out = values / weight
    return jnp.clip(out, -1, 1).astype(x.dtype) if clamp \
        else out.astype(x.dtype)


# Tile plans measured on the v5e (VAE_TILE_SWEEP.json, 2026-08-21): the
# full-height strip plan halves the tiled-decode cost vs the reference's
# (30,52)/(15,26) grid -- wan21 480P 4.84 s -> 2.62 s, wan22 480x832
# 11.83 s -> 5.72 s -- by cutting the overlap redundancy (2.0-2.25x ->
# 1.03-1.06x) while staying under the platform's tile-program compile
# ceiling (tiles >= 1776 latent px crash the remote-compile helper;
# 1596 and 1680 px strips compile).
_MEASURED_TILE_PLANS = {
    (42, 74): ((42, 38), (42, 36)),    # 2 strips, measured 2.622 s
    (60, 104): ((60, 28), (30, 26)),   # 4 strips, measured 5.716 s
}


def deploy_tile_plan(h: int, w: int, max_area: int = 1596,
                     overlap: int = 2) -> Tuple[Tuple[int, int],
                                                Tuple[int, int]]:
    """Full-height vertical-strip tile plan for the tiled decode.

    The reference's (30,52)/(15,26) plan (inference_wan21.py:326) is its
    GPU-memory default; on this TPU platform the binding constraint is the
    remote-compile helper instead, which crashes on tile programs above a
    measured latent-area ceiling (VAE_TILE_SWEEP.json: >=1776 px fails,
    <=1680 px compiles). Half-stride overlap then re-decodes every interior
    pixel up to 4x. This plan keeps each strip at or under ``max_area``
    while cutting the redundancy to ~1.03-1.08x: full-height strips (one
    tile row), equalized widths so the grid has at most two distinct tile
    shapes (one compiled program each), and a small ``overlap`` (x8 output
    px of linear blend) between columns. The two production latent
    geometries return their on-chip-measured plans directly.

    Returns (tile_size, tile_stride) in latent pixels, as accepted by
    ``vae_decode_tiled``; falls back to the reference plan when the latent
    is too tall for any full-height strip.
    """
    if max_area == 1596 and overlap == 2 and (h, w) in _MEASURED_TILE_PLANS:
        return _MEASURED_TILE_PLANS[(h, w)]   # default caps: measured plan
    if h * w <= max_area:
        return (h, w), (h, w)                    # single tile
    cap = max_area // h
    if cap <= overlap:
        return (30, 52), (15, 26)                # reference fallback
    n = -(-(w - overlap) // (cap - overlap))     # number of columns
    tw = -(-(w + (n - 1) * overlap) // n)        # equalized width
    return (h, tw), (h, tw - overlap)


def vae_decode_tiled(p: Dict, cfg: VAEConfig, latents: jnp.ndarray,
                     tile_size=(34, 34), tile_stride=(18, 16)) -> jnp.ndarray:
    return tiled_blend(lambda t: _vae_decode_jit(p, cfg, t, False),
                       latents, tile_size, tile_stride, out_scale=8,
                       out_C=3, out_T=latents.shape[2] * 4 - 3, clamp=True)


def vae_encode_tiled(p: Dict, cfg: VAEConfig, video: jnp.ndarray,
                     tile_size=(34, 34), tile_stride=(18, 16)) -> jnp.ndarray:
    """Spatially tiled encode (wan_video_vae.py:695-744). tile_size/stride
    are in LATENT pixels like the reference public API (encode() multiplies
    by 8 before calling tiled_encode; the blend masks live in latent space).
    The wan22 control-video path encodes tiled (wan_video.py:279-288)."""
    up = 8
    return tiled_blend(lambda t: _vae_encode_jit(p, cfg, t), video,
                       (tile_size[0] * up, tile_size[1] * up),
                       (tile_stride[0] * up, tile_stride[1] * up),
                       out_scale=1 / up, out_C=cfg.z_dim,
                       out_T=(video.shape[2] + 3) // 4, clamp=False)
