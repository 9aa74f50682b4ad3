"""MoGe-2 monocular metric geometry model, TPU-native.

Re-design of thirdparty/MoGe/moge/model/v2.py (MoGeModel) and modules.py:
a DINOv2 ViT-L/14 encoder (24 pre-norm blocks with LayerScale; the block
math is shared with models/vggt/blocks.py), per-level 1x1 projections of
intermediate layers [5, 11, 17, 23] summed into one feature map, a shared
ConvStack neck + points/mask/normal ConvStack heads over a 5-level pyramid
with view-plane-UV conditioning, and an MLP metric-scale head on the class
token.

Used by the FantasyWorld pipeline for scene scale normalization
(inference_wan21.py:247-274) -- the focal/shift recovery solve stays
host-side (scipy, models/moge/infer.py).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.params import (prng_split, prng_fold_in, init_linear, init_layernorm, np_normal, np_zeros,
                            np_ones, np_cast, _np_rng)
from ..vggt.blocks import VGGTBlockConfig, vggt_block_apply
from ...ops.bicubic import bicubic_resize_2d
from ...ops.causal_conv import conv2d
from ...ops.norms import layer_norm

IMAGE_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGE_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class DINOv2Config:
    patch_size: int = 14
    dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    init_values: float = 1.0
    pos_grid: int = 37            # 518 / 14
    interpolate_offset: float = 0.1

    @property
    def block_cfg(self) -> VGGTBlockConfig:
        return VGGTBlockConfig(dim=self.dim, num_heads=self.num_heads,
                               mlp_ratio=self.mlp_ratio, qk_norm=False,
                               init_values=self.init_values,
                               rope_frequency=-1.0, ln_eps=1e-6)


@dataclasses.dataclass(frozen=True)
class MoGeConfig:
    encoder: DINOv2Config = DINOv2Config()
    intermediate_layers: Tuple[int, ...] = (5, 11, 17, 23)
    dim_proj_out: int = 1024
    dim_res_blocks: Tuple[int, ...] = (1024, 256, 128, 64, 32)
    neck_num_res_blocks: Tuple[int, ...] = (0, 2, 2, 2, 0)
    head_num_res_blocks: Tuple[int, ...] = (0, 1, 1, 1, 0)
    # conv_transpose x3 then bilinear (configs/train/v2.json)
    resamplers: Tuple[str, ...] = ("conv_transpose", "conv_transpose",
                                   "conv_transpose", "bilinear")
    scale_head_dims: Tuple[int, ...] = (1024, 1024, 1024, 1)
    remap_output: str = "exp"
    num_tokens_range: Tuple[int, int] = (1200, 3600)
    with_normal_head: bool = True


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_conv(rng, cin, cout, k, dtype):
    scale = 1.0 / math.sqrt(cin * k * k)
    return {"kernel": np_cast(_np_rng(rng).uniform(
        -scale, scale, (cout, cin, k, k)), dtype),
        "bias": np_zeros((cout,), dtype)}


def _init_vit_block(rng, cfg: DINOv2Config, dtype):
    from ..vggt.blocks import init_vggt_block
    return init_vggt_block(rng, cfg.block_cfg, dtype, with_modulation=False)


def init_dinov2(rng, cfg: DINOv2Config, dtype=jnp.float32) -> Dict:
    rs = prng_split(rng, cfg.depth + 4)
    n_pos = cfg.pos_grid ** 2 + 1
    return {
        "patch_embed": {
            "kernel": np_normal(rs[0], (3 * cfg.patch_size ** 2, cfg.dim),
                                0.02, dtype),
            "bias": np_zeros((cfg.dim,), dtype)},
        "cls_token": np_zeros((1, 1, cfg.dim), dtype),
        "pos_embed": np_normal(rs[1], (1, n_pos, cfg.dim), 0.02, dtype),
        "blocks": [_init_vit_block(rs[2 + i], cfg, dtype)
                   for i in range(cfg.depth)],
        "norm": init_layernorm(cfg.dim, dtype=dtype),
    }


def _init_resampler(rng, kind, cin, cout, dtype):
    r1, r2 = prng_split(rng)
    if kind == "conv_transpose":
        # ConvTranspose2d(cin, cout, k=2, s=2) + conv3x3 replicate
        scale = 1.0 / math.sqrt(cin * 4)
        return {"kind": kind,
                "deconv": {"kernel": np_cast(_np_rng(r1).uniform(
                    -scale, scale, (cin, cout, 2, 2)), dtype),
                    "bias": np_zeros((cout,), dtype)},
                "conv": _init_conv(r2, cout, cout, 3, dtype)}
    if kind == "bilinear":
        return {"kind": kind, "conv": _init_conv(r2, cin, cout, 3, dtype)}
    raise ValueError(kind)


def _init_res_block(rng, dim, dtype):
    r1, r2 = prng_split(rng)
    return {"conv1": _init_conv(r1, dim, dim, 3, dtype),
            "conv2": _init_conv(r2, dim, dim, 3, dtype)}


def init_conv_stack(rng, dim_in: Sequence[Optional[int]],
                    dim_out: Sequence[Optional[int]],
                    dim_res: Sequence[int],
                    num_res: Sequence[int],
                    resamplers: Sequence[str], dtype=jnp.float32) -> Dict:
    rs = prng_split(rng, 4 * len(dim_res) + 4)
    p = {"input_blocks": [], "res_blocks": [], "output_blocks": [],
         "resamplers": []}
    for i, d in enumerate(dim_res):
        p["input_blocks"].append(
            None if dim_in[i] is None else _init_conv(rs[4 * i], dim_in[i],
                                                      d, 1, dtype))
        p["res_blocks"].append([
            _init_res_block(prng_fold_in(rs[4 * i + 1], j), d, dtype)
            for j in range(num_res[i])])
        p["output_blocks"].append(
            None if dim_out[i] is None else _init_conv(rs[4 * i + 2], d,
                                                       dim_out[i], 1, dtype))
        if i < len(dim_res) - 1:
            p["resamplers"].append(_init_resampler(
                rs[4 * i + 3], resamplers[i], d, dim_res[i + 1], dtype))
    return p


def init_moge(rng, cfg: MoGeConfig, dtype=jnp.float32) -> Dict:
    rs = prng_split(rng, 10)
    dr = cfg.dim_res_blocks
    # heads re-project every neck level (configs/train/v2.json points_head
    # dim_in == the neck's level dims)
    heads_in = list(dr)
    p = {
        "encoder": {
            "backbone": init_dinov2(rs[0], cfg.encoder, dtype),
            "output_projections": [
                _init_conv(prng_fold_in(rs[1], i), cfg.encoder.dim,
                           cfg.dim_proj_out, 1, dtype)
                for i in range(len(cfg.intermediate_layers))],
        },
        "neck": init_conv_stack(rs[2], [cfg.dim_proj_out + 2, 2, 2, 2, 2],
                                [None] * 5, dr, cfg.neck_num_res_blocks,
                                cfg.resamplers, dtype),
        "points_head": init_conv_stack(rs[3], heads_in,
                                       [None, None, None, None, 3], dr,
                                       cfg.head_num_res_blocks,
                                       cfg.resamplers, dtype),
        "mask_head": init_conv_stack(rs[4], heads_in,
                                     [None, None, None, None, 1], dr,
                                     cfg.head_num_res_blocks,
                                     cfg.resamplers, dtype),
        "scale_head": {
            f"fc{i}": init_linear(prng_fold_in(rs[5], i),
                                  cfg.scale_head_dims[i],
                                  cfg.scale_head_dims[i + 1], dtype=dtype)
            for i in range(len(cfg.scale_head_dims) - 1)},
    }
    if cfg.with_normal_head:
        p["normal_head"] = init_conv_stack(rs[6], heads_in,
                                           [None, None, None, None, 3], dr,
                                           cfg.head_num_res_blocks,
                                           cfg.resamplers, dtype)
    return p


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def interpolate_pos_embed(pos_embed: np.ndarray, grid: int, h0: int, w0: int,
                          offset: float = 0.1) -> np.ndarray:
    """DINOv2 pos-embed interpolation with the historical scale-factor
    kludge (vision_transformer.py:187-220), exact torch bicubic."""
    cls_pos = np.asarray(pos_embed[:, :1], np.float32)
    patch = np.asarray(pos_embed[:, 1:], np.float32)
    if h0 == grid and w0 == grid:
        return np.concatenate([cls_pos, patch], axis=1)
    dim = patch.shape[-1]
    grid_pos = patch.reshape(grid, grid, dim).transpose(2, 0, 1)
    scales = None
    if offset > 0:
        scales = ((h0 + offset) / grid, (w0 + offset) / grid)
    out = bicubic_resize_2d(grid_pos, (h0, w0), scales)
    out = out.transpose(1, 2, 0).reshape(1, h0 * w0, dim)
    return np.concatenate([cls_pos, out], axis=1)


def dinov2_forward(p: Dict, cfg: DINOv2Config, image: jnp.ndarray,
                   take_layers: Sequence[int]
                   ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """image: (B, 3, h0*14, w0*14) already ImageNet-normalized. Returns
    ([final-normed tokens at take_layers (B, N+1, C)], cls of last layer)."""
    B, C, H, W = image.shape
    ps = cfg.patch_size
    h0, w0 = H // ps, W // ps
    x = image.reshape(B, C, h0, ps, w0, ps)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, h0 * w0, C * ps * ps)
    x = _l(p["patch_embed"], x)
    cls = jnp.broadcast_to(jnp.asarray(p["cls_token"]).astype(x.dtype),
                           (B, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    pos = interpolate_pos_embed(np.asarray(p["pos_embed"], np.float32),
                                cfg.pos_grid, h0, w0, cfg.interpolate_offset)
    x = x + jnp.asarray(pos, x.dtype)

    outputs = []
    for i, blk in enumerate(p["blocks"]):
        x = vggt_block_apply(blk, cfg.block_cfg, x)
        if i in take_layers:
            outputs.append(x)
    outputs = [layer_norm(o, p["norm"], 1e-6) for o in outputs]
    return outputs, outputs[-1][:, 0]


def _l(p, x):
    y = jnp.dot(x, jnp.asarray(p["kernel"]).astype(x.dtype),
                preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + jnp.asarray(p["bias"]).astype(jnp.float32)
    return y.astype(x.dtype)


def _conv_replicate(p, x, k=3):
    pad = k // 2
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    return conv2d(jnp.asarray(p["kernel"]), jnp.asarray(p["bias"]), x,
                  padding=((0, 0), (0, 0)))


def _conv1x1(p, x):
    return conv2d(jnp.asarray(p["kernel"]), jnp.asarray(p["bias"]), x,
                  padding=((0, 0), (0, 0)))


def _resampler_apply(p, x):
    if p["kind"] == "conv_transpose":
        wk = jnp.asarray(p["deconv"]["kernel"]).astype(x.dtype)
        N, C, H, W = x.shape
        cout = wk.shape[1]
        y = jnp.einsum("nchw,codk->nodkhw", x, wk,
                       preferred_element_type=jnp.float32)
        y = y + jnp.asarray(p["deconv"]["bias"]).astype(jnp.float32)[
            None, :, None, None, None, None]
        y = y.astype(x.dtype).transpose(0, 1, 4, 2, 5, 3)
        y = y.reshape(N, cout, H * 2, W * 2)
    else:   # bilinear upsample (half-pixel, no antialias) then conv
        N, C, H, W = x.shape
        y = jax.image.resize(x.astype(jnp.float32), (N, C, H * 2, W * 2),
                             method="bilinear", antialias=False).astype(x.dtype)
    return _conv_replicate(p["conv"], y)


def _res_block_apply(p, x):
    # res_block_in_norm='none', hidden_norm='none', relu activation
    h = jax.nn.relu(x.astype(jnp.float32)).astype(x.dtype)
    h = _conv_replicate(p["conv1"], h)
    h = jax.nn.relu(h.astype(jnp.float32)).astype(x.dtype)
    h = _conv_replicate(p["conv2"], h)
    return h + x


def conv_stack_apply(p: Dict, in_features: List[Optional[jnp.ndarray]]
                     ) -> List[jnp.ndarray]:
    outs = []
    x = None
    n = len(p["res_blocks"])
    for i in range(n):
        feat = in_features[i]
        if p["input_blocks"][i] is not None and feat is not None:
            feat = _conv1x1(p["input_blocks"][i], feat)
        if i == 0:
            x = feat
        elif feat is not None:
            x = x + feat
        for rb in p["res_blocks"][i]:
            x = _res_block_apply(rb, x)
        outs.append(_conv1x1(p["output_blocks"][i], x)
                    if p["output_blocks"][i] is not None else x)
        if i < n - 1:
            x = _resampler_apply(p["resamplers"][i], x)
    return outs


def normalized_view_plane_uv(width: int, height: int,
                             aspect_ratio: Optional[float] = None
                             ) -> np.ndarray:
    if aspect_ratio is None:
        aspect_ratio = width / height
    span_x = aspect_ratio / (1 + aspect_ratio ** 2) ** 0.5
    span_y = 1 / (1 + aspect_ratio ** 2) ** 0.5
    u = np.linspace(-span_x * (width - 1) / width,
                    span_x * (width - 1) / width, width, dtype=np.float32)
    v = np.linspace(-span_y * (height - 1) / height,
                    span_y * (height - 1) / height, height, dtype=np.float32)
    uu, vv = np.meshgrid(u, v, indexing="xy")
    return np.stack([uu, vv], axis=-1)


def moge_forward(p: Dict, cfg: MoGeConfig, image: jnp.ndarray,
                 num_tokens: int) -> Dict[str, jnp.ndarray]:
    """image: (B, 3, H, W) in [0, 1]. Returns points/normal/mask/metric_scale
    at the input resolution (v2.py:138-190)."""
    B, _, img_h, img_w = image.shape
    aspect = img_w / img_h
    base_h = int((num_tokens / aspect) ** 0.5)
    base_w = int((num_tokens * aspect) ** 0.5)
    ps = cfg.encoder.patch_size

    x14 = jax.image.resize(image.astype(jnp.float32),
                           (B, 3, base_h * ps, base_w * ps),
                           method="bilinear", antialias=True)
    x14 = (x14 - jnp.asarray(IMAGE_MEAN)[None, :, None, None]) \
        / jnp.asarray(IMAGE_STD)[None, :, None, None]
    x14 = x14.astype(image.dtype)

    layer_tokens, cls_token = dinov2_forward(
        p["encoder"]["backbone"], cfg.encoder, x14, cfg.intermediate_layers)
    feats = None
    for proj, tok in zip(p["encoder"]["output_projections"], layer_tokens):
        fmap = tok[:, 1:].transpose(0, 2, 1).reshape(
            B, cfg.encoder.dim, base_h, base_w)
        fmap = _conv1x1(proj, fmap)
        feats = fmap if feats is None else feats + fmap

    # per-level UV conditioning
    levels = []
    for level in range(5):
        uv = normalized_view_plane_uv(base_w * 2 ** level,
                                      base_h * 2 ** level, aspect)
        uv = jnp.asarray(uv.transpose(2, 0, 1)[None], feats.dtype)
        uv = jnp.broadcast_to(uv, (B,) + uv.shape[1:])
        if level == 0:
            levels.append(jnp.concatenate([feats, uv], axis=1))
        else:
            levels.append(uv)

    neck_feats = conv_stack_apply(p["neck"], levels)

    def run_head(hp):
        return conv_stack_apply(hp, neck_feats)[-1]

    out = {}
    points = run_head(p["points_head"])
    mask = run_head(p["mask_head"])
    normal = run_head(p["normal_head"]) if "normal_head" in p else None
    scale = cls_token
    for i, key in enumerate(sorted(p["scale_head"].keys(),
                                   key=lambda s: int(s[2:]))):
        scale = _l(p["scale_head"][key], scale)
        if i < len(p["scale_head"]) - 1:
            scale = jax.nn.relu(scale.astype(jnp.float32)).astype(scale.dtype)

    def up(v):
        if v is None:
            return None
        return jax.image.resize(v.astype(jnp.float32),
                                (B, v.shape[1], img_h, img_w),
                                method="bilinear", antialias=False)

    points = up(points).transpose(0, 2, 3, 1)
    if cfg.remap_output == "exp":
        xy, z = points[..., :2], jnp.exp(points[..., 2:])
        points = jnp.concatenate([xy * z, z], axis=-1)
    elif cfg.remap_output == "sinh":
        points = jnp.sinh(points)
    out["points"] = points
    out["mask"] = jax.nn.sigmoid(up(mask)[:, 0])
    if normal is not None:
        nrm = up(normal).transpose(0, 2, 3, 1)
        out["normal"] = nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    out["metric_scale"] = jnp.exp(scale[:, 0].astype(jnp.float32))
    return out
