"""torch MoGe-2 checkpoint -> fantasy_world_tpu param tree.

The DINOv2 block layout matches convert_vggt.convert_vggt_block exactly
(norm1/attn.qkv/attn.proj/ls1/norm2/mlp/ls2). ConvStack indices follow
modules.py: ResidualConvBlock.layers = (norm, act, conv, norm, act, conv)
-> convs at 2 and 5; Resampler Sequential -> deconv/upsample at 0, conv 1.
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import numpy as np

from ..models.moge.model import MoGeConfig
from .vggt import convert_vggt_block


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(sd, name):
    return {"kernel": np.asarray(sd[name + ".weight"]),
            "bias": np.asarray(sd[name + ".bias"])}


def _lin(sd, name):
    return {"kernel": _t(sd[name + ".weight"]),
            "bias": np.asarray(sd[name + ".bias"])}


def convert_dinov2(sd: Mapping, pre: str, depth: int = 24) -> Dict:
    pe = np.asarray(sd[pre + "patch_embed.proj.weight"])  # (dim, 3, 14, 14)
    return {
        "patch_embed": {"kernel": _t(pe.reshape(pe.shape[0], -1)),
                        "bias": np.asarray(sd[pre + "patch_embed.proj.bias"])},
        "cls_token": np.asarray(sd[pre + "cls_token"]),
        "pos_embed": np.asarray(sd[pre + "pos_embed"]),
        "blocks": [convert_vggt_block(sd, f"{pre}blocks.{i}")
                   for i in range(depth)],
        "norm": {"scale": np.asarray(sd[pre + "norm.weight"]),
                 "bias": np.asarray(sd[pre + "norm.bias"])},
    }


def convert_conv_stack(sd: Mapping, pre: str,
                       dim_in: Sequence[Optional[int]],
                       dim_out: Sequence[Optional[int]],
                       num_res: Sequence[int],
                       resamplers: Sequence[str]) -> Dict:
    p = {"input_blocks": [], "res_blocks": [], "output_blocks": [],
         "resamplers": []}
    n = len(num_res)
    for i in range(n):
        p["input_blocks"].append(
            _conv(sd, f"{pre}input_blocks.{i}") if dim_in[i] is not None
            else None)
        p["res_blocks"].append([
            {"conv1": _conv(sd, f"{pre}res_blocks.{i}.{j}.layers.2"),
             "conv2": _conv(sd, f"{pre}res_blocks.{i}.{j}.layers.5")}
            for j in range(num_res[i])])
        p["output_blocks"].append(
            _conv(sd, f"{pre}output_blocks.{i}") if dim_out[i] is not None
            else None)
        if i < n - 1:
            kind = resamplers[i]
            if kind == "conv_transpose":
                p["resamplers"].append({
                    "kind": kind,
                    "deconv": _conv(sd, f"{pre}resamplers.{i}.0"),
                    "conv": _conv(sd, f"{pre}resamplers.{i}.1")})
            else:  # bilinear: Upsample has no params
                p["resamplers"].append({
                    "kind": kind,
                    "conv": _conv(sd, f"{pre}resamplers.{i}.1")})
    return p


def convert_moge(sd: Mapping, cfg: MoGeConfig = MoGeConfig(),
                 prefix: str = "") -> Dict:
    pr = prefix
    dr = cfg.dim_res_blocks
    heads_out = [None, None, None, None, 3]
    p = {
        "encoder": {
            "backbone": convert_dinov2(sd, pr + "encoder.backbone.",
                                       cfg.encoder.depth),
            "output_projections": [
                _conv(sd, f"{pr}encoder.output_projections.{i}")
                for i in range(len(cfg.intermediate_layers))],
        },
        "neck": convert_conv_stack(
            sd, pr + "neck.", [dr[0] + 2, 2, 2, 2, 2], [None] * 5,
            cfg.neck_num_res_blocks, cfg.resamplers),
        "points_head": convert_conv_stack(
            sd, pr + "points_head.", list(dr), heads_out,
            cfg.head_num_res_blocks, cfg.resamplers),
        "mask_head": convert_conv_stack(
            sd, pr + "mask_head.", list(dr), [None, None, None, None, 1],
            cfg.head_num_res_blocks, cfg.resamplers),
        "scale_head": {
            f"fc{i}": _lin(sd, f"{pr}scale_head.{2 * i}")
            for i in range(len(cfg.scale_head_dims) - 1)},
    }
    if prefix + "normal_head.input_blocks.0.weight" in sd:
        p["normal_head"] = convert_conv_stack(
            sd, pr + "normal_head.", list(dr), heads_out,
            cfg.head_num_res_blocks, cfg.resamplers)
    return p
