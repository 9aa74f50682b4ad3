"""torch VGGT state dict -> fantasy_world_tpu param tree.

Key layout map (reference module paths -> our tree):
  projection_head (Conv3d 1x1x1)        -> projection_head linear
  time_embedding.0/.2, time_projection.1 -> fp32 time MLPs
  aggregator.{camera,register}_token     -> aggregator
  aggregator.{frame,global}_blocks.N.*   -> aggregator (fused qkv kept fused)
  aggregator.CamTokenProjector.mlp.{0,2} -> cam_token_projector
  camera_head.*                          -> camera_head
  {depth,point}_head.*                   -> dpt heads (scratch.* flattened)
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _lin(sd, name):
    p = {"kernel": _t(sd[name + ".weight"])}
    if name + ".bias" in sd:
        p["bias"] = np.asarray(sd[name + ".bias"])
    return p


def _ln(sd, name):
    p = {}
    if name + ".weight" in sd:
        p["scale"] = np.asarray(sd[name + ".weight"])
    if name + ".bias" in sd:
        p["bias"] = np.asarray(sd[name + ".bias"])
    return p


def _conv(sd, name):
    p = {"kernel": np.asarray(sd[name + ".weight"])}
    if name + ".bias" in sd:
        p["bias"] = np.asarray(sd[name + ".bias"])
    return p


def convert_vggt_block(sd: Mapping, pre: str) -> Dict:
    p = {
        "norm1": _ln(sd, pre + ".norm1"),
        "attn": {"qkv": _lin(sd, pre + ".attn.qkv"),
                 "proj": _lin(sd, pre + ".attn.proj")},
        "norm2": _ln(sd, pre + ".norm2"),
        "mlp": {"fc1": _lin(sd, pre + ".mlp.fc1"),
                "fc2": _lin(sd, pre + ".mlp.fc2")},
    }
    if pre + ".attn.q_norm.weight" in sd:
        p["attn"]["q_norm"] = _ln(sd, pre + ".attn.q_norm")
        p["attn"]["k_norm"] = _ln(sd, pre + ".attn.k_norm")
    if pre + ".ls1.gamma" in sd:
        p["ls1"] = {"gamma": np.asarray(sd[pre + ".ls1.gamma"])}
        p["ls2"] = {"gamma": np.asarray(sd[pre + ".ls2.gamma"])}
    else:  # LayerScale disabled (Identity) -> unit gamma
        dim = p["norm1"]["scale"].shape[0]
        p["ls1"] = {"gamma": np.ones((dim,), np.float32)}
        p["ls2"] = {"gamma": np.ones((dim,), np.float32)}
    if pre + ".modulation" in sd:
        p["modulation"] = np.asarray(sd[pre + ".modulation"])
    return p


def _convert_wanvae_dpt(sd: Mapping, pre: str) -> Dict:
    def res_half(rpre):
        p = {"norm": {"gamma": np.asarray(sd[rpre + ".residual.0.gamma"])},
             "conv": _conv(sd, rpre + ".residual.2")}
        if rpre + ".shortcut.weight" in sd:
            p["shortcut"] = _conv(sd, rpre + ".shortcut")
        return p
    up = pre + ".decoder.upsamples"
    return {
        "conv2": _conv(sd, pre + ".conv2"),
        "up1": {"time_conv": _conv(sd, up + ".0.time_conv")},
        "res1": res_half(up + ".1"),
        "up2": {"time_conv": _conv(sd, up + ".2.time_conv")},
        "res2": res_half(up + ".3"),
    }


def _convert_fusion_block(sd: Mapping, pre: str, has_residual=True) -> Dict:
    p = {"out_conv": _conv(sd, pre + ".out_conv"),
         "res2_conv1": _conv(sd, pre + ".resConfUnit2.conv1"),
         "res2_conv2": _conv(sd, pre + ".resConfUnit2.conv2")}
    if has_residual:
        p["res1_conv1"] = _conv(sd, pre + ".resConfUnit1.conv1")
        p["res1_conv2"] = _conv(sd, pre + ".resConfUnit1.conv2")
    return p


def convert_dpt_head(sd: Mapping, pre: str) -> Dict:
    return {
        "norm": _ln(sd, pre + ".norm"),
        "projects": [_conv(sd, f"{pre}.projects.{i}") for i in range(4)],
        "resize0": _conv(sd, pre + ".resize_layers.0"),
        "resize1": _conv(sd, pre + ".resize_layers.1"),
        "resize3": _conv(sd, pre + ".resize_layers.3"),
        "temporal_upsamplers": [
            _convert_wanvae_dpt(sd, f"{pre}.temporal_upsamplers.{i}")
            for i in range(4)],
        "layer_rn": [_conv(sd, f"{pre}.scratch.layer{i + 1}_rn")
                     for i in range(4)],
        "refinenet1": _convert_fusion_block(sd, pre + ".scratch.refinenet1"),
        "refinenet2": _convert_fusion_block(sd, pre + ".scratch.refinenet2"),
        "refinenet3": _convert_fusion_block(sd, pre + ".scratch.refinenet3"),
        "refinenet4": _convert_fusion_block(sd, pre + ".scratch.refinenet4",
                                            has_residual=False),
        "output_conv1": _conv(sd, pre + ".scratch.output_conv1"),
        # absent in feature_only heads (track feature extractor)
        **({"output_conv2_0": _conv(sd, pre + ".scratch.output_conv2.0"),
            "output_conv2_2": _conv(sd, pre + ".scratch.output_conv2.2")}
           if pre + ".scratch.output_conv2.0.weight" in sd else {}),
    }


def convert_camera_head(sd: Mapping, pre: str, trunk_depth: int = 4) -> Dict:
    return {
        "trunk": [convert_vggt_block(sd, f"{pre}.trunk.{i}")
                  for i in range(trunk_depth)],
        "token_norm": _ln(sd, pre + ".token_norm"),
        "trunk_norm": _ln(sd, pre + ".trunk_norm"),
        "empty_pose_tokens": np.asarray(sd[pre + ".empty_pose_tokens"]),
        "embed_pose": _lin(sd, pre + ".embed_pose"),
        "poseLN_modulation": _lin(sd, pre + ".poseLN_modulation.1"),
        "camera_time_upsample": _conv(
            sd, pre + ".camera_time_upsample.expand_channels"),
        "pose_branch": {"fc1": _lin(sd, pre + ".pose_branch.fc1"),
                        "fc2": _lin(sd, pre + ".pose_branch.fc2")},
    }


def convert_aggregator(sd: Mapping, pre: str, depth: int = 24,
                       skip_globals: bool = False) -> Dict:
    """skip_globals: in the fusion model the global blocks are moved into
    IRG blocks and replaced by Identity (fusion/model_wan21.py:69-87)."""
    p = {
        "camera_token": np.asarray(sd[pre + ".camera_token"]),
        "register_token": np.asarray(sd[pre + ".register_token"]),
        "frame_blocks": [convert_vggt_block(sd, f"{pre}.frame_blocks.{i}")
                         for i in range(depth)],
        "cam_token_projector": {
            "fc1": _lin(sd, pre + ".CamTokenProjector.mlp.0"),
            "fc2": _lin(sd, pre + ".CamTokenProjector.mlp.2")},
    }
    if not skip_globals:
        p["global_blocks"] = [
            convert_vggt_block(sd, f"{pre}.global_blocks.{i}")
            for i in range(depth)]
    return p


def convert_vggt(sd: Mapping, prefix: str = "", depth: int = 24,
                 skip_globals: bool = False) -> Dict:
    pr = prefix
    proj_w = np.asarray(sd[pr + "projection_head.weight"])  # (1024,5120,1,1,1)
    p = {
        "projection_head": {
            "kernel": _t(proj_w.reshape(proj_w.shape[0], proj_w.shape[1])),
            "bias": np.asarray(sd[pr + "projection_head.bias"]),
        },
        "time_embedding": {"fc1": _lin(sd, pr + "time_embedding.0"),
                           "fc2": _lin(sd, pr + "time_embedding.2")},
        "time_projection": _lin(sd, pr + "time_projection.1"),
        "aggregator": convert_aggregator(sd, pr + "aggregator", depth,
                                         skip_globals),
    }
    if pr + "camera_head.token_norm.weight" in sd:
        p["camera_head"] = convert_camera_head(sd, pr + "camera_head")
    if pr + "depth_head.norm.weight" in sd:
        p["depth_head"] = convert_dpt_head(sd, pr + "depth_head")
    if pr + "point_head.norm.weight" in sd:
        p["point_head"] = convert_dpt_head(sd, pr + "point_head")
    if pr + "track_head.tracker.fmap_norm.weight" in sd:
        from .track import convert_tracker
        p["track_head"] = {
            "feature_extractor": convert_dpt_head(
                sd, pr + "track_head.feature_extractor"),
            "tracker": convert_tracker(sd, pr + "track_head.tracker"),
        }
    return p
