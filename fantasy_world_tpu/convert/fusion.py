"""FantasyWorld fusion checkpoint (model.pth) -> param tree.

The reference fusion model performs module surgery at build time: DiT blocks
>= start_index and aggregator global blocks are deep-copied into IRGBlocks
and the originals replaced by nn.Identity (fusion/model_wan21.py:69-87), so
the trained checkpoint stores them under

    IRGBlock.{i}.x_dit.*                 (the DiT half of IRG block i)
    IRGBlock.{i}.x_agg.*                 (the aggregator global half)
    IRGBlock.{i}.bicross_attention.*     (the cross-modal coupler)
    pipe.dit.*                           (PCB blocks + embeddings + head +
                                          cross_attn.processor camera
                                          adapters, frozen base weights
                                          mostly absent -> strict=False)
    vggt.*                               (frame blocks, heads, projections)
    camera_condition.pose_encoder.*      (Plucker feature encoder)

This converter un-does the surgery: IRG halves are written back into their
original slots so the functional model keeps uniform 40-block / 24-block
stacks. Base-model weights missing from the fusion checkpoint are taken
from a separately provided base DiT tree (mirroring strict=False loading
over the merged module).
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np

from ..models.fusion.model import FusionConfig
from .wan_dit import convert_wan_dit, convert_block, _lin
from .vggt import convert_vggt, convert_vggt_block


def _bicross(sd: Mapping, pre: str, head_dim: int = 96) -> Dict:
    from ..ops.rope import permute_qk_out_channels as perm

    def _rope_lin(name):
        # q/k projections carry rope: fold the de-interleave permutation
        # into their output columns (see convert/wan_dit.py _attn)
        p = _lin(sd, name)
        p["kernel"] = perm(p["kernel"], head_dim)
        if "bias" in p:
            p["bias"] = perm(p["bias"], head_dim)
        return p

    ba = pre + ".bicross_attention"
    return {
        "m1_proj": _rope_lin(ba + ".cross_attn.m1_proj"),
        "m2_proj": _rope_lin(ba + ".cross_attn.m2_proj"),
        "values_m1_proj": _lin(sd, ba + ".cross_attn.values_m1_proj"),
        "values_m2_proj": _lin(sd, ba + ".cross_attn.values_m2_proj"),
        "out_m1_proj": _lin(sd, ba + ".cross_attn.out_m1_proj"),
        "out_m2_proj": _lin(sd, ba + ".cross_attn.out_m2_proj"),
        "gamma_m1": np.asarray(sd[ba + ".gamma_m1"]),
        "gamma_m2": np.asarray(sd[ba + ".gamma_m2"]),
    }


def convert_fusion_checkpoint(fusion_sd: Mapping, base_dit_sd: Mapping,
                              cfg: FusionConfig,
                              vggt_sd: Optional[Mapping] = None) -> Dict:
    """fusion_sd: the trained model.pth flat dict. base_dit_sd: the base Wan
    DiT state dict (civitai layout) providing weights the fusion checkpoint
    leaves frozen. Returns {dit, vggt, bicross, camera_pose_encoder}."""
    # 1. base DiT, then overlay any pipe.dit.* keys present in the fusion sd
    merged = dict(base_dit_sd)
    for k, v in fusion_sd.items():
        if k.startswith("pipe.dit."):
            merged[k[len("pipe.dit."):]] = v
    dit = convert_wan_dit(merged, cfg.dit)

    # 2. IRG surgery reversal: x_dit -> dit.blocks[start+i]
    for i in range(cfg.num_irg):
        pre = f"IRGBlock.{i}.x_dit"
        if pre + ".self_attn.q.weight" in fusion_sd:
            sub = {k[len(f"IRGBlock.{i}."):]: v for k, v in fusion_sd.items()
                   if k.startswith(pre)}
            sub = {("blocks.0." + k[len("x_dit."):]): v for k, v in sub.items()}
            dit["blocks"][cfg.start_index + i] = convert_block(
                sub, cfg.dit, 0)

    # 3. VGGT tree (frame blocks etc. under vggt.*), global blocks from IRG
    src = vggt_sd if vggt_sd is not None else {
        k[len("vggt."):]: v for k, v in fusion_sd.items()
        if k.startswith("vggt.")}
    vggt = convert_vggt(src, depth=cfg.vggt.aggregator.depth,
                        skip_globals=True)
    vggt["aggregator"]["global_blocks"] = [
        convert_vggt_block(
            {("g." + k[len(f"IRGBlock.{i}.x_agg."):]): v
             for k, v in fusion_sd.items()
             if k.startswith(f"IRGBlock.{i}.x_agg.")}, "g")
        for i in range(cfg.num_irg)]

    out = {
        "dit": dit,
        "vggt": vggt,
        "bicross": [_bicross(fusion_sd, f"IRGBlock.{i}", cfg.bicross.head_dim)
                    for i in range(cfg.num_irg)],
    }
    if any(k.startswith("camera_condition.pose_encoder.")
           for k in fusion_sd):
        from .camera import convert_pose_encoder
        out["camera_pose_encoder"] = convert_pose_encoder(
            fusion_sd, "camera_condition.pose_encoder.")
    return out
