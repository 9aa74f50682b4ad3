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

Sub-checkpoint regions are exposed to the sub-converters through lazy
re-keyed VIEWS of the original mapping rather than dict copies -- at 14B
scale the copies double host memory during load, and views keep key reads
attributable to the source dict (tests/test_census.py tracks them to prove
no checkpoint key is silently dropped).
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np

from ..models.fusion.model import FusionConfig
from .wan_dit import convert_wan_dit, convert_block, _lin
from .vggt import convert_vggt, convert_vggt_block


class _KeyView(Mapping):
    """Lazy view of ``base`` restricted to keys starting with ``src`` and
    re-prefixed with ``dst``; reads forward to the base mapping."""

    def __init__(self, base: Mapping, src: str, dst: str = ""):
        self._base, self._src, self._dst = base, src, dst
        self._keys = [dst + k[len(src):] for k in base if k.startswith(src)]

    def _unmap(self, key: str) -> str:
        return self._src + key[len(self._dst):]

    def __getitem__(self, key):
        return self._base[self._unmap(key)]

    def __contains__(self, key):
        return key.startswith(self._dst) and self._unmap(key) in self._base

    def __iter__(self):
        return iter(self._keys)

    def __len__(self):
        return len(self._keys)


class _Overlay(Mapping):
    """strict=False merge view: ``top`` (a _KeyView of the fusion ckpt's
    pipe.dit.* region) wins over the base DiT dict."""

    def __init__(self, base: Mapping, top: Mapping):
        self._base, self._top = base, top
        self._keys = list(base)
        seen = set(self._keys)
        self._keys += [k for k in top if k not in seen]

    def __getitem__(self, key):
        if key in self._top:
            return self._top[key]
        return self._base[key]

    def __contains__(self, key):
        return key in self._top or key in self._base

    def __iter__(self):
        return iter(self._keys)

    def __len__(self):
        return len(self._keys)


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
    # 1. base DiT with any pipe.dit.* fusion keys overlaid (strict=False)
    merged = _Overlay(base_dit_sd, _KeyView(fusion_sd, "pipe.dit."))
    dit = convert_wan_dit(merged, cfg.dit)

    # 2. IRG surgery reversal: x_dit -> dit.blocks[start+i]
    for i in range(cfg.num_irg):
        sub = _KeyView(fusion_sd, f"IRGBlock.{i}.x_dit.", "blocks.0.")
        if "blocks.0.self_attn.q.weight" in sub:
            dit["blocks"][cfg.start_index + i] = convert_block(
                sub, cfg.dit, 0)

    # 3. VGGT tree (frame blocks etc. under vggt.*), global blocks from IRG
    src = vggt_sd if vggt_sd is not None else _KeyView(fusion_sd, "vggt.")
    vggt = convert_vggt(src, depth=cfg.vggt.aggregator.depth,
                        skip_globals=True)
    vggt["aggregator"]["global_blocks"] = [
        convert_vggt_block(_KeyView(fusion_sd, f"IRGBlock.{i}.x_agg.", "g."),
                           "g")
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
