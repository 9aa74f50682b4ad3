"""torch Wan video VAE state dict -> fantasy_world_tpu param tree.

The torch module tree (wan_video_vae.py VideoVAE_, keys prefixed 'model.')
is walked with the same layer plans the apply functions use
(models/wan/vae.py encoder_downsample_plan / decoder_upsample_plan), so
nn.Sequential indices line up mechanically.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from ..models.wan.vae import (VAEConfig, encoder_downsample_plan,
                              decoder_upsample_plan)


def _conv(sd, name):
    p = {"kernel": np.asarray(sd[name + ".weight"])}
    if name + ".bias" in sd:
        p["bias"] = np.asarray(sd[name + ".bias"])
    return p


def _res_block(sd, pre):
    p = {
        "norm1": {"gamma": np.asarray(sd[pre + ".residual.0.gamma"])},
        "conv1": _conv(sd, pre + ".residual.2"),
        "norm2": {"gamma": np.asarray(sd[pre + ".residual.3.gamma"])},
        "conv2": _conv(sd, pre + ".residual.6"),
    }
    if pre + ".shortcut.weight" in sd:
        p["shortcut"] = _conv(sd, pre + ".shortcut")
    return p


def _attn_block(sd, pre):
    return {"norm": {"gamma": np.asarray(sd[pre + ".norm.gamma"])},
            "to_qkv": _conv(sd, pre + ".to_qkv"),
            "proj": _conv(sd, pre + ".proj")}


def _resample(sd, pre, kind):
    # every Resample variant keys its conv at .resample.1 (up: after the
    # Upsample module; down: after the ZeroPad2d); only 3d adds time_conv
    p = {"resample_conv": _conv(sd, pre + ".resample.1")}
    if kind in ("up3d", "down3d"):
        p["time_conv"] = _conv(sd, pre + ".time_conv")
    return p


def _plan_params(sd, pre, plan):
    out = []
    for i, (kind, _) in enumerate(plan):
        name = f"{pre}.{i}"
        if kind == "res":
            out.append(_res_block(sd, name))
        elif kind == "attn":
            out.append(_attn_block(sd, name))
        else:
            out.append(_resample(sd, name, kind))
    return out


def _macro_block(sd, pre, n_res, has_resample, resample_kind):
    """Down_/Up_ResidualBlock (wan22 wan_video_vae.py:451-524): the
    AvgDown3D/DupUp3D shortcut is parameter-free; the main path is a
    Sequential of ResidualBlocks plus an optional trailing Resample38."""
    p = {"res": [_res_block(sd, f"{pre}.{j}") for j in range(n_res)]}
    if has_resample:
        p["resample"] = _resample(sd, f"{pre}.{n_res}", resample_kind)
    return p


def convert_wan_vae38(sd: Mapping, cfg=None, prefix: str = "model.") -> Dict:
    """torch VideoVAE38_ state dict -> param tree for models/wan/vae38.py."""
    from ..models.wan.vae38 import (VAE38Config, encoder38_stages,
                                    decoder38_stages)
    cfg = cfg or VAE38Config()
    pr = prefix
    enc_down = []
    for i, st in enumerate(encoder38_stages(cfg)):
        kind = ("down3d" if st["t_down"] else "down2d") if st["down"] else None
        enc_down.append(_macro_block(
            sd, f"{pr}encoder.downsamples.{i}.downsamples",
            cfg.num_res_blocks, st["down"], kind))
    dec_up = []
    for i, st in enumerate(decoder38_stages(cfg)):
        kind = ("up3d" if st["t_up"] else "up2d") if st["up"] else None
        dec_up.append(_macro_block(
            sd, f"{pr}decoder.upsamples.{i}.upsamples",
            cfg.num_res_blocks + 1, st["up"], kind))
    return {
        "encoder": {
            "conv1": _conv(sd, pr + "encoder.conv1"),
            "downsamples": enc_down,
            "middle_res1": _res_block(sd, pr + "encoder.middle.0"),
            "middle_attn": _attn_block(sd, pr + "encoder.middle.1"),
            "middle_res2": _res_block(sd, pr + "encoder.middle.2"),
            "head_norm": {"gamma": np.asarray(sd[pr + "encoder.head.0.gamma"])},
            "head_conv": _conv(sd, pr + "encoder.head.2"),
        },
        "conv1": _conv(sd, pr + "conv1"),
        "conv2": _conv(sd, pr + "conv2"),
        "decoder": {
            "conv1": _conv(sd, pr + "decoder.conv1"),
            "middle_res1": _res_block(sd, pr + "decoder.middle.0"),
            "middle_attn": _attn_block(sd, pr + "decoder.middle.1"),
            "middle_res2": _res_block(sd, pr + "decoder.middle.2"),
            "upsamples": dec_up,
            "head_norm": {"gamma": np.asarray(sd[pr + "decoder.head.0.gamma"])},
            "head_conv": _conv(sd, pr + "decoder.head.2"),
        },
    }


def convert_wan_vae(sd: Mapping, cfg: VAEConfig = VAEConfig(),
                    prefix: str = "model.") -> Dict:
    pr = prefix
    return {
        "encoder": {
            "conv1": _conv(sd, pr + "encoder.conv1"),
            "downsamples": _plan_params(sd, pr + "encoder.downsamples",
                                        encoder_downsample_plan(cfg)),
            "middle_res1": _res_block(sd, pr + "encoder.middle.0"),
            "middle_attn": _attn_block(sd, pr + "encoder.middle.1"),
            "middle_res2": _res_block(sd, pr + "encoder.middle.2"),
            "head_norm": {"gamma": np.asarray(sd[pr + "encoder.head.0.gamma"])},
            "head_conv": _conv(sd, pr + "encoder.head.2"),
        },
        "conv1": _conv(sd, pr + "conv1"),
        "conv2": _conv(sd, pr + "conv2"),
        "decoder": {
            "conv1": _conv(sd, pr + "decoder.conv1"),
            "middle_res1": _res_block(sd, pr + "decoder.middle.0"),
            "middle_attn": _attn_block(sd, pr + "decoder.middle.1"),
            "middle_res2": _res_block(sd, pr + "decoder.middle.2"),
            "upsamples": _plan_params(sd, pr + "decoder.upsamples",
                                      decoder_upsample_plan(cfg)),
            "head_norm": {"gamma": np.asarray(sd[pr + "decoder.head.0.gamma"])},
            "head_conv": _conv(sd, pr + "decoder.head.2"),
        },
    }
