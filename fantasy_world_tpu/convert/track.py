"""torch track-module state dicts -> fantasy_world_tpu param trees.

Covers BaseTrackerPredictor / EfficientUpdateFormer
(vggt/heads/track_modules/{base_track_predictor,blocks,modules}.py).
``nn.MultiheadAttention`` packs q/k/v into one ``in_proj_weight`` (3E, E);
we split it into three (in, out)-layout kernels. ``GroupNorm(1, C)`` on a
2D input is channel LayerNorm, so ``ffeat_norm`` maps onto our layernorm
params. No published FantasyWorld checkpoint carries track weights
(enable_track is False, inference_wan21.py:193); this converter exists for
parity testing and for upstream VGGT checkpoints that do ship the tracker.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from .vggt import _lin, _ln, _t


def _mha(sd: Mapping, pre: str) -> Dict:
    w = np.asarray(sd[pre + ".in_proj_weight"])      # (3E, E)
    b = np.asarray(sd[pre + ".in_proj_bias"])
    E = w.shape[1]
    return {
        "q": {"kernel": _t(w[:E]), "bias": b[:E]},
        "k": {"kernel": _t(w[E:2 * E]), "bias": b[E:2 * E]},
        "v": {"kernel": _t(w[2 * E:]), "bias": b[2 * E:]},
        "out": _lin(sd, pre + ".out_proj"),
    }


def _attn_block(sd: Mapping, pre: str) -> Dict:
    return {"norm1": _ln(sd, pre + ".norm1"),
            "norm2": _ln(sd, pre + ".norm2"),
            "attn": _mha(sd, pre + ".attn"),
            "mlp": {"fc1": _lin(sd, pre + ".mlp.fc1"),
                    "fc2": _lin(sd, pre + ".mlp.fc2")}}


def _cross_block(sd: Mapping, pre: str) -> Dict:
    p = {"norm1": _ln(sd, pre + ".norm1"),
         "norm_context": _ln(sd, pre + ".norm_context"),
         "norm2": _ln(sd, pre + ".norm2"),
         "attn": _mha(sd, pre + ".cross_attn"),
         "mlp": {"fc1": _lin(sd, pre + ".mlp.fc1"),
                 "fc2": _lin(sd, pre + ".mlp.fc2")}}
    return p


def convert_update_former(sd: Mapping, pre: str = "", depth: int = 6) -> Dict:
    pre = pre + "." if pre else ""
    return {
        "input_norm": _ln(sd, pre + "input_norm"),
        "input_transform": _lin(sd, pre + "input_transform"),
        "output_norm": _ln(sd, pre + "output_norm"),
        "flow_head": _lin(sd, pre + "flow_head"),
        "virtual_tracks": np.asarray(sd[pre + "virual_tracks"]),  # sic
        "time_blocks": [_attn_block(sd, f"{pre}time_blocks.{i}")
                        for i in range(depth)],
        "space_virtual_blocks": [
            _attn_block(sd, f"{pre}space_virtual_blocks.{i}")
            for i in range(depth)],
        "space_point2virtual_blocks": [
            _cross_block(sd, f"{pre}space_point2virtual_blocks.{i}")
            for i in range(depth)],
        "space_virtual2point_blocks": [
            _cross_block(sd, f"{pre}space_virtual2point_blocks.{i}")
            for i in range(depth)],
    }


def convert_tracker(sd: Mapping, pre: str = "", depth: int = 6) -> Dict:
    pre = pre + "." if pre else ""
    p = {
        "corr_mlp": {"fc1": _lin(sd, pre + "corr_mlp.fc1"),
                     "fc2": _lin(sd, pre + "corr_mlp.fc2")},
        "query_ref_token": np.asarray(sd[pre + "query_ref_token"]),
        "updateformer": convert_update_former(sd, pre + "updateformer",
                                              depth),
        "fmap_norm": _ln(sd, pre + "fmap_norm"),
        "ffeat_norm": {"scale": np.asarray(sd[pre + "ffeat_norm.weight"]),
                       "bias": np.asarray(sd[pre + "ffeat_norm.bias"])},
        "ffeat_updater": _lin(sd, pre + "ffeat_updater.0"),
        "vis_predictor": _lin(sd, pre + "vis_predictor.0"),
    }
    if pre + "conf_predictor.0.weight" in sd:
        p["conf_predictor"] = _lin(sd, pre + "conf_predictor.0")
    return p
