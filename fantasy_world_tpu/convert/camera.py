"""Camera encoder state-dict conversion (pose_adaptor_ac3d / SimpleAdapter)."""
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


def _conv(sd, name):
    return {"kernel": np.asarray(sd[name + ".weight"]),
            "bias": np.asarray(sd[name + ".bias"])}


def _affine(sd, name):
    return {"scale": np.asarray(sd[name + ".weight"]),
            "bias": np.asarray(sd[name + ".bias"])}


def convert_pose_encoder(sd: Mapping, pre: str) -> Dict:
    """CameraPoseEncoder (pose_adaptor_ac3d.py): controlnet_encode_first is
    Sequential(Conv, GN, Conv, GN, ReLU); second is (Conv, GN, ReLU);
    patch_embedding Conv3d kernel==stride flattened to a matmul kernel."""
    pe_w = np.asarray(sd[pre + "patch_embedding.weight"])   # (dim, c, 1, 2, 2)
    return {
        "encode_first": {
            "conv1": _conv(sd, pre + "controlnet_encode_first.0"),
            "norm1": _affine(sd, pre + "controlnet_encode_first.1"),
            "conv2": _conv(sd, pre + "controlnet_encode_first.2"),
            "norm2": _affine(sd, pre + "controlnet_encode_first.3"),
        },
        "encode_second": {
            "conv1": _conv(sd, pre + "controlnet_encode_second.0"),
            "norm1": _affine(sd, pre + "controlnet_encode_second.1"),
        },
        "patch_embedding": {
            "kernel": _t(pe_w.reshape(pe_w.shape[0], -1)),
            "bias": np.asarray(sd[pre + "patch_embedding.bias"]),
        },
        "fc": {
            "fc1": _lin(sd, pre + "fc.0"),
            "norm1": _affine(sd, pre + "fc.1"),
            "fc2": _lin(sd, pre + "fc.3"),
            "norm2": _affine(sd, pre + "fc.4"),
        },
    }


def convert_simple_adapter(sd: Mapping, pre: str,
                           num_residual_blocks: int = 1) -> Dict:
    return {
        "conv": _conv(sd, pre + "conv"),
        "residual_blocks": [
            {"conv1": _conv(sd, f"{pre}residual_blocks.{i}.conv1"),
             "conv2": _conv(sd, f"{pre}residual_blocks.{i}.conv2")}
            for i in range(num_residual_blocks)],
    }
