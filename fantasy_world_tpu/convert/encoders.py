"""State-dict conversion for the umT5 text encoder and CLIP visual tower."""
from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np

from ..models.wan.t5 import T5Config
from ..models.wan.clip import CLIPVisionConfig


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


def convert_t5(sd: Mapping, cfg: Optional[T5Config] = None,
               prefix: str = "") -> Dict:
    """wan_video_text_encoder.py WanTextEncoder layout (shared_pos=False:
    per-block pos_embedding.embedding). Tower depth is read from the state
    dict itself; a cfg, when given, must agree."""
    pr = prefix
    n_layers = 1 + max(int(k[len(pr) + 7:].split(".")[0]) for k in sd
                       if k.startswith(pr + "blocks."))
    if cfg is not None and cfg.num_layers != n_layers:
        raise ValueError(f"config says {cfg.num_layers} T5 layers, the "
                         f"checkpoint holds {n_layers}")
    blocks = []
    for i in range(n_layers):
        b = f"{pr}blocks.{i}"
        blocks.append({
            "norm1": {"scale": np.asarray(sd[b + ".norm1.weight"])},
            "attn": {k: _lin(sd, f"{b}.attn.{k}") for k in "qkvo"},
            "pos_embedding": np.asarray(
                sd[b + ".pos_embedding.embedding.weight"]),
            "norm2": {"scale": np.asarray(sd[b + ".norm2.weight"])},
            "ffn": {"gate": _lin(sd, b + ".ffn.gate.0"),
                    "fc1": _lin(sd, b + ".ffn.fc1"),
                    "fc2": _lin(sd, b + ".ffn.fc2")},
        })
    return {
        "token_embedding": np.asarray(sd[pr + "token_embedding.weight"]),
        "blocks": blocks,
        "norm": {"scale": np.asarray(sd[pr + "norm.weight"])},
    }


def convert_clip_vision(sd: Mapping, cfg: Optional[CLIPVisionConfig] = None,
                        prefix: str = "model.visual.") -> Dict:
    """VisionTransformer layout inside WanImageEncoder ('model.visual.*').

    The tower depth is read from the state dict itself (count of
    transformer.N blocks) so the converter is self-describing like the
    others; a cfg, when given, must agree."""
    pr = prefix
    pe = np.asarray(sd[pr + "patch_embedding.weight"])   # (dim, 3, ps, ps)
    n_layers = 1 + max(int(k[len(pr) + 12:].split(".")[0]) for k in sd
                       if k.startswith(pr + "transformer."))
    if cfg is not None and cfg.num_layers != n_layers:
        raise ValueError(f"config says {cfg.num_layers} CLIP layers, the "
                         f"checkpoint holds {n_layers}")
    blocks = []
    for i in range(n_layers):
        b = f"{pr}transformer.{i}"
        blocks.append({
            "norm1": _ln(sd, b + ".norm1"),
            "attn": {"to_qkv": _lin(sd, b + ".attn.to_qkv"),
                     "proj": _lin(sd, b + ".attn.proj")},
            "norm2": _ln(sd, b + ".norm2"),
            "mlp": {"fc1": _lin(sd, b + ".mlp.0"),
                    "fc2": _lin(sd, b + ".mlp.2")},
        })
    return {
        # patchify is reshape+matmul over (c, py, px)-flattened patches;
        # torch conv weight (dim, 3, ps, ps) flattens to the same order
        "patch_embedding": {"kernel": _t(pe.reshape(pe.shape[0], -1))},
        "cls_embedding": np.asarray(sd[pr + "cls_embedding"]),
        "pos_embedding": np.asarray(sd[pr + "pos_embedding"]),
        "pre_norm": _ln(sd, pr + "pre_norm"),
        "blocks": blocks,
    }
