"""torch WanModel state dict -> fantasy_world_tpu DiT param tree.

Layout transforms applied here (and only here):
  * Linear weights (out, in) -> kernel (in, out).
  * patch_embedding Conv3d weight (dim, c, pt, ph, pw) -> ((c*pt*ph*pw), dim)
    matching models/wan/dit.py patchify's (c, dt, dy, dx) flatten order.
  * RMSNorm 'weight' -> 'scale'; LayerNorm 'weight'/'bias' -> 'scale'/'bias'.
  * camera AdaLN adapter weights stored by the reference under
    blocks.N.cross_attn.processor.* (processors are registered submodules of
    CrossAttention) -> blocks.N.camera.*.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from ..models.wan.dit import WanDiTConfig


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _lin(sd, name) -> Dict:
    p = {"kernel": _t(sd[name + ".weight"])}
    if name + ".bias" in sd:
        p["bias"] = np.asarray(sd[name + ".bias"])
    return p


def _ln(sd, name) -> Dict:
    p = {}
    if name + ".weight" in sd:
        p["scale"] = np.asarray(sd[name + ".weight"])
    if name + ".bias" in sd:
        p["bias"] = np.asarray(sd[name + ".bias"])
    return p


def _rms(sd, name) -> Dict:
    return {"scale": np.asarray(sd[name + ".weight"])}


def _attn(sd, pre, image_kv=False, rope_head_dim: int = 0) -> Dict:
    p = {
        "q": _lin(sd, pre + ".q"), "k": _lin(sd, pre + ".k"),
        "v": _lin(sd, pre + ".v"), "o": _lin(sd, pre + ".o"),
        "norm_q": _rms(sd, pre + ".norm_q"),
        "norm_k": _rms(sd, pre + ".norm_k"),
    }
    if rope_head_dim:
        # fold the rope de-interleave permutation into the q/k output
        # channels (and their per-channel RMS scales): the model then runs
        # the layout-friendly half-split rotation (ops/rope.py
        # apply_rope_half). Scores are invariant; v/o are untouched.
        from ..ops.rope import permute_qk_out_channels as perm
        for name in ("q", "k"):
            p[name]["kernel"] = perm(p[name]["kernel"], rope_head_dim)
            if "bias" in p[name]:
                p[name]["bias"] = perm(p[name]["bias"], rope_head_dim)
        p["norm_q"]["scale"] = perm(p["norm_q"]["scale"], rope_head_dim)
        p["norm_k"]["scale"] = perm(p["norm_k"]["scale"], rope_head_dim)
    if image_kv:
        p["k_img"] = _lin(sd, pre + ".k_img")
        p["v_img"] = _lin(sd, pre + ".v_img")
        p["norm_k_img"] = _rms(sd, pre + ".norm_k_img")
    return p


def _camera_adapter(sd, pre) -> Dict:
    """CrossAttentionAdapterProcessor 'adaln' weights
    (camera_control.py:24-63): k_proj.group1 Linear, k_proj.group2 2-layer
    MLP, v_proj.group2 2-layer MLP."""
    return {
        "k_group1": _lin(sd, pre + ".k_proj.group1"),
        "k_group2": {"fc1": _lin(sd, pre + ".k_proj.group2.0"),
                     "fc2": _lin(sd, pre + ".k_proj.group2.2")},
        "v_group2": {"fc1": _lin(sd, pre + ".v_proj.group2.0"),
                     "fc2": _lin(sd, pre + ".v_proj.group2.2")},
    }


def convert_block(sd: Mapping, cfg: WanDiTConfig, i: int, prefix: str = "") -> Dict:
    pre = f"{prefix}blocks.{i}"
    p = {
        "self_attn": _attn(sd, pre + ".self_attn",
                           rope_head_dim=cfg.head_dim),
        "cross_attn": _attn(sd, pre + ".cross_attn",
                            image_kv=cfg.has_image_input),
        "norm3": _ln(sd, pre + ".norm3"),
        "ffn": {"fc1": _lin(sd, pre + ".ffn.0"),
                "fc2": _lin(sd, pre + ".ffn.2")},
        "modulation": np.asarray(sd[pre + ".modulation"]),
    }
    proc = pre + ".cross_attn.processor"
    if proc + ".k_proj.group1.weight" in sd:
        p["camera"] = _camera_adapter(sd, proc)          # 'adaln'
    elif proc + ".k_proj.weight" in sd:
        # 'latent_split'/'latent_overall' variants: bias-free zero-init
        # k/v projections (camera_control.py:66-72)
        p["camera"] = {"k_proj": _lin(sd, proc + ".k_proj"),
                       "v_proj": _lin(sd, proc + ".v_proj")}
    return p


def convert_wan_dit(sd: Mapping, cfg: WanDiTConfig, prefix: str = "") -> Dict:
    """sd: flat torch state dict (numpy or torch tensors). prefix allows
    converting nested dumps (e.g. 'pipe.dit.' inside a fusion checkpoint)."""
    g = lambda n: sd[prefix + n]  # noqa: E731
    pe_w = np.asarray(g("patch_embedding.weight"))
    dim = pe_w.shape[0]
    p = {
        "patch_embedding": {
            "kernel": _t(pe_w.reshape(dim, -1)),
            "bias": np.asarray(g("patch_embedding.bias")),
        },
        "text_embedding": {
            "fc1": _lin(sd, prefix + "text_embedding.0"),
            "fc2": _lin(sd, prefix + "text_embedding.2"),
        },
        "time_embedding": {
            "fc1": _lin(sd, prefix + "time_embedding.0"),
            "fc2": _lin(sd, prefix + "time_embedding.2"),
        },
        "time_projection": _lin(sd, prefix + "time_projection.1"),
        "head": {
            "head": _lin(sd, prefix + "head.head"),
            "modulation": np.asarray(g("head.modulation")),
        },
        "blocks": [convert_block(sd, cfg, i, prefix)
                   for i in range(cfg.num_layers)],
    }
    if cfg.has_image_input:
        p["img_emb"] = {
            "norm_in": _ln(sd, prefix + "img_emb.proj.0"),
            "fc1": _lin(sd, prefix + "img_emb.proj.1"),
            "fc2": _lin(sd, prefix + "img_emb.proj.3"),
            "norm_out": _ln(sd, prefix + "img_emb.proj.4"),
        }
        if prefix + "img_emb.emb_pos" in sd:
            p["img_emb"]["emb_pos"] = np.asarray(g("img_emb.emb_pos"))
    if cfg.add_control_adapter \
            and prefix + "control_adapter.conv.weight" in sd:
        # wan22 Fun-Control-Camera SimpleAdapter lives inside the DiT ckpt
        # (wan22 wan_video_dit.py:385-388, wan_video_camera_controller.py:8-22)
        from .camera import convert_simple_adapter
        n_res = 0
        while (f"{prefix}control_adapter.residual_blocks.{n_res}.conv1.weight"
               in sd):
            n_res += 1
        p["control_adapter"] = convert_simple_adapter(
            sd, prefix + "control_adapter.", num_residual_blocks=n_res)
    return p
