"""VGGT prediction heads: iterative camera head and causal-3D DPT head.

Functional re-design of vggt/heads/camera_head.py:20-153 and
dpt_head.py:13-320. The DPT head's frame-chunked processing (chunks of 4/16
frames, dpt_head.py:145-197) is a GPU memory workaround -- here the full
81-frame pyramid runs in fused XLA convs. The WanVAE_-based temporal
upsamplers become the streaming-equivalent full-sequence ops in
ops/causal_conv.py.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.params import (prng_split, init_linear, init_layernorm, np_normal,
                            np_zeros, np_ones, np_cast)
from ...ops.causal_conv import (causal_conv3d, conv2d, wan_vae_dpt_upsampler,
                                channel_expand_reshape)
from ...ops.interpolate import bilinear_align_corners
from ...ops.norms import layer_norm, modulate
from .blocks import (VGGTBlockConfig, init_vggt_block, vggt_block_apply)


def _linear(p, x):
    y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# activations (vggt/heads/head_act.py)
# ---------------------------------------------------------------------------

def inverse_log_transform(y):
    return jnp.sign(y) * jnp.expm1(jnp.abs(y))


def base_pose_act(x, act: str):
    if act == "linear":
        return x
    if act == "inv_log":
        return inverse_log_transform(x)
    if act == "exp":
        return jnp.exp(x)
    if act == "relu":
        return jax.nn.relu(x)
    raise ValueError(act)


def activate_pose(pred, trans_act="linear", quat_act="linear", fl_act="relu"):
    return jnp.concatenate([
        base_pose_act(pred[..., :3], trans_act),
        base_pose_act(pred[..., 3:7], quat_act),
        base_pose_act(pred[..., 7:], fl_act)], axis=-1)


def activate_head(out, activation="inv_log", conf_activation="expp1"):
    """out: (N, C, H, W) -> (pts (N, H, W, C-1), conf (N, H, W))."""
    fmap = out.transpose(0, 2, 3, 1).astype(jnp.float32)
    xyz, conf = fmap[..., :-1], fmap[..., -1]
    if activation == "norm_exp":
        d = jnp.maximum(jnp.linalg.norm(xyz, axis=-1, keepdims=True), 1e-8)
        pts = xyz / d * jnp.expm1(d)
    elif activation == "exp":
        pts = jnp.exp(xyz)
    elif activation == "relu":
        pts = jax.nn.relu(xyz)
    elif activation == "inv_log":
        pts = inverse_log_transform(xyz)
    elif activation == "linear":
        pts = xyz
    else:
        raise ValueError(activation)
    if conf_activation == "expp1":
        conf = 1 + jnp.exp(conf)
    elif conf_activation == "expp0":
        conf = jnp.exp(conf)
    elif conf_activation == "sigmoid":
        conf = jax.nn.sigmoid(conf)
    else:
        raise ValueError(conf_activation)
    return pts, conf


# ---------------------------------------------------------------------------
# Camera head
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CameraHeadConfig:
    dim_in: int = 2048
    trunk_depth: int = 4
    num_heads: int = 16
    mlp_ratio: float = 4.0
    init_values: float = 0.01
    target_dim: int = 9
    trans_act: str = "linear"
    quat_act: str = "linear"
    fl_act: str = "relu"

    @property
    def block_cfg(self) -> VGGTBlockConfig:
        # trunk blocks: no qk-norm, no rope (camera_head.py:53-57)
        return VGGTBlockConfig(dim=self.dim_in, num_heads=self.num_heads,
                               mlp_ratio=self.mlp_ratio, qk_norm=False,
                               init_values=self.init_values,
                               rope_frequency=-1.0)


def init_camera_head(rng, cfg: CameraHeadConfig, dtype=jnp.bfloat16) -> Dict:
    rs = prng_split(rng, cfg.trunk_depth + 5)
    d = cfg.dim_in
    return {
        "trunk": [init_vggt_block(rs[i], cfg.block_cfg, dtype)
                  for i in range(cfg.trunk_depth)],
        "token_norm": init_layernorm(d, dtype=dtype),
        "trunk_norm": init_layernorm(d, dtype=dtype),
        "empty_pose_tokens": np_zeros((1, 1, cfg.target_dim), dtype),
        "embed_pose": init_linear(rs[-5], cfg.target_dim, d, dtype=dtype),
        "poseLN_modulation": init_linear(rs[-4], d, 3 * d, dtype=dtype),
        "camera_time_upsample": {
            "kernel": np_zeros((4 * d, d, 1), dtype),
            "bias": np_zeros((4 * d,), dtype)},
        "pose_branch": {"fc1": init_linear(rs[-3], d, d // 2, dtype=dtype),
                        "fc2": init_linear(rs[-2], d // 2, cfg.target_dim,
                                           dtype=dtype)},
    }


def camera_head_forward(p: Dict, cfg: CameraHeadConfig,
                        last_tokens: jnp.ndarray,
                        num_iterations: int = 4) -> List[jnp.ndarray]:
    """last_tokens: (B, S, P, 2C); uses the camera token (index 0) per frame.

    Temporal 4x upsample of frames >= 1 (camera_head.py:89-95 -- the
    upsampled tokens intentionally skip token_norm, a reference quirk kept
    for checkpoint parity), then iterative AdaLN-modulated refinement.
    """
    pose_tokens = last_tokens[:, :, 0]                     # (B, S, C)
    upsampled = channel_expand_reshape(p["camera_time_upsample"],
                                       pose_tokens[:, 1:])
    normed = layer_norm(pose_tokens, p["token_norm"], 1e-5)
    pose_tokens = jnp.concatenate([normed[:, 0:1], upsampled], axis=1)

    B = pose_tokens.shape[0]
    preds = []
    pred = None
    for _ in range(num_iterations):
        if pred is None:
            inp = jnp.broadcast_to(p["empty_pose_tokens"].astype(pose_tokens.dtype),
                                   (B, 1, cfg.target_dim))
        else:
            inp = pred
        mod_in = _linear(p["poseLN_modulation"], jax.nn.silu(
            _linear(p["embed_pose"], inp).astype(jnp.float32)).astype(pose_tokens.dtype))
        shift, scale, gate = jnp.split(mod_in, 3, axis=-1)
        h = layer_norm(pose_tokens, None, 1e-6)
        h = gate * modulate(h, shift, scale) + pose_tokens
        for blk in p["trunk"]:
            h = vggt_block_apply(blk, cfg.block_cfg, h)
        delta = _linear(p["pose_branch"]["fc2"], jax.nn.gelu(
            _linear(p["pose_branch"]["fc1"],
                    layer_norm(h, p["trunk_norm"], 1e-5)),
            approximate=False))
        pred = delta if pred is None else pred + delta
        preds.append(activate_pose(pred, cfg.trans_act, cfg.quat_act,
                                   cfg.fl_act))
    return preds


# ---------------------------------------------------------------------------
# DPT head (causal-3D)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DPTHeadConfig:
    dim_in: int = 2048
    patch_size: int = 16
    output_dim: int = 4
    activation: str = "inv_log"
    conf_activation: str = "expp1"
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    intermediate_layer_idx: Tuple[int, ...] = (23, 17, 11, 7)
    pos_embed: bool = True
    down_ratio: int = 1
    # feature_only: stop after output_conv1 (which then keeps ``features``
    # channels, dpt_head.py:115-118) and return fused feature maps instead
    # of activated predictions -- the TrackHead feature extractor mode.
    feature_only: bool = False


def _init_conv2d(rng, cin, cout, k, dtype, bias=True):
    from ...core.params import _np_rng
    scale = 1.0 / np.sqrt(cin * k * k)
    p = {"kernel": np_cast(_np_rng(rng).uniform(-scale, scale,
                                                (cout, cin, k, k)), dtype)}
    if bias:
        p["bias"] = np_zeros((cout,), dtype)
    return p


def _init_causal3d(rng, cin, cout, k, dtype):
    from ...core.params import _np_rng
    scale = 1.0 / np.sqrt(cin * k ** 3)
    return {"kernel": np_cast(_np_rng(rng).uniform(
        -scale, scale, (cout, cin, k, k, k)), dtype),
            "bias": np_zeros((cout,), dtype)}


def _init_wanvae_dpt(rng, z_dim, dtype):
    rs = prng_split(rng, 8)
    def time_conv(r, c):
        from ...core.params import _np_rng
        scale = 1.0 / np.sqrt(c * 3)
        return {"time_conv": {
            "kernel": np_cast(_np_rng(r).uniform(-scale, scale,
                                                 (c * 2, c, 3, 1, 1)), dtype),
            "bias": np_zeros((c * 2,), dtype)}}
    def res_half(r, c):
        return {"norm": {"gamma": np_ones((c, 1, 1, 1), dtype)},
                "conv": _init_causal3d(r, c, c, 3, dtype)}
    return {"conv2": _init_causal3d(rs[0], z_dim, z_dim, 1, dtype),
            "up1": time_conv(rs[1], z_dim), "res1": res_half(rs[2], z_dim),
            "up2": time_conv(rs[3], z_dim), "res2": res_half(rs[4], z_dim)}


def _init_fusion_block(rng, features, dtype, has_residual=True):
    rs = prng_split(rng, 6)
    p = {"out_conv": _init_conv2d(rs[0], features, features, 1, dtype),
         "res2_conv1": _init_conv2d(rs[1], features, features, 3, dtype),
         "res2_conv2": _init_conv2d(rs[2], features, features, 3, dtype)}
    if has_residual:
        p["res1_conv1"] = _init_conv2d(rs[3], features, features, 3, dtype)
        p["res1_conv2"] = _init_conv2d(rs[4], features, features, 3, dtype)
    return p


def init_dpt_head(rng, cfg: DPTHeadConfig, dtype=jnp.bfloat16) -> Dict:
    rs = prng_split(rng, 32)
    oc = cfg.out_channels
    f = cfg.features
    p = {
        "norm": init_layernorm(cfg.dim_in, dtype=dtype),
        "projects": [_init_conv2d(rs[i], cfg.dim_in, oc[i], 1, dtype)
                     for i in range(4)],
        # resize_layers: ConvT 4x, ConvT 2x, identity, conv3x3 s2
        "resize0": {"kernel": np_normal(rs[4], (oc[0], oc[0], 4, 4), 0.02,
                                        dtype),
                    "bias": np_zeros((oc[0],), dtype)},
        "resize1": {"kernel": np_normal(rs[5], (oc[1], oc[1], 2, 2), 0.02,
                                        dtype),
                    "bias": np_zeros((oc[1],), dtype)},
        "resize3": _init_conv2d(rs[6], oc[3], oc[3], 3, dtype),
        "temporal_upsamplers": [_init_wanvae_dpt(rs[7 + i], oc[i], dtype)
                                for i in range(4)],
        "layer_rn": [_init_conv2d(rs[11 + i], oc[i], f, 3, dtype, bias=False)
                     for i in range(4)],
        "refinenet1": _init_fusion_block(rs[15], f, dtype),
        "refinenet2": _init_fusion_block(rs[16], f, dtype),
        "refinenet3": _init_fusion_block(rs[17], f, dtype),
        "refinenet4": _init_fusion_block(rs[18], f, dtype, has_residual=False),
    }
    if cfg.feature_only:
        p["output_conv1"] = _init_conv2d(rs[19], f, f, 3, dtype)
    else:
        p["output_conv1"] = _init_conv2d(rs[19], f, f // 2, 3, dtype)
        p["output_conv2_0"] = _init_conv2d(rs[20], f // 2, 32, 3, dtype)
        p["output_conv2_2"] = _init_conv2d(rs[21], 32, cfg.output_dim, 1,
                                           dtype)
    return p


def _pos_embed_2d(n_ch: int, h: int, w: int, full_w: int, full_h: int,
                  ratio: float = 0.1) -> np.ndarray:
    """create_uv_grid + position_grid_to_embed (heads/utils.py:11-109),
    computed host-side in float64; returns (n_ch, h, w) f32."""
    aspect = full_w / full_h
    diag = (aspect ** 2 + 1.0) ** 0.5
    span_x, span_y = aspect / diag, 1.0 / diag
    xs = np.linspace(-span_x * (w - 1) / w, span_x * (w - 1) / w, w)
    ys = np.linspace(-span_y * (h - 1) / h, span_y * (h - 1) / h, h)
    uu, vv = np.meshgrid(xs, ys, indexing="xy")     # (h, w)
    grid = np.stack([uu, vv], axis=-1)              # (h, w, 2)

    def sincos(dim, pos, omega_0=100.0):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / omega_0 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_x = sincos(n_ch // 2, grid[..., 0])
    emb_y = sincos(n_ch // 2, grid[..., 1])
    emb = np.concatenate([emb_x, emb_y], axis=-1).reshape(h, w, n_ch)
    return (emb.transpose(2, 0, 1) * ratio).astype(np.float32)


def _conv_transpose_same_stride(p, x, k):
    """ConvTranspose2d with kernel==stride k: per-pixel linear + depth-to-
    space. torch weight layout (in, out, k, k)."""
    N, C, H, W = x.shape
    wk = p["kernel"].astype(x.dtype)           # (C_in, C_out, k, k)
    cout = wk.shape[1]
    y = jnp.einsum("nchw,codk->nodkhw", x, wk,
                   preferred_element_type=jnp.float32)
    y = y + p["bias"].astype(jnp.float32)[None, :, None, None, None, None]
    y = y.astype(x.dtype)
    y = y.transpose(0, 1, 4, 2, 5, 3)           # n, o, H, dy, W, dx
    return y.reshape(N, cout, H * k, W * k)


def _residual_conv_unit(c1, c2, x):
    # The reference's ReLU is inplace (dpt_head.py:330 activation shared with
    # conv path), so the *skip* connection also sees relu(x) -- replicated.
    x = jax.nn.relu(x.astype(jnp.float32)).astype(x.dtype)
    h = conv2d(c1["kernel"], c1["bias"], x)
    h = jax.nn.relu(h.astype(jnp.float32)).astype(x.dtype)
    h = conv2d(c2["kernel"], c2["bias"], h)
    return h + x


def _fusion_block(p, x, res=None, size=None):
    if res is not None:
        x = x + _residual_conv_unit(p["res1_conv1"], p["res1_conv2"], res)
    x = _residual_conv_unit(p["res2_conv1"], p["res2_conv2"], x)
    if size is None:
        size = (x.shape[-2] * 2, x.shape[-1] * 2)
    x = bilinear_align_corners(x, size)
    return conv2d(p["out_conv"]["kernel"], p["out_conv"]["bias"], x,
                  padding=((0, 0), (0, 0)))


def dpt_stage1_project(p: Dict, cfg: DPTHeadConfig,
                       aggregated_tokens: List[jnp.ndarray],
                       spatial_hw: Tuple[int, int],
                       patch_start_idx: int) -> List[jnp.ndarray]:
    """Per-tap projection + spatial resize pyramid; per-frame independent.
    Returns 4 feature levels, each (B, C_l, S, h_l, w_l)."""
    ph, pw = spatial_hw
    H = ph * cfg.patch_size
    W = pw * cfg.patch_size
    B = aggregated_tokens[0].shape[0]
    S = aggregated_tokens[0].shape[1]
    feats = []
    for dpt_idx, layer_idx in enumerate(cfg.intermediate_layer_idx):
        x = aggregated_tokens[layer_idx][:, :, patch_start_idx:]
        x = x.reshape(B * S, ph * pw, cfg.dim_in)
        x = layer_norm(x, p["norm"], 1e-5)
        x = x.transpose(0, 2, 1).reshape(B * S, cfg.dim_in, ph, pw)
        proj = p["projects"][dpt_idx]
        x = conv2d(proj["kernel"], proj["bias"], x, padding=((0, 0), (0, 0)))
        if cfg.pos_embed:
            pe = jnp.asarray(_pos_embed_2d(x.shape[1], x.shape[2], x.shape[3],
                                           W, H))
            x = x + pe.astype(x.dtype)
        if dpt_idx == 0:
            x = _conv_transpose_same_stride(p["resize0"], x, 4)
        elif dpt_idx == 1:
            x = _conv_transpose_same_stride(p["resize1"], x, 2)
        elif dpt_idx == 3:
            x = conv2d(p["resize3"]["kernel"], p["resize3"]["bias"], x,
                       stride=(2, 2), padding=((1, 1), (1, 1)))
        feats.append(x.reshape(B, S, *x.shape[1:]).transpose(0, 2, 1, 3, 4))
    return feats


def dpt_stage2_upsample(p: Dict, feats: List[jnp.ndarray]
                        ) -> List[jnp.ndarray]:
    """Temporal 4x upsample per pyramid level (S -> 1 + 4*(S-1)); the only
    frame-coupled stage (causal convs over S)."""
    return [wan_vae_dpt_upsampler(p["temporal_upsamplers"][i], feats[i])
            for i in range(4)]


def dpt_stage3_fuse(p: Dict, cfg: DPTHeadConfig, outs: List[jnp.ndarray],
                    spatial_hw: Tuple[int, int]):
    """Scratch fusion + output head; strictly per-frame (pure 2D convs over
    (B*T, C, h, w)), so callers may chunk the frame axis of `outs` and
    concatenate -- bit-identical to one call (bench.py relies on this: the
    monolithic 81-frame graph crashes this platform's remote-compile
    helper). Returns feature map (B, T, C, h, w) if cfg.feature_only else
    (preds, conf)."""
    ph, pw = spatial_hw
    H = ph * cfg.patch_size
    W = pw * cfg.patch_size
    B = outs[0].shape[0]
    T_out = outs[0].shape[2]

    def to2d(x):
        return x.transpose(0, 2, 1, 3, 4).reshape(B * T_out, *x.shape[1:2] + x.shape[3:])

    l1, l2, l3, l4 = (to2d(o) for o in outs)
    rn = [conv2d(p["layer_rn"][i]["kernel"], None, x)
          for i, x in enumerate((l1, l2, l3, l4))]
    out = _fusion_block(p["refinenet4"], rn[3], size=rn[2].shape[-2:])
    out = _fusion_block(p["refinenet3"], out, rn[2], size=rn[1].shape[-2:])
    out = _fusion_block(p["refinenet2"], out, rn[1], size=rn[0].shape[-2:])
    out = _fusion_block(p["refinenet1"], out, rn[0])
    out = conv2d(p["output_conv1"]["kernel"], p["output_conv1"]["bias"], out)

    out = bilinear_align_corners(out, (H // cfg.down_ratio, W // cfg.down_ratio))
    if cfg.feature_only:
        # (B, T_out, features, H/d, W/d) -- dpt_head.py:256-257
        return out.reshape(B, T_out, *out.shape[1:])
    if cfg.pos_embed:
        pe = jnp.asarray(_pos_embed_2d(out.shape[1], out.shape[2],
                                       out.shape[3], W, H))
        out = out + pe.astype(out.dtype)
    out = conv2d(p["output_conv2_0"]["kernel"], p["output_conv2_0"]["bias"], out)
    out = jax.nn.relu(out.astype(jnp.float32)).astype(out.dtype)
    out = conv2d(p["output_conv2_2"]["kernel"], p["output_conv2_2"]["bias"],
                 out, padding=((0, 0), (0, 0)))

    preds, conf = activate_head(out, cfg.activation, cfg.conf_activation)
    preds = preds.reshape(B, T_out, *preds.shape[1:])
    conf = conf.reshape(B, T_out, *conf.shape[1:])
    return preds, conf


def dpt_head_forward(p: Dict, cfg: DPTHeadConfig,
                     aggregated_tokens: List[jnp.ndarray],
                     spatial_hw: Tuple[int, int],
                     patch_start_idx: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """aggregated_tokens: per-layer (B, S, P, dim_in); returns
    (preds (B, T_out, H, W, output_dim-1), conf (B, T_out, H, W)) with
    T_out = 1 + 4*(S-1) and H = spatial_h * patch_size.
    (reference dpt_head.py DPTHead_3D_Causal.forward; staged here so large
    single-chip graphs can run the per-frame stage 3 in frame chunks)."""
    feats = dpt_stage1_project(p, cfg, aggregated_tokens, spatial_hw,
                               patch_start_idx)
    outs = dpt_stage2_upsample(p, feats)
    return dpt_stage3_fuse(p, cfg, outs, spatial_hw)
