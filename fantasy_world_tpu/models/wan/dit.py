"""Wan video diffusion transformer (DiT), TPU-native.

Functional re-design of the reference WanModel
(diffsynth_wan21/models/wan_video_dit.py:361-527) and DiTBlock (:254-321):

  * every module is (init, apply) over an explicit param pytree;
  * the reference's ``return_partial`` / ``run_remaining`` flags become two
    pure functions -- ``dit_block_attn_half`` and ``dit_block_ffn_half`` --
    which is exactly what the IRG fusion loop needs;
  * patchify is a reshape + matmul (a stride==kernel Conv3d is a linear map
    per patch), which lands directly on the MXU instead of a conv kernel;
  * the per-layer camera AdaLN adapter (camera_control.py:81-148,
    pose_inject_method='adaln') is folded into the cross-attention apply as
    optional params -- blocks without an adapter simply omit them.

Weight-layout contract (enforced by the checkpoint converter):
linears are (in, out); patch_embedding kernel is ((c*pt*ph*pw), dim) with
input patch features flattened in (c, dt, dy, dx) order.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.params import (prng_split, init_linear, init_layernorm, init_rmsnorm,
                            np_normal, np_zeros)
from ...ops import rope as rope_ops
from ...ops.attention import dot_product_attention
from ...ops.norms import rms_norm, layer_norm, layer_norm_modulate, modulate

PyTree = Any


@dataclasses.dataclass(frozen=True)
class WanDiTConfig:
    dim: int = 5120
    in_dim: int = 36
    ffn_dim: int = 13824
    out_dim: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    eps: float = 1e-6
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    num_heads: int = 40
    num_layers: int = 40
    has_image_input: bool = True
    has_image_pos_emb: bool = False
    # wan2.2 flags (diffsynth_wan22 WanModel): y-latent concat and CLIP
    # context are independent there -- Fun-Control-Camera keeps the VAE
    # embedding but drops CLIP (hash 47dbeab5..., wan22 wan_video_dit.py:841)
    require_vae_embedding: bool = True
    # TI2V-5B-style first-frame latent fusion (wan22 WanModel flag; consumed
    # by pipelines/units.py ImageEmbedderFused, which overwrites latent
    # frame 0 with the VAE encoding of the input image)
    fuse_vae_embedding_in_latents: bool = False
    # TI2V-5B per-token timestep: when the clean first-frame latent is fused
    # into the sequence, frame-0 tokens are conditioned on t=0 and the rest
    # on the scalar step t (wan22 wan_video_dit.py:342, hash 1f5ab770...;
    # model_fn wan_video_new.py:1555-1566)
    seperated_timestep: bool = False
    add_control_adapter: bool = False
    in_dim_control_adapter: int = 24
    # per-layer camera AdaLN adapters on cross-attn of blocks [0, adapter_end)
    # (reference installs processors on blocks <= 24: wan_video_dit.py:515)
    camera_adapter_end: int = 0
    # 'adaln' (shipped config) | 'latent_split' | 'latent_overall'
    # (camera_control.py:66-79 get_processor variants)
    pose_inject_method: str = "adaln"
    plucker_dim: int = 2048
    # CLIP image-token width feeding img_emb (production ViT-H/14: 1280);
    # configurable so reduced demo bundles can pair a narrow CLIP tower
    clip_feature_dim: int = 1280

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    def has_adapter(self, layer: int) -> bool:
        return layer < self.camera_adapter_end


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_mlp2(rng, d_in, d_mid, d_out, dtype):
    r1, r2 = prng_split(rng)
    return {"fc1": init_linear(r1, d_in, d_mid, dtype=dtype),
            "fc2": init_linear(r2, d_mid, d_out, dtype=dtype)}


def _init_attn(rng, dim, dtype, image_kv=False):
    rs = prng_split(rng, 6)
    p = {
        "q": init_linear(rs[0], dim, dim, dtype=dtype),
        "k": init_linear(rs[1], dim, dim, dtype=dtype),
        "v": init_linear(rs[2], dim, dim, dtype=dtype),
        "o": init_linear(rs[3], dim, dim, dtype=dtype),
        "norm_q": init_rmsnorm(dim, dtype=dtype),
        "norm_k": init_rmsnorm(dim, dtype=dtype),
    }
    if image_kv:
        p["k_img"] = init_linear(rs[4], dim, dim, dtype=dtype)
        p["v_img"] = init_linear(rs[5], dim, dim, dtype=dtype)
        p["norm_k_img"] = init_rmsnorm(dim, dtype=dtype)
    return p


def _init_camera_adapter(rng, cfg: WanDiTConfig, dtype):
    """Pose adapter (camera_control.py:24-79). 'adaln': GroupLinearDualK is
    a linear on the plucker stream plus a 2-layer MLP on the hidden stream;
    GroupLinearDualV maps the combined stream to a zero-init shift.
    'latent_split'/'latent_overall': zero-init bias-free k/v projections
    feeding a decoupled cross attention."""
    rs = prng_split(rng, 5)
    c, d = cfg.plucker_dim, cfg.dim
    if cfg.pose_inject_method in ("latent_split", "latent_overall"):
        return {"k_proj": {"kernel": np_zeros((c, d), dtype)},
                "v_proj": {"kernel": np_zeros((c, d), dtype)}}
    mid_k = min(d, c) // 2            # 1024
    mid_v = c // 5                    # 409
    return {
        "k_group1": init_linear(rs[0], c, c, dtype=dtype),
        "k_group2": {"fc1": init_linear(rs[1], d, mid_k, dtype=dtype),
                     "fc2": init_linear(rs[2], mid_k, c, dtype=dtype)},
        "v_group2": {"fc1": init_linear(rs[3], c, mid_v, dtype=dtype),
                     "fc2": {"kernel": np_zeros((mid_v, d), dtype),
                             "bias": np_zeros((d,), dtype)}},
    }


def init_dit_block(rng, cfg: WanDiTConfig, layer: int, dtype=jnp.bfloat16) -> Dict:
    rs = prng_split(rng, 6)
    p = {
        "self_attn": _init_attn(rs[0], cfg.dim, dtype),
        "cross_attn": _init_attn(rs[1], cfg.dim, dtype,
                                 image_kv=cfg.has_image_input),
        "norm3": init_layernorm(cfg.dim, dtype=dtype),
        "ffn": _init_mlp2(rs[2], cfg.dim, cfg.ffn_dim, cfg.dim, dtype),
        "modulation": np_normal(rs[3], (1, 6, cfg.dim),
                                1.0 / math.sqrt(cfg.dim), dtype),
    }
    if cfg.has_adapter(layer):
        p["camera"] = _init_camera_adapter(rs[4], cfg, dtype)
    return p


def init_wan_dit(rng, cfg: WanDiTConfig, dtype=jnp.bfloat16) -> Dict:
    rs = prng_split(rng, 8 + cfg.num_layers)
    patch_in = cfg.in_dim * int(np.prod(cfg.patch_size))
    p = {
        "patch_embedding": init_linear(rs[0], patch_in, cfg.dim, dtype=dtype),
        "text_embedding": _init_mlp2(rs[1], cfg.text_dim, cfg.dim, cfg.dim, dtype),
        "time_embedding": _init_mlp2(rs[2], cfg.freq_dim, cfg.dim, cfg.dim, dtype),
        "time_projection": init_linear(rs[3], cfg.dim, cfg.dim * 6, dtype=dtype),
        "head": {
            "head": init_linear(rs[4], cfg.dim,
                                cfg.out_dim * int(np.prod(cfg.patch_size)),
                                dtype=dtype),
            "modulation": np_normal(rs[5], (1, 2, cfg.dim),
                                    1.0 / math.sqrt(cfg.dim), dtype),
        },
        "blocks": [init_dit_block(rs[8 + i], cfg, i, dtype)
                   for i in range(cfg.num_layers)],
    }
    if cfg.has_image_input:
        r6a, r6b = prng_split(rs[6])
        fd = cfg.clip_feature_dim
        # reference MLP(1280, dim): LN(fd) -> Linear(fd, fd) -> GELU ->
        # Linear(fd, dim) -> LN(dim)  (wan_video_dit.py:324-333)
        p["img_emb"] = {
            "norm_in": init_layernorm(fd, dtype=dtype),
            "fc1": init_linear(r6a, fd, fd, dtype=dtype),
            "fc2": init_linear(r6b, fd, cfg.dim, dtype=dtype),
            "norm_out": init_layernorm(cfg.dim, dtype=dtype),
        }
        if cfg.has_image_pos_emb:
            p["img_emb"]["emb_pos"] = np_zeros((1, 514, fd), dtype)
    if cfg.add_control_adapter:
        r7 = prng_split(rs[7], 3)
        cin = cfg.in_dim_control_adapter * 64
        p["control_adapter"] = {
            "conv": {"kernel": np_normal(r7[0], (cfg.dim, cin, 2, 2),
                                         (cin * 4) ** -0.5, dtype),
                     "bias": np_zeros((cfg.dim,), dtype)},
            "residual_blocks": [{
                "conv1": {"kernel": np_normal(r7[1], (cfg.dim, cfg.dim, 3, 3),
                                              (cfg.dim * 9) ** -0.5, dtype),
                          "bias": np_zeros((cfg.dim,), dtype)},
                "conv2": {"kernel": np_normal(r7[2], (cfg.dim, cfg.dim, 3, 3),
                                              (cfg.dim * 9) ** -0.5, dtype),
                          "bias": np_zeros((cfg.dim,), dtype)},
            }],
        }
    return p


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

# core.params.linear: f32-accum matmul with int8/fp8 dispatch when the
# param dict was rewritten by core.quant.quantize_tree.
from ...core.params import linear as _linear  # noqa: E402


def _gelu_tanh_mlp(p, x):
    return _linear(p["fc2"], jax.nn.gelu(_linear(p["fc1"], x), approximate=True))


def _split_heads(x, num_heads):
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads)


def _merge_heads(x):
    b, l, h, d = x.shape
    return x.reshape(b, l, h * d)


def self_attention(p, x, rope_cos, rope_sin, num_heads, eps=1e-6):
    """RMS-normed q/k with 3D RoPE (wan_video_dit.py:159-182)."""
    q = rms_norm(_linear(p["q"], x), p["norm_q"]["scale"], eps)
    k = rms_norm(_linear(p["k"], x), p["norm_k"]["scale"], eps)
    v = _linear(p["v"], x)
    # permutation-folded half-split rope: the converters de-interleave the
    # q/k projection columns, so the contiguous rotate-half form applies
    # (ops/rope.py apply_rope_half)
    q = rope_ops.apply_rope_half(_split_heads(q, num_heads), rope_cos, rope_sin)
    k = rope_ops.apply_rope_half(_split_heads(k, num_heads), rope_cos, rope_sin)
    o = dot_product_attention(q, k, _split_heads(v, num_heads))
    return _linear(p["o"], _merge_heads(o))


def cross_attention(p, x, context, num_heads, *, has_image_input, eps=1e-6,
                    plucker_fea=None, apply_pose=False, camera=None,
                    pose_inject_method="adaln", pose_scale=1.0,
                    plucker_frames=None):
    """Text (+image) cross attention with optional camera pose injection
    (CrossAttentionProcessor wan_video_dit.py:185-201; the 'adaln',
    'latent_split' and 'latent_overall' branches of
    camera_control.py:92-148 applied before the output proj)."""
    if has_image_input:
        img, ctx = context[:, :257], context[:, 257:]
    else:
        ctx = context
    q = rms_norm(_linear(p["q"], x), p["norm_q"]["scale"], eps)
    k = rms_norm(_linear(p["k"], ctx), p["norm_k"]["scale"], eps)
    v = _linear(p["v"], ctx)
    qh = _split_heads(q, num_heads)
    o = dot_product_attention(qh, _split_heads(k, num_heads),
                              _split_heads(v, num_heads))
    o = _merge_heads(o)
    if has_image_input:
        k_img = rms_norm(_linear(p["k_img"], img), p["norm_k_img"]["scale"], eps)
        v_img = _linear(p["v_img"], img)
        o_img = dot_product_attention(qh, _split_heads(k_img, num_heads),
                                      _split_heads(v_img, num_heads))
        o = o + _merge_heads(o_img)

    if camera is None:
        camera = p.get("camera")
    if apply_pose and camera is not None and plucker_fea is not None:
        cam = camera
        if pose_inject_method == "adaln":
            plucker_proj = _linear(cam["k_group1"], plucker_fea)
            hidden = _linear(cam["k_group2"]["fc2"],
                             jax.nn.relu(_linear(cam["k_group2"]["fc1"], o)))
            combined = hidden + plucker_proj
            shift = _linear(cam["v_group2"]["fc2"],
                            jax.nn.relu(_linear(cam["v_group2"]["fc1"],
                                                combined)))
            # GroupLinearDualV returns scale=0 identically
            # (camera_control.py:61), so the modulation reduces to an
            # additive shift; all-zero plucker (training-time camera
            # dropout) gates it off entirely (camera_control.py:113, 124)
            nonzero = jnp.any(plucker_fea != 0).astype(shift.dtype)
            o = o + shift * (pose_scale * nonzero)
        elif pose_inject_method in ("latent_split", "latent_overall"):
            # decoupled cross-attn onto zero-init projected plucker tokens,
            # per latent frame ('latent_split') or over the full sequence
            # ('latent_overall'), camera_control.py:129-145
            ip_k = _linear(cam["k_proj"], plucker_fea)
            ip_v = _linear(cam["v_proj"], plucker_fea)
            if pose_inject_method == "latent_split":
                B, Lq, D = q.shape
                f = plucker_frames
                pq = q.reshape(B * f, Lq // f, D)
                pk = ip_k.reshape(B * f, -1, D)
                pv = ip_v.reshape(B * f, -1, D)
            else:
                pq, pk, pv = q, ip_k, ip_v
            pose_x = dot_product_attention(
                _split_heads(pq, num_heads), _split_heads(pk, num_heads),
                _split_heads(pv, num_heads))
            pose_x = _merge_heads(pose_x).reshape(q.shape)
            o = o + pose_x * pose_scale
        else:                                          # pragma: no cover
            raise NotImplementedError(pose_inject_method)
    return _linear(p["o"], o)


def dit_block_modulation(p, t_mod):
    """(1,6,dim) table + per-sample t_mod (B,6,dim) -> six (B,1,dim)
    modifiers; per-token t_mod (B,L,6,dim) -> six (B,L,dim) (TI2V-5B
    seperated_timestep, wan22 wan_video_dit.py:264-265 broadcast)."""
    table = p["modulation"].astype(jnp.float32)
    if t_mod.ndim == 4:
        m = table[:, None] + t_mod.astype(jnp.float32)
        return [m[:, :, i] for i in range(6)]
    m = table + t_mod.astype(jnp.float32)
    return [m[:, i:i + 1] for i in range(6)]


def dit_block_attn_half(p, x, context, t_mod, rope_cos, rope_sin,
                        cfg: WanDiTConfig, *, plucker_fea=None,
                        apply_pose=False, eps=None, plucker_frames=None):
    """Self-attn + cross-attn portion; returns (x, (shift/scale/gate mlp)).

    Equals the reference DiTBlock.forward(..., return_partial=True)
    (wan_video_dit.py:296-306).
    """
    eps = cfg.eps if eps is None else eps
    sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = dit_block_modulation(p, t_mod)
    xd = x.dtype
    h = layer_norm_modulate(x, sh_msa, sc_msa, None, eps)
    x = x + (g_msa * self_attention(p["self_attn"], h, rope_cos, rope_sin,
                                    cfg.num_heads, eps).astype(jnp.float32)).astype(xd)
    x = x + cross_attention(p["cross_attn"], layer_norm(x, p["norm3"], eps),
                            context, cfg.num_heads,
                            has_image_input=cfg.has_image_input, eps=eps,
                            plucker_fea=plucker_fea, apply_pose=apply_pose,
                            camera=p.get("camera"),
                            pose_inject_method=cfg.pose_inject_method,
                            plucker_frames=plucker_frames)
    return x, (sh_mlp, sc_mlp, g_mlp)


def dit_block_ffn_half(p, x, modifiers, cfg: WanDiTConfig, eps=None):
    """FFN portion given saved modifiers -- DiTBlock run_remaining
    (wan_video_dit.py:288-294)."""
    eps = cfg.eps if eps is None else eps
    sh_mlp, sc_mlp, g_mlp = modifiers
    xd = x.dtype
    h = layer_norm_modulate(x, sh_mlp, sc_mlp, None, eps)
    return x + (g_mlp * _gelu_tanh_mlp(p["ffn"], h).astype(jnp.float32)).astype(xd)


def dit_block_apply(p, x, context, t_mod, rope_cos, rope_sin,
                    cfg: WanDiTConfig, *, plucker_fea=None, apply_pose=False,
                    plucker_frames=None):
    x, mods = dit_block_attn_half(p, x, context, t_mod, rope_cos, rope_sin,
                                  cfg, plucker_fea=plucker_fea,
                                  apply_pose=apply_pose,
                                  plucker_frames=plucker_frames)
    return dit_block_ffn_half(p, x, mods, cfg)


# ---------------------------------------------------------------------------
# embeddings / patchify / head
# ---------------------------------------------------------------------------

def time_embedding(p, cfg: WanDiTConfig, timestep):
    """sinusoidal -> MLP(silu); t_mod = silu -> linear.

    timestep (B,)   -> t (B, dim),    t_mod (B, 6, dim)
    timestep (B, L) -> t (B, L, dim), t_mod (B, L, 6, dim)  (per-token
    TI2V-5B seperated_timestep path, wan22 wan_video_new.py:1555-1566)."""
    per_token = timestep.ndim == 2
    flat_t = timestep.reshape(-1) if per_token else timestep
    emb = rope_ops.sinusoidal_embedding_1d(cfg.freq_dim, flat_t)
    if per_token:
        emb = emb.reshape(*timestep.shape, cfg.freq_dim)
    emb = emb.astype(p["time_embedding"]["fc1"]["kernel"].dtype)
    t = _linear(p["time_embedding"]["fc2"],
                jax.nn.silu(_linear(p["time_embedding"]["fc1"], emb)))
    t_mod = _linear(p["time_projection"], jax.nn.silu(t))
    return t, t_mod.reshape(*t.shape[:-1], 6, cfg.dim)


def text_embedding(p, x):
    return _gelu_tanh_mlp(p["text_embedding"], x)


def img_embedding(p, clip_feature):
    """CLIP tokens -> dim (MLP with exact GELU, wan_video_dit.py:324-341)."""
    ie = p["img_emb"]
    x = clip_feature
    if "emb_pos" in ie:
        x = x + ie["emb_pos"].astype(x.dtype)
    x = layer_norm(x, ie["norm_in"], 1e-5)
    x = _linear(ie["fc2"], jax.nn.gelu(_linear(ie["fc1"], x), approximate=False))
    return layer_norm(x, ie["norm_out"], 1e-5)


def control_adapter_tokens(p, cfg: WanDiTConfig, control_camera_latents):
    """Control-camera adapter output in token space (B, f*h*w, dim).

    The adapter (SimpleAdapter: pixel-unshuffle + stride-2 conv + a
    5120-channel residual block, ~62 TFLOPs at 480x832) consumes ONLY the
    camera trajectory -- it is invariant across denoise steps. The torch
    reference re-evaluates it inside patchify on every one of the 100
    CFG forwards (wan22 wan_video_dit.py WanModel.patchify); pipelines
    here evaluate it once per clip and pass the result to patchify's
    ``control_tokens``, saving ~0.42 s/step at the wan22 geometry."""
    from .camera import simple_adapter_apply
    ctrl = simple_adapter_apply(p["control_adapter"], control_camera_latents)
    B = ctrl.shape[0]
    return ctrl.transpose(0, 2, 3, 4, 1).reshape(B, -1, cfg.dim)


def patchify(p, cfg: WanDiTConfig, x, control_camera_latents=None,
             control_tokens=None):
    """(B, C, F, H, W) -> tokens (B, f*h*w, dim) + grid (f, h, w).

    Stride==kernel Conv3d as reshape+matmul: patch features flattened in
    (c, dt, dy, dx) order to match the converted torch kernel. When the
    wan2.2 control adapter is present, its feature map is added to the
    patch embedding (wan22 wan_video_dit.py WanModel.patchify) -- either
    recomputed from ``control_camera_latents`` (reference-shaped path) or
    taken precomputed from ``control_tokens`` (the hoisted per-clip path,
    see control_adapter_tokens; numerically identical).
    """
    pt, ph, pw = cfg.patch_size
    B, C, F, H, W = x.shape
    f, h, w = F // pt, H // ph, W // pw
    x = x.reshape(B, C, f, pt, h, ph, w, pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)          # B f h w c pt ph pw
    x = x.reshape(B, f * h * w, C * pt * ph * pw)
    tokens = _linear(p["patch_embedding"], x)
    if control_tokens is not None:
        tokens = tokens + control_tokens
    elif control_camera_latents is not None and "control_adapter" in p:
        tokens = tokens + control_adapter_tokens(p, cfg,
                                                 control_camera_latents)
    return tokens, (f, h, w)


def unpatchify(cfg: WanDiTConfig, x, grid):
    f, h, w = grid
    pt, ph, pw = cfg.patch_size
    B = x.shape[0]
    x = x.reshape(B, f, h, w, pt, ph, pw, cfg.out_dim)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
    return x.reshape(B, cfg.out_dim, f * pt, h * ph, w * pw)


def head_apply(p, cfg: WanDiTConfig, x, t):
    hp = p["head"]
    table = hp["modulation"].astype(jnp.float32)
    if t.ndim == 3:                       # per-token t (B, L, dim)
        mod = table[:, None] + t.astype(jnp.float32)[:, :, None]
        shift, scale = mod[:, :, 0], mod[:, :, 1]
    else:
        mod = table + t.astype(jnp.float32)[:, None]
        shift, scale = mod[:, 0:1], mod[:, 1:2]
    h = layer_norm_modulate(x, shift, scale, None, cfg.eps)
    return _linear(hp["head"], h)


# ---------------------------------------------------------------------------
# full forward (standalone DiT; the fusion model drives blocks itself)
# ---------------------------------------------------------------------------

def prepare_inputs(p, cfg: WanDiTConfig, x, timestep, context,
                   clip_feature=None, y=None, fuse_first_frame=False,
                   control_camera_latents=None, control_tokens=None):
    """Shared preamble: embeddings, channel concat, patchify, rope tables.

    fuse_first_frame: TI2V-5B mode -- latent frame 0 holds the CLEAN
    VAE-encoded input image (units.py ImageEmbedderFused), so with
    cfg.seperated_timestep its tokens are conditioned on t=0 while the
    rest use the scalar step (wan22 wan_video_new.py:1555-1566)."""
    B, _, F, H, W = x.shape
    pt, ph, pw = cfg.patch_size
    if cfg.seperated_timestep and fuse_first_frame:
        per_frame = (H // ph) * (W // pw)
        n_tok = (F // pt) * per_frame
        mask0 = (jnp.arange(n_tok) < per_frame)
        timestep = jnp.where(mask0[None], 0.0,
                             timestep.astype(jnp.float32)[:, None])
    t, t_mod = time_embedding(p, cfg, timestep)
    ctx = text_embedding(p, context)
    # wan22 splits the two conditionings (model_fn wan_video_new.py:
    # 1583-1588): y-latent concat and CLIP context are independent flags
    if y is not None and cfg.require_vae_embedding:
        x = jnp.concatenate([x, y], axis=1)
    if clip_feature is not None and cfg.has_image_input:
        ctx = jnp.concatenate([img_embedding(p, clip_feature), ctx], axis=1)
    tokens, grid = patchify(p, cfg, x, control_camera_latents,
                            control_tokens)
    f, h, w = grid
    angles = rope_ops.build_angles_3d(cfg.head_dim, f, h, w)
    cos, sin = rope_ops.cos_sin_half_from_angles(angles)
    return tokens, t, t_mod, ctx, grid, (cos, sin)


def wan_dit_forward(p, cfg: WanDiTConfig, x, timestep, context,
                    clip_feature=None, y=None, plucker_fea=None,
                    fuse_first_frame=False, control_camera_latents=None):
    tokens, t, t_mod, ctx, grid, (cos, sin) = prepare_inputs(
        p, cfg, x, timestep, context, clip_feature, y,
        fuse_first_frame=fuse_first_frame,
        control_camera_latents=control_camera_latents)
    apply_pose = plucker_fea is not None
    for i, bp in enumerate(p["blocks"]):
        tokens = dit_block_apply(
            bp, tokens, ctx, t_mod, cos, sin, cfg,
            plucker_fea=plucker_fea,
            apply_pose=apply_pose and cfg.has_adapter(i),
            plucker_frames=grid[0])
    out = head_apply(p, cfg, tokens, t)
    return unpatchify(cfg, out, grid)
