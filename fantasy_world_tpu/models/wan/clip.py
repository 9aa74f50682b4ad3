"""open-CLIP XLM-RoBERTa ViT-H/14 visual tower, TPU-native.

Re-design of the image branch of wan_video_image_encoder.py (VisionTrans-
former:386-479, clip_xlm_roberta_vit_h_14:822-850): patch conv (no bias,
pre-norm variant), cls token, learned position embedding, 32 pre-norm
attention blocks with exact-GELU MLPs -- the Wan pipeline consumes the
penultimate (31-block) output tokens (encode_image use_31_block=True,
:864-880), i.e. 257 tokens of width 1280 per image.

Only the visual tower exists in the Wan checkpoint; the text tower is
never loaded or used.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...core.params import prng_split, init_linear, init_layernorm, np_normal
from ...ops.attention import dot_product_attention
from ...ops.norms import layer_norm

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: int = 4
    num_heads: int = 16
    num_layers: int = 32
    norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def init_clip_vision(rng, cfg: CLIPVisionConfig, dtype=jnp.bfloat16) -> Dict:
    rs = prng_split(rng, cfg.num_layers + 4)
    gain = 1.0 / np.sqrt(cfg.dim)

    def block(r):
        rr = prng_split(r, 4)
        return {
            "norm1": init_layernorm(cfg.dim, dtype=dtype),
            "attn": {"to_qkv": init_linear(rr[0], cfg.dim, cfg.dim * 3,
                                           dtype=dtype),
                     "proj": init_linear(rr[1], cfg.dim, cfg.dim, dtype=dtype)},
            "norm2": init_layernorm(cfg.dim, dtype=dtype),
            "mlp": {"fc1": init_linear(rr[2], cfg.dim,
                                       cfg.dim * cfg.mlp_ratio, dtype=dtype),
                    "fc2": init_linear(rr[3], cfg.dim * cfg.mlp_ratio,
                                       cfg.dim, dtype=dtype)},
        }

    return {
        "patch_embedding": {  # conv kernel==stride -> matmul; no bias
            "kernel": np_normal(rs[0], (3 * cfg.patch_size ** 2, cfg.dim),
                                gain, dtype),
        },
        "cls_embedding": np_normal(rs[1], (1, 1, cfg.dim), gain, dtype),
        "pos_embedding": np_normal(rs[2], (1, cfg.num_patches + 1, cfg.dim),
                                   gain, dtype),
        "pre_norm": init_layernorm(cfg.dim, dtype=dtype),
        "blocks": [block(rs[3 + i]) for i in range(cfg.num_layers)],
    }


def _linear(p, x):
    y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _block_apply(p, cfg: CLIPVisionConfig, x):
    h = layer_norm(x, p["norm1"], cfg.norm_eps)
    qkv = _linear(p["attn"]["to_qkv"], h)
    B, L, _ = x.shape
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = cfg.dim // cfg.num_heads
    o = dot_product_attention(q.reshape(B, L, cfg.num_heads, hd),
                              k.reshape(B, L, cfg.num_heads, hd),
                              v.reshape(B, L, cfg.num_heads, hd))
    x = x + _linear(p["attn"]["proj"], o.reshape(B, L, cfg.dim))
    h = layer_norm(x, p["norm2"], cfg.norm_eps)
    h = _linear(p["mlp"]["fc2"],
                jax.nn.gelu(_linear(p["mlp"]["fc1"], h), approximate=False))
    return x + h


def clip_encode_image(p: Dict, cfg: CLIPVisionConfig, images: jnp.ndarray,
                      use_31_block: bool = True) -> jnp.ndarray:
    """images: (B, 3, H, W) already resized to 224 and CLIP-normalized.
    Returns (B, 257, 1280) penultimate tokens (the y-branch conditioning)."""
    B, C, H, W = images.shape
    ps = cfg.patch_size
    x = images.reshape(B, C, H // ps, ps, W // ps, ps)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, (H // ps) * (W // ps),
                                              C * ps * ps)
    x = _linear(p["patch_embedding"], x)
    cls = jnp.broadcast_to(p["cls_embedding"].astype(x.dtype),
                           (B, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embedding"].astype(x.dtype)
    x = layer_norm(x, p["pre_norm"], cfg.norm_eps)
    n = cfg.num_layers - 1 if use_31_block else cfg.num_layers
    for blk in p["blocks"][:n]:
        x = _block_apply(blk, cfg, x)
    return x


def preprocess_image(image: jnp.ndarray) -> jnp.ndarray:
    """CLIP preprocessing matching encode_image (wan_video_image_encoder.py:
    864-880): (B, 3, H, W) in [-1, 1] -> float bicubic resize to 224 (no
    antialias, half-pixel centers, torch Keys kernel a=-0.75) -> [0, 1]
    -> CLIP normalization.

    The resize runs as two torch-exact resample matmuls
    (ops/bicubic.bicubic_matrix): jax.image.resize's 'bicubic' is
    Catmull-Rom (a=-0.5), a different negative lobe than torch
    F.interpolate's a=-0.75, which would shift every CLIP conditioning
    token off the reference."""
    from ...ops.bicubic import bicubic_matrix
    H, W = image.shape[-2:]
    ah = jnp.asarray(bicubic_matrix(H, 224), jnp.float32)
    aw = jnp.asarray(bicubic_matrix(W, 224), jnp.float32)
    # precision='highest': on TPU the default f32 einsum truncates to
    # bf16 passes (7.7e-3 error vs torch, measured); full-f32 keeps the
    # resize at 2e-4 of the torch oracle and the op is negligible
    x = jnp.einsum("oh,bchw,pw->bcop", ah, image.astype(jnp.float32), aw,
                   precision="highest")
    x = x * 0.5 + 0.5
    mean = jnp.asarray(CLIP_IMAGE_MEAN)[None, :, None, None]
    std = jnp.asarray(CLIP_IMAGE_STD)[None, :, None, None]
    return (x - mean) / std
