"""VGGT Aggregator: alternating frame/global attention over Wan features.

Functional re-design of vggt/models/aggregator.py:24-306. In the fusion
model the aggregator never embeds images -- patch tokens arrive as projected
Wan DiT features -- so this module only owns the special tokens, position
grid, and the frame/global block stacks. The standalone alternating loop is
provided for parity/benchmarks; the fusion model drives the halves itself.

Token layout per frame: [camera(1) | register(4) | patch(h*w)], positions
(0,0) for specials and 1-based (y,x) for patches (aggregator.py:179-187).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.params import prng_split, prng_fold_in, init_linear, np_normal
from ...ops import rope as rope_ops
from .blocks import (VGGTBlockConfig, init_vggt_block, vggt_block_apply)


@dataclasses.dataclass(frozen=True)
class AggregatorConfig:
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    qk_norm: bool = True
    rope_freq: float = 100.0
    init_values: float = 0.01

    @property
    def patch_start_idx(self) -> int:
        return 1 + self.num_register_tokens

    @property
    def block_cfg(self) -> VGGTBlockConfig:
        return VGGTBlockConfig(dim=self.embed_dim, num_heads=self.num_heads,
                               mlp_ratio=self.mlp_ratio, qk_norm=self.qk_norm,
                               init_values=self.init_values,
                               rope_frequency=self.rope_freq)


def init_aggregator(rng, cfg: AggregatorConfig, dtype=jnp.bfloat16) -> Dict:
    rs = prng_split(rng, 2 * cfg.depth + 3)
    p = {
        "camera_token": np_normal(rs[0], (1, 2, 1, cfg.embed_dim), 1e-6,
                                  dtype),
        "register_token": np_normal(
            rs[1], (1, 2, cfg.num_register_tokens, cfg.embed_dim), 1e-6,
            dtype),
        "frame_blocks": [init_vggt_block(rs[2 + i], cfg.block_cfg, dtype)
                         for i in range(cfg.depth)],
        "global_blocks": [init_vggt_block(rs[2 + cfg.depth + i],
                                          cfg.block_cfg, dtype)
                          for i in range(cfg.depth)],
        # CamTokenProjector (layers/block.py:276-297); inference passes no
        # camera tokens so this stays at init unless a checkpoint fills it.
        "cam_token_projector": {
            "fc1": init_linear(rs[-1], 36, 128, dtype=dtype),
            "fc2": init_linear(prng_fold_in(rs[-1], 1), 128,
                               cfg.embed_dim, dtype=dtype),
        },
    }
    return p


# core.params.linear: f32-accum matmul with int8/fp8 dispatch when the
# param dict was rewritten by core.quant.quantize_tree.
from ...core.params import linear as _linear  # noqa: E402


def slice_expand_and_flatten(token: jnp.ndarray, B: int, S: int) -> jnp.ndarray:
    """(1, 2, X, C): index 0 for frame 0, index 1 for frames 1..S-1
    -> (B*S, X, C) (aggregator.py:283-306)."""
    first = jnp.broadcast_to(token[:, 0:1], (B, 1) + token.shape[2:])
    rest = jnp.broadcast_to(token[:, 1:2], (B, S - 1) + token.shape[2:])
    out = jnp.concatenate([first, rest], axis=1)
    return out.reshape((B * S,) + token.shape[2:])


def cam_token_projector(p: Dict, cam: jnp.ndarray, embed_dim: int) -> jnp.ndarray:
    """(B, V, 9) pose encodings -> (B*(V+3)//4, 1, C) camera tokens.

    Requires V % 4 == 1 (production V=81): the fixed 3-frame first-view pad
    followed by a (Vp//4, 4, 9) reshape comes verbatim from the reference
    CamTokenProjector (layers/block.py:286-296), whose torch ``.view``
    raises for any other V just like this reshape does."""
    B, V, _ = cam.shape
    pad = jnp.repeat(cam[:, :1], 3, axis=1)
    cam = jnp.concatenate([cam, pad], axis=1)
    Vp = cam.shape[1]
    cam = cam.reshape(B, Vp // 4, 36).reshape(B * (Vp // 4), 36)
    out = _linear(p["fc2"], jax.nn.gelu(_linear(p["fc1"], cam),
                                        approximate=False))
    return out.reshape(-1, 1, embed_dim)


def assemble_tokens(p: Dict, cfg: AggregatorConfig, patch_tokens: jnp.ndarray,
                    camera_token: Optional[jnp.ndarray] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """patch_tokens: (B, S, H, W, C) -> tokens (B*S, P, C), pos (B*S, P, 2).

    Mirrors aggregator._process_aggregator_input (aggregator.py:261-281).
    """
    B, S, H, W, C = patch_tokens.shape
    patches = patch_tokens.reshape(B * S, H * W, C)
    if camera_token is not None:
        cam = cam_token_projector(p["cam_token_projector"], camera_token, C)
    else:
        cam = slice_expand_and_flatten(p["camera_token"], B, S)
    reg = slice_expand_and_flatten(p["register_token"], B, S)
    tokens = jnp.concatenate([cam.astype(patches.dtype),
                              reg.astype(patches.dtype), patches], axis=1)
    pos = jnp.asarray(rope_ops.grid_positions_2d(
        H, W, n_special=cfg.patch_start_idx))
    pos = jnp.broadcast_to(pos[None], (B * S,) + pos.shape)
    return tokens, pos


def frame_attention(p_block: Dict, cfg: AggregatorConfig, tokens, B, S, P, C,
                    pos=None, e0=None):
    """One frame block over (B*S, P, C) tokens; returns (tokens,
    intermediate (B, S, P, C)). ``pos`` may be int positions or a hoisted
    (cos, sin) table pair already in the frame layout."""
    tokens = tokens.reshape(B * S, P, C)
    if pos is None or isinstance(pos, tuple):
        pos_f = pos
    else:
        pos_f = pos.reshape(B * S, P, 2)
    tokens = vggt_block_apply(p_block, cfg.block_cfg, tokens, pos_f, e0)
    return tokens, tokens.reshape(B, S, P, C)


def global_attention(p_block: Dict, cfg: AggregatorConfig, tokens, B, S, P, C,
                     pos=None, e0=None):
    """One global block over (B, S*P, C) tokens. ``pos`` may be int
    positions or a hoisted (cos, sin) table pair in the global layout."""
    tokens = tokens.reshape(B, S * P, C)
    if pos is None or isinstance(pos, tuple):
        pos_g = pos
    else:
        pos_g = pos.reshape(B, S * P, 2)
    tokens = vggt_block_apply(p_block, cfg.block_cfg, tokens, pos_g, e0)
    return tokens, tokens.reshape(B, S, P, C)


def aggregator_forward(p: Dict, cfg: AggregatorConfig,
                       patch_tokens: jnp.ndarray,
                       camera_token: Optional[jnp.ndarray] = None,
                       e0: Optional[jnp.ndarray] = None
                       ) -> Tuple[List[jnp.ndarray], int]:
    """Standalone alternating frame/global loop (aggregator.py:150-213).
    Returns the per-layer (B, S, P, 2C) concatenated intermediates."""
    B, S = patch_tokens.shape[:2]
    tokens, pos = assemble_tokens(p, cfg, patch_tokens, camera_token)
    P, C = tokens.shape[-2:]
    bcfg = cfg.block_cfg
    # hoist the per-block 2D-rope position gather out of the layer loop
    if bcfg.rope_frequency > 0:
        rope_f = rope_ops.rope2d_tables_from_positions(
            pos, bcfg.head_dim, frequency=bcfg.rope_frequency)
        rope_g = tuple(t.reshape(B, S * P, 1, t.shape[-1]) for t in rope_f)
    else:
        rope_f = rope_g = None
    outputs = []
    for i in range(cfg.depth):
        tokens, frame_inter = frame_attention(
            p["frame_blocks"][i], cfg, tokens, B, S, P, C, rope_f, e0)
        tokens, global_inter = global_attention(
            p["global_blocks"][i], cfg, tokens, B, S, P, C, rope_g, e0)
        outputs.append(jnp.concatenate([frame_inter, global_inter], axis=-1))
    return outputs, cfg.patch_start_idx
