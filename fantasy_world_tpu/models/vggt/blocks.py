"""VGGT transformer block (DINOv2-style) with timestep AdaLN, TPU-native.

Functional re-design of vggt/layers/block.py:22-124 and attention.py:21-93:
fused-QKV attention with per-head LayerNorm qk-norm and 2D RoPE, pre-norm
residuals with LayerScale, and the e0 timestep modulation:

    attn input: norm1(x) * (1 + e[1]) + e[0]
    ffn branch: (mlp(norm2(x)) * (1 + e[4]) + e[3]) * e[5]   (after ls2: see
    note -- the reference applies ls2 *inside* before e[5])

As with the DiT, the reference's return_partial/run_remaining flags become
two pure functions (attn_half / ffn_half) for the IRG fusion loop.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...core.params import (prng_split, prng_fold_in, init_linear, init_layernorm, np_normal, np_full)
from ...ops import rope as rope_ops
from ...ops.attention import dot_product_attention
from ...ops.norms import layer_norm, layer_norm_modulate


@dataclasses.dataclass(frozen=True)
class VGGTBlockConfig:
    dim: int = 1024
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qk_norm: bool = True
    init_values: float = 0.01      # LayerScale
    rope_frequency: float = 100.0  # <=0 disables rope (camera-head trunk)
    ln_eps: float = 1e-5           # torch nn.LayerNorm default

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


def init_vggt_block(rng, cfg: VGGTBlockConfig, dtype=jnp.bfloat16,
                    with_modulation: bool = True) -> Dict:
    rs = prng_split(rng, 4)
    hidden = int(cfg.dim * cfg.mlp_ratio)
    p = {
        "norm1": init_layernorm(cfg.dim, dtype=dtype),
        "attn": {
            "qkv": init_linear(rs[0], cfg.dim, cfg.dim * 3, dtype=dtype),
            "proj": init_linear(rs[1], cfg.dim, cfg.dim, dtype=dtype),
        },
        "ls1": {"gamma": np_full((cfg.dim,), cfg.init_values, dtype)},
        "norm2": init_layernorm(cfg.dim, dtype=dtype),
        "mlp": {"fc1": init_linear(rs[2], cfg.dim, hidden, dtype=dtype),
                "fc2": init_linear(rs[3], hidden, cfg.dim, dtype=dtype)},
        "ls2": {"gamma": np_full((cfg.dim,), cfg.init_values, dtype)},
    }
    if cfg.qk_norm:
        p["attn"]["q_norm"] = init_layernorm(cfg.head_dim, dtype=dtype)
        p["attn"]["k_norm"] = init_layernorm(cfg.head_dim, dtype=dtype)
    if with_modulation:
        p["modulation"] = np_normal(prng_fold_in(rng, 7),
                                    (1, 6, cfg.dim),
                                    1.0 / math.sqrt(cfg.dim), dtype)
    return p


# core.params.linear: f32-accum matmul with int8/fp8 dispatch when the
# param dict was rewritten by core.quant.quantize_tree.
from ...core.params import linear as _linear  # noqa: E402


def vggt_attention(p: Dict, cfg: VGGTBlockConfig, x: jnp.ndarray,
                   pos: Optional[jnp.ndarray]) -> jnp.ndarray:
    """x: (B, N, C); pos: (B, N, 2) int positions, a precomputed
    (cos, sin) table pair (rope_ops.rope2d_tables_from_positions -- the
    layer-loop callers hoist the position gather out of the scan), or
    None."""
    B, N, C = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    qkv = _linear(p["qkv"], x).reshape(B, N, 3, H, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if "q_norm" in p:
        q = layer_norm(q, p["q_norm"], cfg.ln_eps)
        k = layer_norm(k, p["k_norm"], cfg.ln_eps)
    if pos is not None and cfg.rope_frequency > 0:
        if isinstance(pos, tuple):
            q = rope_ops.apply_rope_2d_tables(q, *pos)
            k = rope_ops.apply_rope_2d_tables(k, *pos)
        else:
            q = rope_ops.apply_rope_2d(q, pos, frequency=cfg.rope_frequency)
            k = rope_ops.apply_rope_2d(k, pos, frequency=cfg.rope_frequency)
    o = dot_product_attention(q, k, v)
    return _linear(p["proj"], o.reshape(B, N, C))


def modulation_from_e0(p: Dict, e0: Optional[jnp.ndarray], batch: int):
    """(1,6,C) table + e0 -> tuple of six (B',1,C) modifiers, broadcasting
    e0's batch over frame-folded batches (layers/block.py:96-105)."""
    if e0 is None:
        return None
    B = e0.shape[0]
    if B != batch:
        reps = batch // B
        e0 = jnp.repeat(e0[:, None], reps, axis=1).reshape(batch, 6, -1)
    m = p["modulation"].astype(jnp.float32) + e0.astype(jnp.float32)
    return tuple(m[:, i:i + 1] for i in range(6))


def _attn_residual(p, cfg, x, pos, e):
    if e is not None:
        h = layer_norm_modulate(x, e[0], e[1], p["norm1"], cfg.ln_eps)
    else:
        h = layer_norm(x, p["norm1"], cfg.ln_eps)
    return vggt_attention(p["attn"], cfg, h, pos) * p["ls1"]["gamma"].astype(x.dtype)


def _ffn_residual(p, cfg, x, e):
    h = layer_norm(x, p["norm2"], cfg.ln_eps)
    h = _linear(p["mlp"]["fc2"], jax.nn.gelu(_linear(p["mlp"]["fc1"], h),
                                             approximate=False))
    if e is None:
        return h * p["ls2"]["gamma"].astype(x.dtype)
    out = (h.astype(jnp.float32) * (1 + e[4]) + e[3]).astype(x.dtype)
    out = out * p["ls2"]["gamma"].astype(x.dtype)
    return (out.astype(jnp.float32) * e[5]).astype(x.dtype)


def vggt_block_attn_half(p: Dict, cfg: VGGTBlockConfig, x, pos=None, e0=None
                         ) -> Tuple[jnp.ndarray, Any]:
    """Attention residual; returns (x, e_mod) -- Block return_partial."""
    e = modulation_from_e0(p, e0, x.shape[0]) if "modulation" in p else None
    x = x + _attn_residual(p, cfg, x, pos, e)
    return x, e


def vggt_block_ffn_half(p: Dict, cfg: VGGTBlockConfig, x, e) -> jnp.ndarray:
    """FFN residual with saved modifiers -- Block run_remaining."""
    return x + _ffn_residual(p, cfg, x, e)


def vggt_block_apply(p: Dict, cfg: VGGTBlockConfig, x, pos=None, e0=None
                     ) -> jnp.ndarray:
    x, e = vggt_block_attn_half(p, cfg, x, pos, e0)
    return vggt_block_ffn_half(p, cfg, x, e)
