"""Bidirectional cross-modal attention between the DiT and VGGT streams.

Re-design of CrossModalityBiAttentionBlock / BiMultiHeadAttention
(fusion/layer/block.py:146-221, 316-625, inference 'sdpa' path): one shared
q/k projection pair drives attention in both directions --

    dx1 = softmax(q k^T / sqrt(d)) @ v2      (video attends geometry)
    dx2 = softmax(k q^T / sqrt(d)) @ v1      (geometry attends video)

with Wan-style interleaved RoPE on q (DiT 3D frequencies) and k (aggregator
frequencies with 5 unit-rotation special tokens per frame), zero-init
per-channel gates on both residuals. On TPU both directions lower to the
same Pallas flash-attention kernel with q/k swapped.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...core.params import prng_split, prng_fold_in, init_linear, np_zeros
from ...ops import rope as rope_ops
from ...ops.attention import dot_product_attention
from ...ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class BicrossConfig:
    m1_dim: int = 5120       # DiT stream
    m2_dim: int = 1024       # aggregator stream
    hidden: int = 1152
    num_heads: int = 12

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads


def init_bicross(rng, cfg: BicrossConfig, dtype=jnp.bfloat16) -> Dict:
    rs = prng_split(rng, 6)
    return {
        "m1_proj": init_linear(rs[0], cfg.m1_dim, cfg.hidden, dtype=dtype),
        "m2_proj": init_linear(rs[1], cfg.m2_dim, cfg.hidden, dtype=dtype),
        "values_m1_proj": init_linear(rs[2], cfg.m1_dim, cfg.hidden, dtype=dtype),
        "values_m2_proj": init_linear(rs[3], cfg.m2_dim, cfg.hidden, dtype=dtype),
        "out_m1_proj": init_linear(rs[4], cfg.hidden, cfg.m1_dim, dtype=dtype),
        "out_m2_proj": init_linear(rs[5], cfg.hidden, cfg.m2_dim, dtype=dtype),
        "gamma_m1": np_zeros((cfg.m1_dim,), dtype),
        "gamma_m2": np_zeros((cfg.m2_dim,), dtype),
    }


def _linear(p, x):
    y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _heads(x, n):
    b, l, d = x.shape
    return x.reshape(b, l, n, d // n)


def bicross_apply(p: Dict, cfg: BicrossConfig, x1: jnp.ndarray,
                  x2: jnp.ndarray, rope_dit: Tuple, rope_agg: Tuple
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x1: (B, L1, m1_dim) DiT tokens; x2: (B, L2, m2_dim) agg tokens.
    rope_*: (cos, sin) tables. Returns the gated-residual-updated streams."""
    n = cfg.num_heads
    x1n = layer_norm(x1, None, 1e-6)
    x2n = layer_norm(x2, None, 1e-6)

    q = _heads(_linear(p["m1_proj"], x1n), n)
    k = _heads(_linear(p["m2_proj"], x2n), n)
    q = rope_ops.apply_rope_interleaved(q, *rope_dit)
    k = rope_ops.apply_rope_interleaved(k, *rope_agg)
    v1 = _heads(_linear(p["values_m1_proj"], x1n), n)
    v2 = _heads(_linear(p["values_m2_proj"], x2n), n)

    o1 = dot_product_attention(q, k, v2)
    o2 = dot_product_attention(k, q, v1)

    dx1 = _linear(p["out_m1_proj"], o1.reshape(x1.shape[0], -1, cfg.hidden))
    dx2 = _linear(p["out_m2_proj"], o2.reshape(x2.shape[0], -1, cfg.hidden))
    x1 = x1 + (p["gamma_m1"].astype(jnp.float32)
               * dx1.astype(jnp.float32)).astype(x1.dtype)
    x2 = x2 + (p["gamma_m2"].astype(jnp.float32)
               * dx2.astype(jnp.float32)).astype(x2.dtype)
    return x1, x2
