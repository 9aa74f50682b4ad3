"""umT5-XXL text encoder, TPU-native.

Functional re-design of wan_video_text_encoder.py:209-254: 24 pre-norm T5
blocks (unscaled attention + per-layer relative position bias + gated-GELU
FFN), T5 RMS layernorms, final norm. Default config matches the Wan
checkpoint (dim 4096, ffn 10240, 64 heads, 32 buckets, per-layer pos
embedding). The relative-position bucket table is precomputed host-side
(static seq len 512) so the whole encode is one fused jit.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.params import prng_split, prng_fold_in, init_linear, np_normal, np_ones


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    max_dist: int = 128

    @property
    def head_dim(self) -> int:
        return self.dim_attn // self.num_heads


@functools.lru_cache(maxsize=8)
def relative_position_buckets(lq: int, lk: int, num_buckets: int,
                              max_dist: int) -> np.ndarray:
    """Bidirectional T5 buckets (wan_video_text_encoder.py:171-190)."""
    rel = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    large = max_exact + (np.log(np.maximum(rel, 1) / max_exact)
                         / math.log(max_dist / max_exact)
                         * (nb - max_exact)).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(rel < max_exact, rel, large)
    return buckets.astype(np.int32)


def init_t5(rng, cfg: T5Config, dtype=jnp.bfloat16) -> Dict:
    rs = prng_split(rng, cfg.num_layers + 2)

    def block(r):
        rr = prng_split(r, 7)
        return {
            "norm1": {"scale": np_ones((cfg.dim,), dtype)},
            "attn": {
                "q": init_linear(rr[0], cfg.dim, cfg.dim_attn, bias=False,
                                 dtype=dtype),
                "k": init_linear(rr[1], cfg.dim, cfg.dim_attn, bias=False,
                                 dtype=dtype),
                "v": init_linear(rr[2], cfg.dim, cfg.dim_attn, bias=False,
                                 dtype=dtype),
                "o": init_linear(rr[3], cfg.dim_attn, cfg.dim, bias=False,
                                 dtype=dtype),
            },
            "pos_embedding": np_normal(
                rr[6], (cfg.num_buckets, cfg.num_heads),
                (2 * cfg.num_buckets * cfg.num_heads) ** -0.5, dtype),
            "norm2": {"scale": np_ones((cfg.dim,), dtype)},
            "ffn": {
                "gate": init_linear(rr[4], cfg.dim, cfg.dim_ffn, bias=False,
                                    dtype=dtype),
                "fc1": init_linear(prng_fold_in(rr[4], 1), cfg.dim,
                                   cfg.dim_ffn, bias=False, dtype=dtype),
                "fc2": init_linear(rr[5], cfg.dim_ffn, cfg.dim, bias=False,
                                   dtype=dtype),
            },
        }

    return {
        "token_embedding": np_normal(rs[0], (cfg.vocab, cfg.dim),
                                     cfg.dim ** -0.5, dtype),
        "blocks": [block(rs[1 + i]) for i in range(cfg.num_layers)],
        "norm": {"scale": np_ones((cfg.dim,), dtype)},
    }


def _t5_norm(p, x, eps=1e-6):
    xf = x.astype(jnp.float32)
    y = x * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps
                          ).astype(x.dtype)
    return p["scale"].astype(x.dtype) * y


def _linear(p, x):
    return jnp.dot(x, p["kernel"],
                   preferred_element_type=jnp.float32).astype(x.dtype)


def _t5_gelu(x):
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi)
                                   * (xf + 0.044715 * xf ** 3)))
    return y.astype(x.dtype)


def _t5_attention(p, cfg: T5Config, x, pos_bias, mask):
    B, L, _ = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    q = _linear(p["q"], x).reshape(B, L, H, D)
    k = _linear(p["k"], x).reshape(B, L, H, D)
    v = _linear(p["v"], x).reshape(B, L, H, D)
    # T5 attention is unscaled with an additive bias; the bias rules out the
    # plain flash kernel here, but L=512 keeps the full logits tiny.
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits + pos_bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :] == 0, -1e30, logits)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return _linear(p["o"], o.reshape(B, L, H * D))


def t5_encode(p: Dict, cfg: T5Config, ids: jnp.ndarray,
              mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """ids: (B, L) int32 -> (B, L, dim) final-normed hidden states."""
    x = p["token_embedding"][ids]
    L = ids.shape[1]
    buckets = jnp.asarray(relative_position_buckets(
        L, L, cfg.num_buckets, cfg.max_dist))
    for blk in p["blocks"]:
        pos_bias = blk["pos_embedding"][buckets]            # (L, L, H)
        pos_bias = pos_bias.transpose(2, 0, 1)[None]         # (1, H, L, L)
        x = x + _t5_attention(blk["attn"], cfg, _t5_norm(blk["norm1"], x),
                              pos_bias, mask)
        h = _t5_norm(blk["norm2"], x)
        h = _linear(blk["ffn"]["fc2"],
                    _linear(blk["ffn"]["fc1"], h)
                    * _t5_gelu(_linear(blk["ffn"]["gate"], h)))
        x = x + h
    return _t5_norm(p["norm"], x)
