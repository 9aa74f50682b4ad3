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

from ...core.params import prng_split, init_linear, np_zeros
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


# core.params.linear: f32-accum matmul with int8/fp8 dispatch when the
# param dict was rewritten by core.quant.quantize_tree.
from ...core.params import linear as _linear  # noqa: E402


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
    q = rope_ops.apply_rope_half(q, *rope_dit)
    k = rope_ops.apply_rope_half(k, *rope_agg)
    v1 = _heads(_linear(p["values_m1_proj"], x1n), n)
    v2 = _heads(_linear(p["values_m2_proj"], x2n), n)

    o1 = dot_product_attention(q, k, v2)
    o2 = dot_product_attention(k, q, v1)

    dx1 = _linear(p["out_m1_proj"], o1.reshape(x1.shape[0], -1, cfg.hidden))
    dx2 = _linear(p["out_m2_proj"], o2.reshape(x2.shape[0], -1, cfg.hidden))
    return _gated_residual(p, x1, x2, dx1, dx2)


def _gated_residual(p, x1, x2, dx1, dx2):
    x1 = x1 + (p["gamma_m1"].astype(jnp.float32)
               * dx1.astype(jnp.float32)).astype(x1.dtype)
    x2 = x2 + (p["gamma_m2"].astype(jnp.float32)
               * dx2.astype(jnp.float32)).astype(x2.dtype)
    return x1, x2


# ---------------------------------------------------------------------------
# 'temporal' bica_mode (fusion/layer/block.py:200-218, 226-313): window the
# geometry frames into T per-video-frame windows and attend per window.
# ---------------------------------------------------------------------------

def temporal_slice_plan(R: int, window_num: int):
    """Static replay of ``auto_temporal_slice`` for the pad_mask=None case
    (the only way the model ever calls it): distribute R geometry frames
    uniformly over ``window_num`` windows of ``ceil(R/window_num)`` slots.

    Returns (idx, valid): idx (window_num, W) source-frame index per slot
    (0 for padding), valid (window_num, W) bool. The (r, k) formulas are the
    reference's floor arithmetic (block.py:283-291), so slot assignment --
    including the uneven distribution when window_num does not divide R --
    matches exactly.
    """
    import math
    import numpy as np
    W = math.ceil(R / window_num)
    idx = np.zeros((window_num, W), np.int64)
    valid = np.zeros((window_num, W), bool)
    for i in range(R):
        r = int(math.floor(i * window_num / R))
        k = int(math.floor(i - r * R / window_num))
        if k < W and r < window_num:
            idx[r, k] = i
            valid[r, k] = True
    return idx, valid


def bicross_apply_temporal(p: Dict, cfg: BicrossConfig, x1: jnp.ndarray,
                           x2: jnp.ndarray, T: int, S: int, R: int, M: int
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """bica_mode='temporal': x1 (B, T*S, m1) video tokens attend only the
    geometry frames assigned to their temporal window (and vice versa).
    No RoPE -- the reference temporal branch calls the attention without
    freqs (block.py:214).

    Quirk preserved: the reference's pad mask is a NO-OP -- forward_sdpa
    builds ``mask = attention_mask_1 | attention_mask_2`` with the absent
    mask filled with ones (block.py:563-578), so every pair stays
    attendable and padded slots participate as zero-token projections
    (bias-only k/v). We reproduce that exactly; the pad mask's only live
    effect is selecting valid outputs on unslice (block.py:218)."""
    import numpy as np
    B = x1.shape[0]
    n = cfg.num_heads
    x1n = layer_norm(x1, None, 1e-6)
    x2n = layer_norm(x2, None, 1e-6)

    idx, valid = temporal_slice_plan(R, T)
    W = idx.shape[1]
    # window the geometry stream: (B, R, M, C2) -> (B*T, W*M, C2)
    x2f = x2n.reshape(B, R, M, cfg.m2_dim)
    x2w = x2f[:, jnp.asarray(idx.reshape(-1))].reshape(B, T, W, M, cfg.m2_dim)
    x2w = jnp.where(jnp.asarray(valid)[None, :, :, None, None], x2w, 0)
    x2w = x2w.reshape(B * T, W * M, cfg.m2_dim)
    x1w = x1n.reshape(B * T, S, cfg.m1_dim)

    q = _heads(_linear(p["m1_proj"], x1w), n)
    k = _heads(_linear(p["m2_proj"], x2w), n)
    v1 = _heads(_linear(p["values_m1_proj"], x1w), n)
    v2 = _heads(_linear(p["values_m2_proj"], x2w), n)

    o1 = dot_product_attention(q, k, v2)
    o2 = dot_product_attention(k, q, v1)   # padded queries dropped below

    dx1 = _linear(p["out_m1_proj"], o1.reshape(B, T * S, cfg.hidden))
    dx2w = _linear(p["out_m2_proj"], o2.reshape(B, T, W, M, cfg.hidden))
    # unslice: gather the valid (r, k) slots back into frame order
    rr, kk = np.nonzero(valid)             # ordered by (r, k) == frame order
    order = np.argsort(idx[rr, kk], kind="stable")
    dx2 = dx2w[:, jnp.asarray(rr[order]), jnp.asarray(kk[order])]
    dx2 = dx2.reshape(B, R * M, cfg.m2_dim)
    return _gated_residual(p, x1, x2, dx1, dx2)
