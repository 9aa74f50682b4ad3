"""Pallas TPU flash-attention (dense, bidirectional, online-softmax).

One kernel serves every attention family in the framework (DiT self/cross,
VGGT frame/global, bicross): all are dense bidirectional attentions, so no
causal masking is needed -- only key-padding masking for ragged sequence
lengths (the video token count 21*21*37 = 16317 is not lane-aligned).

Design (see /opt/skills/guides/pallas_guide.md):
  * inputs stay in their natural (B, L, H, D) layout; the wrapper reshapes
    (free) to (B, L, H*D) and the per-head block is addressed as a D-wide
    column slice -- no transposes, no HBM copies.
  * grid (B, H, num_q_blocks, num_k_blocks); the k axis is innermost so the
    f32 accumulator / running-max / running-sum scratch carried in VMEM is
    valid across the online-softmax sweep.
  * q/k/v blocks stay bf16 in VMEM; logits and softmax statistics are f32.
  * head_dim is zero-padded to a lane multiple (zero lanes do not perturb
    logits; zero value lanes are sliced off), sequence padding is masked via
    broadcasted_iota against the true key length.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
               scale: float, kv_len: int, block_k: int):
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]                               # (BQ, D)
    k = k_ref[0]                               # (BK, D)
    v = v_ref[0]                               # (BK, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (BQ, BK)

    col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_ref[...]                        # (BQ, 128) replicated stat
    m_cur = jnp.max(s, axis=-1, keepdims=True)           # (BQ, 1)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    alpha = jnp.exp(m_prev - m_new)                      # (BQ, 128)
    p = jnp.exp(s - m_new[:, :1])                        # (BQ, BK)

    l_ref[...] = l_ref[...] * alpha + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), m_prev.shape)
    m_ref[...] = m_new

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (BQ, D)
    acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[..., :1]).astype(o_ref.dtype)


def _pad_axis(x, axis, target):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    scale: Optional[float] = None,
                    block_q: int = 512, block_k: int = 1024) -> jnp.ndarray:
    """q: (B, Lq, H, D), k/v: (B, Lk, H, D) -> (B, Lq, H, D)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, Lq, H, D = q.shape
    Lk = k.shape[1]

    block_q = min(block_q, -(-Lq // 128) * 128)
    block_k = min(block_k, -(-Lk // 128) * 128)

    d_pad = -(-D // 128) * 128
    lq_pad = -(-Lq // block_q) * block_q
    lk_pad = -(-Lk // block_k) * block_k

    # (B, L, H, D) -> pad -> (B, L, H*Dp): a pure reshape, no data movement
    # beyond the pads themselves.
    qp = _pad_axis(_pad_axis(q, 3, d_pad), 1, lq_pad).reshape(B, lq_pad, H * d_pad)
    kp = _pad_axis(_pad_axis(k, 3, d_pad), 1, lk_pad).reshape(B, lk_pad, H * d_pad)
    vp = _pad_axis(_pad_axis(v, 3, d_pad), 1, lk_pad).reshape(B, lk_pad, H * d_pad)

    nq = lq_pad // block_q
    nk = lk_pad // block_k

    out = pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale, kv_len=Lk, block_k=block_k),
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad),
                         lambda b, h, iq, ik: (b, iq, h)),
            pl.BlockSpec((1, block_k, d_pad),
                         lambda b, h, iq, ik: (b, ik, h)),
            pl.BlockSpec((1, block_k, d_pad),
                         lambda b, h, iq, ik: (b, ik, h)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad),
                               lambda b, h, iq, ik: (b, iq, h)),
        out_shape=jax.ShapeDtypeStruct((B, lq_pad, H * d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d_pad), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(qp, kp, vp)

    return out.reshape(B, lq_pad, H, d_pad)[:, :Lq, :, :D]
