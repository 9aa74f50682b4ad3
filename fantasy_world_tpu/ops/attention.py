"""Single attention dispatch for the whole framework.

Every attention in the model zoo goes through ``dot_product_attention``:
DiT self-attention (3D RoPE, 40 heads x 128), DiT cross-attention
(text+image context), VGGT frame/global attention (16 heads x 64, 2D RoPE),
and the bidirectional cross-modal attention (12 heads x 96) -- mirroring the
reference's priority dispatch (wan_video_dit.py:28-66) but TPU-first:

  * backend="pallas": fused flash-attention kernel (ops/flash_attention.py)
    -- the default on TPU.
  * backend="xla": reference einsum path with f32 softmax -- the fallback on
    CPU and the parity oracle in tests.

Layout is (batch, seq, heads, head_dim) throughout ("BSHD"); RoPE is applied
by callers before dispatch.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_FORCED_BACKEND: Optional[str] = None


def set_default_backend(name: Optional[str]) -> None:
    """Force a backend globally ('pallas' | 'xla' | None for auto)."""
    global _FORCED_BACKEND
    _FORCED_BACKEND = name


def _auto_backend() -> str:
    if _FORCED_BACKEND is not None:
        return _FORCED_BACKEND
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    backend: Optional[str] = None,
    key_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dense bidirectional attention.

    q: (B, Lq, H, D), k/v: (B, Lk, H, D). Returns (B, Lq, H, D) in q.dtype.
    Softmax statistics in f32 on every backend.

    key_mask: optional (B, Lk) or (Lk,) bool, True = attendable. Masked
    attention routes through the XLA path (only the padded temporal-bicross
    mode needs it; the hot paths are mask-free).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    backend = backend or _auto_backend()
    if key_mask is not None:
        return _xla_attention_masked(q, k, v, key_mask, scale)
    from ..parallel.ulysses import current_ulysses
    ctx = current_ulysses()
    if ctx is not None and q.shape[1] >= ctx[3]:
        from ..parallel.ulysses import ulysses_attention
        mesh, seq_axis, batch_axis, _ = ctx
        return ulysses_attention(q, k, v, mesh=mesh, seq_axis=seq_axis,
                                 batch_axis=batch_axis, scale=scale,
                                 backend=backend)
    if backend == "pallas":
        from .flash_attention import flash_attention
        return flash_attention(q, k, v, scale=scale)
    if backend == "xla":
        return _xla_attention(q, k, v, scale)
    raise ValueError(f"unknown attention backend: {backend}")


def attention_with_stats(q, k, v, *, scale: Optional[float] = None,
                         backend: Optional[str] = None):
    """Attention that also returns its softmax statistics for cross-shard
    merging (parallel/ring.py): (o, m2, l) with m2/l (B, Lq, H) f32 in the
    base-2 domain -- s2 = log2(e)*scale*(q.k), m2 = max_k s2,
    l = sum_k exp2(s2 - m2), o = softmax(s)@v. Partial results over key
    shards merge exactly:  m = max(m_a, m_b),
    w_x = l_x * exp2(m_x - m),  o = (w_a*o_a + w_b*o_b) / (w_a + w_b).

    Does NOT consult the ulysses context (it is the primitive that
    sequence-parallel wrappers are built from)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    backend = backend or _auto_backend()
    if backend == "pallas":
        from .flash_attention import flash_attention
        return flash_attention(q, k, v, scale=scale, return_stats=True)
    return _xla_attention_stats(q, k, v, scale)


_LOG2E = 1.4426950408889634


@functools.partial(jax.jit, static_argnums=(3,))
def _xla_attention_stats(q, k, v, scale):
    s2 = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                    preferred_element_type=jnp.float32) * (scale * _LOG2E)
    m2 = jnp.max(s2, axis=-1)                       # (B, H, Lq)
    p = jnp.exp2(s2 - m2[..., None])
    l = jnp.sum(p, axis=-1)                         # (B, H, Lq)
    out = jnp.einsum("bhqk,bkhd->bqhd", (p / l[..., None]).astype(v.dtype),
                     v, preferred_element_type=jnp.float32)
    return (out.astype(q.dtype), m2.transpose(0, 2, 1), l.transpose(0, 2, 1))


@functools.partial(jax.jit, static_argnums=(3,))
def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.partial(jax.jit, static_argnums=(4,))
def _xla_attention_masked(q, k, v, key_mask, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    mask = jnp.broadcast_to(jnp.asarray(key_mask, bool),
                            (q.shape[0], k.shape[1]))
    logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
