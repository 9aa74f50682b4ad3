"""Ring-attention sequence parallelism: rotate k/v shards over ICI.

The reference's USP factorizes its sequence-parallel group into
``ulysses_degree x ring_degree`` (xfuser ``initialize_model_parallel``,
diffsynth_wan22/pipelines/wan_video_new.py:320-325); the shipped config
always uses ring_degree=1 and the ring module itself is absent from the
snapshot. This is the TPU-native ring half: queries stay sharded over the
mesh 'seq' axis, and instead of re-sharding heads (parallel/ulysses.py),
the k/v shards travel — each of the n steps every device attends its local
q chunk against one k/v chunk, then passes the chunk to its neighbour with
``lax.ppermute`` (ICI nearest-neighbour, the cheapest collective there is),
merging partial outputs with exact online-softmax algebra from the
(m2, l) statistics that the flash kernel exposes (ops/flash_attention.py
``return_stats``; base-2 domain).

When to use which:
  * Ulysses needs H %% n == 0 (head re-shard). At seq degree 8 the 12-head
    bicross attention cannot split; the ring has NO head constraint.
  * Ulysses moves 4*(L/n)*H*D per device per attention; the ring moves
    2*(L/n)*H*D*(n-1)/n (k+v chunks, n-1 hops) — less traffic, but spread
    over n dependent steps; Ulysses' two bulk all_to_alls pipeline better
    when heads allow. ``ulysses_attention`` therefore uses the ring as its
    fallback when the head count does not divide.

Ragged sequences: L is zero-padded to a multiple of n on both q and k
sides. Padded q rows are all-zero -> uniform softmax, garbage-free, sliced
off at the end. Padded k rows (they live in the LAST chunk only) score
exactly 0 in the base-2 logit domain, so after attending chunk n-1 the
partial statistics are corrected in closed form: l -= n_pad * exp2(-m2)
and o *= l_old/l_new — the same exact zero-pad correction the flash kernel
applies internally (flash_attention.py:54), lifted one level up.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .ulysses import _pad_to


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                   mesh: Mesh, seq_axis: str = "seq",
                   batch_axis: Optional[str] = "data",
                   scale: Optional[float] = None,
                   backend: Optional[str] = None) -> jnp.ndarray:
    """Sequence-parallel dense attention with rotating k/v shards.

    q: (B, Lq, H, D); k/v: (B, Lk, H, D), logically global (sharding comes
    from the mesh: tokens over ``seq_axis``, batch over ``batch_axis``).
    Returns the global (B, Lq, H, D) result equal to
    ``dot_product_attention(q, k, v)`` up to reduction order. Any H.
    """
    from ..ops.attention import attention_with_stats, dot_product_attention

    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[seq_axis]
    if n == 1:
        from .ulysses import ulysses_context
        with ulysses_context(None):
            return dot_product_attention(q, k, v, scale=scale,
                                         backend=backend)

    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    qp = _pad_to(q, 1, n)
    kp = _pad_to(k, 1, n)
    vp = _pad_to(v, 1, n)
    k_pad = kp.shape[1] - Lk
    # a chunk that is pure padding would zero the corrected l; production
    # Lk >> n makes this unreachable, degenerate inputs take the slow path
    if kp.shape[1] // n <= k_pad:
        from .ulysses import ulysses_context
        with ulysses_context(None):
            return dot_product_attention(q, k, v, scale=scale,
                                         backend=backend)

    bspec = batch_axis if (batch_axis and B % mesh.shape[batch_axis] == 0) \
        else None
    spec = P(bspec, seq_axis, None, None)
    perm = [(j, (j - 1) % n) for j in range(n)]   # chunk c -> device holds
    #                                               chunk (dev_idx + t) % n

    def local(qs, ks, vs):
        idx = jax.lax.axis_index(seq_axis)
        o_acc = m_acc = l_acc = None
        kc, vc = ks, vs
        for t in range(n):
            if t < n - 1:   # prefetch next chunk; XLA overlaps with compute
                kn = jax.lax.ppermute(kc, seq_axis, perm)
                vn = jax.lax.ppermute(vc, seq_axis, perm)
            o_t, m_t, l_t = attention_with_stats(qs, kc, vc, scale=scale,
                                                 backend=backend)
            if k_pad:
                # exact zero-pad correction on the chunk holding the tail
                n_ext = jnp.where((idx + t) % n == n - 1,
                                  jnp.float32(k_pad), 0.0)
                l_new = l_t - n_ext * jnp.exp2(-m_t)
                o_t = o_t.astype(jnp.float32) * (l_t / l_new)[..., None]
                l_t = l_new
            o_t = o_t.astype(jnp.float32)
            if o_acc is None:
                o_acc, m_acc, l_acc = o_t, m_t, l_t
            else:
                m_new = jnp.maximum(m_acc, m_t)
                w_a = l_acc * jnp.exp2(m_acc - m_new)
                w_t = l_t * jnp.exp2(m_t - m_new)
                l_new = w_a + w_t
                o_acc = (o_acc * (w_a / l_new)[..., None]
                         + o_t * (w_t / l_new)[..., None])
                m_acc, l_acc = m_new, l_new
            if t < n - 1:
                kc, vc = kn, vn
        return o_acc.astype(qs.dtype)

    out = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                    out_specs=spec, check_vma=False)(qp, kp, vp)
    return out[:, :Lq]
