"""Ulysses sequence-parallel attention: explicit all_to_all over ICI.

The reference's headline scale-out is xfuser USP with ``ulysses_degree =
world_size`` over NCCL (diffsynth_wan22/pipelines/wan_video_new.py:316-341;
the wan21 inline variant chunks tokens across ranks before the block stack
and all-gathers after the head, wan_video.py:808-830): every rank holds
L/n tokens of every head; immediately around each attention an all-to-all
re-shards to "all tokens, H/n heads", the attention runs unsharded over the
full sequence, and the inverse all-to-all restores the token split.

The GSPMD path (parallel/sharding.py + mesh constraints in joint_forward)
already scales the model correctly -- XLA inserts all-gathers of k/v when
the token axis is sharded. This module is the *bandwidth-optimal* variant
of the same dataflow, written as a ``shard_map`` over the mesh 'seq' axis
with ``lax.all_to_all`` collectives:

  per-device bytes moved  (L tokens, H heads, D head_dim, n = seq degree)
    GSPMD k/v all-gather:   2 * L*H*D * (n-1)/n        (k and v, full L)
    Ulysses 4x all_to_all:  4 * (L/n)*H*D * (n-1)/n    (q,k,v in + o out)
  ratio = n/2: at seq=4 Ulysses moves 2x less, at seq=8 4x less.

Inside each shard the regular single-device kernel runs (Pallas flash
attention on TPU, the XLA path on CPU), so the math is bit-identical to the
unsharded call modulo reduction order.

Ragged sequences: the production token counts (16,317 video / 16,422
geometry tokens) are not divisible by power-of-two meshes. ``ulysses
attention`` zero-pads L up to a multiple of n before the in-all_to_all.
After the all-to-all every device holds the FULL (padded) sequence, so the
pad is simply sliced off the key/value side before the local attention
(exact -- no masking needed) and off the query side after the output
all-to-all (padded query rows compute garbage the slice drops).
"""
from __future__ import annotations

import contextlib
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def ulysses_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                      mesh: Mesh, seq_axis: str = "seq",
                      batch_axis: Optional[str] = "data",
                      scale: Optional[float] = None,
                      backend: Optional[str] = None) -> jnp.ndarray:
    """Sequence-parallel dense attention. q: (B, Lq, H, D); k/v: (B, Lk, H, D).

    The arrays are logically global; sharding is expressed through the mesh
    (tokens over ``seq_axis``, batch over ``batch_axis``). Returns the global
    (B, Lq, H, D) result with the same logical content as
    ``dot_product_attention(q, k, v)``.

    Requires H % n == 0 (n = seq-axis size). When the head count does not
    split (e.g. the 12-head bicross at seq degree 8), the call falls
    through to ``ring_attention`` — rotating k/v shards have no head
    constraint — completing the reference USP's ulysses x ring surface
    (wan_video_new.py:320-325, ring_degree hooks). n == 1 is the plain
    single-device dispatch.
    """
    from ..ops.attention import dot_product_attention

    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[seq_axis]
    H = q.shape[2]
    if n == 1:
        with ulysses_context(None):  # plain path; don't re-enter dispatch
            return dot_product_attention(q, k, v, scale=scale,
                                         backend=backend)
    if H % n != 0:
        from .ring import ring_attention
        with ulysses_context(None):
            return ring_attention(q, k, v, mesh=mesh, seq_axis=seq_axis,
                                  batch_axis=batch_axis, scale=scale,
                                  backend=backend)

    B, Lq, _, D = q.shape
    Lk = k.shape[1]
    qp = _pad_to(q, 1, n)
    kp = _pad_to(k, 1, n)
    vp = _pad_to(v, 1, n)
    lk_pad = kp.shape[1]

    bspec = batch_axis if (batch_axis and B % mesh.shape[batch_axis] == 0) \
        else None
    spec = P(bspec, seq_axis, None, None)

    def local(qs, ks, vs):
        # per shard in: (b, Lp/n, H, D). all_to_all to (b, Lp, H/n, D):
        # split the head axis n ways, concatenate the token shards.
        qs = jax.lax.all_to_all(qs, seq_axis, split_axis=2, concat_axis=1,
                                tiled=True)
        ks = jax.lax.all_to_all(ks, seq_axis, split_axis=2, concat_axis=1,
                                tiled=True)
        vs = jax.lax.all_to_all(vs, seq_axis, split_axis=2, concat_axis=1,
                                tiled=True)
        if lk_pad != Lk:
            ks, vs = ks[:, :Lk], vs[:, :Lk]
        with ulysses_context(None):      # inner dispatch must not re-enter
            o = dot_product_attention(qs, ks, vs, scale=scale,
                                      backend=backend)
        # inverse: token axis back to shards, heads re-gathered
        return jax.lax.all_to_all(o, seq_axis, split_axis=1, concat_axis=2,
                                  tiled=True)

    out = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                    out_specs=spec, check_vma=False)(qp, kp, vp)
    return out[:, :Lq]


# ---------------------------------------------------------------------------
# context plumbing: model code calls dot_product_attention with no mesh in
# scope; the pipeline activates Ulysses for a region instead of threading a
# mesh through every block signature.
# ---------------------------------------------------------------------------

_STATE = threading.local()


def current_ulysses() -> Optional[Tuple[Mesh, str, Optional[str], int]]:
    return getattr(_STATE, "ctx", None)


@contextlib.contextmanager
def ulysses_context(mesh: Optional[Mesh], seq_axis: str = "seq",
                    batch_axis: Optional[str] = "data", min_lq: int = 0):
    """Route every ``dot_product_attention`` under this context through
    ``ulysses_attention`` over ``mesh`` (trace-time dispatch: the context
    only needs to be live while the forward is traced/jitted).

    The reference analogue is ``enable_usp`` monkey-patching every
    ``block.self_attn.forward`` (wan_video_new.py:331-341); here it is an
    explicit, scoped re-dispatch.

    min_lq: only re-route attentions whose query length is at least this
    (trace-time shape check). The fusion forward sets it so the long
    sequences (DiT self/cross 16,317 queries, aggregator global / bicross
    16,422) go sequence-parallel while the per-frame attention (782 tokens,
    already sharded over ('data','seq') via its batch fold) keeps its
    collective-free layout.
    """
    prev = current_ulysses()
    _STATE.ctx = None if mesh is None else (mesh, seq_axis, batch_axis,
                                            min_lq)
    try:
        yield
    finally:
        _STATE.ctx = prev
