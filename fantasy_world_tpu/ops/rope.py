"""Rotary position embeddings: Wan 3D interleaved RoPE and VGGT 2D RoPE.

The reference computes RoPE as complex128 multiplication
(diffsynth_wan21/models/wan_video_dit.py:88-102 ``precompute_freqs_cis`` /
``rope_apply``). TPUs have no fast float64 path, so here the *angle tables*
are precomputed host-side in numpy float64 (exactly matching the torch
float64 table) and materialised once as f32 cos/sin arrays; the rotation
itself is pure f32 vector math on the VPU. Parity of this split is covered
by tests/test_rope.py against the torch oracle.

Layout notes:
  * Wan RoPE is *interleaved*: the head dim is viewed as d/2 complex pairs
    ``(x[..., 0::2], x[..., 1::2])``.
  * The 3D table concatenates [frame | height | width] frequency bands of
    sizes (d/2 - 2*(d/6*... )) -- for head_dim 128: 22 + 21 + 21 complex.
  * VGGT 2D RoPE (vggt/layers/rope.py) is *half-split*: the head dim is
    split into (vertical, horizontal) halves, each rotated non-interleaved
    with rotate_half = [-x2, x1], base frequency 100.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Wan-style interleaved RoPE (1D bands composed into 3D)
# ---------------------------------------------------------------------------

def _freqs_1d_f64(dim: int, end: int, theta: float) -> np.ndarray:
    """Angle table (end, dim//2) in float64; mirrors torch precompute_freqs_cis."""
    inv = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim))
    return np.outer(np.arange(end, dtype=np.float64), inv)


@functools.lru_cache(maxsize=32)
def rope_table_3d(head_dim: int, end: int = 1024, theta: float = 10000.0
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-axis angle tables (f, h, w).

    Band sizes: f gets head_dim - 4*(head_dim//6), h and w get
    2*(head_dim//6) each. Identical to the reference split
    (precompute_freqs_cis_3d, wan_video_dit.py:80-85: ``dim - 2*(dim//3)``
    / ``dim//3``) for every head_dim it actually runs (128 -> 44+42+42),
    but with always-even h/w bands: the reference formula desyncs the
    table from head_dim//2 when dim//3 is odd (e.g. head_dim 64 -> 31
    pairs vs 32) and its own rope_apply would fail there too."""
    d_f = head_dim - 4 * (head_dim // 6)
    d_hw = 2 * (head_dim // 6)
    return (
        _freqs_1d_f64(d_f, end, theta),
        _freqs_1d_f64(d_hw, end, theta),
        _freqs_1d_f64(d_hw, end, theta),
    )


def build_angles_3d(head_dim: int, f: int, h: int, w: int,
                    n_extra_per_frame: int = 0) -> np.ndarray:
    """Full angle grid for a (f, h, w) token lattice, flattened to
    (seq, head_dim//2) float64 (host-side).

    With ``n_extra_per_frame`` > 0, each frame is prefixed by that many
    tokens with *zero* angle (unit rotation) -- the fusion model's
    freqs_bi_agg layout (reference build_freqs_3d_with_extra_cis:
    wan_video_dit.py:105-132, extra tokens get torch.ones == angle 0).
    """
    tf, th, tw = rope_table_3d(head_dim)
    ff = np.broadcast_to(tf[:f][:, None, None, :], (f, h, w, tf.shape[1]))
    hh = np.broadcast_to(th[:h][None, :, None, :], (f, h, w, th.shape[1]))
    ww = np.broadcast_to(tw[:w][None, None, :, :], (f, h, w, tw.shape[1]))
    grid = np.concatenate([ff, hh, ww], axis=-1)          # (f,h,w,d/2)
    if n_extra_per_frame:
        d2 = grid.shape[-1]
        grid = grid.reshape(f, h * w, d2)
        extra = np.zeros((f, n_extra_per_frame, d2), np.float64)
        grid = np.concatenate([extra, grid], axis=1)
        return grid.reshape(f * (n_extra_per_frame + h * w), d2)
    return grid.reshape(f * h * w, grid.shape[-1])


def cos_sin_from_angles(angles: np.ndarray, dtype=jnp.float32
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin computed in float64 on host, then cast once."""
    return (jnp.asarray(np.cos(angles), dtype), jnp.asarray(np.sin(angles), dtype))


def apply_rope_interleaved(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
                           ) -> jnp.ndarray:
    """Rotate interleaved complex pairs (reference semantics; parity oracle).

    x: (..., seq, heads, head_dim); cos/sin: (seq, head_dim//2) broadcast
    over leading dims and heads. Computation in f32, returned in x.dtype.

    NOT used on the hot path: the stride-2 even/odd lane access makes XLA
    relayout the tensor (L-minor f32 copies, ~13 ms/DiT-layer measured on
    v5e). The hot path uses ``apply_rope_half`` below with the de-interleave
    permutation folded into the q/k projection weights at conversion time.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    shp = xf.shape
    xf = xf.reshape(*shp[:-1], shp[-1] // 2, 2)
    x1, x2 = xf[..., 0], xf[..., 1]
    c = cos[..., :, None, :]   # (seq, 1, d/2) -> broadcast over heads
    s = sin[..., :, None, :]
    o1 = x1 * c - x2 * s
    o2 = x1 * s + x2 * c
    out = jnp.stack([o1, o2], axis=-1).reshape(shp)
    return out.astype(orig_dtype)


# -- permutation-folded half-split equivalent of the interleaved rotation --
#
# Attention scores are invariant under any fixed channel permutation applied
# to BOTH q and k. Choosing the per-head de-interleave permutation
# (2j -> j, 2j+1 -> j + d/2) turns the interleaved rotation into the
# contiguous rotate-half form -- no strided lane access, so XLA keeps the
# natural D-minor layout and fuses the rotation into neighbors. The
# permutation is applied once to the q/k projection columns (plus their
# per-channel RMS scales) by the checkpoint converters
# (convert/wan_dit.py, convert/fusion.py); v / output projections are
# untouched, so every activation outside q/k is bit-identical.

def deinterleave_indices(head_dim: int) -> np.ndarray:
    """Channel permutation per head: out[j] = in[idx[j]] with
    idx = [0, 2, 4, ..., 1, 3, 5, ...]."""
    return np.concatenate([np.arange(0, head_dim, 2),
                           np.arange(1, head_dim, 2)])


def permute_qk_out_channels(arr: np.ndarray, head_dim: int, axis: int = -1
                            ) -> np.ndarray:
    """Permute a weight/bias/scale along its output-channel axis by the
    per-head de-interleave; the axis length must be a multiple of head_dim
    (heads * head_dim, heads contiguous)."""
    arr = np.asarray(arr)
    n = arr.shape[axis]
    idx = (np.arange(0, n, head_dim)[:, None]
           + deinterleave_indices(head_dim)[None, :]).reshape(-1)
    return np.take(arr, idx, axis=axis)


def cos_sin_half_from_angles(angles: np.ndarray, dtype=jnp.float32
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(seq, d/2) angle table -> (seq, d) duplicated cos/sin tables for
    ``apply_rope_half`` (f64 trig on host, cast once)."""
    c = np.cos(angles)
    s = np.sin(angles)
    return (jnp.asarray(np.concatenate([c, c], -1), dtype),
            jnp.asarray(np.concatenate([s, s], -1), dtype))


def apply_rope_half(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
                    ) -> jnp.ndarray:
    """Rotate contiguous half-split pairs: out = x*cos + rotate_half(x)*sin
    with rotate_half(x) = [-x2, x1]. x: (..., seq, heads, head_dim);
    cos/sin: (seq, head_dim). Equals ``apply_rope_interleaved`` composed
    with the de-interleave channel permutation (tests/test_rope.py).

    Written per-half with the concat LAST: the naive form materializes a
    full-width f32 rotate_half tensor plus broadcast f32 tables before the
    multiply (profiled at ~90 ms/step of neg/concat/convert/copy HBM
    traffic at the 480P shape); here each half is one fused elementwise
    chain and the concat is the only write. f32 math happens inside the
    fusions, never in HBM."""
    orig_dtype = x.dtype
    d = x.shape[-1]
    x1 = x[..., :d // 2].astype(jnp.float32)
    x2 = x[..., d // 2:].astype(jnp.float32)
    c1 = cos[..., :, None, :d // 2]
    c2 = cos[..., :, None, d // 2:]
    s1 = sin[..., :, None, :d // 2]
    s2 = sin[..., :, None, d // 2:]
    o1 = x1 * c1 - x2 * s1
    o2 = x2 * c2 + x1 * s2
    return jnp.concatenate([o1, o2], axis=-1).astype(orig_dtype)


# ---------------------------------------------------------------------------
# VGGT-style 2D RoPE (half-split, rotate-half)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def rope2d_freq_table(dim_per_axis: int, max_pos: int, frequency: float = 100.0
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables (max_pos, dim_per_axis) for one spatial axis.

    Mirrors vggt/layers/rope.py:_compute_frequency_components: angles of
    size dim/2 duplicated to dim (concat(angles, angles)).
    """
    exponents = np.arange(0, dim_per_axis, 2, dtype=np.float64) / dim_per_axis
    inv_freq = 1.0 / (frequency ** exponents)
    pos = np.arange(max_pos, dtype=np.float64)
    ang = np.outer(pos, inv_freq)
    ang = np.concatenate([ang, ang], axis=-1)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    d = x.shape[-1]
    return jnp.concatenate([-x[..., d // 2:], x[..., : d // 2]], axis=-1)


def rope2d_tables_from_positions(positions: jnp.ndarray, head_dim: int, *,
                                 frequency: float = 100.0,
                                 max_pos: int = 2048):
    """(..., seq, 2) int positions -> per-token (cos, sin) tables, each
    (..., seq, 1, head_dim) laid out [y-half | x-half].

    Positions are static across blocks, so the fusion/aggregator loops call
    this ONCE per forward and the per-block rope becomes pure broadcast
    elementwise (apply_rope_2d_tables) -- no per-block gather. Measured
    (v5e, 2026-08-19): the in-loop cos_t[p] gather costs ~3 ms per rope
    application at the (2, 16422, 16, 64) global shape, x4 applications
    per frame+global block pair."""
    half = head_dim // 2
    cos_t, sin_t = rope2d_freq_table(half, max_pos, frequency)
    cos_t = jnp.asarray(cos_t)
    sin_t = jnp.asarray(sin_t)
    py, px = positions[..., 0], positions[..., 1]
    cos = jnp.concatenate([cos_t[py], cos_t[px]], axis=-1)[..., :, None, :]
    sin = jnp.concatenate([sin_t[py], sin_t[px]], axis=-1)[..., :, None, :]
    return cos, sin


def apply_rope_2d_tables(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
                         ) -> jnp.ndarray:
    """Apply 2D rope from precomputed per-token tables
    (rope2d_tables_from_positions). x: (..., seq, heads, head_dim)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    d = xf.shape[-1]
    half = d // 2
    q = half // 2
    out = []
    for i in (0, 1):
        # per-quarter form, concat last (see apply_rope_half): no
        # materialized rotate_half intermediate
        feats = xf[..., i * half:(i + 1) * half]
        c = cos[..., i * half:(i + 1) * half].astype(jnp.float32)
        s = sin[..., i * half:(i + 1) * half].astype(jnp.float32)
        f1, f2 = feats[..., :q], feats[..., q:]
        c1, c2 = c[..., :q], c[..., q:]
        s1, s2 = s[..., :q], s[..., q:]
        out.append(f1 * c1 - f2 * s1)
        out.append(f2 * c2 + f1 * s2)
    return jnp.concatenate(out, axis=-1).astype(orig_dtype)


def apply_rope_2d(x: jnp.ndarray, positions: jnp.ndarray, *,
                  frequency: float = 100.0, max_pos: int = 2048) -> jnp.ndarray:
    """2D rope on (..., seq, heads, head_dim) with integer positions
    (..., seq, 2) holding (y, x). Head dim split into two halves rotated
    independently by the y and x position."""
    cos, sin = rope2d_tables_from_positions(
        positions, x.shape[-1], frequency=frequency, max_pos=max_pos)
    return apply_rope_2d_tables(x, cos, sin)


def grid_positions_2d(h: int, w: int, n_special: int = 0) -> np.ndarray:
    """(n_special + h*w, 2) int32 positions: special tokens at (0,0), patch
    tokens at 1-based (y, x) -- reference aggregator.py:179-187."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pos = np.stack([ys.ravel(), xs.ravel()], axis=-1).astype(np.int32) + 1
    if n_special:
        pos = np.concatenate([np.zeros((n_special, 2), np.int32), pos], axis=0)
    return pos


# ---------------------------------------------------------------------------
# Timestep embedding
# ---------------------------------------------------------------------------

def sinusoidal_embedding_1d(dim: int, position: jnp.ndarray) -> jnp.ndarray:
    """[cos | sin] timestep embedding; mirrors wan_video_dit.py:73-77.

    The torch oracle computes the outer product in float64; here the
    frequency vector is float64-precomputed on host and the outer product is
    f32 -- timestep magnitudes (<=1000) keep this well within f32 precision.
    """
    half = dim // 2
    freqs = jnp.asarray(
        np.power(10000.0, -np.arange(half, dtype=np.float64) / half),
        jnp.float32)
    sinusoid = position.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=1)
