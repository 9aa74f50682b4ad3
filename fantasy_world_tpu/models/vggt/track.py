"""CoTracker-style point tracker (TrackHead + track_modules), TPU-native.

Functional re-design of vggt/heads/track_head.py:11-103 and
track_modules/{base_track_predictor,blocks,modules,utils}.py: a DPT feature
extractor feeds an iterative refinement loop -- per iteration, a correlation
pyramid is sampled around the current track coordinates, embedded together
with flow sin/cos features and track features, and a factorized time/space
transformer (EfficientUpdateFormer) predicts coordinate and feature deltas.

TPU-first notes:
  * torch ``grid_sample`` becomes a vectorized 4-tap gather
    (``bilinear_sample``) -- static shapes, no scatter;
  * the correlation pyramid is built once per forward with
    ``lax.reduce_window`` average pooling; each level is correlated and
    sampled immediately (matching the reference's memory-saving order,
    blocks.py:176-228) -- on TPU this also keeps each einsum MXU-shaped;
  * the refinement loop is a static Python loop (iters=4) inside jit;
  * ``nn.MultiheadAttention`` becomes packed-qkv projections over the
    shared attention dispatch.

The reference ships this component dead: ``enable_track`` is False at
inference (inference_wan21.py:193) and track_head.py:49 references an
un-imported ``DPTHead`` (NameError if ever constructed). We implement the
working equivalent against the causal-3D DPT in feature_only mode and the
published checkpoint simply never provides track weights.

Quirks replicated on purpose (parity-tested vs the reference modules):
  * AttnBlock/CrossAttnBlock overwrite their input with the normed value,
    so the attention residual adds to ``norm1(x)``, not ``x``
    (modules.py:160-169, 192-203);
  * get_2d_embedding uses linear (not geometric) frequencies
    (utils.py:107) and interleaved sin/cos;
  * coords of frame 0 are reset to the query every iteration
    (base_track_predictor.py:184-186).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.params import (prng_split, init_linear, init_layernorm,
                            np_normal, np_zeros)
from ...ops.attention import dot_product_attention
from ...ops.norms import layer_norm


# ---------------------------------------------------------------------------
# sampling + embedding primitives (track_modules/utils.py)
# ---------------------------------------------------------------------------

def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray,
                    padding_mode: str = "border") -> jnp.ndarray:
    """Sample ``img`` (B, C, H, W) at pixel coordinates ``coords``
    (B, R, 2) = (x, y), align_corners=True convention -- the composition of
    bilinear_sampler's normalize and grid_sample's denormalize is the
    identity (utils.py:124-190), so we gather directly in pixel space.
    Returns (B, R, C) in f32."""
    B, C, H, W = img.shape
    imgf = img.astype(jnp.float32).transpose(0, 2, 3, 1)   # (B, H, W, C)
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(ix, iy):
        gx = jnp.clip(ix.astype(jnp.int32), 0, W - 1)
        gy = jnp.clip(iy.astype(jnp.int32), 0, H - 1)
        val = jnp.take_along_axis(
            imgf.reshape(B, H * W, C),
            (gy * W + gx)[..., None].astype(jnp.int32), axis=1)
        if padding_mode == "zeros":
            ok = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1))
            val = jnp.where(ok[..., None], val, 0.0)
        return val

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def get_2d_embedding(xy: jnp.ndarray, C: int) -> jnp.ndarray:
    """Interleaved sin/cos embedding with LINEAR frequencies
    (utils.py:90-121, cat_coords=False): xy (B, N, 2) -> (B, N, 2C)."""
    x = xy[..., 0:1].astype(jnp.float32)
    y = xy[..., 1:2].astype(jnp.float32)
    div = (np.arange(0, C, 2, dtype=np.float32) * (1000.0 / C)).reshape(1, 1, C // 2)
    div = jnp.asarray(div)

    def interleave(s, c):
        return jnp.stack([s, c], axis=-1).reshape(*s.shape[:-1], C)

    pe_x = interleave(jnp.sin(x * div), jnp.cos(x * div))
    pe_y = interleave(jnp.sin(y * div), jnp.cos(y * div))
    return jnp.concatenate([pe_x, pe_y], axis=-1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_hw: Tuple[int, int]) -> np.ndarray:
    """(1, embed_dim, H, W) f32 -- utils.py:18-87. grid[0] carries x
    (width) coordinates, grid[1] y; each is embedded with geometric
    frequencies and the halves concatenated."""
    H, W = grid_hw
    gy, gx = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")

    def embed_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000.0 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate([embed_1d(embed_dim // 2, gx),
                          embed_1d(embed_dim // 2, gy)], axis=1)
    return emb.reshape(1, H, W, embed_dim).transpose(0, 3, 1, 2).astype(np.float32)


# ---------------------------------------------------------------------------
# correlation pyramid (track_modules/blocks.py:137-236)
# ---------------------------------------------------------------------------

def build_corr_pyramid(fmaps: jnp.ndarray, num_levels: int) -> List[jnp.ndarray]:
    """fmaps (B, S, C, H, W) -> list of ``num_levels`` maps, each avg-pooled
    2x from the previous."""
    pyramid = [fmaps]
    cur = fmaps
    for _ in range(num_levels - 1):
        B, S, C, H, W = cur.shape
        x = cur.reshape(B * S * C, H, W).astype(jnp.float32)
        x = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                  (1, 2, 2), (1, 2, 2), "VALID") * 0.25
        cur = x.reshape(B, S, C, H // 2, W // 2).astype(fmaps.dtype)
        pyramid.append(cur)
    return pyramid


def corr_pyramid_sample(pyramid: List[jnp.ndarray], targets: jnp.ndarray,
                        coords: jnp.ndarray, radius: int) -> jnp.ndarray:
    """targets (B, S, N, C), coords (B, S, N, 2) full-res pixels ->
    (B, S, N, L*(2r+1)^2). Each level's correlation volume is computed and
    sampled immediately (zeros padding, blocks.py:176-228)."""
    B, S, N, C = targets.shape
    r = radius
    k = 2 * r + 1
    # reference quirk (blocks.py:168-174): delta = stack(meshgrid(dy, dx,
    # "ij")) -- the component added to x varies along the ROW index, so the
    # flattened (2r+1)^2 window is transposed vs the intuitive layout; the
    # corr_mlp weights are trained against exactly this order.
    d0, d1 = np.meshgrid(np.linspace(-r, r, k), np.linspace(-r, r, k),
                         indexing="ij")
    delta = jnp.asarray(np.stack([d0, d1], axis=-1).reshape(1, k * k, 2),
                        dtype=jnp.float32)

    out = []
    for lvl, fm in enumerate(pyramid):
        H, W = fm.shape[-2:]
        corr = jnp.einsum("bsnc,bschw->bsnhw", targets.astype(jnp.float32),
                          fm.astype(jnp.float32)) / math.sqrt(C)
        centroid = coords.reshape(B * S * N, 1, 2) / (2.0 ** lvl)
        sampled = bilinear_sample(corr.reshape(B * S * N, 1, H, W),
                                  centroid + delta, padding_mode="zeros")
        out.append(sampled.reshape(B, S, N, k * k))
    return jnp.concatenate(out, axis=-1)


# ---------------------------------------------------------------------------
# transformer blocks (track_modules/modules.py)
# ---------------------------------------------------------------------------

def _linear(p, x):
    y = jnp.dot(x.astype(jnp.float32), p["kernel"].astype(jnp.float32))
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _mlp(p, x):
    return _linear(p["fc2"], jax.nn.gelu(_linear(p["fc1"], x),
                                         approximate=False))


def _mha(p, q_in, kv_in, num_heads):
    """nn.MultiheadAttention with packed in_proj (batch_first)."""
    E = q_in.shape[-1]
    hd = E // num_heads
    q = _linear(p["q"], q_in)
    k = _linear(p["k"], kv_in)
    v = _linear(p["v"], kv_in)
    B, Lq = q.shape[0], q.shape[1]
    Lk = k.shape[1]
    o = dot_product_attention(q.reshape(B, Lq, num_heads, hd),
                              k.reshape(B, Lk, num_heads, hd),
                              v.reshape(B, Lk, num_heads, hd))
    return _linear(p["out"], o.reshape(B, Lq, E))


def _attn_block(p, x, num_heads):
    """modules.py:156-170 -- NOTE the reference overwrites x with norm1(x)
    before the residual add; replicated bit-for-bit."""
    x = layer_norm(x, p["norm1"], 1e-5)
    x = x + _mha(p["attn"], x, x, num_heads)
    return x + _mlp(p["mlp"], layer_norm(x, p["norm2"], 1e-5))


def _cross_attn_block(p, x, context, num_heads):
    """modules.py:192-204 -- same norm-overwrite quirk."""
    x = layer_norm(x, p["norm1"], 1e-5)
    context = layer_norm(context, p["norm_context"], 1e-5)
    x = x + _mha(p["attn"], x, context, num_heads)
    return x + _mlp(p["mlp"], layer_norm(x, p["norm2"], 1e-5))


# ---------------------------------------------------------------------------
# EfficientUpdateFormer (track_modules/blocks.py:19-134)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TrackConfig:
    latent_dim: int = 128
    hidden_size: int = 384
    corr_levels: int = 7
    corr_radius: int = 4
    iters: int = 4
    depth: int = 6              # space and time depth (use_spaceatt=True)
    num_heads: int = 8
    mlp_ratio: float = 4.0
    num_virtual_tracks: int = 64
    max_scale: float = 518.0
    stride: int = 2
    predict_conf: bool = True

    @property
    def transformer_dim(self) -> int:
        return 3 * self.latent_dim + 4

    @property
    def output_dim(self) -> int:
        return self.latent_dim + 2


def _init_mha(rs, dim, dtype):
    return {"q": init_linear(rs[0], dim, dim, dtype=dtype),
            "k": init_linear(rs[1], dim, dim, dtype=dtype),
            "v": init_linear(rs[2], dim, dim, dtype=dtype),
            "out": init_linear(rs[3], dim, dim, dtype=dtype)}


def _init_attn_block(rng, dim, hidden, dtype):
    rs = prng_split(rng, 6)
    return {"norm1": init_layernorm(dim, dtype=dtype),
            "norm2": init_layernorm(dim, dtype=dtype),
            "attn": _init_mha(rs[:4], dim, dtype),
            "mlp": {"fc1": init_linear(rs[4], dim, hidden, dtype=dtype),
                    "fc2": init_linear(rs[5], hidden, dim, dtype=dtype)}}


def _init_cross_block(rng, dim, hidden, dtype):
    p = _init_attn_block(rng, dim, hidden, dtype)
    p["norm_context"] = init_layernorm(dim, dtype=dtype)
    return p


def init_update_former(rng, cfg: TrackConfig, dtype=jnp.float32) -> Dict:
    rs = prng_split(rng, 4 + 4 * cfg.depth)
    hs = cfg.hidden_size
    mlp_h = int(hs * cfg.mlp_ratio)
    return {
        "input_norm": init_layernorm(cfg.transformer_dim, dtype=dtype),
        "input_transform": init_linear(rs[0], cfg.transformer_dim, hs,
                                       dtype=dtype),
        "output_norm": init_layernorm(hs, dtype=dtype),
        "flow_head": init_linear(rs[1], hs, cfg.output_dim, dtype=dtype),
        "virtual_tracks": np_normal(rs[2], (1, cfg.num_virtual_tracks, 1, hs),
                                    1.0, dtype),
        "time_blocks": [_init_attn_block(rs[3 + i], hs, mlp_h, dtype)
                        for i in range(cfg.depth)],
        "space_virtual_blocks": [
            _init_attn_block(rs[3 + cfg.depth + i], hs, mlp_h, dtype)
            for i in range(cfg.depth)],
        "space_point2virtual_blocks": [
            _init_cross_block(rs[3 + 2 * cfg.depth + i], hs, mlp_h, dtype)
            for i in range(cfg.depth)],
        "space_virtual2point_blocks": [
            _init_cross_block(rs[3 + 3 * cfg.depth + i], hs, mlp_h, dtype)
            for i in range(cfg.depth)],
    }


def update_former_apply(p: Dict, cfg: TrackConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x (B, N, T, transformer_dim) -> (B, N, T, latent_dim + 2)."""
    B, N, T, _ = x.shape
    nv = cfg.num_virtual_tracks
    nh = cfg.num_heads
    tokens = _linear(p["input_transform"],
                     layer_norm(x, p["input_norm"], 1e-5))
    init_tokens = tokens

    virtual = jnp.broadcast_to(p["virtual_tracks"].astype(tokens.dtype),
                               (B, nv, T, tokens.shape[-1]))
    tokens = jnp.concatenate([tokens, virtual], axis=1)
    Nv = N + nv

    for i in range(cfg.depth):
        tt = tokens.reshape(B * Nv, T, -1)
        tt = _attn_block(p["time_blocks"][i], tt, nh)
        tokens = tt.reshape(B, Nv, T, -1)
        # space attention every (time_depth // space_depth) time blocks --
        # every block at the shipped 6/6 (blocks.py:112)
        st = tokens.transpose(0, 2, 1, 3).reshape(B * T, Nv, -1)
        point, virt = st[:, :N], st[:, N:]
        virt = _cross_attn_block(p["space_virtual2point_blocks"][i], virt,
                                 point, nh)
        virt = _attn_block(p["space_virtual_blocks"][i], virt, nh)
        point = _cross_attn_block(p["space_point2virtual_blocks"][i], point,
                                  virt, nh)
        st = jnp.concatenate([point, virt], axis=1)
        tokens = st.reshape(B, T, Nv, -1).transpose(0, 2, 1, 3)

    tokens = tokens[:, :N] + init_tokens
    return _linear(p["flow_head"], layer_norm(tokens, p["output_norm"], 1e-5))


# ---------------------------------------------------------------------------
# BaseTrackerPredictor (track_modules/base_track_predictor.py)
# ---------------------------------------------------------------------------

def init_tracker(rng, cfg: TrackConfig, dtype=jnp.float32) -> Dict:
    rs = prng_split(rng, 8)
    corr_dim = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    ld = cfg.latent_dim
    return {
        "corr_mlp": {"fc1": init_linear(rs[0], corr_dim, cfg.hidden_size,
                                        dtype=dtype),
                     "fc2": init_linear(rs[1], cfg.hidden_size, ld,
                                        dtype=dtype)},
        "query_ref_token": np_normal(rs[2], (1, 2, cfg.transformer_dim), 1.0,
                                     dtype),
        "updateformer": init_update_former(rs[3], cfg, dtype),
        "fmap_norm": init_layernorm(ld, dtype=dtype),
        "ffeat_norm": init_layernorm(ld, dtype=dtype),   # GroupNorm(1, C)
        "ffeat_updater": init_linear(rs[4], ld, ld, dtype=dtype),
        "vis_predictor": init_linear(rs[5], ld, 1, dtype=dtype),
        "conf_predictor": init_linear(rs[6], ld, 1, dtype=dtype),
    }


def tracker_predict(p: Dict, cfg: TrackConfig, query_points: jnp.ndarray,
                    fmaps: jnp.ndarray, iters: Optional[int] = None,
                    down_ratio: int = 1, apply_sigmoid: bool = True
                    ) -> Tuple[List[jnp.ndarray], jnp.ndarray,
                               Optional[jnp.ndarray]]:
    """query_points (B, N, 2) full-res pixels; fmaps (B, S, C, HH, WW).
    Returns ([iters x (B, S, N, 2)], vis (B, S, N), conf | None)."""
    iters = cfg.iters if iters is None else iters
    B, N, _ = query_points.shape
    S, C, HH, WW = fmaps.shape[1:]
    ld = cfg.latent_dim

    # LayerNorm over channels (base_track_predictor.py:94)
    fm = fmaps.transpose(0, 1, 3, 4, 2)
    fm = layer_norm(fm, p["fmap_norm"], 1e-5)
    fmaps = fm.transpose(0, 1, 4, 2, 3)

    qp = query_points.astype(jnp.float32)
    if down_ratio > 1:
        qp = qp / float(down_ratio)
    qp = qp / float(cfg.stride)

    coords = jnp.broadcast_to(qp[:, None], (B, S, N, 2))
    query_feat = bilinear_sample(fmaps[:, 0], coords[:, 0])     # (B, N, C)
    track_feats = jnp.broadcast_to(query_feat[:, None], (B, S, N, ld)
                                   ).astype(fmaps.dtype)

    pyramid = build_corr_pyramid(fmaps, cfg.corr_levels)
    pos_table = jnp.asarray(get_2d_sincos_pos_embed(cfg.transformer_dim,
                                                    (HH, WW)))
    sampled_pos = bilinear_sample(
        jnp.broadcast_to(pos_table, (B, cfg.transformer_dim, HH, WW)),
        coords[:, 0])                                           # (B, N, D)
    sampled_pos = sampled_pos.reshape(B * N, 1, cfg.transformer_dim)
    qr = p["query_ref_token"].astype(jnp.float32)
    query_ref = jnp.concatenate(
        [qr[:, 0:1], jnp.broadcast_to(qr[:, 1:2], (1, S - 1, qr.shape[-1]))],
        axis=1)                                                 # (1, S, D)

    coord_preds = []
    for _ in range(iters):
        coords = jax.lax.stop_gradient(coords)
        fcorrs = corr_pyramid_sample(pyramid, track_feats, coords,
                                     cfg.corr_radius)
        corr_dim = fcorrs.shape[-1]
        fcorrs_ = _mlp(p["corr_mlp"],
                       fcorrs.transpose(0, 2, 1, 3).reshape(B * N, S, corr_dim))

        flows = (coords - coords[:, 0:1]).transpose(0, 2, 1, 3).reshape(
            B * N, S, 2)
        flows_emb = get_2d_embedding(flows, cfg.latent_dim // 2)
        flows_emb = jnp.concatenate([flows_emb, flows / cfg.max_scale,
                                     flows / cfg.max_scale], axis=-1)

        track_feats_ = track_feats.transpose(0, 2, 1, 3).reshape(B * N, S, ld)
        x = jnp.concatenate([flows_emb, fcorrs_.astype(jnp.float32),
                             track_feats_.astype(jnp.float32)], axis=-1)
        x = x + sampled_pos + query_ref
        x = x.reshape(B, N, S, cfg.transformer_dim).astype(fmaps.dtype)

        delta = update_former_apply(p["updateformer"], cfg, x)
        delta = delta.reshape(B * N, S, cfg.output_dim)
        delta_coords = delta[..., :2].astype(jnp.float32)
        delta_feats = delta[..., 2:].reshape(B * N * S, ld)

        tf_flat = track_feats_.reshape(B * N * S, ld)
        upd = jax.nn.gelu(_linear(p["ffeat_updater"],
                                  layer_norm(delta_feats, p["ffeat_norm"],
                                             1e-5)), approximate=False)
        track_feats = (upd + tf_flat).reshape(B, N, S, ld).transpose(0, 2, 1, 3)

        coords = coords + delta_coords.reshape(B, N, S, 2).transpose(0, 2, 1, 3)
        coords = coords.at[:, 0].set(jnp.broadcast_to(qp, (B, N, 2)))
        coord_preds.append(coords * cfg.stride * max(down_ratio, 1))

    tf = track_feats.astype(jnp.float32)
    vis = _linear(p["vis_predictor"], tf.reshape(B * S * N, ld)).reshape(B, S, N)
    conf = None
    if cfg.predict_conf:
        conf = _linear(p["conf_predictor"], tf.reshape(B * S * N, ld)
                       ).reshape(B, S, N)
    if apply_sigmoid:
        vis = jax.nn.sigmoid(vis)
        conf = jax.nn.sigmoid(conf) if conf is not None else None
    return coord_preds, vis, conf


# ---------------------------------------------------------------------------
# TrackHead (track_head.py:11-103)
# ---------------------------------------------------------------------------

def init_track_head(rng, cfg: TrackConfig, dpt_cfg, dtype=jnp.float32) -> Dict:
    """dpt_cfg: DPTHeadConfig(feature_only=True, down_ratio=2,
    pos_embed=False, features=latent_dim)."""
    from .heads import init_dpt_head
    rs = prng_split(rng, 2)
    return {"feature_extractor": init_dpt_head(rs[0], dpt_cfg, dtype),
            "tracker": init_tracker(rs[1], cfg, dtype)}


def track_head_forward(p: Dict, cfg: TrackConfig, dpt_cfg,
                       aggregated_tokens: List[jnp.ndarray],
                       spatial_hw: Tuple[int, int], patch_start_idx: int,
                       query_points: jnp.ndarray,
                       iters: Optional[int] = None):
    """aggregated_tokens: per-layer (B, S, P, dim_in); query_points
    (B, N, 2) in full-resolution pixels. Returns (coord_preds list,
    vis, conf) -- track_head.py:71-103 with the working feature extractor
    (causal-3D DPT, feature_only, down_ratio=2)."""
    from .heads import dpt_head_forward
    fmaps = dpt_head_forward(p["feature_extractor"], dpt_cfg,
                             aggregated_tokens, spatial_hw, patch_start_idx)
    # feature_only returns (B, T, C, H/d, W/d); the tracker's stride=2
    # accounts for the DPT down_ratio=2, so down_ratio stays 1 here
    # (track_head.py:101 passes no down_ratio).
    return tracker_predict(p["tracker"], cfg, query_points, fmaps,
                           iters=iters)
