"""VGGT geometry model consuming Wan DiT features (vggt/models/vggt.py).

Owns the 5120->1024 projection, the fp32 timestep AdaLN embedding, the
aggregator, and the camera/depth/point/track heads. The track head is
disabled in the reference inference config (inference_wan21.py:193) and is
off by default here too (enable_track=False); when enabled it runs the
working CoTracker-style stack in track.py (the reference's own TrackHead
cannot even be constructed -- track_head.py:49 NameError).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ...core.params import prng_split, init_linear
from ...ops import rope as rope_ops
from .aggregator import (AggregatorConfig, init_aggregator,
                         aggregator_forward, assemble_tokens)
from .heads import (CameraHeadConfig, DPTHeadConfig, init_camera_head,
                    init_dpt_head, camera_head_forward, dpt_head_forward)


@dataclasses.dataclass(frozen=True)
class VGGTConfig:
    embed_dim: int = 1024
    freq_dim: int = 256
    wan_dim: int = 5120
    enable_camera: bool = True
    enable_depth: bool = True
    enable_point: bool = True
    enable_track: bool = False
    dpt_patch_size: int = 16
    dpt_layer_idx: Tuple[int, ...] = (23, 17, 11, 7)
    dpt_features: int = 256
    dpt_out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    camera_num_heads: int = 16
    aggregator: AggregatorConfig = AggregatorConfig()

    @property
    def camera_head(self) -> CameraHeadConfig:
        return CameraHeadConfig(dim_in=2 * self.embed_dim,
                                num_heads=self.camera_num_heads)

    def dpt_head(self, output_dim: int, activation: str) -> DPTHeadConfig:
        return DPTHeadConfig(dim_in=2 * self.embed_dim,
                             patch_size=self.dpt_patch_size,
                             output_dim=output_dim, activation=activation,
                             features=self.dpt_features,
                             out_channels=self.dpt_out_channels,
                             intermediate_layer_idx=self.dpt_layer_idx)

    @property
    def track(self):
        from .track import TrackConfig
        return TrackConfig()

    @property
    def track_dpt(self) -> DPTHeadConfig:
        # track_head.py:49-56: features=128, down_ratio=2, pos_embed=False
        return DPTHeadConfig(dim_in=2 * self.embed_dim,
                             patch_size=self.dpt_patch_size,
                             output_dim=0, features=self.track.latent_dim,
                             out_channels=self.dpt_out_channels,
                             intermediate_layer_idx=self.dpt_layer_idx,
                             pos_embed=False, down_ratio=2,
                             feature_only=True)


def init_vggt(rng, cfg: VGGTConfig, dtype=jnp.bfloat16) -> Dict:
    rs = prng_split(rng, 8)
    p = {
        "projection_head": init_linear(rs[0], cfg.wan_dim, cfg.embed_dim,
                                       dtype=dtype),
        # fp32 island (vggt.py:78-82)
        "time_embedding": {
            "fc1": init_linear(rs[1], cfg.freq_dim, cfg.embed_dim,
                               dtype=jnp.float32),
            "fc2": init_linear(rs[2], cfg.embed_dim, cfg.embed_dim,
                               dtype=jnp.float32)},
        "time_projection": init_linear(rs[3], cfg.embed_dim,
                                       cfg.embed_dim * 6, dtype=jnp.float32),
        "aggregator": init_aggregator(rs[4], cfg.aggregator, dtype),
    }
    if cfg.enable_camera:
        p["camera_head"] = init_camera_head(rs[5], cfg.camera_head, dtype)
    if cfg.enable_depth:
        p["depth_head"] = init_dpt_head(rs[6], cfg.dpt_head(2, "exp"), dtype)
    if cfg.enable_point:
        p["point_head"] = init_dpt_head(rs[7], cfg.dpt_head(4, "inv_log"), dtype)
    if cfg.enable_track:
        from .track import init_track_head
        # fold: rs[4] already seeds the aggregator; reusing it verbatim
        # would give the two subtrees identical random streams
        from ...core.params import prng_fold_in
        p["track_head"] = init_track_head(prng_fold_in(rs[4], 1),
                                          cfg.track, cfg.track_dpt, dtype)
    return p


def _linear_f32(p, x):
    y = jnp.dot(x.astype(jnp.float32), p["kernel"].astype(jnp.float32))
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y


def process_wan_input(p: Dict, cfg: VGGTConfig, wan_features: jnp.ndarray,
                      timestep: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, F, H, W, wan_dim) DiT features + timestep -> (patch_tokens
    (B, F, H, W, embed_dim), e0 (B, 6, embed_dim) fp32).

    Mirrors VGGT._process_wan_input (vggt.py:118-131); the 1x1x1 Conv3d
    projection is a plain linear over the channel axis.
    """
    proj = jnp.dot(wan_features, p["projection_head"]["kernel"].astype(
        wan_features.dtype), preferred_element_type=jnp.float32)
    proj = (proj + p["projection_head"]["bias"].astype(jnp.float32)
            ).astype(wan_features.dtype)
    emb = rope_ops.sinusoidal_embedding_1d(cfg.freq_dim, timestep)
    e = _linear_f32(p["time_embedding"]["fc2"],
                    jax.nn.silu(_linear_f32(p["time_embedding"]["fc1"], emb)))
    e0 = _linear_f32(p["time_projection"], jax.nn.silu(e))
    return proj, e0.reshape(e.shape[0], 6, cfg.embed_dim)


def head_prediction(p: Dict, cfg: VGGTConfig,
                    aggregated_tokens: List[jnp.ndarray],
                    spatial_hw: Tuple[int, int],
                    patch_start_idx: int,
                    query_points: Optional[jnp.ndarray] = None
                    ) -> Dict[str, jnp.ndarray]:
    """Camera/depth/point heads over the per-layer intermediates
    (VGGT._head_predction, vggt.py:134-154)."""
    out: Dict[str, jnp.ndarray] = {}
    if "camera_head" in p:
        poses = camera_head_forward(p["camera_head"], cfg.camera_head,
                                    aggregated_tokens[-1])
        out["pose_enc"] = poses[-1]
    if "depth_head" in p:
        depth, conf = dpt_head_forward(p["depth_head"],
                                       cfg.dpt_head(2, "exp"),
                                       aggregated_tokens, spatial_hw,
                                       patch_start_idx)
        out["depth"], out["depth_conf"] = depth, conf
    if "point_head" in p:
        pts, conf = dpt_head_forward(p["point_head"],
                                     cfg.dpt_head(4, "inv_log"),
                                     aggregated_tokens, spatial_hw,
                                     patch_start_idx)
        out["world_points"], out["world_points_conf"] = pts, conf
    if "track_head" in p and query_points is not None:
        from .track import track_head_forward
        coords, vis, conf = track_head_forward(
            p["track_head"], cfg.track, cfg.track_dpt, aggregated_tokens,
            spatial_hw, patch_start_idx, query_points)
        out["track"], out["vis"], out["track_conf"] = coords[-1], vis, conf
    return out


def vggt_forward(p: Dict, cfg: VGGTConfig, wan_features: jnp.ndarray,
                 timestep: jnp.ndarray,
                 camera_token: Optional[jnp.ndarray] = None,
                 query_points: Optional[jnp.ndarray] = None
                 ) -> Dict[str, jnp.ndarray]:
    """Standalone geometry pass (BASELINE config 1)."""
    patch_tokens, e0 = process_wan_input(p, cfg, wan_features, timestep)
    outputs, start = aggregator_forward(p["aggregator"], cfg.aggregator,
                                        patch_tokens, camera_token, e0)
    hw = wan_features.shape[2:4]
    return head_prediction(p, cfg, outputs, hw, start, query_points)
