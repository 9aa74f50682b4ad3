"""Wan2.2-Fun-A14B-Control-Camera dual-model pipeline.

Mirrors inference_wan22.py generate_video_with_dual_models (:164-283): two
14B DiTs (Reward-LoRA-merged high/low-noise experts) switched at a timestep
boundary (default 900), camera control injected at the patch embedding via
control-camera latents (Plucker video folded 4-frames-to-channels) instead
of per-layer attention adapters, no CLIP branch.

The timestep schedule is host-known, so the switch is resolved statically:
steps with t > boundary run a scan over the high model, the rest over the
low model -- no device-side branching, each expert's weights stream once.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.fusion.model import FusionConfig, joint_forward
from ..schedulers import FlowMatchScheduler


@functools.partial(jax.jit, static_argnames=("cfg", "cfg_scale"))
def _expert_scan(params, scan, cfg, latents, xs, ctx, y2, ctrl2, cfg_scale):
    """One expert's denoise steps in a jitted scan; params as jit arguments
    (closure capture would embed the 14B tree as lowering constants)."""

    def step_fn(lat, inputs):
        timestep, sigma, sigma_next = inputs
        lat2 = jnp.concatenate([lat] * 2, axis=0)
        noise, _ = joint_forward(params, scan, cfg, lat2,
                                 jnp.full((2,), timestep), ctx, None, y2,
                                 control_camera_latents=ctrl2)
        pred = noise[1:2] + cfg_scale * (noise[0:1] - noise[1:2])
        return (lat.astype(jnp.float32) + pred.astype(jnp.float32)
                * (sigma_next - sigma)).astype(lat.dtype), None

    latents, _ = jax.lax.scan(step_fn, latents, xs)
    return latents


@functools.partial(jax.jit, static_argnames=("cfg", "cfg_scale"))
def _expert_final_step(params, scan, cfg, latents, t_last, sigma, sigma_next,
                       ctx, y2, ctrl2, cfg_scale):
    lat2 = jnp.concatenate([latents] * 2, axis=0)
    noise, prediction = joint_forward(
        params, scan, cfg, lat2, t_last, ctx, None, y2,
        control_camera_latents=ctrl2, return_prediction=True)
    pred = noise[1:2] + cfg_scale * (noise[0:1] - noise[1:2])
    latents = (latents.astype(jnp.float32) + pred.astype(jnp.float32)
               * (sigma_next - sigma)).astype(latents.dtype)
    return latents, prediction


def control_camera_latents_from_plucker(plucker: np.ndarray) -> np.ndarray:
    """(1, F, H, W, 6) Plucker video -> (1, 24, (F-1)/4+1, H, W) control
    latents: frame 0 repeated 4x, then 4 consecutive frames folded into
    channels (inference_wan22.py:204-218)."""
    video = np.transpose(plucker[0], (3, 0, 1, 2))[None]      # (1,6,F,H,W)
    video = np.concatenate([np.repeat(video[:, :, 0:1], 4, axis=2),
                            video[:, :, 1:]], axis=2)          # (1,6,F+3,H,W)
    lat = np.transpose(video, (0, 2, 1, 3, 4))                 # (1,f4,6,H,W)
    b, f4, c, h, w = lat.shape
    lat = lat.reshape(b, f4 // 4, 4, c, h, w).transpose(0, 1, 3, 2, 4, 5)
    lat = lat.reshape(b, f4 // 4, c * 4, h, w).transpose(0, 2, 1, 3, 4)
    return lat                                                  # (1,24,f,H,W)


@dataclasses.dataclass
class DualModelDenoiser:
    """Two fusion param sets sharing one config, switched by timestep."""
    cfg: FusionConfig
    params_high: Dict            # fusion tree (dit/vggt/bicross)
    params_low: Dict
    scan_high: Dict = None
    scan_low: Dict = None
    timestep_boundary: float = 900.0

    def __post_init__(self):
        from ..models.fusion.model import prepare_scan_params
        if self.scan_high is None:
            self.scan_high = prepare_scan_params(self.params_high, self.cfg)
        if self.scan_low is None:
            self.scan_low = prepare_scan_params(self.params_low, self.cfg)

    def quantize(self, mode: str = "int8", **kw) -> None:
        """int8 w8a8 / fp8-storage rewrite of both experts' dense hot
        paths (core/quant.py; see FantasyWorldPipeline.quantize)."""
        from ..core.quant import quantize_tree
        self.params_high = quantize_tree(self.params_high, mode, **kw)
        self.params_low = quantize_tree(self.params_low, mode, **kw)
        self.scan_high = quantize_tree(self.scan_high, mode, **kw)
        self.scan_low = quantize_tree(self.scan_low, mode, **kw)

    def denoise(self, context_pos, context_neg, y, height: int, width: int,
                num_frames: int = 81, num_inference_steps: int = 50,
                cfg_scale: float = 5.0, seed: Optional[int] = None,
                control_camera_latents=None):
        if num_frames % 4 != 1:
            num_frames = (num_frames + 2) // 4 * 4 + 1
        f = (num_frames - 1) // 4 + 1
        sched = FlowMatchScheduler().set_timesteps(num_inference_steps)
        dtype = self.params_high["dit"]["patch_embedding"]["kernel"].dtype

        key = jax.random.PRNGKey(0 if seed is None else seed)
        latents = jax.random.normal(
            key, (1, 16, f, height // 8, width // 8), jnp.float32).astype(dtype)

        ctx = jnp.concatenate([context_pos, context_neg], axis=0).astype(dtype)
        y2 = jnp.concatenate([y] * 2, axis=0).astype(dtype)
        ctrl2 = (None if control_camera_latents is None else
                 jnp.concatenate([jnp.asarray(control_camera_latents,
                                              dtype)] * 2, axis=0))

        pairs = sched.sigma_pairs()
        ts = sched.timesteps
        n_high = int((ts > self.timestep_boundary).sum())

        # high-noise expert phase
        if n_high > 0:
            xs = (jnp.asarray(ts[:n_high]), jnp.asarray(pairs[:n_high, 0]),
                  jnp.asarray(pairs[:n_high, 1]))
            latents = _expert_scan(self.params_high, self.scan_high,
                                   self.cfg, latents, xs, ctx, y2, ctrl2,
                                   cfg_scale)
        # low-noise expert phase (all but the final step)
        if n_high < len(ts) - 1:
            xs = (jnp.asarray(ts[n_high:-1]),
                  jnp.asarray(pairs[n_high:-1, 0]),
                  jnp.asarray(pairs[n_high:-1, 1]))
            latents = _expert_scan(self.params_low, self.scan_low, self.cfg,
                                   latents, xs, ctx, y2, ctrl2, cfg_scale)

        # final step with geometry heads on the active expert
        params, scan = ((self.params_high, self.scan_high)
                        if n_high >= len(ts)
                        else (self.params_low, self.scan_low))
        latents, prediction = _expert_final_step(
            params, scan, self.cfg, latents, jnp.full((2,), float(ts[-1])),
            jnp.float32(pairs[-1, 0]), jnp.float32(pairs[-1, 1]), ctx, y2,
            ctrl2, cfg_scale)
        if prediction is not None:
            prediction = {k: v[:1] for k, v in prediction.items()}
        return latents, prediction
