"""Wan2.2 TI2V-5B denoise loop (standalone DiT, no fusion branch).

The TI2V-5B model (registry hash 1f5ab770...) conditions on the input image
by FUSING its VAE latent into latent frame 0 instead of a y-channel concat:
frame-0 tokens are modulated at t=0 (cfg.seperated_timestep,
models/wan/dit.py per-token timestep path) and after every scheduler step
the frame is re-clamped to the clean latents
(wan22 wan_video_new.py:564-565, 896-915, 1555-1566).

One jitted lax.scan over the step axis; CFG as a batch of 2 like
FantasyWorldPipeline.denoise. This path exists for DiffSynth model-zoo
completeness -- FantasyWorld itself never instantiates TI2V-5B.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wan.dit import WanDiTConfig, wan_dit_forward
from ..schedulers import FlowMatchScheduler


@partial(jax.jit, static_argnames=("cfg", "cfg_scale", "fuse"))
def _ti2v_scan(params: Dict, cfg: WanDiTConfig, latents, first_frame,
               ts, sigmas, sigmas_next, ctx2, cfg_scale: float, fuse: bool):
    B = latents.shape[0]

    def step_fn(lat, inputs):
        t, sigma, sigma_next = inputs
        lat2 = jnp.concatenate([lat, lat], axis=0)
        # keep the timestep f32: bf16 spacing near t=1000 is 4, which
        # would round t before the sinusoidal embedding; and do the Euler
        # update in f32 like every other denoise loop (wan_video.py:52)
        noise = wan_dit_forward(params, cfg, lat2,
                                jnp.full((2 * B,), t, jnp.float32), ctx2,
                                fuse_first_frame=fuse)
        posi, nega = noise[:B], noise[B:]
        pred = nega + cfg_scale * (posi - nega)
        lat = (lat.astype(jnp.float32) + pred.astype(jnp.float32)
               * (sigma_next - sigma)).astype(lat.dtype)
        if fuse:
            lat = lat.at[:, :, 0:1].set(first_frame.astype(lat.dtype))
        return lat, None

    latents, _ = jax.lax.scan(step_fn, latents,
                              (ts, sigmas, sigmas_next))
    return latents


def denoise_ti2v(params: Dict, cfg: WanDiTConfig, context_pos, context_neg,
                 height: int, width: int, num_frames: int = 121,
                 num_inference_steps: int = 50, cfg_scale: float = 5.0,
                 seed: Optional[int] = None,
                 first_frame_latents=None) -> jnp.ndarray:
    """Returns final latents (B, out_dim, f, h/16, w/16) -- TI2V-5B runs on
    the 38-block VAE's 16x-spatial z=48 latent grid."""
    if num_frames % 4 != 1:
        num_frames = (num_frames + 2) // 4 * 4 + 1
    f = (num_frames - 1) // 4 + 1
    sched = FlowMatchScheduler().set_timesteps(num_inference_steps)

    dtype = params["patch_embedding"]["kernel"].dtype
    B = context_pos.shape[0]
    key = jax.random.PRNGKey(0 if seed is None else seed)
    latents = jax.random.normal(
        key, (B, cfg.out_dim, f, height // 16, width // 16),
        jnp.float32).astype(dtype)
    fuse = (cfg.seperated_timestep and cfg.fuse_vae_embedding_in_latents
            and first_frame_latents is not None)
    if fuse:
        latents = latents.at[:, :, 0:1].set(
            first_frame_latents.astype(dtype))
    ctx2 = jnp.concatenate([context_pos, context_neg], axis=0).astype(dtype)

    pairs = sched.sigma_pairs()
    return _ti2v_scan(
        params, cfg, latents,
        first_frame_latents if fuse else jnp.zeros_like(latents[:, :, 0:1]),
        jnp.asarray(sched.timesteps, jnp.float32),
        jnp.asarray(pairs[:, 0], jnp.float32),
        jnp.asarray(pairs[:, 1], jnp.float32),
        ctx2, float(cfg_scale), bool(fuse))
