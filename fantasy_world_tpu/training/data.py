"""Training batch assembly: raw sample -> flow-matching step inputs.

The reference ships no trainer; its single-process utilities
(diffsynth_wan22/pipelines/wan_video_new.py:586-719 one_step) consume a
dict of pre-encoded tensors. This module builds that dict from raw data
(video frames, prompt, camera poses) using the same conditioning encoders
as inference, producing exactly the batch the sharded train step
(training/step.py make_train_step) takes.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..schedulers import FlowMatchScheduler


def build_train_batch(pipe, video_frames: np.ndarray, prompt: str,
                      rng: jax.Array,
                      plucker_embedding: Optional[np.ndarray] = None,
                      sched: Optional[FlowMatchScheduler] = None,
                      num_train_steps: int = 1000) -> Dict[str, jnp.ndarray]:
    """video_frames: (T, H, W, 3) uint8 or [0,1] float. Returns the batch
    dict for make_train_step: clean_latents, noise, sigma, timestep,
    context, clip_feature, y, plucker_fea.
    """
    from ..models.wan.vae import vae_encode

    frames = np.asarray(video_frames, np.float32)
    if frames.max() > 1.5:           # uint8 range
        frames = frames / 255.0
    frames = frames * 2.0 - 1.0
    T, H, W = frames.shape[:3]
    video = jnp.asarray(frames.transpose(3, 0, 1, 2))[None]   # (1,3,T,H,W)

    dtype = pipe.param_dtype()
    clean_latents = vae_encode(pipe.params["vae"], pipe.vae_cfg,
                               video.astype(dtype)).astype(jnp.float32)

    emb = pipe.encode_image(frames[0], T, H, W)
    context = pipe.encode_prompt(prompt).astype(jnp.float32)

    sched = sched or FlowMatchScheduler().set_timesteps(num_train_steps)
    k1, k2 = jax.random.split(rng)
    idx = int(jax.random.randint(k1, (), 0, len(sched.sigmas)))
    noise = jax.random.normal(k2, clean_latents.shape, jnp.float32)

    batch = {
        "clean_latents": clean_latents,
        "noise": noise,
        "sigma": jnp.float32(sched.sigmas[idx]),
        "timestep": jnp.full((1,), float(sched.timesteps[idx])),
        "context": context,
        "clip_feature": (None if emb["clip_feature"] is None
                         else emb["clip_feature"].astype(jnp.float32)),
        "y": emb["y"].astype(jnp.float32),
    }
    if plucker_embedding is not None:
        batch["plucker_fea"] = pipe.encode_plucker(
            plucker_embedding).astype(jnp.float32)
    return batch
