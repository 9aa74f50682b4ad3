"""Flow-matching training step for the fusion model.

The reference ships only single-process training utilities
(diffsynth_wan22/pipelines/wan_video_new.py:586-719 one_step /
training_loss); here the same rectified-flow objective (target = noise -
sample, flow_match.py:76-78) is a pure jitted function over sharded param
trees, scaling over the ('data','seq','model') mesh via GSPMD.

On TPU the backward differentiates through the Pallas flash-attention
kernels via their custom VJP (ops/flash_attention.py:_flash_backward) --
the XLA fallback cannot materialize the production logits, so this is
what makes training at real token counts possible at all.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.fusion.model import FusionConfig, joint_forward
from ..schedulers import FlowMatchScheduler


def flow_match_loss(params: Dict, scan_params: Dict, cfg: FusionConfig,
                    clean_latents: jnp.ndarray, noise: jnp.ndarray,
                    sigma: jnp.ndarray, timestep: jnp.ndarray,
                    context: jnp.ndarray, clip_feature, y,
                    plucker_fea=None, mesh=None,
                    remat: bool = False) -> jnp.ndarray:
    """Rectified-flow MSE at one sampled timestep."""
    noisy = (1 - sigma) * clean_latents + sigma * noise
    pred, _ = joint_forward(params, scan_params, cfg, noisy, timestep,
                            context, clip_feature, y,
                            plucker_fea=plucker_fea, mesh=mesh, remat=remat)
    target = noise - clean_latents
    return jnp.mean(jnp.square(pred.astype(jnp.float32)
                               - target.astype(jnp.float32)))


def make_train_step(cfg: FusionConfig, optimizer: optax.GradientTransformation,
                    mesh=None, remat: bool = True):
    """Returns train_step(trainable, opt_state, batch) -> (trainable,
    opt_state, loss), where trainable = (params_lite, scan_params) from
    models.fusion.model.split_trainable -- one copy of every weight, so
    grads and updates are well-defined.

    remat defaults on: every scan-body block is rematerialized on backward,
    mirroring the reference's per-block gradient checkpointing granularity
    (fusion/model_wan21.py:160-169). Jit with donation to update in place:
        jax.jit(step, donate_argnums=(0, 1)).
    """

    def train_step(trainable, opt_state, batch):
        def loss_fn(tr):
            lite, scan_p = tr
            return flow_match_loss(lite, scan_p, cfg, mesh=mesh, remat=remat,
                                   **batch)
        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    return train_step


def sample_training_inputs(rng, sched: FlowMatchScheduler, shape):
    """Draw (noise, sigma, timestep) for one step."""
    k1, k2 = jax.random.split(rng)
    idx = jax.random.randint(k1, (), 0, len(sched.sigmas))
    sigma = jnp.asarray(sched.sigmas)[idx]
    t = jnp.asarray(sched.timesteps)[idx]
    noise = jax.random.normal(k2, shape, jnp.float32)
    return noise, sigma, t
