"""Pipeline-parallel flow-matching training for the video DiT.

The reference ships no trainer at all (SURVEY.md section 2.2:
vram_management is its only memory story); this repo's fusion trainer
(training/step.py) scales over ('data','seq','model') via GSPMD. For
fine-tuning the plain Wan video DiT -- a HOMOGENEOUS 40-block stack,
unlike the fusion model's PCB/IRG mix -- the block dimension itself can
also be sharded: each device holds a contiguous stage of blocks and
microbatches march through them (parallel/pipeline.py GPipe schedule).
That divides the block-parameter + optimizer-state HBM footprint by the
stage count S, the TPU-native answer to training 14B on small-HBM chips.

Composes with data parallelism: on a ('pipe','data') mesh the pipeline's
shard_map keeps only 'pipe' manual and the batch stays GSPMD-sharded over
'data' inside every stage.

Surface: ``fantasy_world_tpu.cli.train --pipe_stages S`` selects this
step (video-DiT-only training; the fusion stack's heterogeneous blocks
cannot be stage-stacked).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.params import stack_trees
from ..models.wan.dit import (WanDiTConfig, head_apply, prepare_inputs,
                              unpatchify)
from ..parallel.pipeline import pipeline_dit_blocks


def split_dit_trainable(params: Dict) -> Tuple[Dict, Dict]:
    """(lite, blocks_stacked): embeddings/head vs the scan-stacked block
    params the pipeline stages consume. The block list must be structurally
    uniform -- camera-adapter configs attach extra per-block params to a
    subset of layers and cannot be stage-stacked."""
    lite = {k: v for k, v in params.items() if k != "blocks"}
    blocks = params["blocks"]
    trees = [jax.tree_util.tree_structure(b) for b in blocks]
    if any(t != trees[0] for t in trees[1:]):
        raise ValueError(
            "pipeline training needs a homogeneous block stack; this config "
            "has per-layer structural differences (e.g. camera adapters)")
    return lite, stack_trees(blocks)


def pp_flow_match_loss(lite: Dict, blocks_stacked: Dict, cfg: WanDiTConfig,
                       clean_latents: jnp.ndarray, noise: jnp.ndarray,
                       sigma: jnp.ndarray, timestep: jnp.ndarray,
                       context: jnp.ndarray, clip_feature=None, y=None, *,
                       mesh, axis: str = "pipe",
                       microbatches: int) -> jnp.ndarray:
    """Rectified-flow MSE (same objective as training/step.py
    flow_match_loss, reference wan_video_new.py:586-719) with the block
    stack run as a GPipe pipeline over ``axis``. clip_feature/y carry the
    i2v conditioning (CLIP tokens prepended to context, y-latents
    channel-concatenated) for has_image_input/require_vae_embedding
    configs; sigma may be scalar or per-sample broadcastable."""
    noisy = (1 - sigma) * clean_latents + sigma * noise
    tokens, t, t_mod, ctx, grid, (cos, sin) = prepare_inputs(
        lite, cfg, noisy, timestep, context, clip_feature, y)
    tokens = pipeline_dit_blocks(blocks_stacked, cfg, tokens, ctx, t_mod,
                                 cos, sin, mesh=mesh, axis=axis,
                                 microbatches=microbatches)
    out = head_apply(lite, cfg, tokens, t)
    pred = unpatchify(cfg, out, grid)
    target = noise - clean_latents
    return jnp.mean(jnp.square(pred.astype(jnp.float32)
                               - target.astype(jnp.float32)))


def make_pp_train_step(cfg: WanDiTConfig,
                       optimizer: optax.GradientTransformation, *,
                       mesh, axis: str = "pipe", microbatches: int):
    """Returns train_step((lite, blocks_stacked), opt_state, batch) ->
    (trainable, opt_state, loss). batch keys: clean_latents, noise, sigma,
    timestep, context. Differentiable through the pipeline's
    ppermute/where schedule (gradients equal the sequential stack,
    tests/test_pp_train.py). Jit with donate_argnums=(0, 1)."""

    def train_step(trainable, opt_state, batch):
        def loss_fn(tr):
            lite, blocks = tr
            return pp_flow_match_loss(lite, blocks, cfg, mesh=mesh,
                                      axis=axis, microbatches=microbatches,
                                      **batch)
        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    return train_step
