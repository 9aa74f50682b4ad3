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


@functools.partial(jax.jit, static_argnames=("dcfg",))
def _control_tokens_jit(dit_params, dcfg, ctrl2):
    """Per-clip evaluation of the step-invariant control-camera adapter
    (dit.control_adapter_tokens): ~62 TFLOPs at 480x832, hoisted out of
    the 50-step denoise scans below (the torch reference pays it inside
    patchify on every CFG forward)."""
    from ..models.wan.dit import control_adapter_tokens
    return control_adapter_tokens(dit_params, dcfg, ctrl2)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "cfg_scale", "mesh", "ulysses"),
                   donate_argnums=(3,))
def _expert_scan(params, scan, cfg, latents, xs, ctx, y2, ctok2, cfg_scale,
                 mesh=None, ulysses=False):
    """One expert's denoise steps in a jitted scan; params as jit arguments
    (closure capture would embed the 14B tree as lowering constants).
    ctok2: the expert's precomputed control tokens (or None)."""

    def step_fn(lat, inputs):
        timestep, sigma, sigma_next = inputs
        lat2 = jnp.concatenate([lat] * 2, axis=0)
        noise, _ = joint_forward(params, scan, cfg, lat2,
                                 jnp.full((2,), timestep), ctx, None, y2,
                                 control_tokens=ctok2,
                                 mesh=mesh, ulysses=ulysses)
        pred = noise[1:2] + cfg_scale * (noise[0:1] - noise[1:2])
        return (lat.astype(jnp.float32) + pred.astype(jnp.float32)
                * (sigma_next - sigma)).astype(lat.dtype), None

    latents, _ = jax.lax.scan(step_fn, latents, xs)
    return latents


@functools.partial(jax.jit,
                   static_argnames=("cfg", "cfg_scale", "mesh", "ulysses"),
                   donate_argnums=(3, 4))
def _expert_scan_tea(params, scan, cfg, latents, residual0, xs, ctx, y2,
                     ctok2, cfg_scale, mesh=None, ulysses=False):
    """TeaCache-gated expert scan: xs carries the host-planned per-step
    skip boolean, the carry threads the cached block-stack residual (see
    pipelines/tea_cache.py; reference wan_video_new.py:1380-1422). The
    residual persists across the expert boundary, like the reference's
    shared TeaCache instance across the switch_DiT_boundary swap."""
    from ..models.fusion.model import joint_forward_tea

    def step_fn(carry, inputs):
        lat, res = carry
        timestep, sigma, sigma_next, skip = inputs
        lat2 = jnp.concatenate([lat] * 2, axis=0)
        noise, res = joint_forward_tea(
            params, scan, cfg, lat2, jnp.full((2,), timestep), ctx, None,
            y2, skip=skip, residual=res, control_tokens=ctok2,
            mesh=mesh, ulysses=ulysses)
        pred = noise[1:2] + cfg_scale * (noise[0:1] - noise[1:2])
        lat = (lat.astype(jnp.float32) + pred.astype(jnp.float32)
               * (sigma_next - sigma)).astype(lat.dtype)
        return (lat, res), None

    (latents, residual), _ = jax.lax.scan(step_fn, (latents, residual0), xs)
    return latents, residual


@functools.partial(jax.jit,
                   static_argnames=("cfg", "cfg_scale", "mesh", "ulysses"))
def _expert_final_step(params, scan, cfg, latents, t_last, sigma, sigma_next,
                       ctx, y2, ctok2, cfg_scale, mesh=None, ulysses=False):
    lat2 = jnp.concatenate([latents] * 2, axis=0)
    noise, prediction = joint_forward(
        params, scan, cfg, lat2, t_last, ctx, None, y2,
        control_tokens=ctok2, return_prediction=True,
        mesh=mesh, ulysses=ulysses)
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

    def shard(self, mesh) -> None:
        """Shard both experts over the mesh (see
        FantasyWorldPipeline.shard); pass the same mesh to denoise()."""
        from ..models.fusion.model import split_trainable
        from ..parallel.sharding import (param_specs, stacked_specs,
                                         shard_tree)
        for p_attr, s_attr in (("params_high", "scan_high"),
                               ("params_low", "scan_low")):
            lite, scan = split_trainable(getattr(self, p_attr), self.cfg,
                                         scan=getattr(self, s_attr))
            setattr(self, p_attr,
                    shard_tree(lite, mesh, param_specs(lite, mesh=mesh)))
            setattr(self, s_attr,
                    shard_tree(scan, mesh, stacked_specs(scan, mesh=mesh)))

    def denoise(self, context_pos, context_neg, y, height: int, width: int,
                num_frames: int = 81, num_inference_steps: int = 50,
                cfg_scale: float = 5.0, seed: Optional[int] = None,
                control_camera_latents=None, mesh=None,
                ulysses: bool = False,
                tea_cache_l1_thresh: Optional[float] = None,
                tea_cache_model_id: str = "Wan2.1-I2V-14B-480P",
                segment_size: Optional[int] = None,
                progress_callback=None,
                gen_ckpt_path: Optional[str] = None):
        """mesh/ulysses: multi-chip denoise over a Mesh(('data','seq',
        'model')); both experts' params must already be sharded over it
        (see FantasyWorldPipeline.denoise, parallel/sharding.py).

        tea_cache_l1_thresh/tea_cache_model_id: TeaCache block-stack
        skipping (the reference wan22 stack ships the same Wan2.1
        coefficient tables, wan_video_new.py:1390-1395); the skip schedule
        is planned on the host per expert phase and the cached residual
        persists across the expert boundary, matching the reference's
        shared TeaCache instance across the switch_DiT_boundary swap.

        segment_size/progress_callback/gen_ckpt_path: segmented denoise
        with per-segment progress and atomic preemption-resume checkpoints
        (see FantasyWorldPipeline.denoise); segments never span the expert
        boundary, so resuming always re-enters the correct expert."""
        if num_frames % 4 != 1:
            num_frames = (num_frames + 2) // 4 * 4 + 1
        f = (num_frames - 1) // 4 + 1
        sched = FlowMatchScheduler().set_timesteps(num_inference_steps)
        dtype = self.params_high["dit"]["patch_embedding"]["kernel"].dtype

        key = jax.random.PRNGKey(0 if seed is None else seed)
        # latent channels = DiT input width minus the concatenated VAE
        # embedding (16 in production: in_dim 32 - y 16)
        lat_ch = (self.cfg.dit.in_dim - y.shape[1]
                  if self.cfg.dit.require_vae_embedding else
                  self.cfg.dit.in_dim)
        latents = jax.random.normal(
            key, (1, lat_ch, f, height // 8, width // 8),
            jnp.float32).astype(dtype)

        ctx = jnp.concatenate([context_pos, context_neg], axis=0).astype(dtype)
        y2 = jnp.concatenate([y] * 2, axis=0).astype(dtype)
        ctrl2 = (None if control_camera_latents is None else
                 jnp.concatenate([jnp.asarray(control_camera_latents,
                                              dtype)] * 2, axis=0))

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            dsz = mesh.shape.get("data", 1)

            def place(x):
                if x is None:
                    return None
                spec = P("data") if x.shape[0] % dsz == 0 else P()
                return jax.device_put(x, NamedSharding(mesh, spec))

            latents, ctx, y2, ctrl2 = map(place, (latents, ctx, y2, ctrl2))

        # hoist the step-invariant control adapter: one evaluation per
        # expert (each has its own SimpleAdapter weights) feeds all of that
        # expert's steps; the 0.8 GB pixel-res latents never enter the scans
        ctok = {True: None, False: None}     # keyed by `high`
        if ctrl2 is not None:
            ctok[True] = _control_tokens_jit(self.params_high["dit"],
                                             self.cfg.dit, ctrl2)
            ctok[False] = _control_tokens_jit(self.params_low["dit"],
                                              self.cfg.dit, ctrl2)

        pairs = sched.sigma_pairs()
        ts = sched.timesteps
        n_scan = len(ts) - 1                 # final step runs with heads
        n_high = int((ts > self.timestep_boundary).sum())

        tea = tea_cache_l1_thresh is not None
        residual = skips = None
        if tea:
            from .tea_cache import compute_skip_schedule_dual
            skips = compute_skip_schedule_dual(
                self.params_high["dit"], self.params_low["dit"],
                self.cfg.dit, ts, n_high, tea_cache_l1_thresh,
                tea_cache_model_id)
            pt = self.cfg.dit.patch_size
            n_tok = f * (height // 8 // pt[1]) * (width // 8 // pt[2])
            residual = jnp.zeros((2, n_tok, self.cfg.dit.dim), dtype)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                dsz = mesh.shape.get("data", 1)
                residual = jax.device_put(residual, NamedSharding(
                    mesh, P("data") if 2 % dsz == 0 else P()))

        def make_xs(i, j):
            parts = [jnp.asarray(ts[i:j]), jnp.asarray(pairs[i:j, 0]),
                     jnp.asarray(pairs[i:j, 1])]
            if tea:
                parts.append(jnp.asarray(skips[i:j]))
            return tuple(parts)

        import os
        segmented = (segment_size is not None or progress_callback is not None
                     or gen_ckpt_path is not None)
        start = 0
        if gen_ckpt_path and os.path.exists(gen_ckpt_path):
            data = np.load(gen_ckpt_path)
            if (int(data["n_scan"]) == n_scan
                    and tuple(data["latents"].shape) == latents.shape
                    # no residual in the file = written without TeaCache;
                    # resuming a TeaCache run from it would substitute a
                    # zero residual for the block stack on skip steps
                    and (not tea or "residual" in data)):
                start = int(data["step"])

                def restore(x, like):
                    x = jnp.asarray(x).astype(like.dtype)
                    return (jax.device_put(x, like.sharding)
                            if mesh is not None else x)

                latents = restore(data["latents"], latents)
                if tea and "residual" in data:
                    residual = restore(data["residual"], residual)
        total = n_scan + 1
        if progress_callback and start:
            progress_callback(start, total)

        # unified phase/segment host loop: segments never span the expert
        # boundary (each expert's weights stream through its own scan)
        seg = max(1, segment_size or n_scan)
        i = start
        while i < n_scan:
            high = i < n_high
            p, s = ((self.params_high, self.scan_high) if high
                    else (self.params_low, self.scan_low))
            phase_end = min(n_high, n_scan) if high else n_scan
            j = min(i + seg, phase_end)
            xs = make_xs(i, j)
            if tea:
                latents, residual = _expert_scan_tea(
                    p, s, self.cfg, latents, residual, xs, ctx, y2,
                    ctok[high], cfg_scale, mesh=mesh, ulysses=ulysses)
            else:
                latents = _expert_scan(p, s, self.cfg, latents, xs, ctx, y2,
                                       ctok[high], cfg_scale, mesh=mesh,
                                       ulysses=ulysses)
            i = j
            if segmented:
                # sync so progress/checkpoints reflect FINISHED device work
                # (block_until_ready returns early on the tunneled platform)
                np.asarray(jax.device_get(latents.ravel()[0]))
                if gen_ckpt_path:
                    state = {"step": np.asarray(i),
                             "n_scan": np.asarray(n_scan),
                             "latents": np.asarray(latents, np.float32)}
                    if tea and residual is not None:
                        state["residual"] = np.asarray(residual, np.float32)
                    tmp = gen_ckpt_path + ".tmp"
                    with open(tmp, "wb") as fh:
                        np.savez(fh, **state)
                    os.replace(tmp, gen_ckpt_path)
                if progress_callback:
                    progress_callback(i, total)

        # final step with geometry heads on the active expert
        final_high = n_high >= len(ts)
        params, scan = ((self.params_high, self.scan_high) if final_high
                        else (self.params_low, self.scan_low))
        latents, prediction = _expert_final_step(
            params, scan, self.cfg, latents, jnp.full((2,), float(ts[-1])),
            jnp.float32(pairs[-1, 0]), jnp.float32(pairs[-1, 1]), ctx, y2,
            ctok[final_high], cfg_scale, mesh=mesh, ulysses=ulysses)
        if gen_ckpt_path:
            np.asarray(jax.device_get(latents.ravel()[0]))
            if os.path.exists(gen_ckpt_path):
                os.remove(gen_ckpt_path)
        if progress_callback:
            progress_callback(total, total)
        if prediction is not None:
            prediction = {k: v[:1] for k, v in prediction.items()}
        if mesh is not None:
            # gather off the mesh: decode/export jits run on the default
            # device and reject mesh-committed inputs
            dev0 = jax.devices()[0]
            latents = jax.device_put(latents, dev0)
            if prediction is not None:
                prediction = jax.device_put(prediction, dev0)
        return latents, prediction
