"""FantasyWorld generation pipeline: conditioning -> denoise -> decode.

TPU-native orchestration of the reference WanVideoPipeline + fusion
generate_video (pipelines/wan_video.py; fusion/model_wan21.py:226-324):

  * encode_prompt: umT5 ids -> context, zeroed past each prompt length
    (wan_prompter.py:99-109); tokenization is host-side (a HF tokenizer
    path may be supplied, otherwise pre-tokenized ids are accepted).
  * encode_image: CLIP 257-token penultimate features + y = [4ch frame
    mask ‖ 16ch VAE latent of the masked first-frame video]
    (wan_video.py:218-276).
  * denoise: CFG as a batch of 2 through one jitted scan over the 50-step
    flow-matching schedule; the final step additionally runs the geometry
    heads (reference computes the prediction only on the last step).
  * decode: full-sequence causal VAE (tiled mode optional).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import functools

from ..models.fusion.model import (FusionConfig, joint_forward,
                                   joint_forward_tea, prepare_scan_params)
from ..models.wan.camera import (CameraPoseEncoderConfig,
                                 camera_pose_encoder_apply)
from ..models.wan.clip import (CLIPVisionConfig, clip_encode_image,
                               preprocess_image)
from ..models.wan.t5 import T5Config, t5_encode
from ..models.wan.vae import (VAEConfig, vae_encode, vae_decode,
                              vae_decode_tiled)
from ..schedulers import FlowMatchScheduler


@functools.partial(jax.jit,
                   static_argnames=("cfg", "cfg_scale", "mesh", "ulysses"),
                   donate_argnums=(3,))
def _denoise_scan(params, scan_params, cfg, latents, xs, ctx, clip2, y2,
                  pl2, cfg_scale, mesh=None, ulysses=False):
    """All denoise steps but the last in one jitted scan. Params enter as
    jit ARGUMENTS: a closure over lax.scan would embed the full 14B tree
    as lowering-time constants (measured: multi-GB capture warnings and
    pathological compile times). The latents carry is donated -- the
    caller never reuses the input noise buffer."""

    def step_fn(lat, inputs):
        timestep, sigma, sigma_next = inputs
        lat2 = jnp.concatenate([lat] * 2, axis=0)
        noise, _ = joint_forward(params, scan_params, cfg, lat2,
                                 jnp.full((lat2.shape[0],), timestep),
                                 ctx, clip2, y2, plucker_fea=pl2,
                                 mesh=mesh, ulysses=ulysses)
        nb = noise.shape[0] // 2
        pred = noise[nb:] + cfg_scale * (noise[:nb] - noise[nb:])
        lat = (lat.astype(jnp.float32) + pred.astype(jnp.float32)
               * (sigma_next - sigma)).astype(lat.dtype)
        return lat, None

    latents, _ = jax.lax.scan(step_fn, latents, xs)
    return latents


@functools.partial(jax.jit,
                   static_argnames=("cfg", "cfg_scale", "mesh", "ulysses"),
                   donate_argnums=(3, 4))
def _denoise_scan_tea(params, scan_params, cfg, latents, residual0, xs, ctx,
                      clip2, y2, pl2, cfg_scale, mesh=None, ulysses=False):
    """TeaCache-gated variant: xs carries the host-planned per-step skip
    boolean; the carry threads the cached block-stack residual. Both carry
    buffers (latents, residual) are donated."""

    def step_fn(carry, inputs):
        lat, res = carry
        timestep, sigma, sigma_next, skip = inputs
        lat2 = jnp.concatenate([lat] * 2, axis=0)
        noise, res = joint_forward_tea(
            params, scan_params, cfg, lat2,
            jnp.full((lat2.shape[0],), timestep),
            ctx, clip2, y2, plucker_fea=pl2, skip=skip, residual=res,
            mesh=mesh, ulysses=ulysses)
        nb = noise.shape[0] // 2
        pred = noise[nb:] + cfg_scale * (noise[:nb] - noise[nb:])
        lat = (lat.astype(jnp.float32) + pred.astype(jnp.float32)
               * (sigma_next - sigma)).astype(lat.dtype)
        return (lat, res), None

    (latents, residual), _ = jax.lax.scan(step_fn, (latents, residual0), xs)
    return latents, residual


@functools.partial(jax.jit,
                   static_argnames=("cfg", "cfg_scale", "mesh", "ulysses"))
def _cfg_forward_window(params, scan_params, cfg, latents, timestep, ctx,
                        clip2, y2, pl2_bcthw, cfg_scale, mesh=None,
                        ulysses=False):
    """One CFG-pair noise prediction on a temporal latent window (the
    per-window model_fn under temporal_tiled_forward). plucker features
    arrive in pseudo-BCTHW layout (B, D, f, h', w') so the tiler can slice
    them on the frame axis like latents; tokens are re-flattened here."""
    lat2 = jnp.concatenate([latents] * 2, axis=0)
    pl = None
    if pl2_bcthw is not None:
        B2, D, f, h2, w2 = pl2_bcthw.shape
        pl = pl2_bcthw.transpose(0, 2, 3, 4, 1).reshape(B2, f * h2 * w2, D)
    noise, _ = joint_forward(params, scan_params, cfg, lat2,
                             jnp.full((lat2.shape[0],), timestep),
                             ctx, clip2, y2, plucker_fea=pl, mesh=mesh,
                             ulysses=ulysses)
    nb = noise.shape[0] // 2
    return noise[nb:] + cfg_scale * (noise[:nb] - noise[nb:])


@functools.partial(jax.jit,
                   static_argnames=("cfg", "cfg_scale", "mesh", "ulysses"),
                   donate_argnums=(3,))
def _final_step(params, scan_params, cfg, latents, t_last, sigma, sigma_next,
                ctx, clip2, y2, pl2, cfg_scale, mesh=None, ulysses=False):
    """Last denoise step with the geometry heads on, jitted (an eager call
    would dispatch the full forward op-by-op)."""
    lat2 = jnp.concatenate([latents] * 2, axis=0)
    noise, prediction = joint_forward(params, scan_params, cfg, lat2, t_last,
                                      ctx, clip2, y2, plucker_fea=pl2,
                                      return_prediction=True, mesh=mesh,
                                      ulysses=ulysses)
    nb = noise.shape[0] // 2
    pred = noise[nb:] + cfg_scale * (noise[:nb] - noise[nb:])
    latents = (latents.astype(jnp.float32) + pred.astype(jnp.float32)
               * (sigma_next - sigma)).astype(latents.dtype)
    return latents, prediction


@dataclasses.dataclass
class FantasyWorldPipeline:
    """Bundles configs + param trees for the full generation stack.

    params keys: fusion (dit/vggt/bicross[/camera_pose_encoder]), t5, clip,
    vae. Missing components degrade gracefully (e.g. pre-computed context
    can be passed instead of t5 params).
    """
    cfg: FusionConfig
    params: Dict
    t5_cfg: T5Config = dataclasses.field(default_factory=T5Config)
    clip_cfg: CLIPVisionConfig = dataclasses.field(default_factory=CLIPVisionConfig)
    vae_cfg: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    pose_cfg: CameraPoseEncoderConfig = dataclasses.field(
        default_factory=CameraPoseEncoderConfig)
    text_len: int = 512
    tokenizer_path: Optional[str] = None
    _tokenizer: object = dataclasses.field(default=None, repr=False)
    _scan_params: Dict = dataclasses.field(default=None, repr=False)

    def __post_init__(self):
        # encoder-only instances (e.g. the PP trainer's batch builder) carry
        # no fusion tree: the denoiser is unavailable but encode_prompt /
        # encode_image / vae_encode keep working
        if "fusion" in self.params:
            self._scan_params = prepare_scan_params(self.params["fusion"],
                                                    self.cfg)

    def param_dtype(self):
        """Compute dtype of the loaded weights: fusion when present, else
        the first encoder tree (all components are cast together)."""
        for key in ("fusion", "vae", "t5", "clip"):
            if key in self.params:
                import jax
                return jax.tree_util.tree_leaves(self.params[key])[0].dtype
        raise ValueError("pipeline has no parameter trees")

    def shard(self, mesh) -> None:
        """Shard the denoiser over a Mesh(('data','seq','model')): the
        fusion tree is split into lite (embeddings/heads, no block lists)
        + scan stacks and placed per parallel/sharding.py's megatron
        column/row rules; encoders/VAE stay on the default device (they
        run once per clip outside the mesh program). Call after load (and
        after quantize, if used); pass the same mesh to denoise()."""
        from ..models.fusion.model import split_trainable
        from ..parallel.sharding import (param_specs, stacked_specs,
                                         shard_tree)
        lite, scan = split_trainable(self.params["fusion"], self.cfg,
                                     scan=self._scan_params)
        self.params = dict(self.params, fusion=shard_tree(
            lite, mesh, param_specs(lite, mesh=mesh)))
        self._scan_params = shard_tree(scan, mesh,
                                       stacked_specs(scan, mesh=mesh))

    def quantize(self, mode: str = "int8", **kw) -> None:
        """Rewrite the denoiser's big dense kernels to int8 (w8a8, 2.8x
        matmul throughput on the v5e MXU) or fp8 (weight storage halving,
        the reference's fp8 semantics -- fusion/model_wan21.py:42). Only
        the fusion hot loop is touched: encoders/VAE run once per clip and
        stay bf16. Irreversible on this instance; call right after load."""
        from ..core.quant import quantize_tree
        self.params = dict(self.params, fusion=quantize_tree(
            self.params["fusion"], mode, **kw))
        self._scan_params = quantize_tree(self._scan_params, mode, **kw)

    # -- text ---------------------------------------------------------------

    def tokenize(self, prompt: str) -> Tuple[np.ndarray, np.ndarray]:
        if self._tokenizer is None:
            if self.tokenizer_path is None:
                raise ValueError("no tokenizer_path configured; pass ids")
            from transformers import AutoTokenizer
            self._tokenizer = AutoTokenizer.from_pretrained(self.tokenizer_path)
        # reference cleaning is whitespace_clean(basic_clean(text)) -- the
        # basic_clean half (ftfy + double html.unescape) matters for prompts
        # with mojibake/entities (wan_prompter.py:11-20,76)
        from ..utils.textclean import clean_prompt
        prompt = clean_prompt(prompt)
        enc = self._tokenizer([prompt], padding="max_length", truncation=True,
                              max_length=self.text_len, return_tensors="np")
        return enc["input_ids"].astype(np.int32), enc["attention_mask"]

    def encode_prompt(self, prompt=None, ids=None, mask=None) -> jnp.ndarray:
        if ids is None:
            ids, mask = self.tokenize(prompt)
        ids = jnp.asarray(ids, jnp.int32)
        mask = jnp.asarray(mask)
        emb = t5_encode(self.params["t5"], self.t5_cfg, ids, mask)
        # zero out positions past the true length (wan_prompter.py:107-108)
        return emb * (mask[..., None] > 0)

    # -- image --------------------------------------------------------------

    def encode_image(self, image: np.ndarray, num_frames: int, height: int,
                     width: int, end_image: Optional[np.ndarray] = None
                     ) -> Dict[str, jnp.ndarray]:
        """image: (H, W, 3) float in [-1, 1] already resized to (height,
        width). Returns {'clip_feature': (1,257,1280) | None, 'y':
        (1,20,f,h,w)}. The CLIP branch is skipped when the model has no
        image-context input (wan22 Fun-Control-Camera,
        require_clip_embedding=False)."""
        img = jnp.asarray(image, jnp.float32).transpose(2, 0, 1)[None]
        dtype = self.param_dtype()
        clip_feature = None
        if self.cfg.dit.has_image_input and "clip" in self.params:
            clip_in = preprocess_image(img)
            clip_feature = clip_encode_image(self.params["clip"],
                                             self.clip_cfg,
                                             clip_in.astype(dtype))

        msk = np.ones((1, num_frames, height // 8, width // 8), np.float32)
        msk[:, 1:] = 0
        frames = [img.transpose(1, 0, 2, 3)]       # (3, 1, H, W)
        if end_image is not None:
            end = jnp.asarray(end_image, jnp.float32).transpose(2, 0, 1)[None]
            frames += [jnp.zeros((3, num_frames - 2, height, width)),
                       end.transpose(1, 0, 2, 3)]
            msk[:, -1:] = 1
        else:
            frames += [jnp.zeros((3, num_frames - 1, height, width))]
        vae_input = jnp.concatenate(frames, axis=1)[None]   # (1,3,T,H,W)

        msk = np.concatenate([msk[:, 0:1].repeat(4, axis=1), msk[:, 1:]],
                             axis=1)
        msk = msk.reshape(1, msk.shape[1] // 4, 4, height // 8, width // 8)
        msk = msk.transpose(0, 2, 1, 3, 4)[0]                # (4, f, h, w)

        lat = vae_encode(self.params["vae"], self.vae_cfg,
                         vae_input.astype(dtype))[0]
        y = jnp.concatenate([jnp.asarray(msk, lat.dtype), lat], axis=0)[None]
        return {"clip_feature": clip_feature, "y": y}

    # -- noise --------------------------------------------------------------

    def generate_noise(self, shape, seed: Optional[int] = None,
                       torch_compat: bool = False) -> jnp.ndarray:
        """JAX PRNG by default; torch_compat reproduces the reference's
        torch.manual_seed(1024) quirk (fusion/model_wan21.py:250-257) when
        torch is importable, for bit-level A/B against the reference."""
        if torch_compat:
            import torch
            torch.manual_seed(1024)
            g = torch.Generator("cpu").manual_seed(seed) if seed is not None else None
            return jnp.asarray(torch.randn(shape, generator=g,
                                           dtype=torch.float32).numpy())
        if isinstance(seed, (list, tuple, np.ndarray)):
            # per-clip seeds (batched eval sweeps): row i draws exactly
            # what a single-clip run with seed[i] would
            assert len(seed) == shape[0], "one seed per batch row"
            return jnp.stack([
                jax.random.normal(jax.random.PRNGKey(int(s)), shape[1:],
                                  jnp.float32) for s in seed])
        key = jax.random.PRNGKey(0 if seed is None else seed)
        if shape[0] > 1:
            # one scalar seed for a batch: fold the row index in so rows
            # are independent draws
            return jnp.stack([
                jax.random.normal(jax.random.fold_in(key, i), shape[1:],
                                  jnp.float32) for i in range(shape[0])])
        return jax.random.normal(key, shape, jnp.float32)

    # -- camera -------------------------------------------------------------

    def encode_plucker(self, plucker_embedding: np.ndarray) -> jnp.ndarray:
        dtype = self.param_dtype()
        return camera_pose_encoder_apply(
            self.params["fusion"]["camera_pose_encoder"], self.pose_cfg,
            jnp.asarray(plucker_embedding, dtype))

    # -- denoise loop -------------------------------------------------------

    def denoise(self, context_pos, context_neg, clip_feature, y,
                height: int, width: int, num_frames: int = 81,
                num_inference_steps: int = 50, cfg_scale: float = 5.0,
                seed: Optional[int] = None, plucker_fea=None,
                torch_compat_noise: bool = False,
                tea_cache_l1_thresh: Optional[float] = None,
                tea_cache_model_id: str = "Wan2.1-I2V-14B-480P",
                mesh=None, ulysses: bool = False,
                sliding_window_size: Optional[int] = None,
                sliding_window_stride: Optional[int] = None,
                segment_size: Optional[int] = None,
                progress_callback=None,
                gen_ckpt_path: Optional[str] = None):
        """Returns (final latents (B,16,f,h,w), geometry prediction dict).

        Batched generation (WorldScore-style eval sweeps, BASELINE.md
        staged config 5): pass B-row conditioning (context_pos/neg,
        clip_feature, y, plucker_fea all leading-dim B) and B clips
        denoise in one program as a CFG batch of 2B. Pass ``seed`` as a
        list of B ints to make row i draw exactly the noise of a
        single-clip run with seed[i]; a scalar seed folds the row index
        in instead. Shard the batch over the mesh 'data' axis for
        data-parallel sweeps.

        tea_cache_l1_thresh: enable TeaCache block-stack skipping at this
        relative-L1 drift threshold (reference default 0.05 for 480P); the
        skip schedule is planned on the host before the scan
        (pipelines/tea_cache.py), so the jitted loop stays trace-static.

        mesh: optional Mesh(('data','seq','model')) for multi-chip denoise
        (params should already be sharded over it); ulysses additionally
        routes the long attentions through the explicit all_to_all
        sequence-parallel path (parallel/ulysses.py).

        sliding_window_size/stride (latent frames): long-video denoise via
        temporal latent tiling (reference TemporalTiler_BCTHW,
        wan_video_new.py:1433-1484, 1522-1546) -- each step evaluates the
        denoiser per temporal window and blends overlaps with 0.5-shifted
        ramps. Like the reference, this is a noise-prediction mechanism:
        the full-sequence geometry heads do not run (prediction is None).

        segment_size / progress_callback / gen_ckpt_path (deployment
        features the reference lacks -- its loop is all-or-nothing): run
        the denoise scan in host-level segments of ``segment_size`` steps.
        After each segment the carry is synced, ``progress_callback(done,
        total)`` fires, and -- when ``gen_ckpt_path`` is set -- the partial
        state (step, latents[, TeaCache residual]) is written atomically so
        a preempted generation resumes from the last finished segment on
        the next identically-conditioned call. The result is numerically
        identical to the single-scan path (same step ops in the same
        order); segmenting only changes how many steps each compiled scan
        covers (equal-length segments reuse one executable, a ragged tail
        costs one more). Defaults keep the original one-scan behavior.
        """
        if num_frames % 4 != 1:
            num_frames = (num_frames + 2) // 4 * 4 + 1
        f = (num_frames - 1) // 4 + 1
        sched = FlowMatchScheduler().set_timesteps(num_inference_steps)

        dtype = self.param_dtype()
        B = context_pos.shape[0]
        zc = self.cfg.dit.out_dim          # latent channels (16 production)
        latents = self.generate_noise((B, zc, f, height // 8, width // 8),
                                      seed, torch_compat_noise).astype(dtype)

        # batch the CFG pair: row 0 positive, row 1 negative
        ctx = jnp.concatenate([context_pos, context_neg], axis=0).astype(dtype)
        # no-CLIP configs (wan22 Fun-Control-Camera, require_clip_embedding=
        # False) pass clip_feature=None; the image context is simply absent
        clip2 = (None if clip_feature is None else
                 jnp.concatenate([clip_feature] * 2, axis=0).astype(dtype))
        y2 = jnp.concatenate([y] * 2, axis=0).astype(dtype)
        pl2 = (None if plucker_fea is None else
               jnp.concatenate([plucker_fea] * 2, axis=0).astype(dtype))

        if mesh is not None:
            # conditioning comes out of the single-device encoder jits;
            # place it on the mesh (CFG batch over 'data' when divisible,
            # replicated otherwise) so the mesh-spanning scan accepts it
            from jax.sharding import NamedSharding, PartitionSpec as P
            dsz = mesh.shape.get("data", 1)

            def place(x):
                if x is None:
                    return None
                spec = P("data") if x.shape[0] % dsz == 0 else P()
                return jax.device_put(x, NamedSharding(mesh, spec))

            latents, ctx, clip2, y2, pl2 = map(
                place, (latents, ctx, clip2, y2, pl2))

        params, scan_params, cfg = (self.params["fusion"], self._scan_params,
                                    self.cfg)

        pairs = sched.sigma_pairs()
        ts = jnp.asarray(sched.timesteps)

        if sliding_window_size is not None:
            # the windowed path supports neither TeaCache nor segment
            # checkpoints; dropping explicitly-requested options silently
            # (pre-r4 behavior) corrupted expectations on exactly the long
            # runs that need them -- fail loudly instead
            unsupported = [n for n, v in (
                ("tea_cache_l1_thresh", tea_cache_l1_thresh),
                ("segment_size", segment_size),
                ("gen_ckpt_path", gen_ckpt_path)) if v is not None]
            if unsupported:
                raise ValueError(
                    f"sliding_window_size does not compose with "
                    f"{', '.join(unsupported)}; drop them or run the "
                    f"non-windowed path (TemporalTiler covers long videos "
                    f"there)")
            latents = self._denoise_windowed(
                params, scan_params, cfg, latents, ts, pairs, ctx, clip2,
                y2, pl2, cfg_scale, f, height, width,
                sliding_window_size, sliding_window_stride
                or max(1, sliding_window_size // 2),
                mesh=mesh, ulysses=ulysses,
                progress_callback=progress_callback)
            if mesh is not None:
                latents = jax.device_put(latents, jax.devices()[0])
            return latents, None

        # steps 0..n-2 in one jitted scan; final step separately with heads
        tea = tea_cache_l1_thresh is not None
        residual = None
        if tea:
            from .tea_cache import compute_skip_schedule
            skips = compute_skip_schedule(
                params["dit"], cfg.dit, sched.timesteps,
                tea_cache_l1_thresh, tea_cache_model_id)
            pt = cfg.dit.patch_size
            n_tok = f * (height // 8 // pt[1]) * (width // 8 // pt[2])
            residual = jnp.zeros((2 * B, n_tok, cfg.dit.dim), dtype)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                dsz = mesh.shape.get("data", 1)
                residual = jax.device_put(residual, NamedSharding(
                    mesh, P("data") if (2 * B) % dsz == 0 else P()))
            xs = (ts[:-1], jnp.asarray(pairs[:-1, 0]),
                  jnp.asarray(pairs[:-1, 1]), jnp.asarray(skips[:-1]))
        else:
            xs = (ts[:-1], jnp.asarray(pairs[:-1, 0]),
                  jnp.asarray(pairs[:-1, 1]))

        n_scan = len(sched.timesteps) - 1
        if (segment_size is None and progress_callback is None
                and gen_ckpt_path is None):
            if tea:
                latents, _ = _denoise_scan_tea(
                    params, scan_params, cfg, latents, residual, xs, ctx,
                    clip2, y2, pl2, cfg_scale, mesh=mesh, ulysses=ulysses)
            else:
                latents = _denoise_scan(params, scan_params, cfg, latents,
                                        xs, ctx, clip2, y2, pl2, cfg_scale,
                                        mesh=mesh, ulysses=ulysses)
        else:
            latents = self._denoise_segmented(
                params, scan_params, cfg, latents, residual, xs, ctx, clip2,
                y2, pl2, cfg_scale, mesh, ulysses, n_scan,
                segment_size or n_scan, progress_callback, gen_ckpt_path,
                tea)

        latents, prediction = _final_step(
            params, scan_params, cfg, latents, jnp.full((2 * B,), ts[-1]),
            jnp.float32(pairs[-1, 0]), jnp.float32(pairs[-1, 1]), ctx, clip2,
            y2, pl2, cfg_scale, mesh=mesh, ulysses=ulysses)
        if gen_ckpt_path:
            import os
            # sync before declaring done, then drop the partial state so a
            # later call with the same path starts fresh
            np.asarray(jax.device_get(latents.ravel()[0]))
            if os.path.exists(gen_ckpt_path):
                os.remove(gen_ckpt_path)
        if progress_callback:
            progress_callback(n_scan + 1, n_scan + 1)
        if prediction is not None:
            # heads ran on the CFG-doubled batch; keep the positive rows
            prediction = {k: v[:B] for k, v in prediction.items()}
        if mesh is not None:
            # gather off the mesh: the decode/export stages run on the
            # default device, whose jits reject mesh-committed inputs
            dev0 = jax.devices()[0]
            latents = jax.device_put(latents, dev0)
            if prediction is not None:
                prediction = jax.device_put(prediction, dev0)
        return latents, prediction

    def _denoise_segmented(self, params, scan_params, cfg, latents, residual,
                           xs, ctx, clip2, y2, pl2, cfg_scale, mesh, ulysses,
                           n_scan, seg, progress_callback, gen_ckpt_path,
                           tea):
        """Host segment loop around the denoise scan: sync + progress +
        atomic partial-state checkpoint after every segment, resume from
        the last finished one (the reference's loop is all-or-nothing)."""
        import os
        start = 0
        if gen_ckpt_path and os.path.exists(gen_ckpt_path):
            data = np.load(gen_ckpt_path)
            if (int(data["n_scan"]) == n_scan
                    and tuple(data["latents"].shape) == latents.shape
                    # a checkpoint from a non-TeaCache run carries no
                    # residual; resuming a TeaCache run from it would make
                    # planned-skip steps add a ZERO residual in place of
                    # the 40-block stack output -- silent corruption.
                    # Restart from scratch instead (r4 review).
                    and (not tea or "residual" in data)):
                start = int(data["step"])

                def restore(x, like):
                    x = jnp.asarray(x).astype(like.dtype)
                    # match the incoming carry's placement: a mesh-spanning
                    # scan rejects default-device-committed arrays
                    return (jax.device_put(x, like.sharding)
                            if mesh is not None else x)

                latents = restore(data["latents"], latents)
                if tea and "residual" in data:
                    residual = restore(data["residual"], residual)
        total = n_scan + 1                     # + the final head step
        if progress_callback and start:
            progress_callback(start, total)
        i = start
        while i < n_scan:
            j = min(i + max(1, seg), n_scan)
            xs_seg = tuple(a[i:j] for a in xs)
            if tea:
                latents, residual = _denoise_scan_tea(
                    params, scan_params, cfg, latents, residual, xs_seg,
                    ctx, clip2, y2, pl2, cfg_scale, mesh=mesh,
                    ulysses=ulysses)
            else:
                latents = _denoise_scan(params, scan_params, cfg, latents,
                                        xs_seg, ctx, clip2, y2, pl2,
                                        cfg_scale, mesh=mesh,
                                        ulysses=ulysses)
            i = j
            # sync so progress/checkpoints reflect FINISHED device work
            # (block_until_ready returns early on the tunneled platform)
            np.asarray(jax.device_get(latents.ravel()[0]))
            if gen_ckpt_path:
                state = {"step": np.asarray(i), "n_scan": np.asarray(n_scan),
                         "latents": np.asarray(latents, np.float32)}
                if tea and residual is not None:
                    state["residual"] = np.asarray(residual, np.float32)
                tmp = gen_ckpt_path + ".tmp"
                with open(tmp, "wb") as fh:
                    np.savez(fh, **state)
                os.replace(tmp, gen_ckpt_path)
            if progress_callback:
                progress_callback(i, total)
        return latents

    def _denoise_windowed(self, params, scan_params, cfg, latents, ts,
                          pairs, ctx, clip2, y2, pl2, cfg_scale, f, height,
                          width, window_size, window_stride, mesh=None,
                          ulysses=False, progress_callback=None):
        """Host step loop with per-step temporal tiling (the reference's
        sliding_window path). One compiled program serves every full-size
        window; a clamped tail window costs one extra compile."""
        from .temporal_tiler import temporal_tiled_forward
        pl_bcthw = None
        if pl2 is not None:
            pt = cfg.dit.patch_size
            h2, w2 = height // 8 // pt[1], width // 8 // pt[2]
            pl_bcthw = pl2.reshape(pl2.shape[0], f, h2, w2,
                                   pl2.shape[-1]).transpose(0, 4, 1, 2, 3)
        for i in range(len(ts)):
            sigma, sigma_next = float(pairs[i, 0]), float(pairs[i, 1])
            pred = temporal_tiled_forward(
                lambda latents, y, plucker: _cfg_forward_window(
                    params, scan_params, cfg, latents, jnp.float32(ts[i]),
                    ctx, clip2, y, plucker, cfg_scale, mesh=mesh,
                    ulysses=ulysses),
                {"latents": latents, "y": y2, "plucker": pl_bcthw},
                window_size, window_stride,
                slice_names=("latents", "y", "plucker"))
            latents = (latents.astype(jnp.float32)
                       + pred.astype(jnp.float32)
                       * (sigma_next - sigma)).astype(latents.dtype)
            if progress_callback:
                progress_callback(i + 1, len(ts))
        return latents

    # -- decode -------------------------------------------------------------

    def decode_video(self, latents, tiled: bool = False,
                     tile_size=None, tile_stride=None) -> np.ndarray:
        """latents (1,z,f,h,w) -> uint8 frames (T, H, W, 3). Decodes
        through whichever VAE the pipe carries: the 2.1 VAE (z=16, 8x) or
        the 38-block TI2V VAE (z=48, 16x) -- the encode side of the units
        pipeline already dispatched on vae_cfg, and decoding the 38-block
        tree with the 2.1 plan would fail only AFTER the full denoise was
        paid (r4 review).

        When ``tiled`` and no explicit tile plan is given, the deploy plan
        (full-height strips, vae.deploy_tile_plan) is used: measured ~2x
        faster than the reference's (30,52)/(15,26) grid at both
        production geometries with the same blend math. Pass the reference
        values explicitly to reproduce its exact tiling."""
        if getattr(self.vae_cfg, "spatial_down", 8) == 16:
            from ..models.wan.vae38 import vae38_decode, vae38_decode_tiled
            dec, dec_tiled = vae38_decode, vae38_decode_tiled
        else:
            dec, dec_tiled = vae_decode, vae_decode_tiled
        if tiled:
            if tile_size is None or tile_stride is None:
                if getattr(self.vae_cfg, "spatial_down", 8) == 8:
                    from ..models.wan.vae import deploy_tile_plan
                    tile_size, tile_stride = deploy_tile_plan(
                        latents.shape[-2], latents.shape[-1])
                else:
                    # 16x VAE: 4x the output px per latent px -- its
                    # compile ceiling is unmeasured, keep the ref plan
                    tile_size, tile_stride = (30, 52), (15, 26)
            video = dec_tiled(self.params["vae"], self.vae_cfg,
                              latents, tile_size, tile_stride)
        else:
            video = dec(self.params["vae"], self.vae_cfg, latents)
        video = np.asarray(video[0].transpose(1, 2, 3, 0), np.float32)
        return np.clip((video + 1) / 2 * 255, 0, 255).astype(np.uint8)
