"""Declarative pipeline units (wan22-style conditioning pipeline).

Re-design of the reference PipelineUnit / PipelineUnitRunner architecture
(diffsynth_wan22/utils/__init__.py:234-287) and the units the FantasyWorld
path exercises (wan_video_new.py:723-1030): each unit declares which keys
of the shared/positive/negative input dicts it consumes and returns updates;
the runner threads the three dicts through the unit list. ``run_condition``
reproduces the reference's ``return_condition=True`` early exit
(wan_video_new.py:530-534) that FantasyWorld-Wan2.2 uses to collect
(context_posi, context_nega, y) before its own denoise loop.

The full conditioning-unit surface is built: the FantasyWorld-exercised
units plus ImageEmbedderCLIP/Fused, FunControl, FunReference and
SpeedControl (wan_video_new.py:834-1003). Units whose MODELS are absent
from the reference snapshot itself (S2V, Animate, VAP, LongCat, VACE --
their model classes do not exist in the trimmed repo, SURVEY.md 2.3
"dead/vestigial") are intentionally not built.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class PipelineUnit:
    def __init__(self, seperate_cfg: bool = False, take_over: bool = False,
                 input_params: Optional[Tuple[str, ...]] = None,
                 input_params_posi: Optional[Dict[str, str]] = None,
                 input_params_nega: Optional[Dict[str, str]] = None):
        self.seperate_cfg = seperate_cfg
        self.take_over = take_over
        self.input_params = input_params
        self.input_params_posi = input_params_posi
        self.input_params_nega = input_params_nega

    def process(self, pipe, *args, **kwargs) -> dict:
        raise NotImplementedError


class PipelineUnitRunner:
    """utils/__init__.py:257-287 semantics, including the cfg_scale==1
    negative-side aliasing quirk (nega gets the POSITIVE outputs)."""

    def __call__(self, unit: PipelineUnit, pipe, inputs_shared: dict,
                 inputs_posi: dict, inputs_nega: dict):
        if unit.take_over:
            return unit.process(pipe, inputs_shared=inputs_shared,
                                inputs_posi=inputs_posi,
                                inputs_nega=inputs_nega)
        if unit.seperate_cfg:
            proc = {n: inputs_posi.get(src)
                    for n, src in unit.input_params_posi.items()}
            for n in (unit.input_params or ()):
                proc[n] = inputs_shared.get(n)
            out = unit.process(pipe, **proc)
            inputs_posi.update(out)
            if inputs_shared.get("cfg_scale", 5.0) != 1:
                proc = {n: inputs_nega.get(src)
                        for n, src in unit.input_params_nega.items()}
                for n in (unit.input_params or ()):
                    proc[n] = inputs_shared.get(n)
                inputs_nega.update(unit.process(pipe, **proc))
            else:
                inputs_nega.update(out)
        else:
            proc = {n: inputs_shared.get(n) for n in unit.input_params}
            inputs_shared.update(unit.process(pipe, **proc))
        return inputs_shared, inputs_posi, inputs_nega


# ---------------------------------------------------------------------------
# units (wan_video_new.py:723-1030)
# ---------------------------------------------------------------------------

class ShapeChecker(PipelineUnit):
    """Round H/W to /16 and frames to 4k+1 (BasePipeline
    check_resize_height_width semantics)."""

    def __init__(self):
        super().__init__(input_params=("height", "width", "num_frames"))

    def process(self, pipe, height, width, num_frames):
        height = (height + 15) // 16 * 16
        width = (width + 15) // 16 * 16
        if num_frames % 4 != 1:
            num_frames = (num_frames + 2) // 4 * 4 + 1
        return {"height": height, "width": width, "num_frames": num_frames}


class NoiseInitializer(PipelineUnit):
    def __init__(self):
        super().__init__(input_params=("height", "width", "num_frames",
                                       "seed"))

    def process(self, pipe, height, width, num_frames, seed):
        length = (num_frames - 1) // 4 + 1
        z = pipe.vae_cfg.z_dim
        # spatial grid follows the pipe's VAE: 8x for the 2.1 VAE, 16x for
        # the 38-block TI2V VAE (z=48) -- hardcoding //8 gave TI2V a
        # 4x-too-large noise tensor (r4 review)
        sd = getattr(pipe.vae_cfg, "spatial_down", 8)
        shape = (1, z, length, height // sd, width // sd)
        return {"noise": pipe.generate_noise(shape, seed=seed)}


class PromptEmbedder(PipelineUnit):
    def __init__(self):
        super().__init__(
            seperate_cfg=True,
            input_params_posi={"prompt": "prompt"},
            input_params_nega={"prompt": "negative_prompt"})

    def process(self, pipe, prompt):
        return {"context": pipe.encode_prompt(prompt)}


class InputVideoEmbedder(PipelineUnit):
    """v2v path: encode an input video and noise it to the first timestep
    (wan_video_new.py:751-774, denoising_strength < 1)."""

    def __init__(self):
        super().__init__(input_params=("input_video", "noise",
                                       "denoising_strength",
                                       "num_inference_steps"))

    def process(self, pipe, input_video, noise, denoising_strength,
                num_inference_steps):
        if input_video is None:
            return {"latents": noise}
        from ..models.wan.vae import vae_encode
        from ..schedulers import FlowMatchScheduler
        video = jnp.asarray(input_video)          # (1, 3, T, H, W) in [-1,1]
        lat = vae_encode(pipe.params["vae"], pipe.vae_cfg,
                         video.astype(noise.dtype))
        sched = FlowMatchScheduler().set_timesteps(
            num_inference_steps, denoising_strength=denoising_strength or 1.0)
        return {"latents": sched.add_noise(lat, noise, 0)}


class ImageEmbedderVAE(PipelineUnit):
    """y = [rep-interleaved frame mask || VAE latent of the masked video]
    (wan_video_new.py:856-894), including mid-image keyframes."""

    def __init__(self):
        super().__init__(input_params=("input_image", "end_image",
                                       "num_frames", "height", "width",
                                       "mid_images_list",
                                       "mid_images_id_list"))

    def process(self, pipe, input_image, end_image, num_frames, height,
                width, mid_images_list=None, mid_images_id_list=None):
        if input_image is None or not pipe.cfg.dit.require_vae_embedding:
            return {}
        from ..models.wan.vae import vae_encode
        dtype = pipe.param_dtype()
        img = jnp.asarray(input_image, jnp.float32).transpose(2, 0, 1)[None]
        msk = np.ones((1, num_frames, height // 8, width // 8), np.float32)
        msk[:, 1:] = 0
        frames = np.zeros((3, num_frames, height, width), np.float32)
        frames[:, 0] = np.asarray(img[0])
        if end_image is not None:
            frames[:, -1] = np.asarray(end_image, np.float32).transpose(2, 0, 1)
            msk[:, -1:] = 1
        if mid_images_list is not None and mid_images_id_list is not None:
            for mid, mid_id in zip(mid_images_list, mid_images_id_list):
                frames[:, mid_id] = np.asarray(mid, np.float32).transpose(
                    2, 0, 1)
                msk[:, mid_id:mid_id + 1] = 1
        msk = np.concatenate([msk[:, 0:1].repeat(4, axis=1), msk[:, 1:]],
                             axis=1)
        msk = msk.reshape(1, msk.shape[1] // 4, 4, height // 8, width // 8)
        msk = msk.transpose(0, 2, 1, 3, 4)[0]
        lat = vae_encode(pipe.params["vae"], pipe.vae_cfg,
                         jnp.asarray(frames)[None].astype(dtype))[0]
        y = jnp.concatenate([jnp.asarray(msk, lat.dtype), lat], axis=0)[None]
        return {"y": y}


class ImageEmbedderCLIP(PipelineUnit):
    """CLIP-only image conditioning (wan_video_new.py:834-854): the 257x1280
    penultimate-layer tokens, with the end image's tokens concatenated when
    the DiT carries an image positional embedding."""

    def __init__(self):
        super().__init__(input_params=("input_image", "end_image", "height",
                                       "width"))

    def process(self, pipe, input_image, end_image, height, width):
        if input_image is None or "clip" not in pipe.params \
                or not pipe.cfg.dit.has_image_input:
            return {}
        from ..models.wan.clip import clip_encode_image, preprocess_image
        dtype = pipe.param_dtype()

        def enc(img):
            # (H, W, 3) -> (1, 3, H, W): preprocess_image is strictly BCHW
            chw = jnp.asarray(img, jnp.float32).transpose(2, 0, 1)[None]
            return clip_encode_image(pipe.params["clip"], pipe.clip_cfg,
                                     preprocess_image(chw))
        feat = enc(input_image)
        if end_image is not None and pipe.cfg.dit.has_image_pos_emb:
            feat = jnp.concatenate([feat, enc(end_image)], axis=1)
        return {"clip_feature": feat.astype(dtype)}


class ImageEmbedderFused(PipelineUnit):
    """TI2V-5B-style fusion (wan_video_new.py:896-915): the input image's
    VAE latent replaces latent frame 0 instead of entering through y."""

    def __init__(self):
        super().__init__(input_params=("input_image", "latents", "height",
                                       "width"))

    def process(self, pipe, input_image, latents, height, width):
        if input_image is None \
                or not pipe.cfg.dit.fuse_vae_embedding_in_latents:
            return {}
        # TI2V-5B pairs with the 38-block VAE (z=48, 16x grid); encode
        # through whichever VAE the pipe actually carries
        if getattr(pipe.vae_cfg, "spatial_down", 8) == 16:
            from ..models.wan.vae38 import vae38_encode as vae_encode
        else:
            from ..models.wan.vae import vae_encode
        img = jnp.asarray(input_image, jnp.float32).transpose(2, 0, 1)
        z = vae_encode(pipe.params["vae"], pipe.vae_cfg,
                       img[None, :, None].astype(latents.dtype))
        latents = latents.at[:, :, 0:1].set(z)
        return {"latents": latents, "fuse_vae_embedding_in_latents": True,
                "first_frame_latents": z}


class FunControl(PipelineUnit):
    """Fun-Control conditioning (wan_video_new.py:917-939): VAE-encode the
    control video and stack it in front of the masked-image y channels;
    absent CLIP/y conditioning is zero-filled to the DiT's expected
    in_dim."""

    def __init__(self):
        super().__init__(input_params=("control_video", "num_frames",
                                       "height", "width", "clip_feature",
                                       "y", "noise"))

    def process(self, pipe, control_video, num_frames, height, width,
                clip_feature, y, noise):
        if control_video is None:
            return {}
        from ..models.wan.vae import vae_encode
        dtype = pipe.param_dtype()
        video = jnp.asarray(control_video)        # (1, 3, T, H, W) in [-1,1]
        control_latents = vae_encode(pipe.params["vae"], pipe.vae_cfg,
                                     video.astype(dtype))
        y_dim = (pipe.cfg.dit.in_dim - control_latents.shape[1]
                 - noise.shape[1])
        if clip_feature is None or y is None:
            clip_feature = jnp.zeros((1, 257, 1280), dtype)
            y = jnp.zeros((1, y_dim, (num_frames - 1) // 4 + 1,
                           height // 8, width // 8), dtype)
        else:
            y = y[:, -y_dim:]
        y = jnp.concatenate([control_latents, y], axis=1)
        return {"clip_feature": clip_feature, "y": y}


class FunReference(PipelineUnit):
    """Fun-Reference conditioning (wan_video_new.py:942-962): VAE latent of
    a reference still (plus its CLIP tokens when an image encoder is
    loaded)."""

    def __init__(self):
        super().__init__(input_params=("reference_image", "height", "width"))

    def process(self, pipe, reference_image, height, width):
        if reference_image is None:
            return {}
        from ..models.wan.vae import vae_encode
        dtype = pipe.param_dtype()
        img = jnp.asarray(reference_image, jnp.float32).transpose(2, 0, 1)
        ref_latents = vae_encode(pipe.params["vae"], pipe.vae_cfg,
                                 img[None, :, None].astype(dtype))
        if "clip" not in pipe.params:
            return {"reference_latents": ref_latents}
        from ..models.wan.clip import clip_encode_image, preprocess_image
        # reuse the CHW transpose from the VAE branch; BCHW for preprocess
        x = preprocess_image(img[None].astype(jnp.float32))
        feat = clip_encode_image(pipe.params["clip"], pipe.clip_cfg, x)
        return {"reference_latents": ref_latents,
                "clip_feature": feat.astype(dtype)}


class SpeedControl(PipelineUnit):
    """Motion-bucket conditioning passthrough (wan_video_new.py:994-1003)."""

    def __init__(self):
        super().__init__(input_params=("motion_bucket_id",))

    def process(self, pipe, motion_bucket_id):
        if motion_bucket_id is None:
            return {}
        return {"motion_bucket_id": jnp.asarray([motion_bucket_id],
                                                jnp.float32)}


class FunCameraControl(PipelineUnit):
    """Plucker video -> folded control-camera latents for the SimpleAdapter
    patchify path (wan_video_new.py:964-992)."""

    def __init__(self):
        super().__init__(input_params=("plucker_embedding",))

    def process(self, pipe, plucker_embedding):
        if plucker_embedding is None:
            return {}
        from .wan_video_22 import control_camera_latents_from_plucker
        return {"control_camera_latents_input":
                control_camera_latents_from_plucker(plucker_embedding)}


class CfgMerger(PipelineUnit):
    """Batch the positive/negative context rows (wan_video_new.py:1161-1180)
    -- our denoise always runs CFG as a batch of 2, so this materializes the
    merged context for callers that want it."""

    def __init__(self):
        super().__init__(take_over=True)

    def process(self, pipe, inputs_shared, inputs_posi, inputs_nega):
        if "context" in inputs_posi and "context" in inputs_nega:
            inputs_shared["context_merged"] = jnp.concatenate(
                [inputs_posi["context"], inputs_nega["context"]], axis=0)
        return inputs_shared, inputs_posi, inputs_nega


DEFAULT_UNITS: Sequence[PipelineUnit] = (
    ShapeChecker(), NoiseInitializer(), PromptEmbedder(),
    InputVideoEmbedder(), ImageEmbedderCLIP(), ImageEmbedderVAE(),
    ImageEmbedderFused(), FunControl(), FunReference(), FunCameraControl(),
    SpeedControl(), CfgMerger(),
)


def run_condition(pipe, prompt: str, negative_prompt: str = "",
                  input_image=None, end_image=None, height: int = 480,
                  width: int = 832, num_frames: int = 81,
                  seed: Optional[int] = None, plucker_embedding=None,
                  cfg_scale: float = 5.0, units=DEFAULT_UNITS,
                  **extra_shared):
    """The reference's ``pipe(..., return_condition=True)`` flow
    (wan_video_new.py:495-534): run the unit list and return the three
    input dicts instead of denoising."""
    runner = PipelineUnitRunner()
    inputs_posi = {"prompt": prompt}
    inputs_nega = {"negative_prompt": negative_prompt}
    inputs_shared = dict(input_image=input_image, end_image=end_image,
                         height=height, width=width, num_frames=num_frames,
                         seed=seed, plucker_embedding=plucker_embedding,
                         cfg_scale=cfg_scale, input_video=None,
                         denoising_strength=1.0, num_inference_steps=50,
                         mid_images_list=None, mid_images_id_list=None,
                         control_video=None, reference_image=None,
                         motion_bucket_id=None, clip_feature=None, y=None,
                         latents=None, noise=None, **extra_shared)
    for unit in units:
        inputs_shared, inputs_posi, inputs_nega = runner(
            unit, pipe, inputs_shared, inputs_posi, inputs_nega)
    return inputs_shared, inputs_posi, inputs_nega
