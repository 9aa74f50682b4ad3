"""FantasyWorldSampler: the user-facing generate_video API.

Re-design of the reference sampler classes (inference_wan21.py:145-337,
inference_wan22.py:40-378): construct once from a checkpoint directory,
then ``generate_video(prompt, neg_prompt, image, camera_params, ...)``
returns the video frames plus the geometry prediction dict, and
``export`` writes MP4 + colored PLY.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def _load_moge(moge_ckpt: str) -> None:
    """Install the MoGe-2 scale-normalization model as the process default
    (inference_wan21.py:223; used by hostops scale normalization)."""
    import torch
    from .convert.moge import convert_moge
    from .models.moge.model import MoGeConfig
    from .models.moge.infer import set_default_moge
    ckpt = torch.load(moge_ckpt, map_location="cpu", weights_only=True)
    sd = {k: v.float().numpy() for k, v in ckpt["model"].items()}
    set_default_moge(convert_moge(sd), MoGeConfig())


class FantasyWorldSampler:
    """Wan2.1 FantasyWorld sampler (inference_wan21.py:145-227)."""

    def __init__(self, ckpt_dir: str, model_ckpt: str,
                 moge_ckpt: Optional[str] = None,
                 tokenizer_path: Optional[str] = None,
                 auto_download: bool = False):
        import jax.numpy as jnp
        from .models.fusion.model import FusionConfig
        from .pipelines.wan_video import FantasyWorldPipeline
        from .cli.infer_wan21 import load_fusion_params

        if auto_download:
            from .convert.downloader import resolve_ckpt_dir
            resolve_ckpt_dir(ckpt_dir, "Wan2.1-I2V-14B-480P")
        self.cfg = FusionConfig()
        pipe_cfg_kw = {}
        from .convert.orbax_io import is_bundle, load_bundle_configs
        if is_bundle(ckpt_dir):
            # self-describing bundle: use the stamped architecture configs
            # (production 14B and reduced demo bundles load the same way)
            cfgs = load_bundle_configs(ckpt_dir)
            self.cfg = cfgs.get("fusion", self.cfg)
            for key, attr in (("t5", "t5_cfg"), ("clip", "clip_cfg"),
                              ("vae", "vae_cfg"), ("pose", "pose_cfg")):
                if key in cfgs:
                    pipe_cfg_kw[attr] = cfgs[key]
        params = load_fusion_params(ckpt_dir, model_ckpt, self.cfg,
                                    jnp.bfloat16)
        if tokenizer_path is None:
            cand = os.path.join(ckpt_dir, "google", "umt5-xxl")
            tokenizer_path = cand if os.path.isdir(cand) else None
        self.pipe = FantasyWorldPipeline(cfg=self.cfg, params=params,
                                         tokenizer_path=tokenizer_path,
                                         **pipe_cfg_kw)
        if moge_ckpt:
            _load_moge(moge_ckpt)
        self._has_moge = bool(moge_ckpt)

    # -- conditioning ---------------------------------------------------------

    def prepare_camera(self, camera_params: List, image: np.ndarray,
                       height: int, width: int, using_scale: bool = True
                       ) -> np.ndarray:
        """Camera list -> Plucker feature video, with optional MoGe scene
        scale normalization (inference_wan21.py:247-287)."""
        from .hostops.geometry import extri_intri_to_pose_encoding
        from .hostops.camera import plucker_from_pose_encoding
        intr = np.stack([[[c.fx, 0, c.cx], [0, c.fy, c.cy], [0, 0, 1]]
                         for c in camera_params]).astype(np.float32)
        extr = np.stack([c.w2c_mat for c in camera_params]).astype(np.float32)
        if using_scale:
            # degrades to a first-camera rebase (with a warning) when no
            # MoGe weights are installed -- closer to the reference's
            # always-normalized semantics than skipping outright
            from .cli.moge_scale import moge_scale_normalize
            extr = moge_scale_normalize(image, extr, intr)
        pose_enc = extri_intri_to_pose_encoding(extr[:, :3, :], intr,
                                                (height, width))
        return plucker_from_pose_encoding(pose_enc, (height, width))

    # -- generation -------------------------------------------------------------

    def generate_video(self, prompt: str, neg_prompt: str = "",
                       image: Optional[np.ndarray] = None,
                       image_path: Optional[str] = None,
                       camera_params: Optional[List] = None,
                       using_scale: bool = True,
                       seed: Optional[int] = 1024,
                       height: int = 336, width: int = 592,
                       num_frames: int = 81, sample_steps: int = 50,
                       cfg_scale: float = 5.0,
                       tea_cache_l1_thresh: Optional[float] = None,
                       mesh=None, ulysses: bool = False,
                       segment_size: Optional[int] = None,
                       progress_callback=None,
                       gen_ckpt_path: Optional[str] = None
                       ) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
        """Returns (uint8 frames (T, H, W, 3), geometry prediction dict).

        mesh/ulysses: multi-chip denoise (see FantasyWorldPipeline.denoise);
        params must already be sharded over the mesh.

        segment_size/progress_callback/gen_ckpt_path: segmented denoise
        with per-segment progress and preemption-resume (see
        FantasyWorldPipeline.denoise)."""
        if image is None:
            from PIL import Image
            image = np.asarray(Image.open(image_path).convert("RGB")) / 255.0
        from PIL import Image as PILImage
        img_resized = np.asarray(PILImage.fromarray(
            (image * 255).astype(np.uint8)).resize((width, height))) / 255.0
        image_pm1 = (img_resized * 2 - 1).astype(np.float32)

        plucker_fea = None
        if camera_params is not None:
            plucker = self.prepare_camera(camera_params, image, height,
                                          width, using_scale)
            plucker_fea = self.pipe.encode_plucker(plucker)

        emb = self.pipe.encode_image(image_pm1, num_frames, height, width)
        ctx_pos = self.pipe.encode_prompt(prompt)
        ctx_neg = self.pipe.encode_prompt(neg_prompt)
        latents, prediction = self.pipe.denoise(
            ctx_pos, ctx_neg, emb["clip_feature"], emb["y"], height, width,
            num_frames=num_frames, num_inference_steps=sample_steps,
            cfg_scale=cfg_scale, seed=seed, plucker_fea=plucker_fea,
            tea_cache_l1_thresh=tea_cache_l1_thresh, mesh=mesh,
            ulysses=ulysses, segment_size=segment_size,
            progress_callback=progress_callback,
            gen_ckpt_path=gen_ckpt_path)
        video = self.pipe.decode_video(latents)
        pred_np = {k: np.asarray(v, np.float32)
                   for k, v in (prediction or {}).items()}
        return video, pred_np

    def generate_videos(self, prompts: List[str],
                        images: Optional[List[np.ndarray]] = None,
                        image_paths: Optional[List[str]] = None,
                        camera_params: Optional[List[List]] = None,
                        neg_prompt: str = "", using_scale: bool = True,
                        seeds: Optional[List[int]] = None,
                        height: int = 336, width: int = 592,
                        num_frames: int = 81, sample_steps: int = 50,
                        cfg_scale: float = 5.0, mesh=None,
                        ulysses: bool = False,
                        segment_size: Optional[int] = None,
                        progress_callback=None,
                        tea_cache_l1_thresh: Optional[float] = None
                        ) -> List[Tuple[np.ndarray, Dict[str, np.ndarray]]]:
        """Batched eval sweep (BASELINE.md staged config 5): denoise B
        clips in one compiled program as a CFG batch of 2B, sharded over
        the mesh 'data' axis when one is given. Conditioning is encoded
        per clip on the host; decode runs per clip (VAE memory). Row i
        reproduces generate_video(prompt[i], ..., seed=seeds[i]) exactly
        (per-row seed keys). Returns a list of (video, prediction)."""
        import jax.numpy as jnp
        from PIL import Image as PILImage

        B = len(prompts)
        if images is None:
            images = [np.asarray(PILImage.open(p).convert("RGB")) / 255.0
                      for p in image_paths]
        seeds = seeds if seeds is not None else list(range(B))
        assert len(images) == B and len(seeds) == B

        # one umT5-XXL forward for the shared negative prompt, tiled to B
        # (it is identical across the batch by construction; encoding it
        # per clip was B-1 wasted multi-second T5 calls)
        ctx_n1 = self.pipe.encode_prompt(neg_prompt)
        ctx_p, clips, ys, pls = [], [], [], []
        for i in range(B):
            img = np.asarray(PILImage.fromarray(
                (images[i] * 255).astype(np.uint8)).resize(
                    (width, height))) / 255.0
            image_pm1 = (img * 2 - 1).astype(np.float32)
            if camera_params is not None:
                plucker = self.prepare_camera(camera_params[i], images[i],
                                              height, width, using_scale)
                pls.append(self.pipe.encode_plucker(plucker))
            emb = self.pipe.encode_image(image_pm1, num_frames, height,
                                         width)
            clips.append(emb["clip_feature"])
            ys.append(emb["y"])
            ctx_p.append(self.pipe.encode_prompt(prompts[i]))

        cat = lambda xs: jnp.concatenate(xs, axis=0)
        ctx_n = jnp.concatenate([ctx_n1] * B, axis=0)
        latents, prediction = self.pipe.denoise(
            cat(ctx_p), ctx_n, cat(clips), cat(ys), height, width,
            num_frames=num_frames, num_inference_steps=sample_steps,
            cfg_scale=cfg_scale, seed=seeds,
            plucker_fea=cat(pls) if pls else None, mesh=mesh,
            ulysses=ulysses, segment_size=segment_size,
            progress_callback=progress_callback,
            tea_cache_l1_thresh=tea_cache_l1_thresh)

        out = []
        for i in range(B):
            video = self.pipe.decode_video(latents[i:i + 1])
            pred_np = {k: np.asarray(v[i:i + 1], np.float32)
                       for k, v in (prediction or {}).items()}
            out.append((video, pred_np))
        return out

    # -- export -----------------------------------------------------------------

    @staticmethod
    def export(video: np.ndarray, prediction: Dict[str, np.ndarray],
               output_dir: str, fps: int = 16, conf_threshold: float = 1.0,
               stride: int = 4) -> None:
        """MP4 + colored PLY (inference_wan21.py:366-399)."""
        from .hostops.export import (get_pointclouds,
                                     save_colored_pointcloud_ply, save_video)
        os.makedirs(output_dir, exist_ok=True)
        save_video(video, os.path.join(output_dir, "video.mp4"), fps=fps)
        if prediction:
            points = get_pointclouds(prediction, fix_first_frame=True)
            valid = prediction["depth_conf"][0] >= conf_threshold
            save_colored_pointcloud_ply(
                points, video.astype(np.float32),
                os.path.join(output_dir,
                             f"recon_confthresh{conf_threshold}.ply"),
                stride=stride, valid_mask=valid)


class Wan22Sampler:
    """Wan2.2-Fun-A14B-Control-Camera dual-expert sampler
    (inference_wan22.py:40-378): two Reward-LoRA-merged 14B experts
    switched at a timestep boundary, camera control via control-camera
    latents at the patch embedding, no CLIP branch. Same generate/export
    surface as FantasyWorldSampler so the server can host either variant.
    """

    def __init__(self, ckpt_dir: str, model_ckpt_high: Optional[str] = None,
                 model_ckpt_low: Optional[str] = None,
                 moge_ckpt: Optional[str] = None,
                 tokenizer_path: Optional[str] = None,
                 auto_download: bool = False,
                 timestep_boundary: float = 900.0):
        import jax.numpy as jnp
        from .cli.infer_wan22 import wan22_fusion_config, load_expert
        from .pipelines.wan_video import FantasyWorldPipeline
        from .pipelines.wan_video_22 import DualModelDenoiser
        from .convert.orbax_io import (is_bundle, load_bundle,
                                       load_bundle_configs, cast_tree,
                                       load_torch_state_dict)

        if auto_download:
            from .convert.downloader import resolve_ckpt_dir
            resolve_ckpt_dir(ckpt_dir, "Wan2.2-Fun-A14B-Control-Camera")
        cfg = wan22_fusion_config()
        dtype = jnp.bfloat16
        pipe_cfg_kw = {}
        if is_bundle(ckpt_dir):
            # pre-converted self-describing bundle: LoRA already merged,
            # stamped configs override the production dims
            cfgs = load_bundle_configs(ckpt_dir)
            cfg = cfgs.get("fusion_high", cfg)
            for key, attr in (("t5", "t5_cfg"), ("vae", "vae_cfg")):
                if key in cfgs:
                    pipe_cfg_kw[attr] = cfgs[key]
            bundle = load_bundle(ckpt_dir,
                                 ("fusion_high", "fusion_low", "vae", "t5"))
            params_high = cast_tree(bundle["fusion_high"], dtype)
            params_low = cast_tree(bundle["fusion_low"], dtype)
            # encoders only: denoising runs through DualModelDenoiser's
            # own scan trees; putting an expert under 'fusion' would make
            # the pipeline build an unused ~28 GB stacked scan copy that
            # also dodges quantize()/shard() (r4 review)
            shared = {"vae": cast_tree(bundle["vae"], dtype),
                      "t5": cast_tree(bundle["t5"], dtype)}
        else:
            from .convert.wan_vae import convert_wan_vae
            from .convert.encoders import convert_t5
            lora_dir = os.path.join(ckpt_dir, "PAI",
                                    "Wan2.2-Fun-Reward-LoRAs")
            params_high = load_expert(
                ckpt_dir,
                "high_noise_model/diffusion_pytorch_model*.safetensors",
                os.path.join(lora_dir,
                             "Wan2.2-Fun-A14B-InP-high-noise-HPS2.1"
                             ".safetensors"),
                model_ckpt_high, cfg, dtype)
            params_low = load_expert(
                ckpt_dir,
                "low_noise_model/diffusion_pytorch_model*.safetensors",
                os.path.join(lora_dir,
                             "Wan2.2-Fun-A14B-InP-low-noise-HPS2.1"
                             ".safetensors"),
                model_ckpt_low, cfg, dtype)
            vae_sd = load_torch_state_dict(os.path.join(ckpt_dir,
                                                        "Wan2.1_VAE.pth"))
            t5_sd = load_torch_state_dict(os.path.join(
                ckpt_dir, "models_t5_umt5-xxl-enc-bf16.pth"))
            shared = {
                "vae": cast_tree(convert_wan_vae(
                    {("model." + k) if not k.startswith("model.") else k: v
                     for k, v in vae_sd.items()}), dtype),
                "t5": cast_tree(convert_t5(t5_sd), dtype),
            }
        self.cfg = cfg
        self.pipe = FantasyWorldPipeline(cfg=cfg, params=shared,
                                         tokenizer_path=tokenizer_path,
                                         **pipe_cfg_kw)
        self.denoiser = DualModelDenoiser(cfg=cfg, params_high=params_high,
                                          params_low=params_low,
                                          timestep_boundary=timestep_boundary)
        if moge_ckpt:
            _load_moge(moge_ckpt)
        self._has_moge = bool(moge_ckpt)

    # camera list -> Plucker video (shared host path with the wan21 sampler)
    prepare_camera = FantasyWorldSampler.prepare_camera

    def generate_video(self, prompt: str, neg_prompt: str = "",
                       image: Optional[np.ndarray] = None,
                       image_path: Optional[str] = None,
                       end_image: Optional[np.ndarray] = None,
                       camera_params: Optional[List] = None,
                       using_scale: bool = True,
                       seed: Optional[int] = 42,
                       height: int = 480, width: int = 832,
                       num_frames: int = 81, sample_steps: int = 50,
                       cfg_scale: float = 5.0,
                       tea_cache_l1_thresh: Optional[float] = None,
                       tea_cache_model_id: str = "Wan2.1-I2V-14B-480P",
                       mesh=None, ulysses: bool = False,
                       segment_size: Optional[int] = None,
                       progress_callback=None,
                       gen_ckpt_path: Optional[str] = None
                       ) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
        """Returns (uint8 frames (T, H, W, 3), geometry prediction dict).
        Mirrors inference_wan22.py generate_video (:285-378): conditioning
        via the unit pipeline (return_condition flow), control-camera
        latents from the Plucker video, dual-expert denoise."""
        from PIL import Image as PILImage
        from .pipelines.wan_video_22 import (
            control_camera_latents_from_plucker)
        from .pipelines.units import run_condition

        if image is None:
            image = np.asarray(
                PILImage.open(image_path).convert("RGB")) / 255.0
        img_resized = np.asarray(PILImage.fromarray(
            (image * 255).astype(np.uint8)).resize((width, height))) / 255.0
        image_pm1 = (img_resized * 2 - 1).astype(np.float32)

        ctrl = None
        if camera_params is not None:
            plucker = self.prepare_camera(camera_params, image, height,
                                          width, using_scale)
            ctrl = control_camera_latents_from_plucker(plucker)

        shared, posi, nega = run_condition(
            self.pipe, prompt=prompt, negative_prompt=neg_prompt,
            input_image=image_pm1, end_image=end_image, height=height,
            width=width, num_frames=num_frames, seed=seed)

        latents, prediction = self.denoiser.denoise(
            posi["context"], nega["context"], shared["y"], height, width,
            num_frames=num_frames, num_inference_steps=sample_steps,
            cfg_scale=cfg_scale, seed=seed, control_camera_latents=ctrl,
            mesh=mesh, ulysses=ulysses,
            tea_cache_l1_thresh=tea_cache_l1_thresh,
            tea_cache_model_id=tea_cache_model_id,
            segment_size=segment_size, progress_callback=progress_callback,
            gen_ckpt_path=gen_ckpt_path)
        video = self.pipe.decode_video(latents)
        pred_np = {k: np.asarray(v, np.float32)
                   for k, v in (prediction or {}).items()}
        return video, pred_np

    # re-wrap: plain class-attribute access resolves the staticmethod
    # descriptor to a bare function, which would re-bind self here
    export = staticmethod(FantasyWorldSampler.export)
