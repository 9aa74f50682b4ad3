"""FantasyWorld-Wan2.2-Fun-A14B-Control-Camera inference CLI.

Flag-compatible with the reference inference_wan22.py: dual high/low-noise
14B experts switched at --timestep_boundary, Reward-LoRA merged at load,
camera control via control-camera latents at the patch embedding, 480x832
output, PLY confidence threshold 1.5.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
from pathlib import Path

import numpy as np

from .infer_wan21 import str2bool


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="FantasyWorld Wan2.2 TPU Inference")
    p.add_argument("--image_path", type=str,
                   default="examples/images/input_image.png")
    p.add_argument("--end_image_path", type=str, default="")
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--neg_prompt", type=str, default="")
    p.add_argument("--camera_json_path", type=str, required=True)
    p.add_argument("--conf_threshold", type=float, default=1.5)
    p.add_argument("--wan_ckpt_path", type=str, required=True)
    p.add_argument("--model_ckpt_high", type=str, required=True)
    p.add_argument("--model_ckpt_low", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--fps", type=int, default=16)
    p.add_argument("--sample_steps", type=int, default=50)
    p.add_argument("--using_scale", type=str2bool, default=True)
    p.add_argument("--timestep_boundary", type=int, default=900)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--stride", type=int, default=4)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--moge_ckpt", type=str, default=None)
    p.add_argument("--auto_download", type=str2bool, default=True,
                   help="fetch missing checkpoints from ModelScope/HF "
                        "(ModelConfig.download_if_necessary equivalent)")
    p.add_argument("--quant", type=str, default=None,
                   choices=["int8", "fp8"],
                   help="quantize both experts' dense hot paths: int8 w8a8 "
                        "(MXU fast path) or fp8 weight storage "
                        "(core/quant.py)")
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_seq", type=int, default=1)
    p.add_argument("--mesh_model", type=int, default=1,
                   help="multi-chip denoise: data x seq x model mesh over "
                        "jax.devices() (parallel/sharding.py)")
    p.add_argument("--ulysses", type=str2bool, default=False,
                   help="all_to_all sequence-parallel attention over the "
                        "'seq' axis (parallel/ulysses.py)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of the denoise loop")
    p.add_argument("--tea_cache_l1_thresh", type=float, default=None,
                   help="TeaCache: skip the block stack when accumulated "
                        "timestep-modulation drift is below this threshold "
                        "(pipelines/tea_cache.py)")
    p.add_argument("--tea_cache_model_id", type=str,
                   default="Wan2.1-I2V-14B-480P",
                   help="TeaCache polynomial coefficient table (the wan22 "
                        "reference ships the same Wan2.1 tables)")
    p.add_argument("--segment_size", type=int, default=None,
                   help="run the denoise in host-level segments of this "
                        "many steps (progress prints + preemption resume); "
                        "segments never span the expert boundary")
    p.add_argument("--gen_ckpt_path", type=str, default=None,
                   help="partial-state checkpoint: a preempted generation "
                        "resumes from its last finished segment")
    return p.parse_args(argv)


def wan22_fusion_config():
    from ..models.fusion.model import FusionConfig
    from ..models.wan.dit import WanDiTConfig
    return FusionConfig(
        dit=WanDiTConfig(has_image_input=False, require_vae_embedding=True,
                         add_control_adapter=True, in_dim_control_adapter=24,
                         camera_adapter_end=0),
        camera_control=True)


def load_expert(wan_ckpt_path: str, origin_pattern: str, lora_path: str,
                model_ckpt: str, cfg, dtype):
    """Base DiT shards + Reward-LoRA merge + fusion checkpoint overlay."""
    from ..convert.orbax_io import (load_sharded_state_dict,
                                    load_torch_state_dict, cast_tree)
    from ..convert.lora import merge_lora_into_state_dict
    from ..convert.fusion import convert_fusion_checkpoint

    shards = sorted(glob.glob(os.path.join(wan_ckpt_path, origin_pattern)))
    base_sd = load_sharded_state_dict(shards)
    if lora_path and os.path.exists(lora_path):
        from safetensors.numpy import load_file
        base_sd = merge_lora_into_state_dict(base_sd, load_file(lora_path),
                                             multiplier=0.55, verbose=True)
    fusion_sd = load_torch_state_dict(model_ckpt)
    return cast_tree(convert_fusion_checkpoint(fusion_sd, base_sd, cfg),
                     dtype)


def run(args) -> None:
    import jax.numpy as jnp
    from PIL import Image

    from ..pipelines.wan_video import FantasyWorldPipeline
    from ..pipelines.wan_video_22 import (DualModelDenoiser,
                                          control_camera_latents_from_plucker)
    from ..hostops.camera import (cameras_json_to_camera_list,
                                  plucker_from_pose_encoding)
    from ..hostops.geometry import extri_intri_to_pose_encoding
    from ..hostops.export import (get_pointclouds, save_colored_pointcloud_ply,
                                  save_video)
    from ..convert.orbax_io import load_torch_state_dict, cast_tree
    from ..convert.wan_vae import convert_wan_vae
    from ..convert.encoders import convert_t5

    if args.auto_download:
        from ..convert.downloader import resolve_ckpt_dir
        resolve_ckpt_dir(args.wan_ckpt_path, "Wan2.2-Fun-A14B-Control-Camera")

    cfg = wan22_fusion_config()
    dtype = jnp.bfloat16
    pipe_cfg_kw = {}
    from ..convert.orbax_io import (is_bundle, load_bundle,
                                    load_bundle_configs)
    if is_bundle(args.wan_ckpt_path):
        # pre-converted Orbax bundle (cli/convert.py --variant wan22):
        # LoRA already merged into the experts at conversion time; the
        # stamped configs make reduced-size bundles load the same way
        cfgs = load_bundle_configs(args.wan_ckpt_path)
        cfg = cfgs.get("fusion_high", cfg)
        for key, attr in (("t5", "t5_cfg"), ("vae", "vae_cfg")):
            if key in cfgs:
                pipe_cfg_kw[attr] = cfgs[key]
        bundle = load_bundle(args.wan_ckpt_path,
                             ("fusion_high", "fusion_low", "vae", "t5"))
        params_high = cast_tree(bundle["fusion_high"], dtype)
        params_low = cast_tree(bundle["fusion_low"], dtype)
        shared = {"fusion": params_high,
                  "vae": cast_tree(bundle["vae"], dtype),
                  "t5": cast_tree(bundle["t5"], dtype)}
    else:
        lora_dir = os.path.join(args.wan_ckpt_path, "PAI",
                                "Wan2.2-Fun-Reward-LoRAs")
        params_high = load_expert(
            args.wan_ckpt_path, "high_noise_model/diffusion_pytorch_model*.safetensors",
            os.path.join(lora_dir, "Wan2.2-Fun-A14B-InP-high-noise-HPS2.1.safetensors"),
            args.model_ckpt_high, cfg, dtype)
        params_low = load_expert(
            args.wan_ckpt_path, "low_noise_model/diffusion_pytorch_model*.safetensors",
            os.path.join(lora_dir, "Wan2.2-Fun-A14B-InP-low-noise-HPS2.1.safetensors"),
            args.model_ckpt_low, cfg, dtype)

        vae_sd = load_torch_state_dict(os.path.join(args.wan_ckpt_path,
                                                    "Wan2.1_VAE.pth"))
        t5_sd = load_torch_state_dict(os.path.join(
            args.wan_ckpt_path, "models_t5_umt5-xxl-enc-bf16.pth"))
        shared = {
            "fusion": params_high,
            "vae": cast_tree(convert_wan_vae(
                {("model." + k) if not k.startswith("model.") else k: v
                 for k, v in vae_sd.items()}), dtype),
            "t5": cast_tree(convert_t5(t5_sd), dtype),
        }
    pipe = FantasyWorldPipeline(cfg=cfg, params=shared,
                                tokenizer_path=args.tokenizer_path,
                                **pipe_cfg_kw)
    denoiser = DualModelDenoiser(cfg=cfg, params_high=params_high,
                                 params_low=params_low,
                                 timestep_boundary=args.timestep_boundary)
    if args.quant:
        denoiser.quantize(args.quant)
    mesh = None
    if args.mesh_data * args.mesh_seq * args.mesh_model > 1:
        from ..parallel.sharding import make_mesh
        mesh = make_mesh(data=args.mesh_data, seq=args.mesh_seq,
                         model=args.mesh_model)
        denoiser.shard(mesh)

    # ---- host preprocessing ---------------------------------------------
    with open(args.camera_json_path) as f:
        camera_data = json.load(f)
    cameras = cameras_json_to_camera_list(
        camera_data, image_size=(args.height, args.width))
    img = Image.open(args.image_path).convert("RGB")
    img_resized = np.asarray(img.resize((args.width, args.height))) / 255.0
    image_pm1 = (img_resized * 2 - 1).astype(np.float32)
    end_image = None
    if args.end_image_path:
        eimg = Image.open(args.end_image_path).convert("RGB")
        end_image = (np.asarray(eimg.resize((args.width, args.height)))
                     / 255.0 * 2 - 1).astype(np.float32)

    intr = np.stack([[[c.fx, 0, c.cx], [0, c.fy, c.cy], [0, 0, 1]]
                     for c in cameras]).astype(np.float32)
    extr = np.stack([c.w2c_mat for c in cameras]).astype(np.float32)
    if args.using_scale:
        from .moge_scale import moge_scale_normalize
        extr = moge_scale_normalize(np.asarray(img) / 255.0, extr, intr)
    pose_enc = extri_intri_to_pose_encoding(extr[:, :3, :], intr,
                                            (args.height, args.width))
    plucker = plucker_from_pose_encoding(pose_enc, (args.height, args.width))
    ctrl = control_camera_latents_from_plucker(plucker)

    # wan22 path: the reference collects conditioning via the unit pipeline
    # with return_condition=True (inference_wan22.py:345-353); same here
    from ..pipelines.units import run_condition
    shared, posi, nega = run_condition(
        pipe, prompt=args.prompt, negative_prompt=args.neg_prompt,
        input_image=image_pm1, end_image=end_image, height=args.height,
        width=args.width, num_frames=81, seed=args.seed)
    image_emb = {"y": shared["y"]}
    ctx_pos, ctx_neg = posi["context"], nega["context"]

    import contextlib
    import time
    import jax
    trace_ctx = (jax.profiler.trace(args.profile_dir)
                 if args.profile_dir else contextlib.nullcontext())
    progress = None
    if args.segment_size:
        progress = lambda done, total: print(
            f"[denoise] step {done}/{total}", flush=True)
    t0 = time.perf_counter()
    with trace_ctx:
        latents, prediction = denoiser.denoise(
            ctx_pos, ctx_neg, image_emb["y"], args.height, args.width,
            num_inference_steps=args.sample_steps, seed=args.seed,
            control_camera_latents=ctrl, mesh=mesh, ulysses=args.ulysses,
            tea_cache_l1_thresh=args.tea_cache_l1_thresh,
            tea_cache_model_id=args.tea_cache_model_id,
            segment_size=args.segment_size, progress_callback=progress,
            gen_ckpt_path=args.gen_ckpt_path)
        jax.block_until_ready(latents)
    dt = time.perf_counter() - t0
    print(f"[timing] denoise {args.sample_steps} steps: {dt:.1f}s "
          f"({dt / args.sample_steps:.2f} s/step incl. compile)")
    video = pipe.decode_video(latents)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    save_video(video, out_dir / "video.mp4", fps=args.fps)
    pred_np = {k: np.asarray(v, np.float32) for k, v in prediction.items()}
    points = get_pointclouds(pred_np, fix_first_frame=True)
    valid = pred_np["depth_conf"][0] > args.conf_threshold
    save_colored_pointcloud_ply(
        points, video.astype(np.float32),
        out_dir / f"recon_confthresh{args.conf_threshold}.ply",
        stride=args.stride, valid_mask=valid)
    print(f"outputs written to {out_dir}")


def main(argv=None):
    run(parse_args(argv))


if __name__ == "__main__":
    main()
