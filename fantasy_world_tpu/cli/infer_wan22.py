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
    import time

    import jax
    from PIL import Image

    from ..hostops.camera import cameras_json_to_camera_list
    from ..sampler import Wan22Sampler

    with open(args.camera_json_path) as f:
        camera_data = json.load(f)
    cameras = cameras_json_to_camera_list(
        camera_data, image_size=(args.height, args.width))

    sampler = Wan22Sampler(
        args.wan_ckpt_path, args.model_ckpt_high, args.model_ckpt_low,
        moge_ckpt=args.moge_ckpt, tokenizer_path=args.tokenizer_path,
        auto_download=args.auto_download,
        timestep_boundary=args.timestep_boundary)
    if args.quant:
        sampler.denoiser.quantize(args.quant)
    mesh = None
    if args.mesh_data * args.mesh_seq * args.mesh_model > 1:
        from ..parallel.sharding import make_mesh
        mesh = make_mesh(data=args.mesh_data, seq=args.mesh_seq,
                         model=args.mesh_model)
        sampler.denoiser.shard(mesh)

    image = np.asarray(Image.open(args.image_path).convert("RGB")) / 255.0
    end_image = None
    if args.end_image_path:
        eimg = Image.open(args.end_image_path).convert("RGB")
        end_image = (np.asarray(eimg.resize((args.width, args.height)))
                     / 255.0 * 2 - 1).astype(np.float32)

    from ..utils.observability import profile_trace
    trace_ctx = profile_trace(args.profile_dir)
    progress = None
    if args.segment_size:
        progress = lambda done, total: print(
            f"[denoise] step {done}/{total}", flush=True)
    t0 = time.perf_counter()
    with trace_ctx:
        video, pred_np = sampler.generate_video(
            prompt=args.prompt, neg_prompt=args.neg_prompt, image=image,
            end_image=end_image, camera_params=cameras,
            using_scale=args.using_scale, seed=args.seed,
            height=args.height, width=args.width,
            sample_steps=args.sample_steps,
            tea_cache_l1_thresh=args.tea_cache_l1_thresh,
            tea_cache_model_id=args.tea_cache_model_id,
            mesh=mesh, ulysses=args.ulysses,
            segment_size=args.segment_size, progress_callback=progress,
            gen_ckpt_path=args.gen_ckpt_path)
    dt = time.perf_counter() - t0
    print(f"[timing] generate {args.sample_steps} steps + decode: {dt:.1f}s "
          f"({dt / args.sample_steps:.2f} s/step incl. compile)")

    out_dir = Path(args.output_dir)
    sampler.export(video, pred_np, str(out_dir), fps=args.fps,
                   conf_threshold=args.conf_threshold, stride=args.stride)
    print(f"outputs written to {out_dir}")


def main(argv=None):
    run(parse_args(argv))


if __name__ == "__main__":
    main()
