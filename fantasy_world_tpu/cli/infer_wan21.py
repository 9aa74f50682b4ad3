"""FantasyWorld-Wan2.1 inference CLI (flag-compatible with the reference
inference_wan21.py): image + camera JSON + prompt -> MP4 + depth/points/
pose + colored PLY.

Checkpoint loading accepts the reference's torch layout (wan_ckpt_path dir
with 7 DiT safetensors shards, VAE/CLIP/T5 .pth; model_ckpt fusion .pth)
and converts on the fly, or pre-converted Orbax directories.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
from pathlib import Path

import numpy as np


def str2bool(v):
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("yes", "true", "t", "1")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="FantasyWorld TPU Inference")
    p.add_argument("--wan_ckpt_path", type=str, required=True)
    p.add_argument("--model_ckpt", type=str, required=True)
    p.add_argument("--image_path", type=str, required=True)
    p.add_argument("--camera_json_path", type=str, required=True)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--neg_prompt", type=str, default=(
        "Bright tones, overexposed, static, blurred details, subtitles, "
        "style, works, paintings, images, static, overall gray, worst "
        "quality, low quality, JPEG compression residue, ugly, incomplete, "
        "extra fingers, poorly drawn hands, poorly drawn faces, deformed, "
        "disfigured, misshapen limbs, fused fingers, still picture, messy "
        "background, three legs, many people in the background, walking "
        "backwards"))
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--fps", type=int, default=16)
    p.add_argument("--sample_steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=1024)
    p.add_argument("--using_scale", type=str2bool, default=True)
    p.add_argument("--height", type=int, default=336)
    p.add_argument("--width", type=int, default=592)
    p.add_argument("--frames", type=int, default=81)
    p.add_argument("--conf_threshold", type=float, default=1.0)
    p.add_argument("--stride", type=int, default=4)
    p.add_argument("--tokenizer_path", type=str, default=None,
                   help="umT5 tokenizer dir (defaults to "
                        "<wan_ckpt_path>/google/umt5-xxl if present)")
    p.add_argument("--moge_ckpt", type=str, default=None,
                   help="MoGe-2 model.pt for scale normalization "
                        "(Ruicheng/moge-2-vitl-normal)")
    p.add_argument("--auto_download", type=str2bool, default=True,
                   help="fetch missing checkpoints from ModelScope/HF into "
                        "--wan_ckpt_path (downloader.py equivalent)")
    p.add_argument("--tea_cache_l1_thresh", type=float, default=None,
                   help="enable TeaCache block-skip at this rel-L1 drift "
                        "threshold (reference suggests 0.05 for 480P)")
    p.add_argument("--quant", type=str, default=None,
                   choices=["int8", "fp8"],
                   help="quantize the denoiser hot path: int8 w8a8 (MXU "
                        "fast path) or fp8 weight storage (core/quant.py)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of the denoise loop "
                        "into this directory (view with xprof/tensorboard)")
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_seq", type=int, default=1)
    p.add_argument("--mesh_model", type=int, default=1,
                   help="multi-chip denoise: data x seq x model mesh over "
                        "jax.devices() (parallel/sharding.py)")
    p.add_argument("--ulysses", type=str2bool, default=False,
                   help="all_to_all sequence-parallel attention over the "
                        "'seq' axis (parallel/ulysses.py)")
    p.add_argument("--segment_size", type=int, default=None,
                   help="run the denoise scan in host-level segments of "
                        "this many steps (enables progress prints and "
                        "preemption resume)")
    p.add_argument("--gen_ckpt_path", type=str, default=None,
                   help="partial-state checkpoint: a preempted generation "
                        "resumes from its last finished segment")
    return p.parse_args(argv)


def load_fusion_params(wan_ckpt_path: str, model_ckpt: str, cfg,
                       dtype,
                       components=("fusion", "vae", "clip", "t5")):
    """Assemble the param set from the reference checkpoint layout, or
    mmap-restore a pre-converted Orbax bundle (cli/convert.py).

    components: which trees to load. Encoder-only callers (the PP
    trainer's batch builder) pass ("vae","clip","t5") and skip the
    multi-GB base-DiT shard read + fusion surgery entirely."""
    import jax.numpy as jnp
    from ..convert.orbax_io import (is_bundle, load_bundle,
                                    load_torch_state_dict,
                                    load_sharded_state_dict, cast_tree)

    if is_bundle(wan_ckpt_path):
        bundle = load_bundle(wan_ckpt_path, tuple(components))
        return {k: cast_tree(v, dtype) for k, v in bundle.items()}
    from ..convert.fusion import convert_fusion_checkpoint
    from ..convert.wan_vae import convert_wan_vae
    from ..convert.encoders import convert_t5, convert_clip_vision

    out = {}
    if "fusion" in components:
        shards = sorted(glob.glob(os.path.join(
            wan_ckpt_path, "diffusion_pytorch_model-*.safetensors")))
        base_dit_sd = load_sharded_state_dict(shards)
        fusion_sd = load_torch_state_dict(model_ckpt)
        out["fusion"] = cast_tree(
            convert_fusion_checkpoint(fusion_sd, base_dit_sd, cfg), dtype)
    if "vae" in components:
        vae_sd = load_torch_state_dict(os.path.join(wan_ckpt_path,
                                                    "Wan2.1_VAE.pth"))
        out["vae"] = cast_tree(convert_wan_vae(
            {("model." + k) if not k.startswith("model.") else k: v
             for k, v in vae_sd.items()}), dtype)
    if "clip" in components:
        clip_sd = load_torch_state_dict(os.path.join(
            wan_ckpt_path,
            "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth"))
        out["clip"] = cast_tree(convert_clip_vision(clip_sd), dtype)
    if "t5" in components:
        t5_sd = load_torch_state_dict(os.path.join(
            wan_ckpt_path, "models_t5_umt5-xxl-enc-bf16.pth"))
        out["t5"] = cast_tree(convert_t5(t5_sd), dtype)
    return out


def run(args) -> None:
    import time
    from PIL import Image

    from ..hostops.camera import cameras_json_to_camera_list
    from ..sampler import FantasyWorldSampler
    from ..utils.observability import profile_trace

    with open(args.camera_json_path) as f:
        camera_data = json.load(f)
    cameras = cameras_json_to_camera_list(
        camera_data, image_size=(args.height, args.width))

    sampler = FantasyWorldSampler(
        args.wan_ckpt_path, args.model_ckpt, moge_ckpt=args.moge_ckpt,
        tokenizer_path=args.tokenizer_path, auto_download=args.auto_download)
    if args.quant:
        sampler.pipe.quantize(args.quant)
    mesh = None
    if args.mesh_data * args.mesh_seq * args.mesh_model > 1:
        from ..parallel.sharding import make_mesh
        mesh = make_mesh(data=args.mesh_data, seq=args.mesh_seq,
                         model=args.mesh_model)
        sampler.pipe.shard(mesh)

    progress = None
    if args.segment_size:
        progress = lambda done, total: print(
            f"[denoise] step {done}/{total}", flush=True)

    image = np.asarray(Image.open(args.image_path).convert("RGB")) / 255.0
    t0 = time.perf_counter()
    with profile_trace(args.profile_dir):
        video, prediction = sampler.generate_video(
            prompt=args.prompt, neg_prompt=args.neg_prompt, image=image,
            camera_params=cameras, using_scale=args.using_scale,
            seed=args.seed, height=args.height, width=args.width,
            num_frames=args.frames, sample_steps=args.sample_steps,
            tea_cache_l1_thresh=args.tea_cache_l1_thresh,
            mesh=mesh, ulysses=args.ulysses,
            segment_size=args.segment_size, progress_callback=progress,
            gen_ckpt_path=args.gen_ckpt_path)
    dt = time.perf_counter() - t0
    print(f"[timing] generate {args.sample_steps} steps + decode: {dt:.1f}s "
          f"({dt / args.sample_steps:.2f} s/step incl. compile)")

    sampler.export(video, prediction, args.output_dir, fps=args.fps,
                   conf_threshold=args.conf_threshold, stride=args.stride)
    print(f"outputs written to {args.output_dir}")


def main(argv=None):
    run(parse_args(argv))


if __name__ == "__main__":
    main()
