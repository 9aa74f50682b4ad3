"""Pre-convert reference torch checkpoints into an Orbax bundle.

The reference re-parses its .pth/.safetensors layout through ModelManager
on every run (diffsynth_wan21/models/model_manager.py:348-379) -- minutes
of host-side hashing, key renames and dtype casts for the ~28 GB Wan2.1
set. This CLI runs that conversion ONCE and writes an Orbax bundle
(convert/orbax_io.py:save_bundle) that both inference CLIs mmap-restore in
seconds: pass the bundle directory as --wan_ckpt_path and the loaders take
the fast path.

    # Wan2.1: fusion + vae + clip + t5
    python -m fantasy_world_tpu.cli.convert --variant wan21 \
        --wan_ckpt_path ./models/Wan2.1-I2V-14B-480P \
        --model_ckpt model.pth --out ./models/wan21.bundle

    # Wan2.2 dual expert: LoRA is merged into the experts at convert time
    python -m fantasy_world_tpu.cli.convert --variant wan22 \
        --wan_ckpt_path ./models/Wan2.2-Fun-A14B-Control-Camera \
        --model_ckpt_high high.pth --model_ckpt_low low.pth \
        --out ./models/wan22.bundle

    # single checkpoint file -> hash-detected component dir
    python -m fantasy_world_tpu.cli.convert --file Wan2.1_VAE.pth --out dir/
"""
from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="torch checkpoint layout -> Orbax bundle")
    p.add_argument("--variant", choices=["wan21", "wan22"], default=None)
    p.add_argument("--wan_ckpt_path", type=str, default=None)
    p.add_argument("--model_ckpt", type=str, default=None,
                   help="fusion model.pth (wan21)")
    p.add_argument("--model_ckpt_high", type=str, default=None)
    p.add_argument("--model_ckpt_low", type=str, default=None)
    p.add_argument("--file", type=str, default=None,
                   help="convert ONE checkpoint file by hash detection "
                        "instead of a full variant layout")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    return p.parse_args(argv)


def run(args) -> None:
    import jax.numpy as jnp
    from ..convert.orbax_io import save_bundle, convert_checkpoint_file

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]

    if args.file:
        name, _ = convert_checkpoint_file(args.file, out_dir=args.out,
                                          dtype=dtype)
        print(f"converted {args.file} -> {os.path.join(args.out, name)}")
        return

    if args.variant == "wan21":
        if not (args.wan_ckpt_path and args.model_ckpt):
            raise SystemExit("wan21 needs --wan_ckpt_path and --model_ckpt")
        from .infer_wan21 import load_fusion_params
        from ..models.fusion.model import FusionConfig
        from ..models.wan.t5 import T5Config
        from ..models.wan.clip import CLIPVisionConfig
        from ..models.wan.vae import VAEConfig
        from ..models.wan.camera import CameraPoseEncoderConfig
        params = load_fusion_params(args.wan_ckpt_path, args.model_ckpt,
                                    FusionConfig(), dtype)
        path = save_bundle(params, args.out, configs={
            "fusion": FusionConfig(), "t5": T5Config(),
            "clip": CLIPVisionConfig(), "vae": VAEConfig(),
            "pose": CameraPoseEncoderConfig()})
    elif args.variant == "wan22":
        if not (args.wan_ckpt_path and args.model_ckpt_high
                and args.model_ckpt_low):
            raise SystemExit("wan22 needs --wan_ckpt_path, "
                             "--model_ckpt_high and --model_ckpt_low")
        from ..convert.orbax_io import load_torch_state_dict, cast_tree
        from ..convert.wan_vae import convert_wan_vae
        from ..convert.encoders import convert_t5
        from .infer_wan22 import wan22_fusion_config, load_expert

        cfg = wan22_fusion_config()
        lora_dir = os.path.join(args.wan_ckpt_path, "PAI",
                                "Wan2.2-Fun-Reward-LoRAs")
        high = load_expert(
            args.wan_ckpt_path,
            "high_noise_model/diffusion_pytorch_model*.safetensors",
            os.path.join(lora_dir,
                         "Wan2.2-Fun-A14B-InP-high-noise-HPS2.1.safetensors"),
            args.model_ckpt_high, cfg, dtype)
        low = load_expert(
            args.wan_ckpt_path,
            "low_noise_model/diffusion_pytorch_model*.safetensors",
            os.path.join(lora_dir,
                         "Wan2.2-Fun-A14B-InP-low-noise-HPS2.1.safetensors"),
            args.model_ckpt_low, cfg, dtype)
        vae_sd = load_torch_state_dict(
            os.path.join(args.wan_ckpt_path, "Wan2.1_VAE.pth"))
        t5_sd = load_torch_state_dict(os.path.join(
            args.wan_ckpt_path, "models_t5_umt5-xxl-enc-bf16.pth"))
        from ..models.wan.t5 import T5Config
        from ..models.wan.vae import VAEConfig
        path = save_bundle({
            "fusion_high": high, "fusion_low": low,
            "vae": cast_tree(convert_wan_vae(
                {("model." + k) if not k.startswith("model.") else k: v
                 for k, v in vae_sd.items()}), dtype),
            "t5": cast_tree(convert_t5(t5_sd), dtype),
        }, args.out, configs={"fusion_high": cfg, "fusion_low": cfg,
                              "t5": T5Config(), "vae": VAEConfig()})
    else:
        raise SystemExit("pass --variant wan21|wan22 or --file")
    print(f"bundle written: {path}")


def main(argv=None) -> None:
    run(parse_args(argv))


if __name__ == "__main__":
    main()
