"""End-to-end CLI smoke: the real user surface on a reduced-size bundle.

Drives `python -m fantasy_world_tpu.cli.infer_wan21` (main()) over a
self-describing Orbax bundle stamped with demo-scale configs: bundle load
(no torch re-parse), HF tokenizer, T5/CLIP encoders, VAE encode, camera
JSON -> Plucker -> pose encoder, the denoise scan + geometry heads, VAE
decode, and MP4 + colored-PLY export -- the full path a reference user
walks (inference_wan21.py:340-399), at dims one CPU can compile in
seconds. The only torch dependency is building the tiny VAE / pose-encoder
weights through the reference modules (they have no init fns here).
"""
import json
import os

import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity


def _write_tiny_tokenizer(path, vocab_size=64):
    """Minimal offline HF fast tokenizer (WordLevel): enough surface for
    WanPrompter-style max_length padding without sentencepiece assets."""
    os.makedirs(path, exist_ok=True)
    vocab = {"[PAD]": 0, "[UNK]": 1}
    for w in ("a", "scenic", "mountain", "valley", "with", "river"):
        vocab[w] = len(vocab)
    i = 0
    while len(vocab) < vocab_size:
        vocab[f"tok{i}"] = len(vocab)
        i += 1
    tok = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [
            {"id": 0, "content": "[PAD]", "single_word": False,
             "lstrip": False, "rstrip": False, "normalized": False,
             "special": True},
            {"id": 1, "content": "[UNK]", "single_word": False,
             "lstrip": False, "rstrip": False, "normalized": False,
             "special": True},
        ],
        "normalizer": {"type": "Lowercase"},
        "pre_tokenizer": {"type": "Whitespace"},
        "post_processor": None,
        "decoder": None,
        "model": {"type": "WordLevel", "vocab": vocab,
                  "unk_token": "[UNK]"},
    }
    with open(os.path.join(path, "tokenizer.json"), "w") as f:
        json.dump(tok, f)
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "pad_token": "[PAD]", "unk_token": "[UNK]",
                   "model_max_length": 512}, f)
    return path


def _tiny_camera_json(path, n=5):
    cams = []
    for i in range(n):
        c2w = np.eye(4)
        c2w[2, 3] = 0.1 * i          # slow dolly forward
        cams.append(c2w.tolist())
    with open(path, "w") as f:
        json.dump({"focal_length": 50.0, "scale": 1,
                   "cameras_interp": cams}, f)
    return path


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_cli_infer_wan21_end_to_end(tmp_path, capsys):
    import jax.numpy as jnp
    from PIL import Image

    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.models.wan_video_vae import VideoVAE_
    from FantasyWorld.diffsynth_wan21.models.pose_adaptor_ac3d import (
        CameraPoseEncoder)
    from fantasy_world_tpu.utils.demo import demo_config
    from fantasy_world_tpu.models.fusion.model import init_fusion
    from fantasy_world_tpu.models.wan.t5 import T5Config, init_t5
    from fantasy_world_tpu.models.wan.clip import (CLIPVisionConfig,
                                                   init_clip_vision)
    from fantasy_world_tpu.models.wan.vae import VAEConfig
    from fantasy_world_tpu.models.wan.camera import CameraPoseEncoderConfig
    from fantasy_world_tpu.convert.wan_vae import convert_wan_vae
    from fantasy_world_tpu.convert.camera import convert_pose_encoder
    from fantasy_world_tpu.convert.orbax_io import save_bundle
    import jax

    # ---- build the reduced-size self-describing bundle -------------------
    cfg = demo_config(dim=64, layers=3, start_index=1, agg_dim=64,
                      text_dim=32, plucker_dim=48, clip_feature_dim=64)
    fusion = init_fusion(jax.random.PRNGKey(0), cfg, jnp.float32)

    torch.manual_seed(0)
    pose_ref = CameraPoseEncoder(context_dim=48, dim=64,
                                 in_channels=6,
                                 pose_inject_method="adaln").float().eval()
    pose_cfg = CameraPoseEncoderConfig(in_channels=6, dim=64, context_dim=48)
    fusion["camera_pose_encoder"] = convert_pose_encoder(
        {"pe." + k: v.numpy() for k, v in pose_ref.state_dict().items()},
        "pe.")

    t5_cfg = T5Config(vocab=64, dim=32, dim_attn=32, dim_ffn=64,
                      num_heads=4, num_layers=2)
    clip_cfg = CLIPVisionConfig(dim=64, num_heads=4, num_layers=2)
    vae_cfg = VAEConfig(dim=16, z_dim=16)
    vae_ref = VideoVAE_(dim=vae_cfg.dim, z_dim=vae_cfg.z_dim).float().eval()
    vae = convert_wan_vae({"model." + k: v.numpy()
                           for k, v in vae_ref.state_dict().items()}, vae_cfg)

    bundle = save_bundle(
        {"fusion": fusion, "vae": vae,
         "clip": init_clip_vision(jax.random.PRNGKey(1), clip_cfg,
                                  jnp.float32),
         "t5": init_t5(jax.random.PRNGKey(2), t5_cfg, jnp.float32)},
        tmp_path / "demo.bundle",
        configs={"fusion": cfg, "t5": t5_cfg, "clip": clip_cfg,
                 "vae": vae_cfg, "pose": pose_cfg})

    # ---- host-side inputs -------------------------------------------------
    tok_dir = _write_tiny_tokenizer(tmp_path / "tok")
    cam_json = _tiny_camera_json(tmp_path / "cameras.json", n=5)
    rng = np.random.default_rng(0)
    img_path = tmp_path / "input.png"
    Image.fromarray(rng.integers(0, 255, (64, 96, 3), np.uint8)).save(
        img_path)
    out_dir = tmp_path / "out"

    # ---- the actual CLI ---------------------------------------------------
    from fantasy_world_tpu.cli.infer_wan21 import main
    main(["--wan_ckpt_path", str(bundle), "--model_ckpt", "unused",
          "--image_path", str(img_path), "--camera_json_path", str(cam_json),
          "--prompt", "a scenic mountain valley with a river",
          "--output_dir", str(out_dir), "--sample_steps", "2",
          "--frames", "5", "--height", "64", "--width", "96",
          "--using_scale", "false", "--auto_download", "false",
          "--tokenizer_path", str(tok_dir), "--seed", "3",
          "--conf_threshold", "0.0", "--stride", "2",
          "--segment_size", "1"])

    video_out = [p for p in os.listdir(out_dir) if p.startswith("video.mp4")]
    assert video_out, f"no video written: {os.listdir(out_dir)}"
    plys = [p for p in os.listdir(out_dir) if p.endswith(".ply")]
    assert plys, f"no PLY written: {os.listdir(out_dir)}"
    assert os.path.getsize(out_dir / plys[0]) > 100
    out = capsys.readouterr().out
    assert "[denoise] step" in out        # segmented progress reached stdout
    assert "outputs written" in out


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_cli_infer_wan22_end_to_end(tmp_path, capsys):
    """The dual-expert CLI surface end-to-end on a reduced wan22 bundle:
    unit-pipeline conditioning (no CLIP), control-camera latents at the
    patch embedding, two-expert denoise with segments, decode + export."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.models.wan_video_vae import VideoVAE_
    from fantasy_world_tpu.models.fusion.model import (FusionConfig,
                                                       init_fusion)
    from fantasy_world_tpu.models.wan.dit import WanDiTConfig
    from fantasy_world_tpu.models.vggt.model import VGGTConfig
    from fantasy_world_tpu.models.vggt.aggregator import AggregatorConfig
    from fantasy_world_tpu.models.fusion.bicross import BicrossConfig
    from fantasy_world_tpu.models.wan.t5 import T5Config, init_t5
    from fantasy_world_tpu.models.wan.vae import VAEConfig
    from fantasy_world_tpu.convert.wan_vae import convert_wan_vae
    from fantasy_world_tpu.convert.orbax_io import save_bundle

    cfg = FusionConfig(
        dit=WanDiTConfig(dim=64, in_dim=36, ffn_dim=128, out_dim=16,
                         text_dim=32, num_heads=4, num_layers=3,
                         has_image_input=False, require_vae_embedding=True,
                         add_control_adapter=True, in_dim_control_adapter=24,
                         camera_adapter_end=0),
        vggt=VGGTConfig(embed_dim=64, wan_dim=64, dpt_layer_idx=(1, 1, 0, 0),
                        aggregator=AggregatorConfig(embed_dim=64, depth=2,
                                                    num_heads=4)),
        bicross=BicrossConfig(m1_dim=64, m2_dim=64, hidden=64, num_heads=4),
        start_index=1, camera_control=False)
    t5_cfg = T5Config(vocab=64, dim=32, dim_attn=32, dim_ffn=64,
                      num_heads=4, num_layers=2)
    vae_cfg = VAEConfig(dim=16, z_dim=16)
    torch.manual_seed(1)
    vae_ref = VideoVAE_(dim=vae_cfg.dim, z_dim=vae_cfg.z_dim).float().eval()

    bundle = save_bundle(
        {"fusion_high": init_fusion(jax.random.PRNGKey(0), cfg, jnp.float32),
         "fusion_low": init_fusion(jax.random.PRNGKey(1), cfg, jnp.float32),
         "vae": convert_wan_vae({"model." + k: v.numpy() for k, v in
                                 vae_ref.state_dict().items()}, vae_cfg),
         "t5": init_t5(jax.random.PRNGKey(2), t5_cfg, jnp.float32)},
        tmp_path / "demo22.bundle",
        configs={"fusion_high": cfg, "fusion_low": cfg, "t5": t5_cfg,
                 "vae": vae_cfg})

    tok_dir = _write_tiny_tokenizer(tmp_path / "tok")
    cam_json = _tiny_camera_json(tmp_path / "cameras.json", n=81)
    rng = np.random.default_rng(1)
    img_path = tmp_path / "input.png"
    Image.fromarray(rng.integers(0, 255, (64, 96, 3), np.uint8)).save(
        img_path)
    out_dir = tmp_path / "out22"

    from fantasy_world_tpu.cli.infer_wan22 import main
    main(["--wan_ckpt_path", str(bundle),
          "--model_ckpt_high", "unused", "--model_ckpt_low", "unused",
          "--image_path", str(img_path), "--camera_json_path", str(cam_json),
          "--prompt", "a scenic valley", "--output_dir", str(out_dir),
          "--sample_steps", "2", "--height", "64", "--width", "96",
          "--using_scale", "false", "--auto_download", "false",
          "--tokenizer_path", str(tok_dir), "--seed", "3",
          "--conf_threshold", "0.0", "--stride", "2",
          "--segment_size", "1"])

    names = os.listdir(out_dir)
    assert any(p.startswith("video.mp4") for p in names), names
    assert any(p.endswith(".ply") for p in names), names
    out = capsys.readouterr().out
    assert "[denoise] step" in out
    assert "outputs written" in out
