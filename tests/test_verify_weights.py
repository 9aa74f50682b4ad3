"""cli/verify_weights.py against the synthetic production layouts of
tests/test_checkpoint_rehearsal.py (r4 VERDICT next-#9): the dress
rehearsal must pass end-to-end on a valid layout (raw torch files AND a
pre-converted bundle), write its report artifact, and FAIL loudly --
nonzero exit + a failing census phase in the report -- when the fusion
checkpoint is corrupted (a missing tensor, the class of error the
reference guards with `assert not messages.unexpected_keys`,
inference_wan21.py:217-223)."""
import json
import os

import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity

from test_checkpoint_rehearsal import _write_shards          # noqa: E402
from test_fusion_e2e import (_build_reference, _our_config,  # noqa: E402
                             B, F, H2, W2)


@pytest.fixture()
def wan21_layout(tmp_path):
    """The reference's on-disk wan21 layout at reduced width + a
    pre-converted self-describing bundle (for --config_from / bundle runs).
    Mirrors test_wan21_torch_layout_convert_from_disk's synthesis."""
    import jax.numpy as jnp
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.models.wan_video_vae import VideoVAE_
    from FantasyWorld.diffsynth_wan21.models.wan_video_text_encoder import (
        WanTextEncoder)
    from FantasyWorld.diffsynth_wan21.models.wan_video_image_encoder import (
        VisionTransformer)
    from fantasy_world_tpu.cli.infer_wan21 import load_fusion_params
    from fantasy_world_tpu.convert.orbax_io import save_bundle

    cfg = _our_config()
    ref, base_sd = _build_reference()

    torch.manual_seed(11)
    vae_ref = VideoVAE_(dim=16, z_dim=4).float().eval()
    t5_ref = WanTextEncoder(vocab=100, dim=32, dim_attn=32, dim_ffn=64,
                            num_heads=4, num_layers=2).float().eval()
    clip_ref = VisionTransformer(image_size=28, patch_size=14, dim=64,
                                 mlp_ratio=4, out_dim=32, num_heads=4,
                                 num_layers=3, pool_type="token",
                                 pre_norm=True,
                                 activation="gelu").float().eval()

    ckpt = tmp_path / "Wan2.1-I2V-14B-480P"
    os.makedirs(ckpt)
    _write_shards(base_sd, str(ckpt),
                  "diffusion_pytorch_model-{i:05d}-of-{n:05d}.safetensors",
                  n_shards=7, bf16=True)
    torch.save(vae_ref.state_dict(), ckpt / "Wan2.1_VAE.pth")
    torch.save({k: v.to(torch.bfloat16)
                for k, v in t5_ref.state_dict().items()},
               ckpt / "models_t5_umt5-xxl-enc-bf16.pth")
    torch.save({"model.visual." + k: v
                for k, v in clip_ref.state_dict().items()},
               ckpt / "models_clip_open-clip-xlm-roberta-large-vit-huge-14"
                      ".pth")
    model_pth = tmp_path / "model.pth"
    torch.save(ref.state_dict(), model_pth)

    params = load_fusion_params(str(ckpt), str(model_pth), cfg, jnp.bfloat16)
    bundle = save_bundle(params, tmp_path / "wan21.bundle",
                         configs={"fusion": cfg})
    return dict(ckpt=str(ckpt), model_pth=str(model_pth),
                bundle=str(bundle), tmp=tmp_path, cfg=cfg)


def _argv(layout, raw=True, **over):
    args = ["--variant", "wan21",
            "--frames", str(4 * (F - 1) + 1),
            "--height", str(H2 * 8), "--width", str(W2 * 8),
            "--steps", "2"]
    if raw:
        args += ["--wan_ckpt_path", layout["ckpt"],
                 "--model_ckpt", layout["model_pth"],
                 "--config_from", layout["bundle"]]
    else:
        args += ["--wan_ckpt_path", layout["bundle"]]
    for k, v in over.items():
        args += [f"--{k}", str(v)]
    return args


def test_verify_weights_raw_layout_all_ok(wan21_layout):
    from fantasy_world_tpu.cli.verify_weights import main
    report_path = str(wan21_layout["tmp"] / "report_raw.json")
    out_bundle = str(wan21_layout["tmp"] / "verified.bundle")
    main(_argv(wan21_layout, raw=True, report=report_path,
               out_bundle=out_bundle))
    rep = json.load(open(report_path))
    assert rep["ok"] is True
    names = [p["name"] for p in rep["phases"]]
    assert names == ["load", "census:fusion", "finite", "bundle",
                     "denoise", "heads"]
    census = rep["phases"][1]["detail"]
    assert census["n_missing"] == 0 and census["n_unexpected"] == 0
    assert rep["phases"][3]["detail"]["bit_exact_reload"] is True
    heads = rep["phases"][5]["detail"]["heads"]
    assert heads["depth"]["positive"] is True
    assert heads["depth_conf"]["ge_one"] is True


def test_verify_weights_bundle_all_ok(wan21_layout):
    from fantasy_world_tpu.cli.verify_weights import main
    report_path = str(wan21_layout["tmp"] / "report_bundle.json")
    main(_argv(wan21_layout, raw=False, report=report_path))
    rep = json.load(open(report_path))
    assert rep["ok"] is True


def test_verify_weights_catches_corrupt_fusion_ckpt(wan21_layout):
    """Poison one fusion tensor with NaN (truncated download / bad disk --
    the corruption class a key census cannot see): the finite phase must
    fail and the CLI must exit nonzero. A MISSING key, by contrast, is
    legitimately absorbed by the reference's own strict=False semantics
    (missing = frozen base weights, inference_wan21.py:219), which the
    raw-layout all-ok test above covers."""
    from fantasy_world_tpu.cli.verify_weights import main
    sd = torch.load(wan21_layout["model_pth"], weights_only=True)
    # poison every tensor's first element: whatever subset of keys the
    # converter consumes, at least one NaN lands in the loaded tree
    for k in sd:
        bad_t = sd[k].clone().float()
        bad_t.view(-1)[0] = float("nan")
        sd[k] = bad_t.to(sd[k].dtype)
    corrupt = str(wan21_layout["tmp"] / "model_corrupt.pth")
    torch.save(sd, corrupt)

    layout = dict(wan21_layout, model_pth=corrupt)
    report_path = str(wan21_layout["tmp"] / "report_corrupt.json")
    with pytest.raises(SystemExit) as exc:
        main(_argv(layout, raw=True, report=report_path))
    assert exc.value.code == 1
    rep = json.load(open(report_path))
    assert rep["ok"] is False
    bad = [p for p in rep["phases"] if not p["ok"]]
    assert bad, rep
    # the failure is attributed to the weight-validation phase (or the
    # loader itself), not discovered late as a crash in denoise
    assert bad[0]["name"].startswith(("finite", "census", "load")), bad[0]
    assert rep["phases"][2]["name"] == "finite"
    assert rep["phases"][2]["detail"]["nonfinite"], rep["phases"][2]
