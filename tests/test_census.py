"""Production-scale checkpoint-conversion validation (no weights needed).

The only path by which real checkpoints could silently fail is a key drop /
rename drift at full scale: every converter was parity-tested at tiny
widths, but nothing ever consumed the REAL key census -- the 40-layer DiT
(wan_video_dit.py:718-731), the fusion ckpt's deepcopy->Identity surgery at
16 PCB + 24 IRG (fusion/model_wan21.py:69-87), the umT5/CLIP/VAE towers, or
the wan22 LoRA target names (fusion/model_wan22.py:18-118).

These tests instantiate the reference torch classes at production config on
the torch ``meta`` device (shapes only, zero weight memory), feed their full
state-dict censuses through every converter, and assert three things:

  1. the md5-of-keys census hash equals the registry constant the reference
     uses for architecture detection (proves the meta construction IS the
     real file layout -- from_civitai is a pass-through for these models);
  2. every reference key is consumed by the converter (no silent drops);
  3. every leaf of the converted tree exists in our abstract init tree with
     the exact same shape (no silently unfilled / mis-shaped params).

Memory discipline: state-dict values are stride-0 broadcast fp16 zeros and
``np.ascontiguousarray`` is patched to identity for the duration, so the
"14B" trees cost kilobytes. Distinct fill values per checkpoint source let
the fusion test assert weight PROVENANCE (IRG halves really overwrite the
base blocks; absent pipe.dit keys really fall back to the base).
"""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.parity, pytest.mark.parity_fast]


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

class TrackingDict(dict):
    """Records which keys a converter actually reads."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.consumed = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)

    def unconsumed(self):
        return {k for k in self if k not in self.consumed}


def _fake_sd(torch_sd, fill=0.0):
    """meta state dict -> TrackingDict of stride-0 fp16 arrays (zero mem)."""
    return TrackingDict({
        k: np.broadcast_to(np.float16(fill), tuple(v.shape))
        for k, v in torch_sd.items()})


@pytest.fixture
def no_copy(monkeypatch):
    """Identity np.ascontiguousarray: keeps converted leaves as views of the
    stride-0 fakes (layout is irrelevant to a shape/key census)."""
    monkeypatch.setattr(np, "ascontiguousarray", lambda a, *k, **kw: np.asarray(a))


def _shapes(tree, prefix=""):
    """Flatten a params tree to {path: shape}."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_shapes(v, f"{prefix}/{k}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_shapes(v, f"{prefix}/{i}"))
    else:
        out[prefix] = tuple(tree.shape)
    return out


def _abstract(init_fn, *args, **kw):
    from fantasy_world_tpu.core.params import abstract_init
    with abstract_init():
        return init_fn(*args, **kw)


def _assert_census(converted, expected_tree, sd, allow_unconsumed=()):
    """Converted tree == abstract init tree (paths + shapes), all sd keys
    consumed except documented exemptions."""
    got, want = _shapes(converted), _shapes(expected_tree)
    assert set(got) == set(want), (
        f"tree paths differ: only-converted={sorted(set(got) - set(want))[:8]} "
        f"only-init={sorted(set(want) - set(got))[:8]}")
    bad = {p: (got[p], want[p]) for p in got if got[p] != want[p]}
    assert not bad, f"shape mismatches: {dict(list(bad.items())[:8])}"
    left = {k for k in sd.unconsumed()
            if not any(k.startswith(p) for p in allow_unconsumed)}
    assert not left, f"reference keys silently dropped: {sorted(left)[:10]}"


# ---------------------------------------------------------------------------
# Wan2.1 14B I2V DiT (the FantasyWorld base, 7-shard civitai layout)
# ---------------------------------------------------------------------------

def _ref_wan21_dit():
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.models.wan_video_dit import WanModel
    # production config: wan_video_dit.py:691-704 (hash 6bfcfb3b...)
    return WanModel(has_image_input=True, patch_size=[1, 2, 2], in_dim=36,
                    dim=5120, ffn_dim=13824, freq_dim=256, text_dim=4096,
                    out_dim=16, num_heads=40, num_layers=40, eps=1e-6)


def test_wan21_dit_14b_census(no_copy):
    from fantasy_world_tpu.convert.registry import (
        hash_state_dict_keys, detect, WAN_DIT_CONFIGS)
    from fantasy_world_tpu.convert.manager import _translate_dit_config
    from fantasy_world_tpu.convert.wan_dit import convert_wan_dit
    from fantasy_world_tpu.models.wan.dit import WanDiTConfig, init_wan_dit

    with torch.device("meta"):
        ref_sd = _ref_wan21_dit().state_dict()
    assert len(ref_sd) == 1303
    h = hash_state_dict_keys(ref_sd)
    assert h == "6bfcfb3b342cb286ce886889d519a77e"   # file == module layout

    sd = _fake_sd(ref_sd)
    name, overrides = detect(sd)
    assert name == "wan_video_dit" and overrides is WAN_DIT_CONFIGS[h]
    cfg = WanDiTConfig(**_translate_dit_config(overrides))
    params = convert_wan_dit(sd, cfg)
    _assert_census(params, _abstract(init_wan_dit, 0, cfg), sd)


def test_wan21_dit_sharded_file_merge(tmp_path):
    """The 7-shard civitai split (model_manager.py:348-374): shard merge +
    hash detect + convert must behave exactly like the single dict. Run at
    reduced dims (file IO) but FULL key structure via the manager API."""
    import safetensors.numpy
    from fantasy_world_tpu.convert.manager import ModelManager
    from fantasy_world_tpu.convert.registry import WAN_DIT_CONFIGS

    with torch.device("meta"):
        ref_sd = _ref_wan21_dit().state_dict()
    rng = np.random.default_rng(0)
    # tiny random values, PRODUCTION key set; shapes collapsed to rank only
    # (hash detection is monkeypatched off by loading via explicit config)
    sd = {k: rng.standard_normal([2] * v.ndim).astype(np.float16)
          for k, v in ref_sd.items()}
    keys = sorted(sd)
    shards = []
    for i in range(7):
        part = {k: sd[k] for k in keys[i::7]}
        path = tmp_path / f"shard-{i:05d}-of-00007.safetensors"
        safetensors.numpy.save_file(part, str(path))
        shards.append(str(path))
    merged = ModelManager._read(shards)
    assert set(merged) == set(sd)
    for k in keys[:50]:
        np.testing.assert_array_equal(merged[k], sd[k])
    # duplicate keys across shards must be rejected, not silently overwritten
    dup = {keys[0]: sd[keys[0]]}
    path = tmp_path / "dup.safetensors"
    safetensors.numpy.save_file(dup, str(path))
    with pytest.raises(ValueError):
        ModelManager._read(shards + [str(path)])


# ---------------------------------------------------------------------------
# Wan2.2 Fun-A14B-Control-Camera DiT (hash 47dbeab5e5..., control adapter)
# ---------------------------------------------------------------------------

def test_wan22_fun_camera_census(no_copy):
    import sys
    C.add_reference_to_path()
    # both diffsynth forks define top-level-importable module names; make
    # sure we get the wan22 WanModel regardless of import order
    from FantasyWorld.diffsynth_wan22.models.wan_video_dit import WanModel
    from fantasy_world_tpu.convert.registry import (hash_state_dict_keys,
                                                    detect)
    from fantasy_world_tpu.convert.manager import _translate_dit_config
    from fantasy_world_tpu.convert.wan_dit import convert_wan_dit
    from fantasy_world_tpu.models.wan.dit import WanDiTConfig, init_wan_dit

    with torch.device("meta"):
        # production config: wan22 wan_video_dit.py:841-859
        ref = WanModel(has_image_input=False, patch_size=[1, 2, 2], in_dim=36,
                       dim=5120, ffn_dim=13824, freq_dim=256, text_dim=4096,
                       out_dim=16, num_heads=40, num_layers=40, eps=1e-6,
                       has_ref_conv=False, add_control_adapter=True,
                       in_dim_control_adapter=24, require_clip_embedding=False)
        ref_sd = ref.state_dict()
    h = hash_state_dict_keys(ref_sd)
    assert h == "47dbeab5e560db3180adf51dc0232fb1"   # wan22 registry value

    sd = _fake_sd(ref_sd)
    name, overrides = detect(sd)
    assert name == "wan_video_dit"
    cfg = WanDiTConfig(**_translate_dit_config(overrides))
    assert cfg.add_control_adapter and not cfg.has_image_input
    assert cfg.require_vae_embedding and cfg.in_dim == 36
    params = convert_wan_dit(sd, cfg)
    assert "control_adapter" in params     # silently dropped before round 2
    _assert_census(params, _abstract(init_wan_dit, 0, cfg), sd)


def test_wan22_ti2v_5b_census(no_copy):
    """Wan2.2-TI2V-5B (per-token timestep, fused first-frame latent, z=48):
    wan22 wan_video_dit.py:789-807."""
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan22.models.wan_video_dit import WanModel
    from fantasy_world_tpu.convert.registry import (hash_state_dict_keys,
                                                    detect)
    from fantasy_world_tpu.convert.manager import _translate_dit_config
    from fantasy_world_tpu.convert.wan_dit import convert_wan_dit
    from fantasy_world_tpu.models.wan.dit import WanDiTConfig, init_wan_dit

    with torch.device("meta"):
        ref = WanModel(has_image_input=False, patch_size=[1, 2, 2], in_dim=48,
                       dim=3072, ffn_dim=14336, freq_dim=256, text_dim=4096,
                       out_dim=48, num_heads=24, num_layers=30, eps=1e-6,
                       seperated_timestep=True, require_clip_embedding=False,
                       require_vae_embedding=False,
                       fuse_vae_embedding_in_latents=True)
        ref_sd = ref.state_dict()
    h = hash_state_dict_keys(ref_sd)
    assert h == "1f5ab7703c6fc803fdded85ff040c316"

    sd = _fake_sd(ref_sd)
    name, overrides = detect(sd)
    assert name == "wan_video_dit"
    cfg = WanDiTConfig(**_translate_dit_config(overrides))
    assert cfg.seperated_timestep and cfg.fuse_vae_embedding_in_latents
    assert not cfg.require_vae_embedding and cfg.out_dim == 48
    params = convert_wan_dit(sd, cfg)
    _assert_census(params, _abstract(init_wan_dit, 0, cfg), sd)


# ---------------------------------------------------------------------------
# umT5-XXL text encoder
# ---------------------------------------------------------------------------

def test_t5_census(no_copy):
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.models.wan_video_text_encoder import (
        WanTextEncoder)
    from fantasy_world_tpu.convert.registry import (hash_state_dict_keys,
                                                    WAN_T5_HASH)
    from fantasy_world_tpu.convert.encoders import convert_t5
    from fantasy_world_tpu.models.wan.t5 import T5Config, init_t5

    with torch.device("meta"):
        ref_sd = WanTextEncoder().state_dict()
    assert hash_state_dict_keys(ref_sd) == WAN_T5_HASH
    sd = _fake_sd(ref_sd)
    params = convert_t5(sd)
    _assert_census(params, _abstract(init_t5, 0, T5Config()), sd)


# ---------------------------------------------------------------------------
# CLIP ViT-H visual tower
# ---------------------------------------------------------------------------

def test_clip_census(no_copy):
    """File layout: XLMRobertaCLIP keys WITHOUT the 'model.' module prefix
    plus the original release's textual.* tower, which from_civitai SKIPS
    (wan_video_image_encoder.py:894-905; the snapshot's module has
    textual=None, :708). The textual half can't be reconstructed without the
    file, so the census covers the visual tower + documented exemptions."""
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.models.wan_video_image_encoder import (
        XLMRobertaCLIP, XLMRobertaWithHead)
    from fantasy_world_tpu.convert.encoders import convert_clip_vision
    from fantasy_world_tpu.models.wan.clip import (CLIPVisionConfig,
                                                   init_clip_vision)

    with torch.device("meta"):
        # production cfg: clip_xlm_roberta_vit_h_14, image_encoder.py:823-848
        clip = XLMRobertaCLIP(
            embed_dim=1024, image_size=224, patch_size=14, vision_dim=1280,
            vision_mlp_ratio=4, vision_heads=16, vision_layers=32,
            vision_pool='token', activation='gelu', vocab_size=250002,
            max_text_len=514, type_size=1, pad_id=1, text_dim=1024,
            text_heads=16, text_layers=24, text_post_norm=True,
            text_dropout=0.1, attn_dropout=0.0, proj_dropout=0.0,
            embedding_dropout=0.0)
        file_sd = dict(clip.state_dict())
        # emulate the original release's text tower (XLM-RoBERTa-large +
        # projection head) so the converter proves it IGNORES those keys
        tex = XLMRobertaWithHead(vocab_size=250002, max_seq_len=514,
                                 type_size=1, pad_id=1, dim=1024,
                                 num_heads=16, num_layers=24, post_norm=True,
                                 dropout=0.1, eps=1e-5, out_dim=1024)
        for k, v in tex.state_dict().items():
            file_sd["textual." + k] = v

    sd = _fake_sd(file_sd)
    params = convert_clip_vision(sd, prefix="visual.")
    # post_norm/head sit after block 31; encode_image stops there
    # (use_31_block=True, image_encoder.py:879-881) so they are dead weights
    _assert_census(params, _abstract(init_clip_vision, 0, CLIPVisionConfig()),
                   sd, allow_unconsumed=("textual.", "log_scale",
                                         "visual.head", "visual.post_norm."))


# ---------------------------------------------------------------------------
# Wan2.1 video VAE
# ---------------------------------------------------------------------------

def test_vae_census(no_copy):
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.models.wan_video_vae import WanVideoVAE
    from fantasy_world_tpu.convert.registry import (hash_state_dict_keys,
                                                    WAN21_VAE_HASH,
                                                    WAN21_VAE_HASH_ALT)
    from fantasy_world_tpu.convert.wan_vae import convert_wan_vae
    from fantasy_world_tpu.models.wan.vae import VAEConfig, init_wan_vae

    with torch.device("meta"):
        module_sd = WanVideoVAE().state_dict()
    # file layout: module keys without 'model.' (from_civitai re-adds it,
    # wan_video_vae.py:794-800)
    file_sd = {k[len("model."):]: v for k, v in module_sd.items()}
    assert hash_state_dict_keys(file_sd) in (WAN21_VAE_HASH,
                                             WAN21_VAE_HASH_ALT)
    sd = _fake_sd({("model." + k): v for k, v in file_sd.items()})
    params = convert_wan_vae(sd)
    _assert_census(params, _abstract(init_wan_vae, 0, VAEConfig()), sd)


# ---------------------------------------------------------------------------
# The fusion checkpoint: surgery at 16 PCB + 24 IRG, overlay precedence
# ---------------------------------------------------------------------------

def _ref_fusion_census():
    """Replicate the reference's build-time module surgery on meta
    (fusion/model_wan21.py:69-87 + camera_control.py:152-209) and return the
    state-dict census model.pth would carry."""
    import copy
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.models.camera_control import (
        CrossAttentionAdapterProcessor)
    from FantasyWorld.diffsynth_wan21.models.pose_adaptor_ac3d import (
        CameraPoseEncoder)
    from FantasyWorld.fusion.layer.block import IRGBlock
    from FantasyWorld.vggt.models.vggt import VGGT

    with torch.device("meta"):
        dit = _ref_wan21_dit()
        # CameraConditionModel.set_pose_processor: adaln processors on every
        # cross_attn of blocks <= 24 (wan_video_dit.py:515, installed BEFORE
        # the IRG surgery so blocks 16..24's copies carry them)
        for name in dit.attn_processors.keys():
            idx = int(name.split("blocks.")[1].split(".")[0])
            dit.blocks[idx].cross_attn.set_processor(
                CrossAttentionAdapterProcessor(
                    context_dim=2048, hidden_dim=5120,
                    pose_inject_method="adaln"))
        vggt = VGGT(enable_camera=True, enable_depth=True, enable_point=True,
                    enable_track=False, DPT_patch_size=16)
        irg_blocks = []
        for idx in range(24):
            dit_copy = copy.deepcopy(dit.blocks[idx + 16])
            agg_copy = copy.deepcopy(vggt.aggregator.global_blocks[idx])
            dit.blocks[idx + 16] = torch.nn.Identity()
            vggt.aggregator.global_blocks[idx] = torch.nn.Identity()
            irg_blocks.append(IRGBlock(
                x_agg_block=agg_copy, x_dit_block=dit_copy, m1_dim=5120,
                m2_dim=1024, hidden_size=1152, num_heads=12, drop_path=None))
        # production pose encoder kwargs: camera_control.py:165-191
        pose_enc = CameraPoseEncoder(
            downscale_factor=8, channels=[320, 640, 1280, 1280, 2048],
            nums_rb=2, cin=384, ksize=1, sk=True, use_conv=False,
            compression_factor=1, temporal_attention_nhead=8,
            attention_block_types=["Temporal_Self"],
            temporal_position_encoding=True,
            temporal_position_encoding_max_len=16,
            pose_inject_method="adaln", context_dim=2048, in_channels=6)

        census = {}
        for k, v in dit.state_dict().items():
            census["pipe.dit." + k] = v
        for i, blk in enumerate(irg_blocks):
            for k, v in blk.state_dict().items():
                census[f"IRGBlock.{i}.{k}"] = v
        for k, v in vggt.state_dict().items():
            census["vggt." + k] = v
        for k, v in pose_enc.state_dict().items():
            census["camera_condition.pose_encoder." + k] = v
    return census


def test_fusion_checkpoint_census(no_copy):
    from fantasy_world_tpu.convert.fusion import convert_fusion_checkpoint
    from fantasy_world_tpu.models.fusion.model import (FusionConfig,
                                                       init_fusion)

    cfg = FusionConfig()        # production defaults: 16 PCB + 24 IRG, 14B
    census = _ref_fusion_census()
    with torch.device("meta"):
        base_sd_t = _ref_wan21_dit().state_dict()

    BASE, OVERLAY, IRG, VGGT_F, POSE = 1.0, 2.0, 3.0, 4.0, 5.0
    base_sd = _fake_sd(base_sd_t, fill=BASE)

    def fill_for(key):
        if key.startswith("pipe.dit."):
            return OVERLAY
        if ".x_dit." in key or ".x_agg." in key or ".bicross_attention." in key:
            return IRG
        if key.startswith("vggt."):
            return VGGT_F
        return POSE
    fusion_sd = TrackingDict({
        k: np.broadcast_to(np.float16(fill_for(k)), tuple(v.shape))
        for k, v in census.items()})
    # simulate frozen-base behavior: drop one PCB block's BASE keys from the
    # ckpt (strict=False load, missing keys = frozen base weights). The
    # camera processors stay -- they exist only in the trained ckpt.
    dropped = {k for k in fusion_sd if k.startswith("pipe.dit.blocks.3.")
               and ".cross_attn.processor." not in k}
    for k in dropped:
        del fusion_sd[k]

    params = convert_fusion_checkpoint(fusion_sd, base_sd, cfg)

    # shapes/paths vs the abstract production init tree
    expected = _abstract(init_fusion, 0, cfg)
    got = _shapes({k: v for k, v in params.items()
                   if k != "camera_pose_encoder"})
    want = _shapes(expected)
    assert set(got) == set(want), (
        f"paths differ: extra={sorted(set(got) - set(want))[:8]} "
        f"missing={sorted(set(want) - set(got))[:8]}")
    bad = {p: (got[p], want[p]) for p in got if got[p] != want[p]}
    assert not bad, f"shape mismatches: {dict(list(bad.items())[:8])}"
    assert "camera_pose_encoder" in params

    # provenance: every converted leaf must come from the right source
    def fills(tree):
        return {p: float(np.asarray(a).flat[0])
                for p, a in _flatten_leaves(tree).items()}

    def _flatten_leaves(tree, prefix=""):
        out = {}
        if isinstance(tree, dict):
            for k, v in tree.items():
                out.update(_flatten_leaves(v, f"{prefix}/{k}"))
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                out.update(_flatten_leaves(v, f"{prefix}/{i}"))
        else:
            out[prefix] = tree
        return out

    f = fills(params)
    for p, v in f.items():
        if p.startswith("/dit/blocks/"):
            blk = int(p.split("/")[3])
            if blk >= 16:
                assert v == IRG, f"{p}: IRG half not written back (={v})"
            elif blk == 3 and "/camera/" not in p:
                assert v == BASE, f"{p}: dropped ckpt key must fall back (={v})"
            else:
                assert v == OVERLAY, f"{p}: pipe.dit overlay lost (={v})"
        elif p.startswith("/dit/"):
            assert v == OVERLAY, f"{p}: ={v}"
        elif "/global_blocks/" in p:
            assert v == IRG, f"{p}: x_agg half not written back (={v})"
        elif p.startswith("/vggt/"):
            assert v == VGGT_F, f"{p}: ={v}"
        elif p.startswith("/bicross/"):
            assert v == IRG, f"{p}: ={v}"
        elif p.startswith("/camera_pose_encoder/"):
            assert v == POSE, f"{p}: ={v}"

    # full consumption of the ckpt (minus the keys we deliberately dropped)
    left = fusion_sd.unconsumed()
    assert not left, f"fusion ckpt keys silently dropped: {sorted(left)[:10]}"


# ---------------------------------------------------------------------------
# wan22 Reward-LoRA: name resolution against the production key set
# ---------------------------------------------------------------------------

def test_lora_name_resolution_production_census():
    from fantasy_world_tpu.convert.lora import resolve_lora_targets

    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan22.models.wan_video_dit import WanModel
    with torch.device("meta"):
        ref = WanModel(has_image_input=False, patch_size=[1, 2, 2], in_dim=36,
                       dim=5120, ffn_dim=13824, freq_dim=256, text_dim=4096,
                       out_dim=16, num_heads=40, num_layers=40, eps=1e-6,
                       add_control_adapter=True, in_dim_control_adapter=24,
                       require_clip_embedding=False)
        sd_keys = list(ref.state_dict().keys())

    # every Linear the Reward-LoRA could target, in all four key dialects
    targets = [k[:-len(".weight")] for k in sd_keys
               if k.endswith(".weight") and "blocks." in k
               and any(t in k for t in (".self_attn.", ".cross_attn.",
                                        ".ffn."))
               and "norm" not in k and "modulation" not in k]
    assert len(targets) >= 40 * 10
    dialects = [
        lambda t: f"lora_unet_{t.replace('.', '_')}.lora_up.weight",
        lambda t: f"lora_unet_{t.replace('.', '_')}_lora_up_weight",
        lambda t: f"{t}.lora_A.weight",          # peft; lora_unet__ prefixed
        lambda t: f"{t}.lora_B.default.weight",
    ]
    sd_key_set = {k: None for k in sd_keys}
    for i, t in enumerate(targets):
        lk = dialects[i % len(dialects)](t)
        resolved = resolve_lora_targets(sd_key_set, [lk])
        assert resolved, f"{lk} did not resolve"
        ((layer, target),) = resolved.items()
        assert target == t + ".weight", (lk, target)


def test_lora_merge_matches_reference_tiny():
    """True parity of resolution + algebra: reference load_lora vs our merge
    on a real (small) wan22 WanModel with synthetic LoRA in two dialects."""
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan22.models.wan_video_dit import WanModel
    from FantasyWorld.fusion.model_wan22 import load_lora as ref_load_lora
    from fantasy_world_tpu.convert.lora import merge_lora_into_state_dict

    torch.manual_seed(3)
    dit = WanModel(has_image_input=False, patch_size=[1, 2, 2], in_dim=8,
                   dim=64, ffn_dim=128, freq_dim=32, text_dim=32, out_dim=4,
                   num_heads=4, num_layers=2, eps=1e-6).float().eval()
    rank = 4
    lora_sd = {}
    gen = np.random.default_rng(0)
    for i, name in enumerate(["blocks.0.self_attn.q", "blocks.1.ffn.0",
                              "blocks.1.cross_attn.o"]):
        mod = dit
        for part in name.split("."):
            mod = mod[int(part)] if part.isdigit() else getattr(mod, part)
        out_f, in_f = mod.weight.shape
        up = gen.standard_normal((out_f, rank)).astype(np.float32)
        down = gen.standard_normal((rank, in_f)).astype(np.float32)
        if i % 2 == 0:   # mangled dialect
            base = "lora_unet_" + name.replace(".", "_")
            lora_sd[base + ".lora_up.weight"] = torch.from_numpy(up)
            lora_sd[base + ".lora_down.weight"] = torch.from_numpy(down)
            lora_sd[base + ".alpha"] = torch.tensor(float(rank))
        else:            # peft dialect
            lora_sd[name + ".lora_B.weight"] = torch.from_numpy(up)
            lora_sd[name + ".lora_A.weight"] = torch.from_numpy(down)

    ours = merge_lora_into_state_dict(
        {k: v.numpy().copy() for k, v in dit.state_dict().items()},
        {k: v.numpy() for k, v in lora_sd.items()}, multiplier=0.55)

    class FakePipe:
        device, torch_dtype = "cpu", torch.float32
        dit = None
    pipe = FakePipe()
    pipe.dit = dit

    import safetensors.torch as st
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "lora.safetensors")
        st.save_file(lora_sd, path)
        ref_load_lora(pipe, path, multiplier=0.55, sub_transformer_name="dit")

    ref_sd = dit.state_dict()
    changed = 0
    for k, v in ours.items():
        np.testing.assert_allclose(v, ref_sd[k].numpy(), rtol=1e-5, atol=1e-5,
                                   err_msg=k)
        changed += int(not np.allclose(v, 0) and "lora" not in k)
    assert len(ours) == len(ref_sd)
