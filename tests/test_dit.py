"""Wan DiT parity vs the reference torch WanModel (tiny config, f32, CPU)."""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.parity, pytest.mark.parity_fast]

# tiny config: head_dim 24 keeps the 3D-RoPE bands even (8+8+8)
TINY = dict(dim=96, in_dim=8, ffn_dim=128, out_dim=4, text_dim=32,
            freq_dim=64, eps=1e-6, patch_size=(1, 2, 2), num_heads=4,
            num_layers=2, has_image_input=True)


def _make_pair(camera=False, method="adaln"):
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.models.wan_video_dit import WanModel
    from fantasy_world_tpu.models.wan.dit import WanDiTConfig
    from fantasy_world_tpu.convert.wan_dit import convert_wan_dit

    torch.manual_seed(0)
    ref = WanModel(**TINY).eval().float()
    cfg = WanDiTConfig(**{k: v for k, v in TINY.items()},
                       camera_adapter_end=TINY["num_layers"] if camera else 0,
                       pose_inject_method=method, plucker_dim=48)
    if camera:
        from FantasyWorld.diffsynth_wan21.models.camera_control import (
            CrossAttentionAdapterProcessor)
        for blk in ref.blocks:
            blk.cross_attn.set_processor(CrossAttentionAdapterProcessor(
                context_dim=48, hidden_dim=TINY["dim"],
                pose_inject_method=method).float())
        # zero-init final layers would make the adapters no-ops; randomize
        for blk in ref.blocks:
            proc = blk.cross_attn.processor
            if method == "adaln":
                torch.nn.init.normal_(proc.v_proj.group2[-1].weight, std=0.02)
            else:
                torch.nn.init.normal_(proc.k_proj.weight, std=0.05)
                torch.nn.init.normal_(proc.v_proj.weight, std=0.05)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_wan_dit(sd, cfg)
    return ref, cfg, params


def test_wan_dit_forward_parity():
    from fantasy_world_tpu.models.wan.dit import wan_dit_forward
    import jax.numpy as jnp

    ref, cfg, params = _make_pair()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 3, 8, 12)).astype(np.float32)
    y = rng.standard_normal((1, 4, 3, 8, 12)).astype(np.float32)
    ctx = rng.standard_normal((1, 20, 32)).astype(np.float32)
    clip = rng.standard_normal((1, 257, 1280)).astype(np.float32)
    t = np.array([500.0], np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t),
                      torch.from_numpy(ctx),
                      clip_feature=torch.from_numpy(clip),
                      y=torch.from_numpy(y)).numpy()

    out = wan_dit_forward(params, cfg, jnp.asarray(x), jnp.asarray(t),
                          jnp.asarray(ctx), clip_feature=jnp.asarray(clip),
                          y=jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3, atol=2e-3)


def test_wan_dit_camera_adapter_parity():
    """AdaLN pose injection (camera_control.py adaln branch) at block level --
    the reference only reaches adapter processors through the fusion loop's
    per-block kwargs (fusion/model_wan21.py:157-167), not WanModel.forward."""
    from fantasy_world_tpu.models.wan.dit import dit_block_apply
    from fantasy_world_tpu.ops import rope as rope_ops
    import jax.numpy as jnp

    ref, cfg, params = _make_pair(camera=True)
    rng = np.random.default_rng(1)
    f, h, w = 3, 4, 6
    x = rng.standard_normal((1, f * h * w, 96)).astype(np.float32)
    ctx = rng.standard_normal((1, 277, 96)).astype(np.float32)
    t_mod = rng.standard_normal((1, 6, 96)).astype(np.float32)
    plucker = rng.standard_normal((1, f * h * w, 48)).astype(np.float32)

    freqs_cis = __import__(
        "FantasyWorld.diffsynth_wan21.models.wan_video_dit",
        fromlist=["x"])
    tf = torch.cat([
        ref.freqs[0][:f].view(f, 1, 1, -1).expand(f, h, w, -1),
        ref.freqs[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
        ref.freqs[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
    ], dim=-1).reshape(f * h * w, 1, -1)

    with torch.no_grad():
        ref_out = ref.blocks[0](
            torch.from_numpy(x), torch.from_numpy(ctx),
            torch.from_numpy(t_mod), tf,
            plucker_fea=torch.from_numpy(plucker),
            plucker_context_lens=torch.ones(f, dtype=torch.long)).numpy()

    ang = rope_ops.build_angles_3d(cfg.head_dim, f, h, w)
    cos, sin = rope_ops.cos_sin_half_from_angles(ang)
    out = dit_block_apply(params["blocks"][0], jnp.asarray(x),
                          jnp.asarray(ctx), jnp.asarray(t_mod), cos, sin, cfg,
                          plucker_fea=jnp.asarray(plucker), apply_pose=True)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("method", ["latent_split", "latent_overall"])
def test_wan_dit_latent_pose_inject_parity(method):
    """The decoupled-attention pose variants (camera_control.py:129-145):
    zero-init k/v projections over plucker tokens, per-latent-frame
    ('latent_split') or whole-sequence ('latent_overall')."""
    from fantasy_world_tpu.models.wan.dit import dit_block_apply
    from fantasy_world_tpu.ops import rope as rope_ops
    import jax.numpy as jnp

    ref, cfg, params = _make_pair(camera=True, method=method)
    rng = np.random.default_rng(3)
    f, h, w = 3, 4, 6
    x = rng.standard_normal((1, f * h * w, 96)).astype(np.float32)
    ctx = rng.standard_normal((1, 277, 96)).astype(np.float32)
    t_mod = rng.standard_normal((1, 6, 96)).astype(np.float32)
    plucker = rng.standard_normal((1, f * 5, 48)).astype(np.float32)

    tf = torch.cat([
        ref.freqs[0][:f].view(f, 1, 1, -1).expand(f, h, w, -1),
        ref.freqs[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
        ref.freqs[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
    ], dim=-1).reshape(f * h * w, 1, -1)

    with torch.no_grad():
        ref_out = ref.blocks[0](
            torch.from_numpy(x), torch.from_numpy(ctx),
            torch.from_numpy(t_mod), tf,
            plucker_fea=torch.from_numpy(plucker),
            plucker_context_lens=torch.ones(f, dtype=torch.long)).numpy()

    ang = rope_ops.build_angles_3d(cfg.head_dim, f, h, w)
    cos, sin = rope_ops.cos_sin_half_from_angles(ang)
    out = dit_block_apply(params["blocks"][0], jnp.asarray(x),
                          jnp.asarray(ctx), jnp.asarray(t_mod), cos, sin, cfg,
                          plucker_fea=jnp.asarray(plucker), apply_pose=True,
                          plucker_frames=f)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3, atol=2e-3)


def test_split_block_equals_monolithic():
    """attn_half + ffn_half == full block (the IRG split-execution API)."""
    from fantasy_world_tpu.models.wan.dit import (
        dit_block_apply, dit_block_attn_half, dit_block_ffn_half)
    from fantasy_world_tpu.ops import rope as rope_ops
    import jax.numpy as jnp

    _, cfg, params = _make_pair()
    bp = params["blocks"][0]
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 72, 96)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 277, 96)).astype(np.float32))
    t_mod = jnp.asarray(rng.standard_normal((1, 6, 96)).astype(np.float32))
    ang = rope_ops.build_angles_3d(cfg.head_dim, 3, 4, 6)
    cos, sin = rope_ops.cos_sin_half_from_angles(ang)

    full = dit_block_apply(bp, x, ctx, t_mod, cos, sin, cfg)
    part, mods = dit_block_attn_half(bp, x, ctx, t_mod, cos, sin, cfg)
    split = dit_block_ffn_half(bp, part, mods, cfg)
    np.testing.assert_allclose(np.asarray(full), np.asarray(split),
                               rtol=1e-6, atol=1e-6)
