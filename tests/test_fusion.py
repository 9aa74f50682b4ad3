"""Fusion core parity: bicross attention, IRG block, pose encoder, and the
joint_forward scan orchestration."""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.parity, pytest.mark.parity_fast]


def _rope_tables_torch(head_dim, f, h, w, n_extra=0):
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.models.wan_video_dit import (
        precompute_freqs_cis_3d, build_freqs_3d_with_extra_cis)
    fc = precompute_freqs_cis_3d(head_dim)
    if n_extra:
        return build_freqs_3d_with_extra_cis(fc, f, h, w, n_extra)
    return torch.cat([
        fc[0][:f].view(f, 1, 1, -1).expand(f, h, w, -1),
        fc[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
        fc[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
    ], dim=-1).reshape(f * h * w, 1, -1)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_bicross_parity():
    C.add_reference_to_path()
    from FantasyWorld.fusion.layer.block import CrossModalityBiAttentionBlock
    from fantasy_world_tpu.models.fusion.bicross import (
        BicrossConfig, bicross_apply)
    from fantasy_world_tpu.convert.fusion import _bicross
    from fantasy_world_tpu.ops import rope as rope_ops
    import jax.numpy as jnp

    torch.manual_seed(0)
    m1, m2, hidden, heads = 96, 64, 96, 4
    ref = CrossModalityBiAttentionBlock(m1, m2, hidden, heads).float().eval()
    # zero-init gates make the residual trivially x; randomize for signal
    with torch.no_grad():
        ref.gamma_m1.normal_(std=0.1)
        ref.gamma_m2.normal_(std=0.1)
    cfg = BicrossConfig(m1_dim=m1, m2_dim=m2, hidden=hidden, num_heads=heads)

    f, h, w, n_extra = 3, 4, 6, 5
    L1 = f * h * w
    L2 = f * (n_extra + h * w)
    rng = np.random.default_rng(0)
    x1 = rng.standard_normal((1, L1, m1)).astype(np.float32)
    x2 = rng.standard_normal((1, L2, m2)).astype(np.float32)

    head_dim = hidden // heads
    tf_dit = _rope_tables_torch(head_dim, f, h, w)
    tf_agg = _rope_tables_torch(head_dim, f, h, w, n_extra)
    with torch.no_grad():
        r1, r2 = ref([torch.from_numpy(x1), torch.from_numpy(x2)],
                     freqs_dit=tf_dit, freqs_agg=tf_agg)

    sd = {"b.bicross_attention." + k: v.numpy()
          for k, v in ref.state_dict().items()}
    # reference nests the projections under .cross_attn; our converter
    # expects the fusion checkpoint layout IRGBlock.i.bicross_attention.*
    p = _bicross(sd, "b", head_dim=hidden // heads)
    rope_dit = rope_ops.cos_sin_half_from_angles(
        rope_ops.build_angles_3d(head_dim, f, h, w))
    rope_agg = rope_ops.cos_sin_half_from_angles(
        rope_ops.build_angles_3d(head_dim, f, h, w, n_extra_per_frame=n_extra))
    o1, o2 = bicross_apply(p, cfg, jnp.asarray(x1), jnp.asarray(x2),
                           rope_dit, rope_agg)
    np.testing.assert_allclose(np.asarray(o1), r1.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(o2), r2.numpy(), rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_bicross_temporal_mode_parity():
    """bica_mode='temporal' (fusion/layer/block.py:200-218): windowed
    geometry frames, uneven R/T split, no-op pad mask quirk."""
    C.add_reference_to_path()
    from FantasyWorld.fusion.layer.block import CrossModalityBiAttentionBlock
    from fantasy_world_tpu.models.fusion.bicross import (
        BicrossConfig, bicross_apply_temporal)
    from fantasy_world_tpu.convert.fusion import _bicross
    import jax.numpy as jnp

    torch.manual_seed(9)
    dim, hidden, heads = 64, 64, 4
    ref = CrossModalityBiAttentionBlock(dim, dim, hidden, heads,
                                        bica_mode="temporal").float().eval()
    with torch.no_grad():
        ref.gamma_m1.normal_(std=0.1)
        ref.gamma_m2.normal_(std=0.1)
    cfg = BicrossConfig(m1_dim=dim, m2_dim=dim, hidden=hidden,
                        num_heads=heads)

    T, S, R, M = 3, 12, 5, 7       # R not divisible by T -> padded window
    rng = np.random.default_rng(9)
    x1 = rng.standard_normal((1, T * S, dim)).astype(np.float32)
    x2 = rng.standard_normal((1, R * M, dim)).astype(np.float32)

    with torch.no_grad():
        r1, r2 = ref([torch.from_numpy(x1), torch.from_numpy(x2)],
                     T=T, S=S, R=R, M=M)

    p = _bicross({"b.bicross_attention." + k: v.numpy()
                  for k, v in ref.state_dict().items()}, "b",
                 head_dim=hidden // heads)
    o1, o2 = bicross_apply_temporal(p, cfg, jnp.asarray(x1), jnp.asarray(x2),
                                    T, S, R, M)
    np.testing.assert_allclose(np.asarray(o1), r1.numpy(), rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(o2), r2.numpy(), rtol=2e-3,
                               atol=2e-3)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_irg_block_parity():
    """Full IRG iteration: dit half + agg half + bicross + ffn halves."""
    C.add_reference_to_path()
    from FantasyWorld.fusion.layer.block import IRGBlock
    from FantasyWorld.diffsynth_wan21.models.wan_video_dit import DiTBlock
    from FantasyWorld.vggt.layers.block import Block
    from FantasyWorld.vggt.layers.rope import RotaryPositionEmbedding2D

    from fantasy_world_tpu.models.wan.dit import (
        WanDiTConfig, dit_block_attn_half, dit_block_ffn_half)
    from fantasy_world_tpu.models.vggt.blocks import (
        VGGTBlockConfig, vggt_block_attn_half, vggt_block_ffn_half)
    from fantasy_world_tpu.models.fusion.bicross import (
        BicrossConfig, bicross_apply)
    from fantasy_world_tpu.convert.wan_dit import convert_block
    from fantasy_world_tpu.convert.vggt import convert_vggt_block
    from fantasy_world_tpu.convert.fusion import _bicross
    from fantasy_world_tpu.ops import rope as rope_ops
    import jax.numpy as jnp

    torch.manual_seed(3)
    dit_dim, agg_dim, hidden = 96, 64, 96
    rope2d = RotaryPositionEmbedding2D(frequency=100.0)
    dit_blk = DiTBlock(True, dit_dim, 4, 128).float().eval()
    agg_blk = Block(dim=agg_dim, num_heads=4, qk_norm=True, init_values=0.01,
                    rope=rope2d).float().eval()
    irg = IRGBlock(x_dit_block=dit_blk, x_agg_block=agg_blk, m1_dim=dit_dim,
                   m2_dim=agg_dim, hidden_size=hidden, num_heads=4).float().eval()
    with torch.no_grad():
        irg.bicross_attention.gamma_m1.normal_(std=0.1)
        irg.bicross_attention.gamma_m2.normal_(std=0.1)

    f, h, w, n_extra = 2, 3, 4, 5
    B, S = 1, f
    P = n_extra + h * w
    L1 = f * h * w
    rng = np.random.default_rng(5)
    x_dit = rng.standard_normal((B, L1, dit_dim)).astype(np.float32)
    x_agg = rng.standard_normal((B * S, P, agg_dim)).astype(np.float32)
    ctx = rng.standard_normal((B, 277, dit_dim)).astype(np.float32)
    t_mod = rng.standard_normal((B, 6, dit_dim)).astype(np.float32)
    e0 = rng.standard_normal((B, 6, agg_dim)).astype(np.float32)
    pos_np = rope_ops.grid_positions_2d(h, w, n_special=n_extra)
    pos = np.tile(pos_np[None], (B * S, 1, 1)).astype(np.int64)

    tf = _rope_tables_torch(dit_dim // 4, f, h, w)
    tf_bi_dit = _rope_tables_torch(hidden // 4, f, h, w)
    tf_bi_agg = _rope_tables_torch(hidden // 4, f, h, w, n_extra)

    with torch.no_grad():
        ref_dit, ref_agg, ref_inter = irg(
            torch.from_numpy(x_dit), torch.from_numpy(x_agg),
            context=torch.from_numpy(ctx), t_mod=torch.from_numpy(t_mod),
            freqs=tf, freqs_dit=tf_bi_dit, freqs_agg=tf_bi_agg,
            pos=torch.from_numpy(pos), e0=torch.from_numpy(e0))

    # convert the three sub-modules
    dit_sd = {"blocks.0." + k: v.numpy() for k, v in dit_blk.state_dict().items()}
    dcfg = WanDiTConfig(dim=dit_dim, num_heads=4, ffn_dim=128,
                        has_image_input=True)
    dp = convert_block(dit_sd, dcfg, 0)
    ap = convert_vggt_block({"g." + k: v.numpy()
                             for k, v in agg_blk.state_dict().items()}, "g")
    bp = _bicross({"b.bicross_attention." + k: v.numpy()
                   for k, v in irg.bicross_attention.state_dict().items()}, "b",
                  head_dim=hidden // 4)
    bcfg = BicrossConfig(m1_dim=dit_dim, m2_dim=agg_dim, hidden=hidden,
                         num_heads=4)
    vcfg = VGGTBlockConfig(dim=agg_dim, num_heads=4)

    cos_d, sin_d = rope_ops.cos_sin_half_from_angles(
        rope_ops.build_angles_3d(dit_dim // 4, f, h, w))
    rope_bd = rope_ops.cos_sin_half_from_angles(
        rope_ops.build_angles_3d(hidden // 4, f, h, w))
    rope_ba = rope_ops.cos_sin_half_from_angles(
        rope_ops.build_angles_3d(hidden // 4, f, h, w, n_extra_per_frame=n_extra))

    xj, mod_dit = dit_block_attn_half(dp, jnp.asarray(x_dit), jnp.asarray(ctx),
                                      jnp.asarray(t_mod), cos_d, sin_d, dcfg)
    xa = jnp.asarray(x_agg).reshape(B, S * P, agg_dim)
    pos_g = jnp.asarray(pos_np)[None].repeat(B, 0).astype(np.int32)
    pos_g = jnp.tile(jnp.asarray(pos_np)[None], (S, 1, 1)).reshape(B, S * P, 2)
    xa, mod_agg = vggt_block_attn_half(ap, vcfg, xa, pos_g, jnp.asarray(e0))
    xj, xa = bicross_apply(bp, bcfg, xj, xa, rope_bd, rope_ba)
    xj = dit_block_ffn_half(dp, xj, mod_dit, dcfg)
    xa = vggt_block_ffn_half(ap, vcfg, xa, mod_agg)

    np.testing.assert_allclose(np.asarray(xj), ref_dit.numpy(),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(xa), ref_agg.numpy(),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(xa.reshape(B, S, P, agg_dim)),
                               ref_inter[0].numpy(), rtol=3e-3, atol=3e-3)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_camera_pose_encoder_parity():
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.models.pose_adaptor_ac3d import (
        CameraPoseEncoder)
    from fantasy_world_tpu.models.wan.camera import (
        CameraPoseEncoderConfig, camera_pose_encoder_apply)
    from fantasy_world_tpu.convert.camera import convert_pose_encoder
    import jax.numpy as jnp

    torch.manual_seed(4)
    ref = CameraPoseEncoder(context_dim=64, dim=128, in_channels=6,
                            pose_inject_method="adaln").float().eval()
    cfg = CameraPoseEncoderConfig(in_channels=6, dim=128, context_dim=64)
    rng = np.random.default_rng(6)
    plucker = rng.standard_normal((1, 9, 32, 48, 6)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(plucker)).numpy()
    sd = {"pe." + k: v.numpy() for k, v in ref.state_dict().items()}
    p = convert_pose_encoder(sd, "pe.")
    out = camera_pose_encoder_apply(p, cfg, jnp.asarray(plucker))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3, atol=2e-3)


def test_joint_forward_smoke():
    """Tiny fusion model end-to-end on CPU: shapes, scan segments, heads."""
    import jax, jax.numpy as jnp
    from fantasy_world_tpu.models.fusion.model import (
        FusionConfig, init_fusion, prepare_scan_params, joint_forward)
    from fantasy_world_tpu.models.wan.dit import WanDiTConfig
    from fantasy_world_tpu.models.vggt.model import VGGTConfig
    from fantasy_world_tpu.models.vggt.aggregator import AggregatorConfig
    from fantasy_world_tpu.models.fusion.bicross import BicrossConfig

    cfg = FusionConfig(
        dit=WanDiTConfig(dim=96, in_dim=8, ffn_dim=128, out_dim=4,
                         text_dim=32, num_heads=4, num_layers=6,
                         has_image_input=True, camera_adapter_end=5,
                         plucker_dim=48),
        vggt=VGGTConfig(embed_dim=64, wan_dim=96, dpt_layer_idx=(3, 2, 1, 0),
                        aggregator=AggregatorConfig(embed_dim=64, depth=4,
                                                    num_heads=4)),
        bicross=BicrossConfig(m1_dim=96, m2_dim=64, hidden=96, num_heads=4),
        start_index=2)
    assert cfg.num_irg == 4

    from fantasy_world_tpu.models.fusion.model import segment_adapter_flags
    params = init_fusion(jax.random.PRNGKey(0), cfg, jnp.float32)
    scan = prepare_scan_params(params, cfg)
    # PCB all-adapter single segment; IRG split at 25-16 -> here 5-2=3
    assert len(scan["pcb"]) == 1 and len(scan["irg"]) == 2
    assert segment_adapter_flags(cfg) == ([True],
                                          [(True, True), (True, False)])

    B, f, h2, w2 = 1, 3, 8, 12
    latents = jnp.zeros((B, 4, f, h2, w2), jnp.float32)
    y = jnp.zeros((B, 4, f, h2, w2), jnp.float32)
    ctx = jnp.zeros((B, 20, 32), jnp.float32)
    clip = jnp.zeros((B, 257, 1280), jnp.float32)
    plucker = jnp.zeros((B, f * (h2 // 2) * (w2 // 2), 48), jnp.float32)
    t = jnp.array([500.0])

    noise, pred = joint_forward(params, scan, cfg, latents, t, ctx, clip, y,
                                plucker_fea=plucker, return_prediction=True)
    assert noise.shape == latents.shape
    assert pred["pose_enc"].shape == (B, 1 + 4 * (f - 1), 9)
    assert pred["depth"].shape == (B, 1 + 4 * (f - 1), 4 * 16, 6 * 16, 1)
    assert pred["world_points"].shape == (B, 1 + 4 * (f - 1), 64, 96, 3)
    for v in pred.values():
        assert bool(jnp.isfinite(jnp.asarray(v, jnp.float32)).all())
