"""Wan2.2 path: SimpleAdapter parity, control-latent folding, LoRA merge."""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_simple_adapter_parity():
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan22.models.wan_video_camera_controller import (
        SimpleAdapter)
    from fantasy_world_tpu.models.wan.camera import simple_adapter_apply
    from fantasy_world_tpu.convert.camera import convert_simple_adapter
    import jax.numpy as jnp

    torch.manual_seed(0)
    ref = SimpleAdapter(24, 64, kernel_size=(2, 2), stride=(2, 2)).float().eval()
    x = np.random.default_rng(0).standard_normal((1, 24, 3, 32, 48)).astype(
        np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    sd = {"a." + k: v.numpy() for k, v in ref.state_dict().items()}
    p = convert_simple_adapter(sd, "a.")
    out = simple_adapter_apply(p, jnp.asarray(x))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3, atol=2e-3)


def test_control_camera_latents_fold():
    """The 4-frame->channel fold matches the reference tensor gymnastics."""
    from fantasy_world_tpu.pipelines.wan_video_22 import (
        control_camera_latents_from_plucker)

    rng = np.random.default_rng(1)
    plucker = rng.standard_normal((1, 9, 8, 10, 6)).astype(np.float32)

    # reference computation (inference_wan22.py:204-218)
    v = torch.from_numpy(plucker)[0].permute([3, 0, 1, 2]).unsqueeze(0)
    lat = torch.concat([torch.repeat_interleave(v[:, :, 0:1], repeats=4,
                                                dim=2), v[:, :, 1:]],
                       dim=2).transpose(1, 2)
    b, f, c, h, w = lat.shape
    lat = lat.contiguous().view(b, f // 4, 4, c, h, w).transpose(2, 3)
    ref = lat.contiguous().view(b, f // 4, c * 4, h, w).transpose(1, 2).numpy()

    out = control_camera_latents_from_plucker(plucker)
    assert out.shape == ref.shape == (1, 24, 3, 8, 10)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_lora_merge():
    from fantasy_world_tpu.convert.lora import merge_lora_into_state_dict

    rng = np.random.default_rng(2)
    W = rng.standard_normal((8, 6)).astype(np.float32)
    sd = {"blocks.0.self_attn.q.weight": W.copy()}
    up = rng.standard_normal((8, 2)).astype(np.float32)
    down = rng.standard_normal((2, 6)).astype(np.float32)
    lora = {
        "lora_unet_blocks_0_self_attn_q.lora_up.weight": up,
        "lora_unet_blocks_0_self_attn_q.lora_down.weight": down,
        "lora_unet_blocks_0_self_attn_q.alpha": np.float32(2.0),
    }
    out = merge_lora_into_state_dict(sd, lora, multiplier=0.55)
    expected = W + 0.55 * (2.0 / 2) * (up @ down)
    np.testing.assert_allclose(out["blocks.0.self_attn.q.weight"], expected,
                               rtol=1e-6)


def _tiny_dual_cfg():
    from fantasy_world_tpu.models.fusion.model import FusionConfig
    from fantasy_world_tpu.models.wan.dit import WanDiTConfig
    from fantasy_world_tpu.models.vggt.model import VGGTConfig
    from fantasy_world_tpu.models.vggt.aggregator import AggregatorConfig
    from fantasy_world_tpu.models.fusion.bicross import BicrossConfig
    return FusionConfig(
        dit=WanDiTConfig(dim=64, in_dim=8, ffn_dim=128, out_dim=4,
                         text_dim=32, num_heads=4, num_layers=4,
                         has_image_input=False, require_vae_embedding=True,
                         add_control_adapter=True, in_dim_control_adapter=24,
                         camera_adapter_end=0),
        vggt=VGGTConfig(embed_dim=64, wan_dim=64, dpt_layer_idx=(1, 1, 0, 0),
                        aggregator=AggregatorConfig(embed_dim=64, depth=2,
                                                    num_heads=4)),
        bicross=BicrossConfig(m1_dim=64, m2_dim=64, hidden=64, num_heads=4),
        start_index=2, camera_control=False)


def test_wan22_dual_denoiser_sharded_equality():
    """DualModelDenoiser.shard(mesh) + denoise(mesh=...) — the wan22 CLI
    multi-chip path — must reproduce the single-device dual-expert
    denoise."""
    import jax, jax.numpy as jnp
    from fantasy_world_tpu.models.fusion.model import init_fusion
    from fantasy_world_tpu.parallel.sharding import make_mesh
    from fantasy_world_tpu.pipelines.wan_video_22 import DualModelDenoiser

    if jax.device_count() < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")

    cfg = _tiny_dual_cfg()
    params_h = init_fusion(jax.random.PRNGKey(0), cfg, jnp.float32)
    params_l = init_fusion(jax.random.PRNGKey(1), cfg, jnp.float32)

    f, h, w = 3, 64, 96
    ctx_pos = jnp.zeros((1, 20, 32), jnp.float32)
    ctx_neg = jnp.ones((1, 20, 32), jnp.float32) * 0.01
    y = jnp.zeros((1, 4, f, h // 8, w // 8), jnp.float32)
    ctrl = jnp.zeros((1, 24, f, h, w), jnp.float32)
    kw = dict(num_frames=4 * (f - 1) + 1, num_inference_steps=3, seed=5,
              control_camera_latents=ctrl)

    den = DualModelDenoiser(cfg=cfg, params_high=params_h,
                            params_low=params_l)
    lat_ref, _ = den.denoise(ctx_pos, ctx_neg, y, h, w, **kw)

    mesh = make_mesh(data=2, seq=2, model=2)
    den_s = DualModelDenoiser(cfg=cfg, params_high=params_h,
                              params_low=params_l)
    den_s.shard(mesh)
    lat_s, _ = den_s.denoise(ctx_pos, ctx_neg, y, h, w, mesh=mesh, **kw)

    np.testing.assert_allclose(np.asarray(lat_s, np.float32),
                               np.asarray(lat_ref, np.float32),
                               rtol=2e-4, atol=2e-4)


def test_wan22_boundary_clamp_identical_experts():
    """With identical experts the result must not depend on the boundary.
    Catches the n_high == len(ts) double-step: the high scan must clamp to
    n_scan so the final (heads) step is not applied twice."""
    import jax, jax.numpy as jnp
    from fantasy_world_tpu.models.fusion.model import init_fusion
    from fantasy_world_tpu.pipelines.wan_video_22 import DualModelDenoiser

    cfg = _tiny_dual_cfg()
    params = init_fusion(jax.random.PRNGKey(0), cfg, jnp.float32)
    f, h, w = 2, 32, 32
    ctx_pos = jnp.zeros((1, 10, 32), jnp.float32)
    ctx_neg = jnp.ones((1, 10, 32), jnp.float32) * 0.01
    y = jnp.zeros((1, 4, f, h // 8, w // 8), jnp.float32)
    kw = dict(num_frames=4 * (f - 1) + 1, num_inference_steps=3, seed=7)

    outs = []
    for boundary in (2000.0, 900.0, -1.0):   # n_high = 0, mid, len(ts)
        den = DualModelDenoiser(cfg=cfg, params_high=params,
                                params_low=params,
                                timestep_boundary=boundary)
        lat, _ = den.denoise(ctx_pos, ctx_neg, y, h, w, **kw)
        outs.append(np.asarray(lat, np.float32))
    np.testing.assert_allclose(outs[1], outs[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs[2], outs[0], rtol=1e-5, atol=1e-5)


def test_wan22_segmented_resume_and_tea(tmp_path):
    """Segmented dual-expert denoise: (a) segment_size + progress matches
    the unsegmented run exactly, (b) a run killed mid-way resumes from the
    partial-state checkpoint to the identical result, (c) TeaCache with a
    compute-everything threshold matches the plain path, and with forced
    skips stays finite and runs fewer stacks."""
    import jax, jax.numpy as jnp
    from fantasy_world_tpu.models.fusion.model import init_fusion
    from fantasy_world_tpu.pipelines.wan_video_22 import DualModelDenoiser
    from fantasy_world_tpu.pipelines.tea_cache import (
        compute_skip_schedule_dual)

    cfg = _tiny_dual_cfg()
    params_h = init_fusion(jax.random.PRNGKey(0), cfg, jnp.float32)
    params_l = init_fusion(jax.random.PRNGKey(1), cfg, jnp.float32)
    f, h, w = 2, 32, 32
    ctx_pos = jnp.zeros((1, 10, 32), jnp.float32)
    ctx_neg = jnp.ones((1, 10, 32), jnp.float32) * 0.01
    y = jnp.zeros((1, 4, f, h // 8, w // 8), jnp.float32)
    kw = dict(num_frames=4 * (f - 1) + 1, num_inference_steps=5, seed=7)

    den = DualModelDenoiser(cfg=cfg, params_high=params_h,
                            params_low=params_l)
    lat_ref, _ = den.denoise(ctx_pos, ctx_neg, y, h, w, **kw)
    ref = np.asarray(lat_ref, np.float32)

    # (a) segmented run with progress callback
    seen = []
    lat_seg, _ = den.denoise(ctx_pos, ctx_neg, y, h, w, segment_size=2,
                             progress_callback=lambda d, t: seen.append((d, t)),
                             **kw)
    np.testing.assert_allclose(np.asarray(lat_seg, np.float32), ref,
                               rtol=1e-6, atol=1e-6)
    assert seen[-1][0] == seen[-1][1]
    assert [d for d, _ in seen] == sorted(d for d, _ in seen)

    # (b) preemption: die after the first segment, then resume
    ckpt = str(tmp_path / "gen.npz")

    class Die(RuntimeError):
        pass

    def die_after_first(done, total):
        if done >= 2 and done < total:
            raise Die()

    with pytest.raises(Die):
        den.denoise(ctx_pos, ctx_neg, y, h, w, segment_size=2,
                    progress_callback=die_after_first, gen_ckpt_path=ckpt,
                    **kw)
    import os
    assert os.path.exists(ckpt)
    lat_res, _ = den.denoise(ctx_pos, ctx_neg, y, h, w, segment_size=2,
                             gen_ckpt_path=ckpt, **kw)
    np.testing.assert_allclose(np.asarray(lat_res, np.float32), ref,
                               rtol=1e-6, atol=1e-6)
    assert not os.path.exists(ckpt)   # completed run drops the partial state

    # (c) TeaCache: a tiny threshold plans zero skips -> identical result
    ts = np.linspace(1000.0, 20.0, 5).astype(np.float32)
    skips_none = compute_skip_schedule_dual(
        params_h["dit"], params_l["dit"], cfg.dit, ts, 2, 1e-9)
    assert not skips_none.any()
    lat_tea, _ = den.denoise(ctx_pos, ctx_neg, y, h, w,
                             tea_cache_l1_thresh=1e-9, **kw)
    np.testing.assert_allclose(np.asarray(lat_tea, np.float32), ref,
                               rtol=1e-6, atol=1e-6)
    # forced skips (huge threshold): still finite, differs from exact
    lat_skip, _ = den.denoise(ctx_pos, ctx_neg, y, h, w,
                              tea_cache_l1_thresh=1e9, **kw)
    assert np.isfinite(np.asarray(lat_skip, np.float32)).all()


def test_wan22_joint_forward_smoke():
    """Control-adapter patchify path, no CLIP, y concat still on."""
    import jax, jax.numpy as jnp
    from fantasy_world_tpu.models.fusion.model import (
        FusionConfig, init_fusion, prepare_scan_params, joint_forward)
    from fantasy_world_tpu.models.wan.dit import WanDiTConfig
    from fantasy_world_tpu.models.vggt.model import VGGTConfig
    from fantasy_world_tpu.models.vggt.aggregator import AggregatorConfig
    from fantasy_world_tpu.models.fusion.bicross import BicrossConfig

    cfg = FusionConfig(
        dit=WanDiTConfig(dim=96, in_dim=8, ffn_dim=128, out_dim=4,
                         text_dim=32, num_heads=4, num_layers=4,
                         has_image_input=False, require_vae_embedding=True,
                         add_control_adapter=True, in_dim_control_adapter=24,
                         camera_adapter_end=0),
        vggt=VGGTConfig(embed_dim=64, wan_dim=96, dpt_layer_idx=(1, 1, 0, 0),
                        aggregator=AggregatorConfig(embed_dim=64, depth=2,
                                                    num_heads=4)),
        bicross=BicrossConfig(m1_dim=96, m2_dim=64, hidden=96, num_heads=4),
        start_index=2, camera_control=False)

    params = init_fusion(jax.random.PRNGKey(0), cfg, jnp.float32)
    scan = prepare_scan_params(params, cfg)

    B, f, h2, w2 = 1, 3, 8, 12
    latents = jnp.zeros((B, 4, f, h2, w2), jnp.float32)
    y = jnp.zeros((B, 4, f, h2, w2), jnp.float32)
    ctx = jnp.zeros((B, 20, 32), jnp.float32)
    ctrl = jnp.zeros((B, 24, f, h2 * 8, w2 * 8), jnp.float32)
    t = jnp.array([950.0])

    noise, _ = joint_forward(params, scan, cfg, latents, t, ctx, None, y,
                             control_camera_latents=ctrl)
    assert noise.shape == latents.shape
    assert bool(jnp.isfinite(noise).all())

    # int8 w8a8 rewrite (DualModelDenoiser.quantize path) stays close to
    # the float forward on the control-adapter config too
    from fantasy_world_tpu.core.quant import count_quantized, quantize_tree
    params_q = quantize_tree(params, min_dim=16)
    scan_q = quantize_tree(scan, min_dim=16)
    assert count_quantized(scan_q) > 0
    noise_q, _ = joint_forward(params_q, scan_q, cfg, latents, t, ctx, None,
                               y, control_camera_latents=ctrl)
    a = np.asarray(noise, np.float64).ravel()
    b = np.asarray(noise_q, np.float64).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
    assert bool(jnp.isfinite(noise_q).all())
    assert cos > 0.99


def test_wan22_hoisted_control_tokens_exact():
    """The deploy pipelines evaluate the step-invariant SimpleAdapter once
    per clip (dit.control_adapter_tokens) and feed patchify its token-space
    output; that path must be BIT-identical to the reference-shaped
    per-step control_camera_latents path (same function of the same
    input, just hoisted out of the loop)."""
    import jax, jax.numpy as jnp
    from fantasy_world_tpu.models.fusion.model import (
        FusionConfig, init_fusion, prepare_scan_params, joint_forward)
    from fantasy_world_tpu.models.wan.dit import (WanDiTConfig,
                                                  control_adapter_tokens)
    from fantasy_world_tpu.models.vggt.model import VGGTConfig
    from fantasy_world_tpu.models.vggt.aggregator import AggregatorConfig
    from fantasy_world_tpu.models.fusion.bicross import BicrossConfig

    cfg = FusionConfig(
        dit=WanDiTConfig(dim=96, in_dim=8, ffn_dim=128, out_dim=4,
                         text_dim=32, num_heads=4, num_layers=4,
                         has_image_input=False, require_vae_embedding=True,
                         add_control_adapter=True, in_dim_control_adapter=24,
                         camera_adapter_end=0),
        vggt=VGGTConfig(embed_dim=64, wan_dim=96, dpt_layer_idx=(1, 1, 0, 0),
                        aggregator=AggregatorConfig(embed_dim=64, depth=2,
                                                    num_heads=4)),
        bicross=BicrossConfig(m1_dim=96, m2_dim=64, hidden=96, num_heads=4),
        start_index=2, camera_control=False)

    params = init_fusion(jax.random.PRNGKey(0), cfg, jnp.float32)
    scan = prepare_scan_params(params, cfg)

    rng = np.random.default_rng(3)
    B, f, h2, w2 = 1, 3, 8, 12
    latents = jnp.asarray(rng.standard_normal((B, 4, f, h2, w2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, 4, f, h2, w2)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((B, 20, 32)), jnp.float32)
    ctrl = jnp.asarray(rng.standard_normal((B, 24, f, h2 * 8, w2 * 8)),
                       jnp.float32)
    t = jnp.array([950.0])

    ref, _ = joint_forward(params, scan, cfg, latents, t, ctx, None, y,
                           control_camera_latents=ctrl)
    ctok = control_adapter_tokens(params["dit"], cfg.dit, ctrl)
    assert ctok.shape == (B, f * (h2 // 2) * (w2 // 2), cfg.dit.dim)
    hoisted, _ = joint_forward(params, scan, cfg, latents, t, ctx, None, y,
                               control_tokens=ctok)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(hoisted))


def test_wan22_tea_resume_rejects_non_tea_checkpoint(tmp_path):
    """A partial-state checkpoint written WITHOUT TeaCache carries no
    residual; resuming a TeaCache run from it would add a zero residual in
    place of the whole block stack on skip steps (silent corruption, r4
    review). The resume gate must instead restart from scratch, giving the
    same result as a fresh TeaCache run."""
    import os
    import jax, jax.numpy as jnp
    from fantasy_world_tpu.models.fusion.model import init_fusion
    from fantasy_world_tpu.pipelines.wan_video_22 import DualModelDenoiser

    cfg = _tiny_dual_cfg()
    params_h = init_fusion(jax.random.PRNGKey(0), cfg, jnp.float32)
    params_l = init_fusion(jax.random.PRNGKey(1), cfg, jnp.float32)
    f, h, w = 2, 32, 32
    ctx_pos = jnp.zeros((1, 10, 32), jnp.float32)
    ctx_neg = jnp.ones((1, 10, 32), jnp.float32) * 0.01
    y = jnp.zeros((1, 4, f, h // 8, w // 8), jnp.float32)
    kw = dict(num_frames=4 * (f - 1) + 1, num_inference_steps=5, seed=7)
    den = DualModelDenoiser(cfg=cfg, params_high=params_h,
                            params_low=params_l)

    # write a NON-tea partial checkpoint by dying after the first segment
    ckpt = str(tmp_path / "gen.npz")

    class Die(RuntimeError):
        pass

    def die_after_first(done, total):
        if done >= 2 and done < total:
            raise Die()

    with pytest.raises(Die):
        den.denoise(ctx_pos, ctx_neg, y, h, w, segment_size=2,
                    progress_callback=die_after_first, gen_ckpt_path=ckpt,
                    **kw)
    data = np.load(ckpt)
    assert "residual" not in data       # precondition: non-tea checkpoint

    # fresh tea run (forced skips so the residual actually matters)
    lat_fresh, _ = den.denoise(ctx_pos, ctx_neg, y, h, w,
                               tea_cache_l1_thresh=1e9, **kw)
    # tea run pointed at the non-tea checkpoint must ignore it (restart)
    lat_resumed, _ = den.denoise(ctx_pos, ctx_neg, y, h, w,
                                 tea_cache_l1_thresh=1e9, segment_size=2,
                                 gen_ckpt_path=ckpt, **kw)
    np.testing.assert_allclose(np.asarray(lat_resumed, np.float32),
                               np.asarray(lat_fresh, np.float32),
                               rtol=1e-6, atol=1e-6)
    assert not os.path.exists(ckpt)
