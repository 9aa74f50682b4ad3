"""wan22 serving-option contracts: int8 + TeaCache drift through the
DualModelDenoiser (r4 VERDICT next-#4).

The wan21 contracts (tests/test_quant_drift.py, tests/test_tea_cache.py)
drive FantasyWorldPipeline; the wan22 orchestration differs in exactly the
places a quantization or cache bug would hide -- control tokens folded into
the patch embedding (hoisted SimpleAdapter), the expert boundary
mid-schedule, and the TeaCache residual carried ACROSS that boundary
(reference: one TeaCache instance persists across the switch_DiT_boundary
swap, wan_video_new.py:1380-1422 + inference_wan22.py:229-241). These run
the same A/B contracts through DualModelDenoiser:

  * int8 6-step gate: rel-L2 latent drift <= 4% (same bound as wan21;
    measured 0.63% on random-gaussian weights, CFG 5, 2026-08-20);
  * int8 50-step: latent AND every geometry-head output bounded;
  * TeaCache: segmented (segment_size=1) vs unsegmented runs with REAL
    mid-schedule skips -- including the first low-expert step consuming a
    residual computed by the HIGH expert -- must agree exactly;
  * int8 + TeaCache composed (the PERF.md single-pod serving recipe):
    zero-skip plan reproduces the int8-only result; forced skips finite.

Bounds are documented next to the wan21 ones in core/quant.py and PERF.md.
"""
import numpy as np
import pytest

import conftest  # noqa: F401

B = 1
STEPS6, CFG_SCALE, SEED = 6, 5.0, 42
F_LAT, H, W = 3, 48, 64                      # latents 6x8, 72 DiT tokens


def _cfg(dim=128, layers=4, start=2, agg=64):
    from fantasy_world_tpu.models.fusion.model import FusionConfig
    from fantasy_world_tpu.models.wan.dit import WanDiTConfig
    from fantasy_world_tpu.models.vggt.model import VGGTConfig
    from fantasy_world_tpu.models.vggt.aggregator import AggregatorConfig
    from fantasy_world_tpu.models.fusion.bicross import BicrossConfig
    n_irg = layers - start
    return FusionConfig(
        dit=WanDiTConfig(dim=dim, in_dim=8, ffn_dim=2 * dim, out_dim=4,
                         text_dim=32, num_heads=4, num_layers=layers,
                         has_image_input=False, require_vae_embedding=True,
                         add_control_adapter=True, in_dim_control_adapter=24,
                         camera_adapter_end=0),
        vggt=VGGTConfig(embed_dim=agg, wan_dim=dim,
                        dpt_layer_idx=(n_irg - 1, max(0, n_irg - 2), 0, 0),
                        aggregator=AggregatorConfig(embed_dim=agg,
                                                    depth=n_irg,
                                                    num_heads=4)),
        bicross=BicrossConfig(m1_dim=dim, m2_dim=agg, hidden=64,
                              num_heads=4),
        start_index=start, camera_control=False)


def _make_denoiser(cfg, dtype=None, seed_h=0, seed_l=1):
    import jax
    import jax.numpy as jnp
    from fantasy_world_tpu.models.fusion.model import init_fusion
    from fantasy_world_tpu.pipelines.wan_video_22 import DualModelDenoiser
    dtype = dtype or jnp.bfloat16
    params_h = init_fusion(jax.random.PRNGKey(seed_h), cfg, dtype)
    params_l = init_fusion(jax.random.PRNGKey(seed_l), cfg, dtype)
    return DualModelDenoiser(cfg=cfg, params_high=params_h,
                             params_low=params_l)


def _denoise(den, steps, **extra):
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    dt = den.params_high["dit"]["patch_embedding"]["kernel"].dtype
    ctx_pos = jnp.asarray(rng.standard_normal((B, 10, 32)), dt)
    ctx_neg = jnp.asarray(rng.standard_normal((B, 10, 32)) * 0.3, dt)
    y = jnp.asarray(rng.standard_normal((B, 4, F_LAT, H // 8, W // 8)), dt)
    ctrl = jnp.asarray(
        rng.standard_normal((B, 24, F_LAT, H, W)) * 0.5, dt)
    lat, pred = den.denoise(
        ctx_pos, ctx_neg, y, H, W, num_frames=4 * (F_LAT - 1) + 1,
        num_inference_steps=steps, cfg_scale=CFG_SCALE, seed=SEED,
        control_camera_latents=ctrl, **extra)
    return (np.asarray(lat, np.float32),
            None if pred is None else
            {k: np.asarray(v, np.float32) for k, v in pred.items()})


def _rel(a, b):
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


@pytest.mark.parity_fast
@pytest.mark.parity
def test_wan22_int8_6step_drift_bound():
    cfg = _cfg()
    den = _make_denoiser(cfg)
    lat16, _ = _denoise(den, STEPS6)

    den_q = _make_denoiser(cfg)
    den_q.quantize("int8", min_dim=32)
    lat8, _ = _denoise(den_q, STEPS6)

    assert np.isfinite(lat8).all()
    d = _rel(lat8, lat16)
    print(f"\nwan22 int8 6-step latent drift: rel_l2 = {d:.5f}")
    assert 0.0 < d <= 0.04, f"wan22 int8 6-step drift {d:.4f}"


@pytest.mark.parity
def test_wan22_int8_50step_drift_and_head_outputs():
    """Product-scale contract: 50 steps through BOTH experts (boundary at
    the schedule's t=900 crossing) plus the final-step geometry heads.
    Measured (random-gaussian weights, CFG 5, 2026-08-20): see bounds."""
    cfg = _cfg()
    den = _make_denoiser(cfg)
    lat16, pred16 = _denoise(den, 50)

    den_q = _make_denoiser(cfg)
    den_q.quantize("int8", min_dim=32)
    lat8, pred8 = _denoise(den_q, 50)

    assert np.isfinite(lat8).all()
    d_lat = _rel(lat8, lat16)
    print(f"\nwan22 int8 50-step latent drift: rel_l2 = {d_lat:.5f}")
    assert 0.0 < d_lat <= 0.04, f"wan22 int8 50-step drift {d_lat:.4f}"

    bounds = {"depth": 0.002, "depth_conf": 0.002, "pose_enc": 0.08,
              "world_points": 0.04, "world_points_conf": 0.002}
    assert set(bounds) == set(pred16), sorted(pred16)
    for k, bound in bounds.items():
        d = _rel(pred8[k], pred16[k])
        print(f"wan22 int8 50-step {k} drift: rel_l2 = {d:.5f} "
              f"(bound {bound})")
        assert np.isfinite(pred8[k]).all(), k
        assert d <= bound, f"{k} drift {d:.4f} > {bound}"


def _skip_plan(den, steps):
    """The host plan den.denoise will compute for a given threshold --
    evaluated here to CHOOSE a threshold with real mid-schedule skips."""
    from fantasy_world_tpu.pipelines.tea_cache import (
        compute_skip_schedule_dual)
    from fantasy_world_tpu.schedulers import FlowMatchScheduler
    sched = FlowMatchScheduler().set_timesteps(steps)
    ts = sched.timesteps
    n_high = int((ts > den.timestep_boundary).sum())
    def plan(thresh):
        return compute_skip_schedule_dual(
            den.params_high["dit"], den.params_low["dit"], den.cfg.dit,
            ts, n_high, thresh), n_high
    return plan


def test_wan22_tea_segmented_equality_with_boundary_crossing_residual():
    """TeaCache with REAL skips: segment_size=1 (one host call per step,
    residual checkpointed through every segment AND the expert boundary)
    must equal the unsegmented tea run bit-for-bit. The low expert's
    time-embedding weights are copied from the high expert so the
    boundary-step modulation drift is ~0 and the FIRST low-expert step
    plans a skip -- consuming the residual the HIGH expert computed."""
    import jax.numpy as jnp
    cfg = _cfg(dim=64, layers=4, start=2, agg=64)
    den = _make_denoiser(cfg, dtype=jnp.float32)
    # identical time-embedding weights => zero drift at the boundary step
    for k in ("time_embedding", "time_projection"):
        den.params_low["dit"][k] = den.params_high["dit"][k]

    steps = 8
    plan = _skip_plan(den, steps)
    # random-gaussian time-embedding weights make the polynomial-rescaled
    # drift values arbitrary in scale, so search a WIDE threshold range;
    # prefer a mixed plan (some skips, some computes besides the forced
    # first/last), fall back to the skip-all-middles plan -- either way
    # the first low-expert step must skip (consuming the high expert's
    # residual)
    thresh = mixed = None
    for cand in np.logspace(-6, 12, 160):
        skips, n_high = plan(float(cand))
        if skips.any() and n_high < len(skips) and skips[n_high]:
            if thresh is None:
                thresh = float(cand)
            if not skips[1:-1].all():
                mixed = float(cand)
                break
    thresh = mixed if mixed is not None else thresh
    assert thresh is not None, "no threshold yields a boundary-step skip"
    skips, n_high = plan(thresh)
    print(f"\nwan22 tea plan: thresh={thresh:.4g}, skips={skips.tolist()}, "
          f"n_high={n_high}")

    kw = dict(tea_cache_l1_thresh=thresh)
    lat_un, _ = _denoise(den, steps, **kw)
    lat_seg, _ = _denoise(den, steps, segment_size=1, **kw)
    assert np.isfinite(lat_un).all()
    np.testing.assert_allclose(lat_seg, lat_un, rtol=1e-6, atol=1e-6)
    # and the plan genuinely skipped: the tea run differs from exact
    lat_exact, _ = _denoise(den, steps)
    assert _rel(lat_un, lat_exact) > 0.0


def test_wan22_int8_plus_tea_composed():
    """The PERF.md single-pod wan22 serving recipe composes int8 AND
    TeaCache. Zero-skip plan => identical to the int8-only run (the tea
    machinery adds no drift of its own under quantization); forced skips
    => finite output that actually diverges (stack genuinely skipped)."""
    cfg = _cfg(dim=64, layers=4, start=2, agg=64)
    den = _make_denoiser(cfg)
    den.quantize("int8", min_dim=32)

    steps = 6
    lat_q, _ = _denoise(den, steps)
    lat_q_tea0, _ = _denoise(den, steps, tea_cache_l1_thresh=1e-9)
    np.testing.assert_allclose(lat_q_tea0, lat_q, rtol=1e-6, atol=1e-6)

    lat_q_skip, _ = _denoise(den, steps, tea_cache_l1_thresh=1e9)
    assert np.isfinite(lat_q_skip).all()
    assert _rel(lat_q_skip, lat_q) > 0.0
