"""Pipeline denoise loop: jitted scan + final-step heads + TeaCache path."""
import numpy as np
import pytest

import conftest  # noqa: F401

pytestmark = pytest.mark.parity


def _tiny_pipe(dtype=None):
    import jax.numpy as jnp
    from fantasy_world_tpu.models.fusion.model import init_fusion
    from fantasy_world_tpu.pipelines.wan_video import FantasyWorldPipeline
    from __graft_entry__ import _demo_config

    cfg = _demo_config(dim=64, layers=3, start_index=1, agg_dim=64,
                       agg_depth=2)
    params = init_fusion(0, cfg, dtype or jnp.float32)
    return FantasyWorldPipeline(cfg=cfg, params={"fusion": params}), cfg


def test_denoise_smoke_and_tea_path():
    import jax.numpy as jnp
    pipe, cfg = _tiny_pipe()

    B, f, h, w = 1, 2, 64, 64             # latent 8x8, 3 latent frames? f=2
    num_frames = 4 * (f - 1) + 1
    ctx_pos = jnp.zeros((1, 16, 4096), jnp.float32)
    ctx_neg = jnp.ones((1, 16, 4096), jnp.float32) * 0.01
    clip = jnp.zeros((1, 257, 1280), jnp.float32)
    y = jnp.zeros((1, 20, f, h // 8, w // 8), jnp.float32)
    pl = jnp.zeros((1, f * (h // 16) * (w // 16), 2048), jnp.float32)

    lat, pred = pipe.denoise(ctx_pos, ctx_neg, clip, y, h, w,
                             num_frames=num_frames, num_inference_steps=3,
                             seed=7, plucker_fea=pl)
    assert lat.shape == (1, 16, f, h // 8, w // 8)
    assert pred is not None and pred["pose_enc"].shape[0] == 1
    assert bool(jnp.isfinite(lat).all())

    # TeaCache path: threshold so large every eligible step skips; the
    # 3-step schedule has first/last forced compute, middle skipped
    lat_tea, pred_tea = pipe.denoise(ctx_pos, ctx_neg, clip, y, h, w,
                                     num_frames=num_frames,
                                     num_inference_steps=3, seed=7,
                                     plucker_fea=pl,
                                     tea_cache_l1_thresh=1e9)
    assert lat_tea.shape == lat.shape
    assert bool(jnp.isfinite(lat_tea).all())
    # skipping the middle step changes the result (but not wildly)
    assert not np.allclose(np.asarray(lat), np.asarray(lat_tea))


def test_denoise_sliding_window():
    """Temporal tiling (TemporalTiler_BCTHW equivalent): a window covering
    the whole sequence must reproduce the plain scan exactly (prediction is
    None by design); a strided 2-frame window must still denoise finitely
    and differ from the full-attention result."""
    import jax.numpy as jnp
    pipe, cfg = _tiny_pipe()

    f, h, w = 3, 64, 64
    num_frames = 4 * (f - 1) + 1
    ctx_pos = jnp.zeros((1, 16, 4096), jnp.float32)
    ctx_neg = jnp.ones((1, 16, 4096), jnp.float32) * 0.01
    clip = jnp.zeros((1, 257, 1280), jnp.float32)
    y = jnp.zeros((1, 20, f, h // 8, w // 8), jnp.float32)
    pl = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, f * (h // 16) * (w // 16), 2048)) * 0.1, jnp.float32)

    lat_ref, _ = pipe.denoise(ctx_pos, ctx_neg, clip, y, h, w,
                              num_frames=num_frames, num_inference_steps=2,
                              seed=7, plucker_fea=pl)

    lat_full, pred = pipe.denoise(ctx_pos, ctx_neg, clip, y, h, w,
                                  num_frames=num_frames,
                                  num_inference_steps=2, seed=7,
                                  plucker_fea=pl, sliding_window_size=f,
                                  sliding_window_stride=f)
    assert pred is None
    np.testing.assert_allclose(np.asarray(lat_full, np.float32),
                               np.asarray(lat_ref, np.float32),
                               rtol=2e-5, atol=2e-5)

    lat_win, _ = pipe.denoise(ctx_pos, ctx_neg, clip, y, h, w,
                              num_frames=num_frames, num_inference_steps=2,
                              seed=7, plucker_fea=pl, sliding_window_size=2,
                              sliding_window_stride=1)
    assert lat_win.shape == lat_ref.shape
    assert bool(jnp.isfinite(lat_win).all())
    assert not np.allclose(np.asarray(lat_win), np.asarray(lat_ref))


def test_denoise_batched_matches_singles():
    """Batched eval-sweep denoise (BASELINE staged config 5): a B=2 batch
    with different conditioning per row must reproduce, row for row, the
    two single-clip runs with the same seed (noise keys fold the clip
    index, so batch size does not change the draw)."""
    import jax.numpy as jnp
    pipe, cfg = _tiny_pipe()

    f, h, w = 2, 64, 64
    num_frames = 4 * (f - 1) + 1
    rng = np.random.default_rng(5)
    ctx_a = jnp.zeros((1, 16, 4096), jnp.float32)
    ctx_b = jnp.asarray(rng.standard_normal((1, 16, 4096)) * 0.02,
                        jnp.float32)
    ctx_neg = jnp.ones((1, 16, 4096), jnp.float32) * 0.01
    clip = jnp.zeros((1, 257, 1280), jnp.float32)
    y = jnp.zeros((1, 20, f, h // 8, w // 8), jnp.float32)
    pl = jnp.asarray(rng.standard_normal(
        (1, f * (h // 16) * (w // 16), 2048)) * 0.1, jnp.float32)
    kw = dict(num_frames=num_frames, num_inference_steps=2)

    lat_a, pred_a = pipe.denoise(ctx_a, ctx_neg, clip, y, h, w,
                                 plucker_fea=pl, seed=11, **kw)
    lat_b, _ = pipe.denoise(ctx_b, ctx_neg, clip, y, h, w,
                            plucker_fea=pl, seed=13, **kw)

    cat = lambda u, v: jnp.concatenate([u, v], axis=0)
    lat2, pred2 = pipe.denoise(
        cat(ctx_a, ctx_b), cat(ctx_neg, ctx_neg), cat(clip, clip),
        cat(y, y), h, w, plucker_fea=cat(pl, pl), seed=[11, 13], **kw)

    assert lat2.shape[0] == 2
    np.testing.assert_allclose(np.asarray(lat2[0:1], np.float32),
                               np.asarray(lat_a, np.float32),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lat2[1:2], np.float32),
                               np.asarray(lat_b, np.float32),
                               rtol=2e-5, atol=2e-5)
    assert not np.allclose(np.asarray(lat2[0]), np.asarray(lat2[1]))
    for k, v in pred2.items():
        assert v.shape[0] == 2
        np.testing.assert_allclose(np.asarray(v[0:1], np.float32),
                                   np.asarray(pred_a[k], np.float32),
                                   rtol=2e-4, atol=2e-4)


def test_denoise_segmented_progress_and_resume(tmp_path):
    """Segmented denoise (deployment feature: per-segment progress +
    preemption-resume) must be numerically identical to the one-scan
    path, fire monotone progress callbacks, and resume a generation
    killed mid-way from its partial-state checkpoint."""
    import jax.numpy as jnp
    pipe, cfg = _tiny_pipe()

    f, h, w = 2, 64, 64
    num_frames = 4 * (f - 1) + 1
    ctx_pos = jnp.zeros((1, 16, 4096), jnp.float32)
    ctx_neg = jnp.ones((1, 16, 4096), jnp.float32) * 0.01
    clip = jnp.zeros((1, 257, 1280), jnp.float32)
    y = jnp.zeros((1, 20, f, h // 8, w // 8), jnp.float32)
    pl = jnp.zeros((1, f * (h // 16) * (w // 16), 2048), jnp.float32)
    kw = dict(num_frames=num_frames, num_inference_steps=4, seed=7,
              plucker_fea=pl)

    lat_ref, _ = pipe.denoise(ctx_pos, ctx_neg, clip, y, h, w, **kw)

    ticks = []
    lat_seg, pred = pipe.denoise(ctx_pos, ctx_neg, clip, y, h, w,
                                 segment_size=2,
                                 progress_callback=lambda d, t:
                                 ticks.append((d, t)), **kw)
    assert pred is not None
    # 4 steps = 3 scan steps in segments of 2 (2+1) + final head step
    assert ticks == [(2, 4), (3, 4), (4, 4)]
    np.testing.assert_allclose(np.asarray(lat_seg, np.float32),
                               np.asarray(lat_ref, np.float32),
                               rtol=1e-6, atol=1e-6)

    # preemption: die after the first segment, then resume from the ckpt
    ckpt = str(tmp_path / "gen.npz")

    class _Preempt(Exception):
        pass

    def die_after_first(done, total):
        if done >= 2:
            raise _Preempt

    with pytest.raises(_Preempt):
        pipe.denoise(ctx_pos, ctx_neg, clip, y, h, w, segment_size=2,
                     gen_ckpt_path=ckpt, progress_callback=die_after_first,
                     **kw)
    import os
    assert os.path.exists(ckpt)          # partial state survived the crash

    ticks2 = []
    lat_res, _ = pipe.denoise(ctx_pos, ctx_neg, clip, y, h, w,
                              segment_size=2, gen_ckpt_path=ckpt,
                              progress_callback=lambda d, t:
                              ticks2.append((d, t)), **kw)
    assert ticks2[0] == (2, 4)           # resumed past the finished segment
    np.testing.assert_allclose(np.asarray(lat_res, np.float32),
                               np.asarray(lat_ref, np.float32),
                               rtol=1e-6, atol=1e-6)
    assert not os.path.exists(ckpt)      # done -> partial state cleared


def test_denoise_segmented_tea_matches():
    """The TeaCache residual is part of the segment carry: segmented TeaCache
    denoise must match the one-scan TeaCache result."""
    import jax.numpy as jnp
    pipe, cfg = _tiny_pipe()

    f, h, w = 2, 64, 64
    ctx_pos = jnp.zeros((1, 16, 4096), jnp.float32)
    ctx_neg = jnp.ones((1, 16, 4096), jnp.float32) * 0.01
    clip = jnp.zeros((1, 257, 1280), jnp.float32)
    y = jnp.zeros((1, 20, f, h // 8, w // 8), jnp.float32)
    pl = jnp.zeros((1, f * (h // 16) * (w // 16), 2048), jnp.float32)
    kw = dict(num_frames=4 * (f - 1) + 1, num_inference_steps=4, seed=7,
              plucker_fea=pl, tea_cache_l1_thresh=1e9)

    lat_ref, _ = pipe.denoise(ctx_pos, ctx_neg, clip, y, h, w, **kw)
    lat_seg, _ = pipe.denoise(ctx_pos, ctx_neg, clip, y, h, w,
                              segment_size=1, **kw)
    np.testing.assert_allclose(np.asarray(lat_seg, np.float32),
                               np.asarray(lat_ref, np.float32),
                               rtol=1e-6, atol=1e-6)


def test_denoise_no_clip_config():
    """A require_clip_embedding=False config (wan22 Fun-Control-Camera,
    registry hash 47dbeab5) routed through the wan21 pipeline class must
    denoise with clip_feature=None instead of dying on the CFG concat
    (class contract: missing components degrade gracefully)."""
    import dataclasses
    import jax.numpy as jnp
    from fantasy_world_tpu.models.fusion.model import init_fusion
    from fantasy_world_tpu.pipelines.wan_video import FantasyWorldPipeline
    from __graft_entry__ import _demo_config

    cfg = _demo_config(dim=64, layers=3, start_index=1, agg_dim=64)
    cfg = dataclasses.replace(
        cfg, dit=dataclasses.replace(cfg.dit, has_image_input=False))
    params = init_fusion(0, cfg, jnp.float32)
    pipe = FantasyWorldPipeline(cfg=cfg, params={"fusion": params})

    f, h, w = 2, 64, 64
    ctx_pos = jnp.zeros((1, 16, 4096), jnp.float32)
    ctx_neg = jnp.ones((1, 16, 4096), jnp.float32) * 0.01
    y = jnp.zeros((1, 20, f, h // 8, w // 8), jnp.float32)
    pl = jnp.zeros((1, f * (h // 16) * (w // 16), 2048), jnp.float32)

    lat, pred = pipe.denoise(ctx_pos, ctx_neg, None, y, h, w,
                             num_frames=4 * (f - 1) + 1,
                             num_inference_steps=2, seed=7, plucker_fea=pl)
    assert lat.shape == (1, 16, f, h // 8, w // 8)
    assert bool(jnp.isfinite(lat).all())
    assert pred is not None


def test_denoise_bf16_production_dtype():
    """Production inference runs bf16 end-to-end; the scheduler's f32 sigma
    math must not promote the scan carry (caught live on TPU: 'carry input
    and carry output must have equal types' -- CPU tests ran f32 only)."""
    import jax.numpy as jnp
    pipe, cfg = _tiny_pipe(jnp.bfloat16)

    f, h, w = 2, 64, 64
    ctx_pos = jnp.zeros((1, 16, 4096), jnp.bfloat16)
    ctx_neg = jnp.ones((1, 16, 4096), jnp.bfloat16) * 0.01
    clip = jnp.zeros((1, 257, 1280), jnp.bfloat16)
    y = jnp.zeros((1, 20, f, h // 8, w // 8), jnp.bfloat16)
    pl = jnp.zeros((1, f * (h // 16) * (w // 16), 2048), jnp.bfloat16)

    lat, pred = pipe.denoise(ctx_pos, ctx_neg, clip, y, h, w,
                             num_frames=4 * (f - 1) + 1,
                             num_inference_steps=3, seed=7, plucker_fea=pl)
    assert lat.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(lat.astype(jnp.float32)).all())
    assert pred is not None


def test_sliding_window_rejects_uncomposable_options():
    """The windowed path supports neither TeaCache nor segment
    checkpoints; pre-r4 it silently dropped them (a preempted multi-hour
    windowed run would restart from scratch with no warning). It must
    refuse loudly instead."""
    import pytest
    import jax.numpy as jnp
    pipe, cfg = _tiny_pipe()
    f, h, w = 3, 64, 64
    num_frames = 4 * (f - 1) + 1
    ctx = jnp.zeros((1, 16, 4096), jnp.float32)
    clip = jnp.zeros((1, 257, 1280), jnp.float32)
    y = jnp.zeros((1, 20, f, h // 8, w // 8), jnp.float32)
    for bad_kw in ({"tea_cache_l1_thresh": 0.05},
                   {"segment_size": 2},
                   {"gen_ckpt_path": "/tmp/never_written.npz"}):
        with pytest.raises(ValueError, match="sliding_window_size"):
            pipe.denoise(ctx, ctx, clip, y, h, w, num_frames=num_frames,
                         num_inference_steps=2, seed=7,
                         sliding_window_size=2, sliding_window_stride=1,
                         **bad_kw)
