"""Track stack parity vs the reference track_modules (CPU torch oracle).

The reference TrackHead itself cannot be constructed (track_head.py:49
references an un-imported DPTHead; enable_track is False everywhere), so
parity is pinned at the working component level: embeddings, the bilinear
sampler, the correlation pyramid, EfficientUpdateFormer, and the full
BaseTrackerPredictor loop.
"""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")
pytestmark = [pytest.mark.parity,
              pytest.mark.skipif(not C.reference_available(),
                                 reason="reference not mounted")]


@pytest.fixture(scope="module", autouse=True)
def _ref_path():
    C.add_reference_to_path()


def test_2d_embedding_parity():
    from FantasyWorld.vggt.heads.track_modules.utils import get_2d_embedding
    from fantasy_world_tpu.models.vggt import track
    rng = np.random.default_rng(0)
    xy = rng.uniform(-30, 30, (2, 7, 2)).astype(np.float32)
    ref = get_2d_embedding(torch.from_numpy(xy), 4, cat_coords=False).numpy()
    out = np.asarray(track.get_2d_embedding(xy, 4))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_2d_sincos_pos_embed_parity():
    from FantasyWorld.vggt.heads.track_modules.utils import (
        get_2d_sincos_pos_embed)
    from fantasy_world_tpu.models.vggt import track
    ref = get_2d_sincos_pos_embed(28, (5, 9)).numpy()
    out = track.get_2d_sincos_pos_embed(28, (5, 9))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["border", "zeros"])
def test_bilinear_sampler_parity(mode):
    from FantasyWorld.vggt.heads.track_modules.utils import bilinear_sampler
    from fantasy_world_tpu.models.vggt import track
    rng = np.random.default_rng(1)
    img = rng.standard_normal((2, 3, 9, 11)).astype(np.float32)
    # include in-range, boundary, and out-of-range coordinates
    coords = rng.uniform(-2.5, 12.5, (2, 13, 2)).astype(np.float32)
    ref = bilinear_sampler(torch.from_numpy(img),
                           torch.from_numpy(coords)[:, :, None],
                           padding_mode=mode).numpy()   # (B, C, R, 1)
    ref = ref[..., 0].transpose(0, 2, 1)                # (B, R, C)
    out = np.asarray(track.bilinear_sample(img, coords, padding_mode=mode))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_corr_pyramid_sample_parity():
    from FantasyWorld.vggt.heads.track_modules.blocks import CorrBlock
    from fantasy_world_tpu.models.vggt import track
    rng = np.random.default_rng(2)
    B, S, C, H, W, N = 1, 3, 8, 12, 16, 5
    fmaps = rng.standard_normal((B, S, C, H, W)).astype(np.float32)
    targets = rng.standard_normal((B, S, N, C)).astype(np.float32)
    coords = rng.uniform(0, 11, (B, S, N, 2)).astype(np.float32)

    fn = CorrBlock(torch.from_numpy(fmaps), num_levels=3, radius=2)
    ref = fn.corr_sample(torch.from_numpy(targets),
                         torch.from_numpy(coords)).numpy()

    pyr = track.build_corr_pyramid(fmaps, 3)
    out = np.asarray(track.corr_pyramid_sample(pyr, targets, coords, 2))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def _tiny_cfg():
    from fantasy_world_tpu.models.vggt.track import TrackConfig
    return TrackConfig(latent_dim=8, hidden_size=16, corr_levels=2,
                       corr_radius=1, iters=2, depth=2, num_heads=8,
                       num_virtual_tracks=4)


def test_update_former_parity():
    from FantasyWorld.vggt.heads.track_modules.blocks import (
        EfficientUpdateFormer)
    from fantasy_world_tpu.models.vggt import track
    from fantasy_world_tpu.convert.track import convert_update_former
    cfg = _tiny_cfg()
    torch.manual_seed(0)
    ref = EfficientUpdateFormer(
        space_depth=cfg.depth, time_depth=cfg.depth,
        input_dim=cfg.transformer_dim, hidden_size=cfg.hidden_size,
        num_heads=cfg.num_heads, output_dim=cfg.output_dim,
        mlp_ratio=cfg.mlp_ratio, add_space_attn=True,
        num_virtual_tracks=cfg.num_virtual_tracks).eval()

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 3, cfg.transformer_dim)).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x))
    p = convert_update_former(ref.state_dict(), depth=cfg.depth)
    out = np.asarray(track.update_former_apply(p, cfg, x))
    np.testing.assert_allclose(out, ref_out.numpy(), rtol=2e-4, atol=2e-4)


def test_tracker_predict_parity():
    from FantasyWorld.vggt.heads.track_modules.base_track_predictor import (
        BaseTrackerPredictor)
    from fantasy_world_tpu.models.vggt import track
    from fantasy_world_tpu.convert.track import convert_tracker
    cfg = _tiny_cfg()
    torch.manual_seed(1)
    ref = BaseTrackerPredictor(
        stride=cfg.stride, corr_levels=cfg.corr_levels,
        corr_radius=cfg.corr_radius, latent_dim=cfg.latent_dim,
        hidden_size=cfg.hidden_size, use_spaceatt=True, depth=cfg.depth,
        max_scale=cfg.max_scale, predict_conf=True).eval()
    # the reference hardwires num_virtual_tracks=64 inside
    # EfficientUpdateFormer's default; rebuild it with the tiny count
    from FantasyWorld.vggt.heads.track_modules.blocks import (
        EfficientUpdateFormer)
    ref.updateformer = EfficientUpdateFormer(
        space_depth=cfg.depth, time_depth=cfg.depth,
        input_dim=cfg.transformer_dim, hidden_size=cfg.hidden_size,
        num_heads=cfg.num_heads, output_dim=cfg.output_dim,
        mlp_ratio=cfg.mlp_ratio, add_space_attn=True,
        num_virtual_tracks=cfg.num_virtual_tracks).eval()

    rng = np.random.default_rng(4)
    B, S, HH, WW, N = 1, 3, 8, 8, 5
    fmaps = rng.standard_normal((B, S, cfg.latent_dim, HH, WW)
                                ).astype(np.float32)
    # query points in FULL-res pixels (stride 2 -> feature coords /2)
    queries = rng.uniform(1, 13, (B, N, 2)).astype(np.float32)

    with torch.no_grad():
        ref_coords, ref_vis, ref_conf = ref(
            torch.from_numpy(queries), torch.from_numpy(fmaps),
            iters=cfg.iters)

    p = convert_tracker(ref.state_dict(), depth=cfg.depth)
    coords, vis, conf = track.tracker_predict(p, cfg, queries, fmaps)

    assert len(coords) == len(ref_coords) == cfg.iters
    for ours, theirs in zip(coords, ref_coords):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(vis), ref_vis.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(conf), ref_conf.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_track_head_forward_shapes():
    """End-to-end TrackHead over the causal-3D DPT feature extractor
    (feature_only, down_ratio=2): shape/finiteness smoke."""
    import jax.numpy as jnp
    from fantasy_world_tpu.models.vggt import track
    from fantasy_world_tpu.models.vggt.heads import DPTHeadConfig
    cfg = _tiny_cfg()
    dpt_cfg = DPTHeadConfig(dim_in=32, patch_size=4, features=cfg.latent_dim,
                            out_channels=(8, 8, 8, 8),
                            intermediate_layer_idx=(3, 2, 1, 0),
                            pos_embed=False, down_ratio=2, feature_only=True)
    p = track.init_track_head(0, cfg, dpt_cfg, jnp.float32)
    rng = np.random.default_rng(5)
    B, S, ph, pw = 1, 2, 4, 4
    toks = [jnp.asarray(rng.standard_normal((B, S, 5 + ph * pw, 32)),
                        jnp.float32) for _ in range(4)]
    queries = jnp.asarray(rng.uniform(2, 10, (B, 3, 2)), jnp.float32)
    coords, vis, conf = track.track_head_forward(
        p, cfg, dpt_cfg, toks, (ph, pw), 5, queries)
    T_out = 1 + 4 * (S - 1)
    assert len(coords) == cfg.iters
    assert coords[-1].shape == (B, T_out, 3, 2)
    assert vis.shape == conf.shape == (B, T_out, 3)
    assert np.isfinite(np.asarray(coords[-1])).all()
