"""Wan2.2 38-block VAE parity vs the reference streaming implementation."""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity


def _make_pair(dim=16, dec_dim=16, z_dim=8):
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan22.models.wan_video_vae import VideoVAE38_
    from fantasy_world_tpu.models.wan.vae38 import VAE38Config
    from fantasy_world_tpu.convert.wan_vae import convert_wan_vae38

    torch.manual_seed(0)
    ref = VideoVAE38_(dim=dim, dec_dim=dec_dim, z_dim=z_dim).float().eval()
    cfg = VAE38Config(dim=dim, dec_dim=dec_dim, z_dim=z_dim)
    sd = {"model." + k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_wan_vae38(sd, cfg)
    return ref, cfg, params


def _unit_scale(z_dim):
    return [torch.zeros(z_dim), 1.0 / torch.ones(z_dim)]


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_vae38_encode_parity():
    import jax.numpy as jnp
    import fantasy_world_tpu.models.wan.vae38 as v38
    from fantasy_world_tpu.models.wan.vae38 import vae38_encode

    ref, cfg, params = _make_pair()
    rng = np.random.default_rng(0)
    video = rng.uniform(-1, 1, (1, 3, 5, 64, 64)).astype(np.float32)

    with torch.no_grad():
        ref_lat = ref.encode(torch.from_numpy(video.copy()),
                             _unit_scale(cfg.z_dim)).numpy()

    old = v38.LATENT38_MEAN, v38.LATENT38_STD
    v38.LATENT38_MEAN = np.zeros(cfg.z_dim, np.float32)
    v38.LATENT38_STD = np.ones(cfg.z_dim, np.float32)
    try:
        lat = vae38_encode(params, cfg, jnp.asarray(video))
    finally:
        v38.LATENT38_MEAN, v38.LATENT38_STD = old

    assert lat.shape == tuple(ref_lat.shape) == (1, cfg.z_dim, 2, 4, 4)
    np.testing.assert_allclose(np.asarray(lat), ref_lat, rtol=2e-3, atol=2e-3)


def test_vae38_tiled_encode_matches_full_interior():
    """Tiled encode equals full-sequence encode away from tile seams (and
    blends smoothly across them); random weights suffice."""
    import jax.numpy as jnp
    from fantasy_world_tpu.models.wan.vae38 import (vae38_encode,
                                                    vae38_encode_tiled)
    import fantasy_world_tpu.models.wan.vae38 as v38
    _, cfg, params = _make_pair()
    rng = np.random.default_rng(7)
    video = rng.uniform(-1, 1, (1, 3, 1, 128, 192)).astype(np.float32)
    old = v38.LATENT38_MEAN, v38.LATENT38_STD
    v38.LATENT38_MEAN = np.zeros(cfg.z_dim, np.float32)
    v38.LATENT38_STD = np.ones(cfg.z_dim, np.float32)
    try:
        full = np.asarray(vae38_encode(params, cfg, jnp.asarray(video)))
        tiled = np.asarray(vae38_encode_tiled(params, cfg,
                                              jnp.asarray(video),
                                              tile_size=(6, 6),
                                              tile_stride=(3, 4)))
    finally:
        v38.LATENT38_MEAN, v38.LATENT38_STD = old
    assert tiled.shape == full.shape == (1, cfg.z_dim, 1, 8, 12)
    assert np.isfinite(tiled).all()
    # interior of the first tile (no blending) must match the full encode
    # only approximately: the conv receptive field crosses the tile edge
    np.testing.assert_allclose(tiled[..., :2, :2], full[..., :2, :2],
                               rtol=0.2, atol=0.2)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_vae38_tiled_decode_parity():
    """Tiled decode vs the reference WanVideoVAE38 (inherits the 2.1 tiler
    with upsampling_factor 16). Note: the reference's tiled_encode is
    unusable for z=48 (it hardcodes a 16-channel buffer,
    wan_video_vae.py:1184) -- encode tiling is covered by the
    self-consistency test above instead."""
    import jax.numpy as jnp
    import fantasy_world_tpu.models.wan.vae38 as v38
    from fantasy_world_tpu.models.wan.vae38 import vae38_decode_tiled
    from FantasyWorld.diffsynth_wan22.models.wan_video_vae import (
        WanVideoVAE38)

    ref, cfg, params = _make_pair()
    rng = np.random.default_rng(3)
    z = rng.standard_normal((1, cfg.z_dim, 2, 8, 12)).astype(np.float32)

    wrapper = WanVideoVAE38.__new__(WanVideoVAE38)
    torch.nn.Module.__init__(wrapper)
    wrapper.model = ref
    wrapper.mean = torch.zeros(cfg.z_dim)
    wrapper.std = torch.ones(cfg.z_dim)
    wrapper.scale = [wrapper.mean, 1.0 / wrapper.std]
    wrapper.upsampling_factor = 16
    wrapper.z_dim = cfg.z_dim

    tile, stride = (5, 5), (3, 4)
    with torch.no_grad():
        ref_out = wrapper.tiled_decode(torch.from_numpy(z.copy()), "cpu",
                                       tile, stride).numpy()

    old = v38.LATENT38_MEAN, v38.LATENT38_STD
    v38.LATENT38_MEAN = np.zeros(cfg.z_dim, np.float32)
    v38.LATENT38_STD = np.ones(cfg.z_dim, np.float32)
    try:
        out = vae38_decode_tiled(params, cfg, jnp.asarray(z), tile, stride)
    finally:
        v38.LATENT38_MEAN, v38.LATENT38_STD = old
    assert out.shape == tuple(ref_out.shape)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=5e-3,
                               atol=5e-3)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_vae38_decode_parity():
    import jax.numpy as jnp
    import fantasy_world_tpu.models.wan.vae38 as v38
    from fantasy_world_tpu.models.wan.vae38 import vae38_decode

    ref, cfg, params = _make_pair()
    rng = np.random.default_rng(1)
    z = rng.standard_normal((1, cfg.z_dim, 3, 4, 4)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref.decode(torch.from_numpy(z.copy()),
                             _unit_scale(cfg.z_dim)).numpy()

    old = v38.LATENT38_MEAN, v38.LATENT38_STD
    v38.LATENT38_MEAN = np.zeros(cfg.z_dim, np.float32)
    v38.LATENT38_STD = np.ones(cfg.z_dim, np.float32)
    try:
        out = vae38_decode(params, cfg, jnp.asarray(z), clamp=False)
    finally:
        v38.LATENT38_MEAN, v38.LATENT38_STD = old

    assert out.shape == tuple(ref_out.shape) == (1, 3, 9, 64, 64)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3, atol=2e-3)
