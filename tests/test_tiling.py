"""Tiled VAE encode and temporal latent tiling parity vs the reference."""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_vae_tiled_encode_parity():
    """Our tiled encode == reference WanVideoVAE.tiled_encode on the same
    tiny network (identical tile split, latent-space blend masks)."""
    C.add_reference_to_path()
    import jax.numpy as jnp
    from test_vae import _make_pair
    import fantasy_world_tpu.models.wan.vae as vae_mod
    from fantasy_world_tpu.models.wan.vae import vae_encode_tiled
    from FantasyWorld.diffsynth_wan21.models.wan_video_vae import WanVideoVAE

    # z_dim=16: the reference tiled_encode hardcodes 16 output channels
    # (wan_video_vae.py:719)
    ref, cfg, params = _make_pair(z_dim=16)
    rng = np.random.default_rng(2)
    video = rng.uniform(-1, 1, (1, 3, 5, 96, 128)).astype(np.float32)

    wrapper = WanVideoVAE.__new__(WanVideoVAE)
    torch.nn.Module.__init__(wrapper)
    wrapper.model = ref
    wrapper.mean = torch.zeros(cfg.z_dim)
    wrapper.std = torch.ones(cfg.z_dim)
    wrapper.scale = [wrapper.mean, 1.0 / wrapper.std]
    wrapper.upsampling_factor = 8

    tile, stride = (8, 8), (4, 6)     # latent px, as the public encode() API
    with torch.no_grad():
        ref_lat = wrapper.tiled_encode(
            torch.from_numpy(video.copy()), "cpu",
            (tile[0] * 8, tile[1] * 8), (stride[0] * 8, stride[1] * 8)).numpy()

    old = vae_mod.LATENT_MEAN, vae_mod.LATENT_STD
    vae_mod.LATENT_MEAN = np.zeros(cfg.z_dim, np.float32)
    vae_mod.LATENT_STD = np.ones(cfg.z_dim, np.float32)
    try:
        lat = vae_encode_tiled(params, cfg, jnp.asarray(video), tile, stride)
    finally:
        vae_mod.LATENT_MEAN, vae_mod.LATENT_STD = old

    assert lat.shape == tuple(ref_lat.shape) == (1, cfg.z_dim, 2, 12, 16)
    np.testing.assert_allclose(np.asarray(lat), ref_lat, rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_temporal_tiler_parity():
    """Window split + 0.5-shift blend == reference TemporalTiler_BCTHW on a
    toy frame-mixing model."""
    C.add_reference_to_path()
    import jax.numpy as jnp
    from FantasyWorld.diffsynth_wan22.pipelines.wan_video_new import (
        TemporalTiler_BCTHW)
    from fantasy_world_tpu.pipelines.temporal_tiler import (
        temporal_tiled_forward)

    rng = np.random.default_rng(3)
    lat = rng.standard_normal((1, 4, 13, 6, 6)).astype(np.float32)
    y = rng.standard_normal((1, 4, 13, 6, 6)).astype(np.float32)

    def torch_fn(latents=None, y=None, **kw):
        # frame-coupled toy model: causal cumulative mean + conditioning
        return torch.cumsum(latents, dim=2) / torch.arange(
            1, latents.shape[2] + 1).view(1, 1, -1, 1, 1) + 0.5 * y

    def jax_fn(latents=None, y=None):
        csum = jnp.cumsum(latents, axis=2)
        denom = jnp.arange(1, latents.shape[2] + 1).reshape(1, 1, -1, 1, 1)
        return csum / denom + 0.5 * y

    size, stride = 6, 4
    ref_out = TemporalTiler_BCTHW().run(
        torch_fn, size, stride, "cpu", torch.float32,
        model_kwargs={"latents": torch.from_numpy(lat.copy()),
                      "y": torch.from_numpy(y.copy())},
        tensor_names=["latents", "y"]).numpy()

    out = temporal_tiled_forward(jax_fn,
                                 {"latents": jnp.asarray(lat),
                                  "y": jnp.asarray(y)},
                                 size, stride)
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-5, atol=1e-5)
