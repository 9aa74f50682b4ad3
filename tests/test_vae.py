"""Wan video VAE parity vs the reference streaming implementation."""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity


def _make_pair(dim=16, z_dim=4):
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.models.wan_video_vae import VideoVAE_
    from fantasy_world_tpu.models.wan.vae import VAEConfig
    from fantasy_world_tpu.convert.wan_vae import convert_wan_vae

    torch.manual_seed(0)
    ref = VideoVAE_(dim=dim, z_dim=z_dim).float().eval()
    cfg = VAEConfig(dim=dim, z_dim=z_dim)
    sd = {"model." + k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_wan_vae(sd, cfg)
    return ref, cfg, params


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_vae_decode_full_sequence_parity():
    """Fused full-sequence decode == streamed per-frame reference decode."""
    from fantasy_world_tpu.models.wan.vae import (
        vae_decode, LATENT_MEAN, LATENT_STD)
    import jax.numpy as jnp

    ref, cfg, params = _make_pair()
    rng = np.random.default_rng(0)
    z = rng.standard_normal((1, cfg.z_dim, 3, 8, 10)).astype(np.float32)

    mean = torch.zeros(cfg.z_dim)
    std = torch.ones(cfg.z_dim)
    with torch.no_grad():
        ref_out = ref.decode(torch.from_numpy(z.copy()),
                             [mean, 1.0 / std]).numpy()

    # our decode folds the 16ch wan stats in; for the tiny 4ch test model use
    # zero-mean unit-std by monkeypatching the stat tables
    import fantasy_world_tpu.models.wan.vae as vae_mod
    old = vae_mod.LATENT_MEAN, vae_mod.LATENT_STD
    vae_mod.LATENT_MEAN = np.zeros(cfg.z_dim, np.float32)
    vae_mod.LATENT_STD = np.ones(cfg.z_dim, np.float32)
    try:
        out = vae_decode(params, cfg, jnp.asarray(z), clamp=False)
    finally:
        vae_mod.LATENT_MEAN, vae_mod.LATENT_STD = old

    assert out.shape == ref_out.shape == (1, 3, 9, 64, 80)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_vae_encode_full_sequence_parity():
    from fantasy_world_tpu.models.wan.vae import vae_encode
    import jax.numpy as jnp
    import fantasy_world_tpu.models.wan.vae as vae_mod

    ref, cfg, params = _make_pair()
    rng = np.random.default_rng(1)
    video = rng.uniform(-1, 1, (1, 3, 9, 64, 80)).astype(np.float32)

    mean = torch.zeros(cfg.z_dim)
    std = torch.ones(cfg.z_dim)
    with torch.no_grad():
        ref_lat = ref.encode(torch.from_numpy(video.copy()),
                             [mean, 1.0 / std]).numpy()

    old = vae_mod.LATENT_MEAN, vae_mod.LATENT_STD
    vae_mod.LATENT_MEAN = np.zeros(cfg.z_dim, np.float32)
    vae_mod.LATENT_STD = np.ones(cfg.z_dim, np.float32)
    try:
        lat = vae_encode(params, cfg, jnp.asarray(video))
    finally:
        vae_mod.LATENT_MEAN, vae_mod.LATENT_STD = old

    assert lat.shape == ref_lat.shape == (1, cfg.z_dim, 3, 8, 10)
    np.testing.assert_allclose(np.asarray(lat), ref_lat, rtol=2e-3, atol=2e-3)
