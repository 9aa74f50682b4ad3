"""Training batch assembly smoke test."""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity


def test_build_train_batch():
    import jax
    import jax.numpy as jnp
    import fantasy_world_tpu.models.wan.vae as vae_mod
    from test_vae import _make_pair
    from fantasy_world_tpu.training.data import build_train_batch

    _, vae_cfg, vae_params = _make_pair()

    class Pipe:
        params = {"vae": vae_params,
                  "fusion": {"dit": {"patch_embedding":
                                     {"kernel": jnp.zeros((1,), jnp.float32)}}}}

        def __init__(self, cfg):
            self.vae_cfg = cfg

        def param_dtype(self):
            return jnp.float32

        def encode_prompt(self, prompt):
            return jnp.zeros((1, 8, 16), jnp.float32)

        def encode_image(self, image, T, H, W):
            return {"clip_feature": jnp.zeros((1, 257, 1280), jnp.float32),
                    "y": jnp.zeros((1, 20, (T - 1) // 4 + 1, H // 8, W // 8),
                                   jnp.float32)}

    pipe = Pipe(vae_cfg)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (5, 64, 80, 3), np.uint8)

    old = vae_mod.LATENT_MEAN, vae_mod.LATENT_STD
    vae_mod.LATENT_MEAN = np.zeros(vae_cfg.z_dim, np.float32)
    vae_mod.LATENT_STD = np.ones(vae_cfg.z_dim, np.float32)
    try:
        batch = build_train_batch(pipe, frames, "a cat",
                                  jax.random.PRNGKey(0))
    finally:
        vae_mod.LATENT_MEAN, vae_mod.LATENT_STD = old

    assert batch["clean_latents"].shape == (1, vae_cfg.z_dim, 2, 8, 10)
    assert batch["noise"].shape == batch["clean_latents"].shape
    assert batch["timestep"].shape == (1,)
    assert 0.0 < float(batch["sigma"]) <= 1.0
    assert batch["y"].shape[1] == 20
    for v in batch.values():
        if v is not None:
            assert bool(jnp.isfinite(jnp.asarray(v, jnp.float32)).all())
