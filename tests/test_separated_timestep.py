"""TI2V-5B seperated_timestep path (wan22 wan_video_dit.py:342, registry
hash 1f5ab770...).

NOTE on the oracle: the reference SNAPSHOT's TI2V path is dead code -- its
DiTBlock chunks the modulation on dim=1 unconditionally
(wan22 wan_video_dit.py:264-265), which for the per-token 4-D t_mod
(1, L, 6, dim) splits the TOKEN axis and then fails to broadcast against
(1, L, dim) activations. FantasyWorld never instantiates TI2V-5B, so the bug
is unreachable there. We implement the intended semantics (chunk the 6-axis;
frame-0 tokens conditioned on t=0, upstream DiffSynth-Studio behavior) and
pin it with: (a) per-token time_embedding parity vs the reference modules,
which ARE runnable; (b) self-consistency -- a constant per-token timestep
must reproduce the scalar path bit-for-bit.
"""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.parity, pytest.mark.parity_fast]

TINY = dict(dim=96, in_dim=8, ffn_dim=128, out_dim=8, text_dim=32,
            freq_dim=64, eps=1e-6, patch_size=(1, 2, 2), num_heads=4,
            num_layers=2, has_image_input=False)


def _pair():
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan22.models.wan_video_dit import WanModel
    from fantasy_world_tpu.models.wan.dit import WanDiTConfig
    from fantasy_world_tpu.convert.wan_dit import convert_wan_dit

    torch.manual_seed(5)
    ref = WanModel(**TINY, require_clip_embedding=False,
                   require_vae_embedding=False, seperated_timestep=True,
                   fuse_vae_embedding_in_latents=True).float().eval()
    cfg = WanDiTConfig(**TINY, require_vae_embedding=False,
                       seperated_timestep=True,
                       fuse_vae_embedding_in_latents=True)
    params = convert_wan_dit({k: v.numpy() for k, v in ref.state_dict().items()},
                             cfg)
    return ref, cfg, params


def test_per_token_time_embedding_parity():
    """The reference's separated-timestep t/t_mod construction
    (wan_video_new.py:1555-1566) vs ours, on the reference's own modules."""
    import jax.numpy as jnp
    from fantasy_world_tpu.models.wan.dit import time_embedding

    ref, cfg, params = _pair()
    from FantasyWorld.diffsynth_wan22.models.wan_video_dit import (
        sinusoidal_embedding_1d)
    f, h, w = 3, 4, 6
    per_frame = h * w
    tstep = 437.0
    ref_timestep = torch.cat([
        torch.zeros((1, per_frame)),
        torch.ones((f - 1, per_frame)) * tstep]).flatten()
    with torch.no_grad():
        t_ref = ref.time_embedding(
            sinusoidal_embedding_1d(ref.freq_dim, ref_timestep).unsqueeze(0))
        t_mod_ref = ref.time_projection(t_ref).unflatten(2, (6, cfg.dim))

    ours_timestep = jnp.where(jnp.arange(f * per_frame) < per_frame, 0.0,
                              tstep)[None]
    t, t_mod = time_embedding(params, cfg, ours_timestep)
    np.testing.assert_allclose(np.asarray(t), t_ref.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_mod), t_mod_ref.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_constant_per_token_equals_scalar_path():
    """With every token at the same t (no fused frame), the per-token
    machinery must reproduce the scalar forward exactly."""
    import jax.numpy as jnp
    import dataclasses
    from fantasy_world_tpu.models.wan.dit import wan_dit_forward

    _, cfg, params = _pair()
    rng = np.random.default_rng(2)
    B, f, h2, w2 = 1, 3, 8, 12
    x = jnp.asarray(rng.standard_normal((B, 8, f, h2, w2)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((B, 16, 32)), jnp.float32)
    t = jnp.asarray([611.0], jnp.float32)

    cfg_scalar = dataclasses.replace(cfg, seperated_timestep=False)
    out_scalar = wan_dit_forward(params, cfg_scalar, x, t, ctx)
    # hand the forward a full per-token vector at the same t
    from fantasy_world_tpu.models.wan.dit import (prepare_inputs,
                                                  dit_block_apply,
                                                  head_apply, unpatchify)
    n_tok = f * (h2 // 2) * (w2 // 2)
    tokens, tt, t_mod, ctx2, grid, (cos, sin) = prepare_inputs(
        params, cfg, x, jnp.full((B, n_tok), 611.0), ctx)
    for bp in params["blocks"]:
        tokens = dit_block_apply(bp, tokens, ctx2, t_mod, cos, sin, cfg)
    out_vec = unpatchify(cfg, head_apply(params, cfg, tokens, tt), grid)
    np.testing.assert_allclose(np.asarray(out_vec), np.asarray(out_scalar),
                               rtol=2e-5, atol=2e-5)


def test_ti2v_denoise_loop():
    """denoise_ti2v: frame 0 must stay clamped to the clean first-frame
    latents through the whole loop; disabling fusion must change the
    result (pipelines/ti2v.py, wan22 wan_video_new.py:564-565)."""
    import dataclasses
    import jax.numpy as jnp
    from fantasy_world_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
    from fantasy_world_tpu.pipelines.ti2v import denoise_ti2v

    cfg = WanDiTConfig(**TINY, require_vae_embedding=False,
                       seperated_timestep=True,
                       fuse_vae_embedding_in_latents=True)
    params = init_wan_dit(0, cfg, jnp.float32)
    rng = np.random.default_rng(0)
    h, w = 32, 64      # latent grid (2, 4): divisible by the (2,2) patch
    ctx_p = jnp.asarray(rng.standard_normal((1, 12, 32)), jnp.float32)
    ctx_n = jnp.zeros((1, 12, 32), jnp.float32)
    z0 = jnp.asarray(rng.standard_normal((1, cfg.out_dim, 1, h // 16,
                                          w // 16)), jnp.float32)

    lat = denoise_ti2v(params, cfg, ctx_p, ctx_n, h, w, num_frames=9,
                       num_inference_steps=3, seed=5,
                       first_frame_latents=z0)
    assert lat.shape == (1, cfg.out_dim, 3, h // 16, w // 16)
    assert np.isfinite(np.asarray(lat)).all()
    np.testing.assert_array_equal(np.asarray(lat[:, :, 0:1]),
                                  np.asarray(z0))   # clamp survived

    cfg_noseq = dataclasses.replace(cfg, seperated_timestep=False,
                                    fuse_vae_embedding_in_latents=False)
    lat2 = denoise_ti2v(params, cfg_noseq, ctx_p, ctx_n, h, w, num_frames=9,
                        num_inference_steps=3, seed=5,
                        first_frame_latents=None)
    assert not np.allclose(np.asarray(lat), np.asarray(lat2))


def test_fused_first_frame_forward():
    """fuse_first_frame=True: frame-0 tokens ride t=0 modulation; the output
    must differ from the scalar path on frame 0 tokens, stay finite, and a
    t=0 scalar run must agree on a single-frame (f=1) input where the mask
    covers everything."""
    import jax.numpy as jnp
    from fantasy_world_tpu.models.wan.dit import wan_dit_forward

    _, cfg, params = _pair()
    rng = np.random.default_rng(4)
    B, f, h2, w2 = 1, 3, 8, 12
    x = jnp.asarray(rng.standard_normal((B, 8, f, h2, w2)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((B, 16, 32)), jnp.float32)
    t = jnp.asarray([611.0], jnp.float32)

    out_plain = wan_dit_forward(params, cfg, x, t, ctx)
    out_fused = wan_dit_forward(params, cfg, x, t, ctx,
                                fuse_first_frame=True)
    assert np.isfinite(np.asarray(out_fused)).all()
    assert not np.allclose(np.asarray(out_fused), np.asarray(out_plain))

    x1 = x[:, :, :1]
    out_f1 = wan_dit_forward(params, cfg, x1, jnp.asarray([0.0]), ctx)
    out_f1_fused = wan_dit_forward(params, cfg, x1, t, ctx,
                                   fuse_first_frame=True)
    np.testing.assert_allclose(np.asarray(out_f1_fused), np.asarray(out_f1),
                               rtol=2e-5, atol=2e-5)
