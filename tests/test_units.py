"""PipelineUnit runner semantics (wan22 declarative conditioning)."""
import numpy as np
import pytest

import conftest  # noqa: F401


class _StubPipe:
    """Minimal pipeline surface the basic units touch."""

    class _VaeCfg:
        z_dim = 16

    vae_cfg = _VaeCfg()

    def generate_noise(self, shape, seed=None, **_):
        import jax
        import jax.numpy as jnp
        return jax.random.normal(jax.random.PRNGKey(seed or 0), shape,
                                 jnp.float32)

    def encode_prompt(self, prompt):
        import jax.numpy as jnp
        # deterministic embedding keyed by prompt hash
        v = float(abs(hash(prompt)) % 1000) / 1000.0
        return jnp.full((1, 4, 8), v)

    def param_dtype(self):
        import jax.numpy as jnp
        return jnp.float32


def test_runner_separate_cfg_and_quirk():
    from fantasy_world_tpu.pipelines.units import (PipelineUnitRunner,
                                                   PromptEmbedder)
    runner = PipelineUnitRunner()
    pipe = _StubPipe()

    shared = {"cfg_scale": 5.0}
    posi = {"prompt": "a cat"}
    nega = {"negative_prompt": "blurry"}
    shared, posi, nega = runner(PromptEmbedder(), pipe, shared, posi, nega)
    assert "context" in posi and "context" in nega
    assert float(posi["context"][0, 0, 0]) != float(nega["context"][0, 0, 0])

    # cfg_scale == 1: the reference aliases the POSITIVE outputs into nega
    # (utils/__init__.py:279-280)
    shared = {"cfg_scale": 1}
    posi = {"prompt": "a cat"}
    nega = {"negative_prompt": "blurry"}
    shared, posi, nega = runner(PromptEmbedder(), pipe, shared, posi, nega)
    np.testing.assert_array_equal(np.asarray(posi["context"]),
                                  np.asarray(nega["context"]))


def test_shape_checker_and_noise():
    from fantasy_world_tpu.pipelines.units import (PipelineUnitRunner,
                                                   ShapeChecker,
                                                   NoiseInitializer)
    runner = PipelineUnitRunner()
    pipe = _StubPipe()
    shared = {"height": 479, "width": 833, "num_frames": 80,
              "cfg_scale": 5.0, "seed": 3}
    shared, _, _ = runner(ShapeChecker(), pipe, shared, {}, {})
    assert shared["height"] == 480 and shared["width"] == 848
    assert shared["num_frames"] == 81
    shared, _, _ = runner(NoiseInitializer(), pipe, shared, {}, {})
    assert shared["noise"].shape == (1, 16, 21, 60, 106)

    # TI2V-5B pairs with the 38-block VAE: z=48 on the 16x grid (the 8x
    # hardcode gave a 4x-too-large noise tensor, r4 review)
    class _Vae38Cfg:
        z_dim = 48
        spatial_down = 16

    pipe38 = _StubPipe()
    pipe38.vae_cfg = _Vae38Cfg()
    shared38 = {"height": 480, "width": 848, "num_frames": 81,
                "cfg_scale": 5.0, "seed": 3}
    shared38, _, _ = runner(NoiseInitializer(), pipe38, shared38, {}, {})
    assert shared38["noise"].shape == (1, 48, 21, 30, 53)


class _DitCfg:
    in_dim = 36
    has_image_input = True
    has_image_pos_emb = False
    require_vae_embedding = True
    fuse_vae_embedding_in_latents = False


class _Cfg:
    dit = _DitCfg()


def _stub_vae_encode(marker=2.0):
    import jax.numpy as jnp

    def enc(p, cfg, video):
        b, c, t, h, w = video.shape
        return jnp.full((b, 16, (t - 1) // 4 + 1, h // 8, w // 8), marker,
                        video.dtype)
    return enc


def _full_pipe():
    import jax.numpy as jnp
    pipe = _StubPipe()
    pipe.cfg = _Cfg()
    pipe.params = {"vae": {}, "fusion": {"dit": {"patch_embedding": {
        "kernel": jnp.zeros((1, 1), jnp.float32)}}}}
    return pipe


def test_fun_control_unit(monkeypatch):
    """Channel assembly (wan_video_new.py:917-939): control latents stacked
    in front of y, zero-filled clip/y when absent, y_dim from dit.in_dim."""
    import jax.numpy as jnp
    from fantasy_world_tpu.models.wan import vae as vae_mod
    from fantasy_world_tpu.pipelines.units import (PipelineUnitRunner,
                                                   FunControl)
    monkeypatch.setattr(vae_mod, "vae_encode", _stub_vae_encode(3.0))
    pipe = _full_pipe()
    ctrl = np.zeros((1, 3, 9, 64, 64), np.float32)
    shared = {"control_video": ctrl, "num_frames": 9, "height": 64,
              "width": 64, "clip_feature": None, "y": None,
              "noise": jnp.zeros((1, 16, 3, 8, 8)), "cfg_scale": 5.0}
    shared, _, _ = PipelineUnitRunner()(FunControl(), pipe, shared, {}, {})
    # in_dim 36 - 16 control - 16 noise -> 4 zero-filled y channels
    assert shared["y"].shape == (1, 20, 3, 8, 8)
    np.testing.assert_array_equal(np.asarray(shared["y"][:, :16]), 3.0)
    np.testing.assert_array_equal(np.asarray(shared["y"][:, 16:]), 0.0)
    assert shared["clip_feature"].shape == (1, 257, 1280)


def test_image_embedder_fused_unit(monkeypatch):
    import jax.numpy as jnp
    from fantasy_world_tpu.models.wan import vae as vae_mod
    from fantasy_world_tpu.pipelines.units import (PipelineUnitRunner,
                                                   ImageEmbedderFused)
    monkeypatch.setattr(vae_mod, "vae_encode", _stub_vae_encode(7.0))
    pipe = _full_pipe()
    lat = jnp.zeros((1, 16, 3, 8, 8))
    shared = {"input_image": np.zeros((64, 64, 3), np.float32),
              "latents": lat, "height": 64, "width": 64, "cfg_scale": 5.0}
    # flag off -> no-op
    shared2, _, _ = PipelineUnitRunner()(ImageEmbedderFused(), pipe,
                                         dict(shared), {}, {})
    assert "first_frame_latents" not in shared2
    # flag on -> frame 0 replaced, rest untouched
    pipe.cfg.dit.fuse_vae_embedding_in_latents = True
    shared3, _, _ = PipelineUnitRunner()(ImageEmbedderFused(), pipe,
                                         dict(shared), {}, {})
    pipe.cfg.dit.fuse_vae_embedding_in_latents = False
    np.testing.assert_array_equal(np.asarray(shared3["latents"][:, :, 0]), 7.0)
    np.testing.assert_array_equal(np.asarray(shared3["latents"][:, :, 1:]), 0.0)
    assert shared3["fuse_vae_embedding_in_latents"] is True


def test_fun_reference_and_speed_units(monkeypatch):
    from fantasy_world_tpu.models.wan import vae as vae_mod
    from fantasy_world_tpu.pipelines.units import (PipelineUnitRunner,
                                                   FunReference, SpeedControl)
    monkeypatch.setattr(vae_mod, "vae_encode", _stub_vae_encode(5.0))
    pipe = _full_pipe()          # no "clip" params -> latents only
    shared = {"reference_image": np.zeros((64, 64, 3), np.float32),
              "height": 64, "width": 64, "cfg_scale": 5.0}
    shared, _, _ = PipelineUnitRunner()(FunReference(), pipe, shared, {}, {})
    assert shared["reference_latents"].shape == (1, 16, 1, 8, 8)
    assert "clip_feature" not in shared

    shared = {"motion_bucket_id": 31, "cfg_scale": 5.0}
    shared, _, _ = PipelineUnitRunner()(SpeedControl(), pipe, shared, {}, {})
    assert np.asarray(shared["motion_bucket_id"]).tolist() == [31.0]


def test_image_embedder_clip_gating(monkeypatch):
    """No clip params -> no-op; with stubbed encoder the end-image tokens
    concatenate only under has_image_pos_emb (wan_video_new.py:841-852)."""
    import jax.numpy as jnp
    from fantasy_world_tpu.models.wan import clip as clip_mod
    from fantasy_world_tpu.pipelines.units import (PipelineUnitRunner,
                                                   ImageEmbedderCLIP)
    pipe = _full_pipe()
    img = np.zeros((64, 64, 3), np.float32)
    shared = {"input_image": img, "end_image": img, "height": 64,
              "width": 64, "cfg_scale": 5.0}
    out, _, _ = PipelineUnitRunner()(ImageEmbedderCLIP(), pipe,
                                     dict(shared), {}, {})
    assert "clip_feature" not in out

    # the stubs ENFORCE the layout contract instead of erasing it (the r4
    # review found both CLIP units feeding (H, W, 3) into the strictly-
    # BCHW preprocess_image, invisible to an identity stub)
    real_preprocess = clip_mod.preprocess_image

    def fake_preprocess(x):
        assert x.ndim == 4 and x.shape[1] == 3, x.shape
        return real_preprocess(x)

    def fake_encode(p, cfg, x):
        assert x.ndim == 4 and x.shape[1:] == (3, 224, 224), x.shape
        return jnp.ones((1, 257, 1280))

    monkeypatch.setattr(clip_mod, "preprocess_image", fake_preprocess)
    monkeypatch.setattr(clip_mod, "clip_encode_image", fake_encode)
    pipe.params["clip"] = {}
    pipe.clip_cfg = None
    out, _, _ = PipelineUnitRunner()(ImageEmbedderCLIP(), pipe,
                                     dict(shared), {}, {})
    assert out["clip_feature"].shape == (1, 257, 1280)
    pipe.cfg.dit.has_image_pos_emb = True
    out, _, _ = PipelineUnitRunner()(ImageEmbedderCLIP(), pipe,
                                     dict(shared), {}, {})
    pipe.cfg.dit.has_image_pos_emb = False
    assert out["clip_feature"].shape == (1, 514, 1280)


def test_fun_camera_control_unit():
    import jax.numpy as jnp
    from fantasy_world_tpu.pipelines.units import (PipelineUnitRunner,
                                                   FunCameraControl)
    from fantasy_world_tpu.pipelines.wan_video_22 import (
        control_camera_latents_from_plucker)
    rng = np.random.default_rng(0)
    plucker = rng.standard_normal((1, 9, 32, 48, 6)).astype(np.float32)
    shared = {"plucker_embedding": plucker, "cfg_scale": 5.0}
    shared, _, _ = PipelineUnitRunner()(FunCameraControl(), _StubPipe(),
                                        shared, {}, {})
    ref = control_camera_latents_from_plucker(plucker)
    np.testing.assert_array_equal(
        np.asarray(shared["control_camera_latents_input"]), np.asarray(ref))
