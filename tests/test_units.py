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
