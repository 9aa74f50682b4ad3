"""int8/fp8 quantized inference (core/quant.py).

TPU-native counterpart of the reference's fp8 serving hook
(fusion/model_wan21.py:42): w8a8 int8 for the MXU fast path, fp8 as
weight-storage parity. Checks quantization error bounds, tree-walk
selectivity, scan-stacked slicing, and the end-to-end quantized denoise.
"""
import numpy as np
import pytest

import conftest  # noqa: F401



def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def _nrmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)) / (np.std(b) + 1e-30))


def test_qlinear_error_bounds():
    import jax.numpy as jnp
    from fantasy_world_tpu.core.params import linear
    from fantasy_world_tpu.core.quant import quantize_linear_params

    rng = np.random.default_rng(0)
    p = {"kernel": jnp.asarray(rng.standard_normal((1024, 512)) * 0.02,
                               jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(512) * 0.1, jnp.float32)}
    x = jnp.asarray(rng.standard_normal((64, 1024)), jnp.float32)
    ref = linear(p, x)

    for mode, cos_min, nrmse_max in (("int8", 0.9995, 0.035),
                                     ("fp8", 0.998, 0.07)):
        q = quantize_linear_params(p, mode)
        out = linear(q, x)          # dispatches on pytree keys
        assert out.dtype == x.dtype
        assert _cos(out, ref) > cos_min, mode
        assert _nrmse(out, ref) < nrmse_max, mode


def test_qlinear_stacked_matches_per_layer():
    """A scan-stacked (L, K, N) kernel must quantize layer-by-layer (per-
    layer scales), and its leading-axis slices must equal quantizing each
    layer separately -- that is what lax.scan consumes."""
    import jax.numpy as jnp
    from fantasy_world_tpu.core.quant import quantize_linear_params

    rng = np.random.default_rng(1)
    ks = [rng.standard_normal((32, 16)) * (i + 1) for i in range(3)]
    stacked = quantize_linear_params(
        {"kernel": jnp.asarray(np.stack(ks), jnp.float32)})
    assert stacked["kernel_q"].shape == (3, 32, 16)
    assert stacked["kscale"].shape == (3, 16)
    for i, k in enumerate(ks):
        single = quantize_linear_params(
            {"kernel": jnp.asarray(k, jnp.float32)})
        np.testing.assert_array_equal(np.asarray(stacked["kernel_q"][i]),
                                      np.asarray(single["kernel_q"]))
        np.testing.assert_allclose(np.asarray(stacked["kscale"][i]),
                                   np.asarray(single["kscale"]), rtol=1e-6)


def test_quantize_tree_selectivity():
    import jax.numpy as jnp
    from fantasy_world_tpu.core.quant import (count_quantized, is_quantized,
                                              quantize_tree)

    z = lambda *s: jnp.zeros(s, jnp.bfloat16)
    tree = {
        "patch_embedding": {"kernel": z(64, 64)},        # excluded by name
        "blocks": [{"q": {"kernel": z(64, 64), "bias": z(64)},
                    "norm": {"scale": z(64)}}],
        "stacked": {"kernel": z(4, 64, 64)},             # scan layout
        "tiny": {"kernel": z(8, 64)},                    # below min_dim
        "conv": {"kernel": z(16, 16, 3, 3)},             # 4-D conv: never
    }
    q = quantize_tree(tree, "int8", min_dim=64)
    assert "kernel" in q["patch_embedding"]
    assert is_quantized(q["blocks"][0]["q"])
    assert "bias" in q["blocks"][0]["q"]
    assert q["blocks"][0]["norm"] == {"scale": tree["blocks"][0]["norm"]["scale"]}
    assert is_quantized(q["stacked"])
    assert "kernel" in q["tiny"] and "kernel" in q["conv"]
    assert count_quantized(q) == 2
    # original tree untouched
    assert "kernel" in tree["blocks"][0]["q"]


@pytest.mark.parity
def test_pipeline_quantized_denoise_close_to_bf16():
    """End-to-end: a quantized tiny pipeline must denoise to nearly the
    same latents as the float one (w8a8 noise only)."""
    import jax.numpy as jnp
    from tests.test_pipeline import _tiny_pipe

    f, h, w = 2, 64, 64
    num_frames = 4 * (f - 1) + 1
    ctx_pos = jnp.zeros((1, 16, 4096), jnp.float32)
    ctx_neg = jnp.ones((1, 16, 4096), jnp.float32) * 0.01
    clip = jnp.zeros((1, 257, 1280), jnp.float32)
    y = jnp.zeros((1, 20, f, h // 8, w // 8), jnp.float32)
    pl = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, f * (h // 16) * (w // 16), 2048)) * 0.1, jnp.float32)
    args = (ctx_pos, ctx_neg, clip, y, h, w)
    kw = dict(num_frames=num_frames, num_inference_steps=2, seed=7,
              plucker_fea=pl)

    pipe, _ = _tiny_pipe()
    lat_ref, _ = pipe.denoise(*args, **kw)

    from fantasy_world_tpu.core.quant import count_quantized
    pipe_q, _ = _tiny_pipe()
    pipe_q.quantize("int8", min_dim=16)
    assert count_quantized(pipe_q._scan_params) > 0
    lat_q, pred_q = pipe_q.denoise(*args, **kw)

    assert bool(jnp.isfinite(lat_q).all())
    assert pred_q is not None
    assert _cos(lat_q, lat_ref) > 0.99
