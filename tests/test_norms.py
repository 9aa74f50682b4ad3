"""Norm primitives: public-API numerics (reference semantics:
wan_video_dit.py:135-146 RMSNorm f32 stats + cast-back, torch fp32
LayerNorm statistics, AdaLN modulate wan_video_dit.py:69-70).

The fused Pallas norm kernel that used to live behind these APIs was
deleted in round 4 (measured slower than XLA's fused norms at production
shapes, PERF.md); these tests pin the jnp semantics it was checked against.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from fantasy_world_tpu.ops import norms


def test_rms_norm_f32_stats_bf16_roundtrip():
    """bf16 in -> f32 mean-square -> bf16 round -> scale in bf16 (the
    reference's RMS_norm ordering: normalize, cast back, THEN weight)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 130, 128)), dtype=jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal((128,)), dtype=jnp.bfloat16)
    out = norms.rms_norm(x, scale, 1e-5)
    assert out.dtype == jnp.bfloat16
    xf = np.asarray(x, np.float32)
    y = xf / np.sqrt(np.mean(xf * xf, -1, keepdims=True) + 1e-5)
    ref = (y.astype(jnp.bfloat16) * np.asarray(scale, np.float32)
           .astype(jnp.bfloat16)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("affine,bias", [(False, False), (True, False),
                                         (True, True)])
def test_layer_norm_affine_variants(affine, bias):
    rng = np.random.default_rng(2)
    B, L, D = 2, 200, 128
    x = rng.standard_normal((B, L, D)).astype(np.float32) * 2 + 0.5
    params = None
    if affine:
        params = {"scale": jnp.asarray(rng.standard_normal((D,)), jnp.float32)}
        if bias:
            params["bias"] = jnp.asarray(rng.standard_normal((D,)),
                                         jnp.float32)
    out = norms.layer_norm(jnp.asarray(x), params, 1e-6)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    ref = (x - mu) / np.sqrt(var + 1e-6)
    if affine:
        ref = ref * np.asarray(params["scale"])
        if bias:
            ref = ref + np.asarray(params["bias"])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_layer_norm_modulate_dtype_rounding():
    """The normed value is rounded to x.dtype BEFORE the f32 modulation --
    the composed reference semantics (norm in fp32, .type_as(x), then
    modulate in f32 via broadcasting)."""
    rng = np.random.default_rng(3)
    B, L, D = 2, 256, 128
    x = jnp.asarray(rng.standard_normal((B, L, D)), dtype=jnp.bfloat16)
    shift = jnp.asarray(rng.standard_normal((B, 1, D)), dtype=jnp.float32)
    scale_m = jnp.asarray(rng.standard_normal((B, 1, D)), dtype=jnp.float32)
    out = norms.layer_norm_modulate(x, shift, scale_m, None, 1e-6)
    assert out.dtype == x.dtype
    y = norms._layer_norm_jnp(x, None, 1e-6)          # rounds to bf16
    ref = norms.modulate(y.astype(jnp.float32), shift, scale_m).astype(x.dtype)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_layer_norm_modulate_public_batch_repeat():
    """Public wrapper repeats (B_e0,1,D) modifiers over the frame-folded
    batch (VGGT blocks fold frames into batch: blocks.py e0 broadcast)."""
    rng = np.random.default_rng(4)
    B, L, D = 4, 16, 64
    x = jnp.asarray(rng.standard_normal((B, L, D)), dtype=jnp.float32)
    shift = jnp.asarray(rng.standard_normal((1, 1, D)), dtype=jnp.float32)
    scale_m = jnp.asarray(rng.standard_normal((1, 1, D)), dtype=jnp.float32)
    out = norms.layer_norm_modulate(x, shift, scale_m, None, 1e-6)
    y = norms._layer_norm_jnp(x, None, 1e-6)
    ref = norms.modulate(y.astype(jnp.float32), shift, scale_m).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
