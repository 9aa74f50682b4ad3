"""Fused Pallas norm kernels: interpret-mode parity vs the jnp oracle.

The public entry points (rms_norm / layer_norm / layer_norm_modulate) fall
back to the jnp path off-TPU, so these tests drive the kernel wrapper
``_fused_norm`` directly under pltpu.force_tpu_interpret_mode() and compare
against the composed jnp reference semantics (reference numerics:
wan_video_dit.py:135-146 RMSNorm, torch fp32 LayerNorm statistics).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from fantasy_world_tpu.ops import norms


def _interpret():
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.force_tpu_interpret_mode()


@pytest.mark.parametrize("B,L,D", [(2, 256, 128), (1, 200, 256)])
def test_fused_rms_norm_parity(B, L, D):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, L, D)).astype(np.float32) * 3
    scale = rng.standard_normal((D,)).astype(np.float32)
    ref = norms._rms_norm_jnp(jnp.asarray(x), jnp.asarray(scale), 1e-5)
    with _interpret():
        out = norms._fused_norm(jnp.asarray(x), scale=jnp.asarray(scale),
                                kind="rms", eps=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_rms_norm_bf16_parity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 130, 128)), dtype=jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal((128,)), dtype=jnp.bfloat16)
    ref = norms._rms_norm_jnp(x, scale, 1e-5)
    with _interpret():
        out = norms._fused_norm(x, scale=scale, kind="rms", eps=1e-5)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref, dtype=np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("affine,bias", [(False, False), (True, False),
                                         (True, True)])
def test_fused_layer_norm_parity(affine, bias):
    rng = np.random.default_rng(2)
    B, L, D = 2, 200, 128   # ragged L exercises the pad/slice path
    x = rng.standard_normal((B, L, D)).astype(np.float32) * 2 + 0.5
    params = None
    scale_a = bias_a = None
    if affine:
        params = {"scale": jnp.asarray(rng.standard_normal((D,)).astype(np.float32))}
        scale_a = params["scale"]
        if bias:
            params["bias"] = jnp.asarray(rng.standard_normal((D,)).astype(np.float32))
            bias_a = params["bias"]
    ref = norms._layer_norm_jnp(jnp.asarray(x), params, 1e-6)
    with _interpret():
        out = norms._fused_norm(jnp.asarray(x), scale=scale_a, bias=bias_a,
                                kind="ln", eps=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_layer_norm_modulate_parity():
    """kernel(ln+AdaLN) == modulate(layer_norm(x)) with the x.dtype rounding
    between the two stages (the composed reference semantics)."""
    rng = np.random.default_rng(3)
    B, L, D = 2, 256, 128
    x = jnp.asarray(rng.standard_normal((B, L, D)), dtype=jnp.bfloat16)
    shift = jnp.asarray(rng.standard_normal((B, 1, D)), dtype=jnp.float32)
    scale_m = jnp.asarray(rng.standard_normal((B, 1, D)), dtype=jnp.float32)

    y = norms._layer_norm_jnp(x, None, 1e-6)
    ref = norms.modulate(y.astype(jnp.float32), shift, scale_m).astype(x.dtype)
    with _interpret():
        out = norms._fused_norm(x, shift=shift, mscale=scale_m,
                                kind="ln", eps=1e-6)
    assert out.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref, dtype=np.float32),
                               rtol=2e-2, atol=2e-2)


def test_layer_norm_modulate_public_batch_repeat():
    """Public wrapper repeats (B_e0,1,D) modifiers over the frame-folded
    batch (VGGT blocks fold frames into batch: blocks.py e0 broadcast)."""
    rng = np.random.default_rng(4)
    B, L, D = 4, 16, 64           # D%128!=0 -> jnp fallback path on any host
    x = jnp.asarray(rng.standard_normal((B, L, D)), dtype=jnp.float32)
    shift = jnp.asarray(rng.standard_normal((1, 1, D)), dtype=jnp.float32)
    scale_m = jnp.asarray(rng.standard_normal((1, 1, D)), dtype=jnp.float32)
    out = norms.layer_norm_modulate(x, shift, scale_m, None, 1e-6)
    y = norms._layer_norm_jnp(x, None, 1e-6)
    ref = norms.modulate(y.astype(jnp.float32), shift, scale_m).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
