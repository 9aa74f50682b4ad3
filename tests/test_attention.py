"""Attention dispatch: XLA path numerics + Pallas kernel parity (interpret)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fantasy_world_tpu.ops.attention import dot_product_attention
from fantasy_world_tpu.ops import flash_attention as fa


def _ref_attention(q, k, v, scale):
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
    logits = logits - logits.max(axis=-1, keepdims=True)
    p = np.exp(logits)
    p = p / p.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("lq,lk,h,d", [(37, 53, 2, 64), (128, 128, 1, 96)])
def test_xla_attention_matches_numpy(lq, lk, h, d):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, lq, h, d)).astype(np.float32)
    k = rng.standard_normal((2, lk, h, d)).astype(np.float32)
    v = rng.standard_normal((2, lk, h, d)).astype(np.float32)
    out = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                backend="xla")
    ref = _ref_attention(q, k, v, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("lq,lk,h,d,bq,bk", [
    (256, 256, 2, 128, 128, 128),     # aligned
    (200, 300, 1, 64, 128, 128),      # ragged seq + padded head dim
    (130, 513, 2, 96, 128, 256),      # ragged everything
])
def test_pallas_flash_attention_interpret_parity(lq, lk, h, d, bq, bk):
    rng = np.random.default_rng(1)
    q = rng.standard_normal((1, lq, h, d)).astype(np.float32)
    k = rng.standard_normal((1, lk, h, d)).astype(np.float32)
    v = rng.standard_normal((1, lk, h, d)).astype(np.float32)

    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                 block_q=bq, block_k=bk)
    ref = _ref_attention(q, k, v, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("lq,lk", [
    (1, 1), (1, 200), (127, 128), (128, 1), (129, 127),
    (255, 257), (383, 130),
])
def test_pallas_flash_attention_extreme_ragged(lq, lk):
    """Block-boundary edges the production shapes never hit: single-token
    rows/keys, exactly-one-under/over the 128 block, tails in both axes.
    h=2 x d=64 also routes the paired-head packing path."""
    rng = np.random.default_rng(lq * 1000 + lk)
    q = rng.standard_normal((1, lq, 2, 64)).astype(np.float32)
    k = rng.standard_normal((1, lk, 2, 64)).astype(np.float32)
    v = rng.standard_normal((1, lk, 2, 64)).astype(np.float32)

    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v))
    ref = _ref_attention(q, k, v, 64 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_pallas_flash_attention_stats_ragged():
    """return_stats at a ragged shape: the (m2, l) statistics must merge
    two key shards to the exact unsharded output (the ring-attention
    contract, ops/attention.py:attention_with_stats docstring)."""
    rng = np.random.default_rng(5)
    lq, lk, h, d = 130, 259, 2, 64
    q = rng.standard_normal((1, lq, h, d)).astype(np.float32)
    k = rng.standard_normal((1, lk, h, d)).astype(np.float32)
    v = rng.standard_normal((1, lk, h, d)).astype(np.float32)
    cut = 131                          # ragged split

    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        parts = [fa.flash_attention(jnp.asarray(q), jnp.asarray(k[:, sl]),
                                    jnp.asarray(v[:, sl]), return_stats=True)
                 for sl in (slice(0, cut), slice(cut, lk))]
    (oa, ma, la), (ob, mb, lb) = [tuple(np.asarray(t, np.float64)
                                        for t in p) for p in parts]
    m = np.maximum(ma, mb)
    wa = la * np.exp2(ma - m)
    wb = lb * np.exp2(mb - m)
    merged = ((wa[..., None] * oa + wb[..., None] * ob)
              / (wa + wb)[..., None])
    ref = _ref_attention(q, k, v, d ** -0.5)
    np.testing.assert_allclose(merged, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("lq,lk,h,d", [
    (130, 300, 1, 128),     # generic multi-k-block path, ragged lk
    (130, 200, 1, 128),     # one-kv fast path, ragged lk
    (130, 300, 2, 64),      # paired-head path, ragged lk
])
def test_pallas_flash_ragged_all_negative_logits_finite(lq, lk, h, d):
    """The ragged-tail zero-pad correction l - n_pad*exp2(-m) cancels to
    exactly 0 in f32 when every real logit is ~2^-24 below the pad's
    implicit 0 score -- the old finalize then emitted Inf/NaN rows. The
    relative clamp must keep the output finite and bounded by max|v|
    (r4 review finding; unreachable for sane inputs, but a NaN is a
    clip-killer while a bounded row is not)."""
    rng = np.random.default_rng(7)
    e = np.zeros((d,), np.float32)
    e[0] = 1.0
    # scaled log2-domain logits ~= -57 for every (q, k) pair: far below
    # the f32 cancellation cliff at ~-25
    q = np.tile(8.0 * e, (1, lq, h, 1)).astype(np.float32)
    k = np.tile(-40.0 * e, (1, lk, h, 1)).astype(np.float32)
    v = rng.standard_normal((1, lk, h, d)).astype(np.float32)

    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(fa.flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    assert np.isfinite(out).all(), "Inf/NaN rows from pad-mass cancellation"
    assert np.abs(out).max() <= np.abs(v).max() + 1e-3
