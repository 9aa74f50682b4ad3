"""Ring sequence-parallel attention: equality vs the single-device path.

The rotating-k/v dance (n ppermute hops + online-softmax merge from the
kernel's (m2, l) statistics) must reproduce plain dot_product_attention;
checked on the 8-virtual-device CPU mesh including ragged token counts
(the production 16,317/16,422 are never divisible by power-of-two meshes)
and the head-indivisible ulysses fallthrough that is the ring's reason to
exist (12-head bicross at seq degree 8).
"""
import numpy as np
import pytest

import conftest  # noqa: F401

pytestmark = pytest.mark.multichip


def _mesh_or_skip(data, seq, model=1):
    import jax
    from fantasy_world_tpu.parallel.sharding import make_mesh
    if jax.device_count() < data * seq * model:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(data=data, seq=seq, model=model)


@pytest.mark.parametrize("L,H,D", [
    (256, 8, 64),          # evenly divisible
    (251, 3, 32),          # ragged L AND H % 4 != 0 (no ulysses possible)
])
def test_ring_matches_plain(L, H, D):
    import jax.numpy as jnp
    from fantasy_world_tpu.ops.attention import dot_product_attention
    from fantasy_world_tpu.parallel.ring import ring_attention

    mesh = _mesh_or_skip(data=2, seq=4)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, L, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, L, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, L, H, D)), jnp.float32)

    ref = np.asarray(dot_product_attention(q, k, v))
    out = np.asarray(ring_attention(q, k, v, mesh=mesh))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_ring_cross_attention_ragged_kv():
    """Lq != Lk; the k pad lands in the last rotating chunk."""
    import jax.numpy as jnp
    from fantasy_world_tpu.ops.attention import dot_product_attention
    from fantasy_world_tpu.parallel.ring import ring_attention

    mesh = _mesh_or_skip(data=2, seq=4)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 130, 5, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 77, 5, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 77, 5, 32)), jnp.float32)

    ref = np.asarray(dot_product_attention(q, k, v))
    out = np.asarray(ring_attention(q, k, v, mesh=mesh))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_ulysses_head_indivisible_uses_ring():
    """H % n != 0 -> ulysses_attention falls through to the ring and still
    matches the plain path (the seq-degree-8 bicross situation)."""
    import jax.numpy as jnp
    from fantasy_world_tpu.ops.attention import dot_product_attention
    from fantasy_world_tpu.parallel.ulysses import ulysses_attention

    mesh = _mesh_or_skip(data=2, seq=4)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((2, 120, 6, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 120, 6, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 120, 6, 32)), jnp.float32)
    ref = np.asarray(dot_product_attention(q, k, v))
    out = np.asarray(ulysses_attention(q, k, v, mesh=mesh))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_ring_grad_flows():
    """ppermute + merge are differentiable: grads match the plain path."""
    import jax
    import jax.numpy as jnp
    from fantasy_world_tpu.ops.attention import dot_product_attention
    from fantasy_world_tpu.parallel.ring import ring_attention

    mesh = _mesh_or_skip(data=2, seq=4)
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 64, 4, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 64, 4, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 64, 4, 32)), jnp.float32)

    g_ref = jax.grad(lambda q: dot_product_attention(q, k, v).sum())(q)
    g_ring = jax.grad(lambda q: ring_attention(q, k, v, mesh=mesh).sum())(q)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# the statistics primitive the ring is built on
# ---------------------------------------------------------------------------

def _np_stats(q, k, v, scale):
    """Reference (o, m2, l) in the base-2 domain."""
    log2e = 1.4426950408889634
    s2 = np.einsum("bqhd,bkhd->bhqk", q, k) * scale * log2e
    m2 = s2.max(axis=-1)
    p = np.exp2(s2 - m2[..., None])
    l = p.sum(axis=-1)
    o = np.einsum("bhqk,bkhd->bqhd", p / l[..., None], v)
    return o, m2.transpose(0, 2, 1), l.transpose(0, 2, 1)


def test_xla_stats_match_numpy():
    import jax.numpy as jnp
    from fantasy_world_tpu.ops.attention import attention_with_stats

    rng = np.random.default_rng(4)
    q = rng.standard_normal((2, 37, 3, 32)).astype(np.float32)
    k = rng.standard_normal((2, 53, 3, 32)).astype(np.float32)
    v = rng.standard_normal((2, 53, 3, 32)).astype(np.float32)
    o, m2, l = attention_with_stats(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), backend="xla")
    o_r, m_r, l_r = _np_stats(q, k, v, 32 ** -0.5)
    np.testing.assert_allclose(np.asarray(o), o_r, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(m2), m_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l), l_r, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("lq,lk,h,d,bq,bk", [
    (256, 256, 2, 128, 128, 128),     # multi-k-block online path
    (130, 513, 2, 96, 128, 256),      # ragged everything
    (128, 100, 2, 64, 128, 128),      # onekv fast path + head pairing OFF
])
def test_pallas_stats_interpret_parity(lq, lk, h, d, bq, bk):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from fantasy_world_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(5)
    q = rng.standard_normal((1, lq, h, d)).astype(np.float32)
    k = rng.standard_normal((1, lk, h, d)).astype(np.float32)
    v = rng.standard_normal((1, lk, h, d)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        o, m2, l = fa.flash_attention(jnp.asarray(q), jnp.asarray(k),
                                      jnp.asarray(v), block_q=bq, block_k=bk,
                                      return_stats=True)
    o_r, m_r, l_r = _np_stats(q, k, v, d ** -0.5)
    np.testing.assert_allclose(np.asarray(o), o_r, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(m2), m_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l), l_r, rtol=1e-4, atol=1e-4)


def test_stats_merge_identity():
    """Splitting the keys in two and merging (o, m2, l) pairs reproduces
    the full attention — the algebra the ring relies on."""
    import jax.numpy as jnp
    from fantasy_world_tpu.ops.attention import (attention_with_stats,
                                                 dot_product_attention)

    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.standard_normal((2, 40, 3, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 60, 3, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 60, 3, 32)), jnp.float32)

    o_a, m_a, l_a = attention_with_stats(q, k[:, :25], v[:, :25],
                                         backend="xla")
    o_b, m_b, l_b = attention_with_stats(q, k[:, 25:], v[:, 25:],
                                         backend="xla")
    m = np.maximum(np.asarray(m_a), np.asarray(m_b))
    w_a = np.asarray(l_a) * np.exp2(np.asarray(m_a) - m)
    w_b = np.asarray(l_b) * np.exp2(np.asarray(m_b) - m)
    o = (np.asarray(o_a) * w_a[..., None] +
         np.asarray(o_b) * w_b[..., None]) / (w_a + w_b)[..., None]

    ref = np.asarray(dot_product_attention(q, k, v, backend="xla"))
    np.testing.assert_allclose(o, ref, rtol=2e-5, atol=2e-5)
