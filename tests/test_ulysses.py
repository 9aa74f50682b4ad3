"""Ulysses sequence-parallel attention: equality vs the single-device path.

The all_to_all dance (tokens-split -> heads-split -> attention -> inverse)
must be a numerical no-op relative to plain dot_product_attention; these
tests check it on the 8-virtual-device CPU mesh, including the ragged-L
case (token counts not divisible by the seq degree) and the context-based
dispatch that the pipeline uses.
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
    (251, 8, 32),          # ragged: 251 % 4 != 0 -> pad+slice path
])
def test_ulysses_matches_plain(L, H, D):
    import jax.numpy as jnp
    from fantasy_world_tpu.ops.attention import dot_product_attention
    from fantasy_world_tpu.parallel.ulysses import ulysses_attention

    mesh = _mesh_or_skip(data=2, seq=4)
    rng = np.random.default_rng(0)
    B = 2
    q = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)

    ref = np.asarray(dot_product_attention(q, k, v))
    out = np.asarray(ulysses_attention(q, k, v, mesh=mesh))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_ulysses_cross_attention_ragged_kv():
    """Lq != Lk (DiT cross-attention shape family)."""
    import jax.numpy as jnp
    from fantasy_world_tpu.ops.attention import dot_product_attention
    from fantasy_world_tpu.parallel.ulysses import ulysses_attention

    mesh = _mesh_or_skip(data=2, seq=4)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 130, 8, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 77, 8, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 77, 8, 32)), jnp.float32)

    ref = np.asarray(dot_product_attention(q, k, v))
    out = np.asarray(ulysses_attention(q, k, v, mesh=mesh))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_ulysses_context_dispatch():
    """dot_product_attention under ulysses_context routes through the
    sequence-parallel path (and restores plain dispatch after)."""
    import jax.numpy as jnp
    from fantasy_world_tpu.ops.attention import dot_product_attention
    from fantasy_world_tpu.parallel.ulysses import (current_ulysses,
                                                    ulysses_context)

    mesh = _mesh_or_skip(data=2, seq=4)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((2, 64, 8, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 64, 8, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 64, 8, 32)), jnp.float32)

    ref = np.asarray(dot_product_attention(q, k, v))
    assert current_ulysses() is None
    with ulysses_context(mesh):
        assert current_ulysses() is not None
        out = np.asarray(dot_product_attention(q, k, v))
    assert current_ulysses() is None
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_ulysses_head_indivisible_falls_back():
    """H not divisible by the seq degree -> plain path, same result."""
    import jax.numpy as jnp
    from fantasy_world_tpu.ops.attention import dot_product_attention
    from fantasy_world_tpu.parallel.ulysses import ulysses_attention

    mesh = _mesh_or_skip(data=2, seq=4)
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 64, 6, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 64, 6, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 64, 6, 32)), jnp.float32)
    ref = np.asarray(dot_product_attention(q, k, v))
    out = np.asarray(ulysses_attention(q, k, v, mesh=mesh))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parity
def test_joint_forward_ulysses_equality():
    """Full fusion forward with ulysses=True on the 8-device mesh matches
    the replicated single-device run (the test_multichip equality check,
    but with the explicit all_to_all path instead of GSPMD resharding)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fantasy_world_tpu.models.fusion.model import (
        init_fusion, split_trainable, joint_forward)
    from fantasy_world_tpu.parallel.sharding import (
        param_specs, stacked_specs, shard_tree)
    from __graft_entry__ import _demo_config

    mesh = _mesh_or_skip(data=2, seq=2, model=2)
    cfg = _demo_config(dim=64, layers=3, start_index=1, agg_dim=64,
                       agg_depth=2)
    params = init_fusion(0, cfg, jnp.float32)
    lite, scan = split_trainable(params, cfg)

    B, f, h2, w2 = 2, 2, 8, 8
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((B, 16, f, h2, w2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, 20, f, h2, w2)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((B, 16, 4096)) * 0.02, jnp.float32)
    clip = jnp.zeros((B, 257, 1280), jnp.float32)
    pl = jnp.asarray(rng.standard_normal(
        (B, f * (h2 // 2) * (w2 // 2), 2048)) * 0.1, jnp.float32)
    t = jnp.full((B,), 500.0)

    ref, _ = jax.jit(lambda: joint_forward(lite, scan, cfg, lat, t, ctx,
                                           clip, y, plucker_fea=pl))()
    ref = np.asarray(ref)

    with mesh:
        lite_s = shard_tree(lite, mesh, param_specs(lite, mesh=mesh))
        scan_s = shard_tree(scan, mesh, stacked_specs(scan, mesh=mesh))
        sh = NamedSharding(mesh, P("data"))
        lat_s, y_s, ctx_s, clip_s, pl_s = (
            jax.device_put(a, sh) for a in (lat, y, ctx, clip, pl))

        def fwd(lp, sp, l, tt, c, cl, yy, pf):
            n, _ = joint_forward(lp, sp, cfg, l, tt, c, cl, yy,
                                 plucker_fea=pf, mesh=mesh, ulysses=True,
                                 ulysses_min_lq=0)
            return n
        out = np.asarray(jax.jit(fwd)(lite_s, scan_s, lat_s, t, ctx_s,
                                      clip_s, y_s, pl_s))

    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_ulysses_grad_flows():
    """all_to_all is differentiable: gradients through the sequence-parallel
    attention must match the plain path (training-path requirement)."""
    import jax
    import jax.numpy as jnp
    from fantasy_world_tpu.ops.attention import dot_product_attention
    from fantasy_world_tpu.parallel.ulysses import ulysses_attention

    mesh = _mesh_or_skip(data=2, seq=4)
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((2, 64, 8, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 64, 8, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 64, 8, 32)), jnp.float32)

    g_ref = jax.grad(lambda q: dot_product_attention(q, k, v).sum())(q)
    g_uly = jax.grad(lambda q: ulysses_attention(q, k, v, mesh=mesh).sum())(q)
    np.testing.assert_allclose(np.asarray(g_uly), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
