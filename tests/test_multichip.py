"""Sharded-vs-single-device numerical equality of joint_forward.

Runs the fusion forward twice on the 8-virtual-device CPU mesh -- once
replicated (no mesh constraints) and once sharded over
('data','seq','model') with params partitioned and activations constrained
-- and asserts the outputs agree. This is the correctness check for the
GSPMD re-design of the reference's Ulysses sequence parallelism
(diffsynth_wan21/pipelines/wan_video.py:808-830): the collectives XLA
inserts must not change the math.
"""
import numpy as np
import pytest

import conftest  # noqa: F401

pytestmark = [pytest.mark.parity, pytest.mark.multichip]


def test_joint_forward_sharded_equality():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fantasy_world_tpu.models.fusion.model import (
        init_fusion, split_trainable, joint_forward)
    from fantasy_world_tpu.parallel.sharding import (
        make_mesh, param_specs, stacked_specs, shard_tree)
    from __graft_entry__ import _demo_config

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")

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

    # single-device (replicated) reference
    ref, _ = jax.jit(lambda: joint_forward(lite, scan, cfg, lat, t, ctx,
                                           clip, y, plucker_fea=pl))()
    ref = np.asarray(ref)

    mesh = make_mesh(data=2, seq=2, model=2)
    with mesh:
        lite_s = shard_tree(lite, mesh, param_specs(lite, mesh=mesh))
        scan_s = shard_tree(scan, mesh, stacked_specs(scan, mesh=mesh))
        sh = NamedSharding(mesh, P("data"))
        args = [jax.device_put(a, sh) for a in (lat, y, ctx, clip, pl)]
        lat_s, y_s, ctx_s, clip_s, pl_s = args

        def fwd(lp, sp, l, t, c, cl, yy, pf):
            n, _ = joint_forward(lp, sp, cfg, l, t, c, cl, yy,
                                 plucker_fea=pf, mesh=mesh)
            return n
        out = jax.jit(fwd)(lite_s, scan_s, lat_s, t, ctx_s, clip_s, y_s,
                           pl_s)
        out = np.asarray(out)

    assert np.isfinite(out).all()
    # identical math up to reduction-order differences from the collectives
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_joint_forward_sharded_equality_int8():
    """int8 w8a8 params must shard like their float originals (kernel_q
    column/row-parallel with kscale following the output channels --
    parallel/sharding.py PARAM_RULES) and produce the same numbers sharded
    as replicated: the dynamic per-token absmax reduces over the
    contraction axis, so under row-parallel sharding XLA must all-reduce
    the max before quantizing and all-reduce the int32 partials after."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fantasy_world_tpu.core.quant import count_quantized, quantize_tree
    from fantasy_world_tpu.models.fusion.model import (
        init_fusion, split_trainable, joint_forward)
    from fantasy_world_tpu.parallel.sharding import (
        make_mesh, param_specs, stacked_specs, shard_tree, spec_for_path)
    from __graft_entry__ import _demo_config

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")

    assert spec_for_path("dit/blocks/0/self_attn/q/kernel_q") == \
        P(None, "model")
    assert spec_for_path("dit/blocks/0/self_attn/q/kscale") == P("model")
    assert spec_for_path("dit/blocks/0/ffn/fc2/kernel_q") == \
        P("model", None)
    assert spec_for_path("dit/blocks/0/ffn/fc2/kscale") == P()

    cfg = _demo_config(dim=64, layers=3, start_index=1, agg_dim=64,
                       agg_depth=2)
    params = init_fusion(0, cfg, jnp.float32)
    lite, scan = split_trainable(params, cfg)
    lite = quantize_tree(lite, min_dim=16)
    scan = quantize_tree(scan, min_dim=16)
    assert count_quantized(scan) > 0

    B, f, h2, w2 = 2, 2, 8, 8
    rng = np.random.default_rng(1)
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

    mesh = make_mesh(data=2, seq=2, model=2)
    with mesh:
        lite_s = shard_tree(lite, mesh, param_specs(lite, mesh=mesh))
        scan_s = shard_tree(scan, mesh, stacked_specs(scan, mesh=mesh))
        sh = NamedSharding(mesh, P("data"))
        lat_s, y_s, ctx_s, clip_s, pl_s = (
            jax.device_put(a, sh) for a in (lat, y, ctx, clip, pl))

        def fwd(lp, sp, l, t, c, cl, yy, pf):
            n, _ = joint_forward(lp, sp, cfg, l, t, c, cl, yy,
                                 plucker_fea=pf, mesh=mesh)
            return n
        out = np.asarray(jax.jit(fwd)(lite_s, scan_s, lat_s, t, ctx_s,
                                      clip_s, y_s, pl_s))

    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_pipeline_denoise_sharded_equality():
    """FantasyWorldPipeline.shard(mesh) + denoise(mesh=...) — the CLI/serve
    multi-chip path — must reproduce the single-device denoise: shard()
    splits lite/scan and partitions params, denoise() places the encoder
    outputs on the mesh, and the mesh-spanning scan must not change the
    math."""
    import jax
    import jax.numpy as jnp
    from fantasy_world_tpu.models.fusion.model import init_fusion
    from fantasy_world_tpu.pipelines.wan_video import FantasyWorldPipeline
    from fantasy_world_tpu.parallel.sharding import make_mesh
    from __graft_entry__ import _demo_config

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")

    cfg = _demo_config(dim=64, layers=3, start_index=1, agg_dim=64,
                       agg_depth=2)
    params = init_fusion(0, cfg, jnp.float32)

    f, h, w = 2, 64, 64
    ctx_pos = jnp.zeros((1, 16, 4096), jnp.float32)
    ctx_neg = jnp.ones((1, 16, 4096), jnp.float32) * 0.01
    clip = jnp.zeros((1, 257, 1280), jnp.float32)
    y = jnp.zeros((1, 20, f, h // 8, w // 8), jnp.float32)
    pl = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, f * (h // 16) * (w // 16), 2048)) * 0.1, jnp.float32)
    kw = dict(num_frames=4 * (f - 1) + 1, num_inference_steps=2, seed=7,
              plucker_fea=pl)

    pipe = FantasyWorldPipeline(cfg=cfg, params={"fusion": params})
    lat_ref, pred_ref = pipe.denoise(ctx_pos, ctx_neg, clip, y, h, w, **kw)

    mesh = make_mesh(data=2, seq=2, model=2)
    pipe_s = FantasyWorldPipeline(cfg=cfg, params={"fusion": params})
    pipe_s.shard(mesh)
    lat_s, pred_s = pipe_s.denoise(ctx_pos, ctx_neg, clip, y, h, w,
                                   mesh=mesh, **kw)

    np.testing.assert_allclose(np.asarray(lat_s, np.float32),
                               np.asarray(lat_ref, np.float32),
                               rtol=2e-4, atol=2e-4)
    for k in pred_ref:
        np.testing.assert_allclose(np.asarray(pred_s[k], np.float32),
                                   np.asarray(pred_ref[k], np.float32),
                                   rtol=5e-4, atol=5e-4)


def test_distributed_bootstrap_single_host():
    """initialize() must no-op on a single host and report sane topology."""
    from fantasy_world_tpu.parallel import distributed

    assert distributed.initialize() is False     # no coordinator env -> no-op
    info = distributed.runtime_info()
    assert info["process_count"] == 1
    assert info["global_device_count"] >= 1
    assert not info["initialized"]
