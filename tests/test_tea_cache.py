"""TeaCache: host skip-schedule parity vs the reference recurrence, and
the lax.cond-gated forward vs the plain joint forward."""
import numpy as np
import pytest

import conftest


def test_plan_skips_matches_reference_recurrence():
    """Replay the reference TeaCache.check accumulate-and-reset logic
    (wan_video.py:716-733) in pure numpy and compare decisions."""
    from fantasy_world_tpu.pipelines.tea_cache import (
        TEACACHE_COEFFICIENTS, plan_skips)

    rng = np.random.RandomState(0)
    n = 50
    drift = np.abs(rng.randn(n)).astype(np.float64) * 0.05
    drift[0] = 0.0
    coeffs = TEACACHE_COEFFICIENTS["Wan2.1-I2V-14B-480P"]
    poly = np.poly1d(coeffs)
    thresh = 0.05

    # oracle: direct transcription of the reference's stateful check()
    acc, expected = 0.0, []
    for step in range(n):
        if step == 0 or step == n - 1:
            should_calc = True
            acc = 0.0
        else:
            acc += poly(drift[step])
            if acc < thresh:
                should_calc = False
            else:
                should_calc = True
                acc = 0.0
        expected.append(not should_calc)

    got = plan_skips(drift, thresh, "Wan2.1-I2V-14B-480P")
    assert got.tolist() == expected
    assert not got[0] and not got[-1]
    assert got.any(), "threshold 0.05 should skip at least one step here"


def test_plan_skips_vs_reference_class():
    """Drive the actual reference TeaCache object with identical t_mod
    tensors and assert the same skip decisions."""
    if not conftest.reference_available():
        pytest.skip("reference repo unavailable")
    conftest.add_reference_to_path()
    import torch
    from FantasyWorld.diffsynth_wan21.pipelines.wan_video import TeaCache

    from fantasy_world_tpu.pipelines.tea_cache import (
        modulation_drift_schedule, plan_skips)

    rng = np.random.RandomState(3)
    n = 12
    t_mods = rng.randn(n, 1, 6, 32).astype(np.float32)

    ref = TeaCache(n, rel_l1_thresh=0.05, model_id="Wan2.1-I2V-14B-480P")
    ref_skips = []
    for i in range(n):
        x = torch.zeros(1, 4, 8)
        skipped = ref.check(None, x, torch.from_numpy(t_mods[i]))
        ref_skips.append(bool(skipped))
        if not skipped:
            ref.store(x + 1.0)   # keep internal state machine consistent

    drift = modulation_drift_schedule(t_mods)
    got = plan_skips(drift, 0.05, "Wan2.1-I2V-14B-480P")
    assert got.tolist() == ref_skips


@pytest.mark.parity
def test_joint_forward_tea_gating():
    """skip=False must equal joint_forward exactly (same stack, residual =
    out-in); skip=True must equal prologue + residual + head."""
    import jax
    import jax.numpy as jnp
    from fantasy_world_tpu.models.fusion.model import (
        init_fusion, prepare_scan_params, joint_forward, joint_forward_tea)
    from __graft_entry__ import _demo_config

    cfg = _demo_config(dim=64, layers=3, start_index=1, agg_dim=64,
                       agg_depth=2)
    params = init_fusion(0, cfg, jnp.float32)
    scan = prepare_scan_params(params, cfg)

    B, f, h2, w2 = 2, 2, 8, 8
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, 16, f, h2, w2))
    y = jnp.zeros((B, 20, f, h2, w2))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 16, 4096)) * 0.02
    clip = jnp.zeros((B, 257, 1280))
    pl = jnp.zeros((B, f * (h2 // 2) * (w2 // 2), 2048))
    t = jnp.full((B,), 500.0)
    n_tok = f * (h2 // 2) * (w2 // 2)
    res0 = jnp.zeros((B, n_tok, cfg.dit.dim))

    ref_noise, _ = jax.jit(
        lambda: joint_forward(params, scan, cfg, lat, t, ctx, clip, y,
                              plucker_fea=pl))()

    fwd_tea = jax.jit(lambda skip, res: joint_forward_tea(
        params, scan, cfg, lat, t, ctx, clip, y, plucker_fea=pl,
        skip=skip, residual=res))
    noise_c, res_c = fwd_tea(jnp.asarray(False), res0)
    np.testing.assert_allclose(np.asarray(noise_c), np.asarray(ref_noise),
                               atol=1e-5)
    assert float(jnp.abs(res_c).max()) > 0

    # skipping with the just-computed residual reproduces the compute path
    # bit-for-bit at the same timestep/latents
    noise_s, res_s = fwd_tea(jnp.asarray(True), res_c)
    np.testing.assert_allclose(np.asarray(noise_s), np.asarray(noise_c),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(res_s), np.asarray(res_c))


@pytest.mark.multichip
def test_joint_forward_tea_sharded_equality():
    """The tea-gated forward must give the same answer on the 8-device mesh
    (params sharded, activations constrained, both cond branches keeping the
    token sharding) as replicated single-device -- for the compute branch
    AND the reuse branch, whose carried residual is itself sharded."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fantasy_world_tpu.models.fusion.model import (
        init_fusion, split_trainable, joint_forward_tea)
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
    rng = np.random.default_rng(7)
    lat = jnp.asarray(rng.standard_normal((B, 16, f, h2, w2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, 20, f, h2, w2)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((B, 16, 4096)) * 0.02, jnp.float32)
    clip = jnp.zeros((B, 257, 1280), jnp.float32)
    pl = jnp.asarray(rng.standard_normal(
        (B, f * (h2 // 2) * (w2 // 2), 2048)) * 0.1, jnp.float32)
    t = jnp.full((B,), 500.0)
    n_tok = f * (h2 // 2) * (w2 // 2)
    res0 = jnp.zeros((B, n_tok, cfg.dit.dim), jnp.float32)

    ref_fwd = jax.jit(lambda skip, res: joint_forward_tea(
        params, scan, cfg, lat, t, ctx, clip, y, plucker_fea=pl,
        skip=skip, residual=res))
    ref_c, rres_c = ref_fwd(jnp.asarray(False), res0)
    ref_s, _ = ref_fwd(jnp.asarray(True), rres_c)
    ref_c, ref_s = np.asarray(ref_c), np.asarray(ref_s)

    mesh = make_mesh(data=2, seq=2, model=2)
    with mesh:
        lite_m = shard_tree(lite, mesh, param_specs(lite, mesh=mesh))
        scan_m = shard_tree(scan, mesh, stacked_specs(scan, mesh=mesh))
        sh = NamedSharding(mesh, P("data"))
        lat_m, y_m, ctx_m, clip_m, pl_m, res_m = (
            jax.device_put(a, sh) for a in (lat, y, ctx, clip, pl, res0))

        def fwd(lp, sp, l, t, c, cl, yy, pf, skip, res):
            return joint_forward_tea(lp, sp, cfg, l, t, c, cl, yy,
                                     plucker_fea=pf, skip=skip,
                                     residual=res, mesh=mesh)
        jfwd = jax.jit(fwd)
        out_c, res_c = jfwd(lite_m, scan_m, lat_m, t, ctx_m, clip_m, y_m,
                            pl_m, jnp.asarray(False), res_m)
        out_s, _ = jfwd(lite_m, scan_m, lat_m, t, ctx_m, clip_m, y_m,
                        pl_m, jnp.asarray(True), res_c)

    np.testing.assert_allclose(np.asarray(out_c), ref_c, rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_s), ref_s, rtol=2e-4,
                               atol=2e-4)
