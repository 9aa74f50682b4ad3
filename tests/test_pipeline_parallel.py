"""Pipeline parallelism: the ppermute GPipe schedule must be EQUAL to the
sequential block stack -- forward and gradients (parallel/pipeline.py goes
beyond the reference, which ships no PP; SURVEY §2.9)."""
import numpy as np
import pytest

import conftest  # noqa: F401  (8 virtual CPU devices)

pytestmark = pytest.mark.multichip

S, L, M = 4, 8, 2      # stages, stacked blocks, microbatches


def test_pipeline_toy_forward_and_grad_equality():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from fantasy_world_tpu.parallel.pipeline import (make_pipe_mesh,
                                                     pipeline_apply)

    assert jax.device_count() >= S
    rng = np.random.default_rng(0)
    D = 16
    params = {
        "kernel": jnp.asarray(rng.standard_normal((L, D, D)) * 0.3,
                              jnp.float32),
        "bias": jnp.asarray(rng.standard_normal((L, D)) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((4, 6, D)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((4, 1, D)) * 0.2, jnp.float32)

    def block(k, b, sc, h):
        return jnp.tanh(h @ k + b) * (1.0 + sc) + h

    def stage(stage_p, h, sc):
        def body(hc, bp):
            return block(bp["kernel"], bp["bias"], sc, hc), None
        return lax.scan(body, h, stage_p)[0]

    def sequential(p, x, sc):
        def body(hc, bp):
            return block(bp["kernel"], bp["bias"], sc, hc), None
        return lax.scan(body, x, p)[0]

    mesh = make_pipe_mesh(S)
    ref = sequential(params, x, scale)
    out = pipeline_apply(stage, params, x, per_mb_args=(scale,),
                         mesh=mesh, microbatches=M)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # gradient equality: PP is for TRAINING, so d(loss)/d(params) through
    # the ppermute schedule must match the sequential stack
    def loss_pp(p):
        return jnp.sum(jnp.square(pipeline_apply(
            stage, p, x, per_mb_args=(scale,), mesh=mesh, microbatches=M)))

    def loss_seq(p):
        return jnp.sum(jnp.square(sequential(p, x, scale)))

    g_pp = jax.grad(loss_pp)(params)
    g_seq = jax.grad(loss_seq)(params)
    for k in params:
        np.testing.assert_allclose(np.asarray(g_pp[k]), np.asarray(g_seq[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)


def test_pipeline_dit_blocks_equality():
    """The real Wan DiT block stack through 4 pipeline stages == the
    sequential scan (f32, tiny dims, real attention/FFN/modulation)."""
    import jax.numpy as jnp
    from jax import lax
    from fantasy_world_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                                  dit_block_apply)
    from fantasy_world_tpu.ops import rope as rope_ops
    from fantasy_world_tpu.core.params import stack_trees
    from fantasy_world_tpu.parallel.pipeline import (make_pipe_mesh,
                                                     pipeline_dit_blocks)

    cfg = WanDiTConfig(dim=96, in_dim=8, ffn_dim=128, out_dim=4, text_dim=32,
                       freq_dim=64, patch_size=(1, 2, 2), num_heads=4,
                       num_layers=L, has_image_input=False)
    params = init_wan_dit(0, cfg, jnp.float32)
    blocks = stack_trees(params["blocks"])

    rng = np.random.default_rng(1)
    B, Ltok = 4, 3 * 4 * 6
    x = jnp.asarray(rng.standard_normal((B, Ltok, cfg.dim)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((B, 20, cfg.dim)), jnp.float32)
    t_mod = jnp.asarray(rng.standard_normal((B, 6, cfg.dim)), jnp.float32)
    ang = rope_ops.build_angles_3d(cfg.head_dim, 3, 4, 6)
    cos, sin = rope_ops.cos_sin_half_from_angles(ang)

    def sequential(h):
        def body(hc, bp):
            return dit_block_apply(bp, hc, ctx, t_mod, cos, sin, cfg), None
        return lax.scan(body, h, blocks)[0]

    ref = sequential(x)
    out = pipeline_dit_blocks(blocks, cfg, x, ctx, t_mod, cos, sin,
                              mesh=make_pipe_mesh(S), microbatches=M)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_composes_with_gspmd_axes():
    """The documented 4-D-mesh composition: 'pipe' is the only MANUAL axis
    (shard_map axis_names={'pipe'}); other mesh axes stay GSPMD-auto inside
    the stage, so a bare-PartitionSpec sharding constraint over 'data'
    works and the result still equals the sequential reference."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from fantasy_world_tpu.parallel.pipeline import pipeline_apply

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("pipe", "data"))
    L, B, D = 4, 4, 8
    ps = jnp.asarray(np.random.default_rng(0).standard_normal((L, D)),
                     jnp.float32) * 0.1
    x = jnp.asarray(np.random.default_rng(1).standard_normal((B, D)),
                    jnp.float32)
    # shard the input batch over 'data' as a real DP deployment would
    x = jax.device_put(x, NamedSharding(mesh, P("data", None)))

    def stage(stage_p, h):
        def body(hc, w):
            hc = lax.with_sharding_constraint(hc, P("data", None))
            return jnp.tanh(hc + w), None
        return lax.scan(body, h, stage_p)[0]

    ref = x
    for i in range(L):
        ref = jnp.tanh(ref + ps[i])

    out = pipeline_apply(stage, ps, x, mesh=mesh, axis="pipe",
                         microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
