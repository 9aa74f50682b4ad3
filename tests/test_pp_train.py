"""Pipeline-parallel DiT training step == sequential training step.

Covers training/pp.py: the GPipe-scheduled flow-match step on a
('pipe','data') mesh must produce the same loss, gradients and parameter
update as the plain sequential stack (wan_dit_forward), proving the
pipeline path is a pure execution-layout change.
"""
import numpy as np

import conftest  # noqa: F401


def _tiny_cfg(L):
    from fantasy_world_tpu.models.wan.dit import WanDiTConfig
    return WanDiTConfig(dim=96, in_dim=8, ffn_dim=128, out_dim=8,
                        text_dim=32, freq_dim=64, patch_size=(1, 2, 2),
                        num_heads=4, num_layers=L, has_image_input=False)


def _batch(cfg, B, F, H, W, rng):
    import jax.numpy as jnp
    return dict(
        clean_latents=jnp.asarray(
            rng.standard_normal((B, cfg.in_dim, F, H, W)), jnp.float32),
        noise=jnp.asarray(
            rng.standard_normal((B, cfg.in_dim, F, H, W)), jnp.float32),
        sigma=jnp.float32(0.7),
        timestep=jnp.full((B,), 500.0, jnp.float32),
        context=jnp.asarray(
            rng.standard_normal((B, 20, cfg.text_dim)), jnp.float32),
    )


def test_pp_train_step_matches_sequential():
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
    from fantasy_world_tpu.models.wan.dit import init_wan_dit, wan_dit_forward
    from fantasy_world_tpu.training.pp import (make_pp_train_step,
                                               split_dit_trainable)

    L, B, F, H, W = 4, 4, 3, 4, 6
    cfg = _tiny_cfg(L)
    params = init_wan_dit(0, cfg, jnp.float32)
    trainable = split_dit_trainable(params)
    batch = _batch(cfg, B, F, H, W, np.random.default_rng(0))

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("pipe", "data"))
    opt = optax.sgd(1e-2)
    opt_state = opt.init(trainable)

    step = make_pp_train_step(cfg, opt, mesh=mesh, microbatches=2)
    (lite2, blocks2), opt_state2, loss_pp = jax.jit(step)(
        trainable, opt_state, batch)

    # sequential reference: same trainable, plain unstacked forward
    def seq_loss(tr):
        lite, blocks = tr
        p = dict(lite)
        p["blocks"] = [jax.tree_util.tree_map(lambda a: a[i], blocks)
                       for i in range(L)]
        noisy = ((1 - batch["sigma"]) * batch["clean_latents"]
                 + batch["sigma"] * batch["noise"])
        pred = wan_dit_forward(p, cfg, noisy, batch["timestep"],
                               batch["context"])
        target = batch["noise"] - batch["clean_latents"]
        return jnp.mean(jnp.square(pred.astype(jnp.float32)
                                   - target.astype(jnp.float32)))

    loss_seq, grads_seq = jax.value_and_grad(seq_loss)(trainable)
    np.testing.assert_allclose(float(loss_pp), float(loss_seq),
                               rtol=2e-5, atol=2e-6)

    updates, _ = opt.update(grads_seq, opt.init(trainable), trainable)
    lite_ref, blocks_ref = optax.apply_updates(trainable, updates)
    for got, want in [(lite2, lite_ref), (blocks2, blocks_ref)]:
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6),
            got, want)

    # data-sharded inputs keep working (GSPMD over 'data' inside stages)
    sharded = dict(batch)
    for k in ("clean_latents", "noise", "context"):
        sharded[k] = jax.device_put(
            batch[k], NamedSharding(mesh, P("data")))
    _, _, loss_sh = jax.jit(step)(trainable, opt_state, sharded)
    np.testing.assert_allclose(float(loss_sh), float(loss_seq),
                               rtol=2e-5, atol=2e-6)


def test_split_dit_trainable_rejects_heterogeneous_stack():
    import jax.numpy as jnp
    import pytest
    from fantasy_world_tpu.models.wan.dit import init_wan_dit
    from fantasy_world_tpu.training.pp import split_dit_trainable

    cfg = _tiny_cfg(4)
    params = init_wan_dit(0, cfg, jnp.float32)
    params["blocks"][2] = dict(params["blocks"][2],
                               extra_adapter={"w": jnp.zeros((3,))})
    with pytest.raises(ValueError, match="homogeneous"):
        split_dit_trainable(params)
