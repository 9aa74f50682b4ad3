"""LoRA fine-tuning: factor init/apply algebra + one training step.

The reference only merges pre-trained LoRA into weights at load
(fusion/model_wan22.py:18-118 -> convert/lora.py); training/lora.py adds
the producing side. These tests pin the algebra (zero-init up == identity
merge, delta placement, untargeted leaves untouched) and run one real
optimizer step at the dryrun-scale config.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _setup(dtype=jnp.float32):
    from fantasy_world_tpu.utils.demo import demo_config
    from fantasy_world_tpu.models.fusion.model import (init_fusion,
                                                       split_trainable)
    cfg = demo_config(dim=32, layers=2, start_index=1, agg_dim=32)
    params = init_fusion(0, cfg, dtype)
    lite, scan = split_trainable(params, cfg)
    return cfg, lite, scan


def test_lora_init_targets_and_identity():
    from fantasy_world_tpu.training.lora import init_lora, apply_lora

    _, _, scan = _setup()
    lora = init_lora(1, scan, rank=4)
    # every target is a stacked kernel of a named DiT component
    for path, entry in lora.items():
        assert path.endswith("/kernel")
        assert any(t in path.split("/") for t in
                   ("self_attn", "cross_attn", "ffn"))
        assert entry["down"].ndim == 3 and entry["down"].shape[-1] == 4
        assert entry["up"].ndim == 3 and entry["up"].shape[-2] == 4
        assert not np.any(np.asarray(entry["up"]))       # zero-init
    # zero-init up => merge is the identity
    merged = apply_lora(scan, lora, alpha=7.0)
    for a, b in zip(jax.tree_util.tree_leaves(merged),
                    jax.tree_util.tree_leaves(scan)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_apply_delta_placement():
    from fantasy_world_tpu.training.lora import init_lora, apply_lora

    _, _, scan = _setup()
    rank, alpha = 4, 2.0
    lora = init_lora(1, scan, rank=rank, targets=("self_attn",))
    lora = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), lora)
    merged = apply_lora(scan, lora, alpha=alpha)

    flat_orig = jax.tree_util.tree_flatten_with_path(scan)[0]
    flat_merge = jax.tree_util.tree_leaves(merged)
    from fantasy_world_tpu.training.lora import _path_str
    for (path, orig), new in zip(flat_orig, flat_merge):
        ps = _path_str(path)
        orig, new = np.asarray(orig, np.float32), np.asarray(new, np.float32)
        if ps in lora:
            # down=ones (L,d_in,r), up=ones (L,r,d_out):
            # (down @ up)[l,i,o] = sum_r 1*1 = rank, * alpha/rank = alpha
            np.testing.assert_allclose(new - orig,
                                       np.full_like(orig, alpha), atol=1e-5)
        else:
            np.testing.assert_array_equal(new, orig)


def test_lora_train_step_updates_factors_only():
    import optax
    from fantasy_world_tpu.training.lora import (init_lora,
                                                 make_lora_train_step)
    from fantasy_world_tpu.schedulers import FlowMatchScheduler

    cfg, lite, scan = _setup()
    lora = init_lora(1, scan, rank=2)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(lora)
    step = jax.jit(make_lora_train_step(cfg, opt, alpha=1.0, remat=False),
                   donate_argnums=(0, 1))

    B, f, h2, w2 = 1, 2, 8, 8
    rng = np.random.default_rng(0)
    sched = FlowMatchScheduler().set_timesteps(1000)
    batch = {
        "clean_latents": jnp.asarray(
            rng.standard_normal((B, 16, f, h2, w2)), jnp.float32),
        "noise": jnp.asarray(
            rng.standard_normal((B, 16, f, h2, w2)), jnp.float32),
        "sigma": jnp.float32(sched.sigmas[10]),
        "timestep": jnp.full((B,), float(sched.timesteps[10]), jnp.float32),
        "context": jnp.asarray(
            rng.standard_normal((B, 16, 4096)) * 0.02, jnp.float32),
        "clip_feature": jnp.asarray(
            rng.standard_normal((B, 257, 1280)) * 0.02, jnp.float32),
        "y": jnp.asarray(rng.standard_normal((B, 20, f, h2, w2)), jnp.float32),
        "plucker_fea": jnp.asarray(
            rng.standard_normal((B, f * (h2 // 2) * (w2 // 2), 2048)) * 0.02,
            jnp.float32),
    }
    lora2, opt_state, loss = step(lora, opt_state, (lite, scan), batch)
    assert np.isfinite(float(loss))
    # zero-init up gets a gradient through down's nonzero activations: at
    # least the up factors must move
    moved = any(np.any(np.asarray(e["up"])) for e in lora2.values())
    assert moved, "no LoRA factor changed after one step"
