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


def test_pp_loss_matches_sequential_with_i2v_conditioning():
    """clip_feature/y conditioning (the deploy has_image_input +
    require_vae_embedding config, what real-data PP batches carry) flows
    through the pipeline path identically to the sequential forward, with
    per-sample sigma."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from fantasy_world_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                                  wan_dit_forward)
    from fantasy_world_tpu.training.pp import (pp_flow_match_loss,
                                               split_dit_trainable)

    L, B, F, H, W = 4, 4, 3, 4, 6
    lat_ch = 8
    # in_dim is the CONCATENATED channel count: latents + y (i2v concat)
    cfg = WanDiTConfig(dim=96, in_dim=2 * lat_ch, ffn_dim=128, out_dim=8,
                       text_dim=32, freq_dim=64, patch_size=(1, 2, 2),
                       num_heads=4, num_layers=L, has_image_input=True,
                       require_vae_embedding=True, clip_feature_dim=48)
    params = init_wan_dit(0, cfg, jnp.float32)
    lite, blocks = split_dit_trainable(params)
    rng = np.random.default_rng(3)
    batch = _batch(cfg, B, F, H, W, rng)
    for k in ("clean_latents", "noise"):
        batch[k] = jnp.asarray(
            rng.standard_normal((B, lat_ch, F, H, W)), jnp.float32)
    batch["sigma"] = jnp.asarray(
        rng.uniform(0.2, 0.9, (B, 1, 1, 1, 1)), jnp.float32)
    clip_feature = jnp.asarray(
        rng.standard_normal((B, 257, cfg.clip_feature_dim)), jnp.float32)
    y = jnp.asarray(
        rng.standard_normal((B, lat_ch, F, H, W)), jnp.float32)

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("pipe",))
    loss_pp = pp_flow_match_loss(lite, blocks, cfg, mesh=mesh,
                                 microbatches=2, clip_feature=clip_feature,
                                 y=y, **batch)

    p = dict(lite)
    p["blocks"] = [jax.tree_util.tree_map(lambda a: a[i], blocks)
                   for i in range(L)]
    noisy = ((1 - batch["sigma"]) * batch["clean_latents"]
             + batch["sigma"] * batch["noise"])
    pred = wan_dit_forward(p, cfg, noisy, batch["timestep"],
                           batch["context"], clip_feature=clip_feature, y=y)
    target = batch["noise"] - batch["clean_latents"]
    loss_seq = jnp.mean(jnp.square(pred - target))
    np.testing.assert_allclose(float(loss_pp), float(loss_seq),
                               rtol=2e-5, atol=2e-6)


def test_pp_data_batches_stacking(monkeypatch):
    """cli.train._pp_data_batches: stacks M x data single-clip batches from
    training/data.py into one PP batch -- per-sample sigma (B,1,1,1,1),
    concatenated conditioning, plucker dropped."""
    import types
    import jax
    import jax.numpy as jnp
    import numpy as np_
    from jax.sharding import Mesh
    from fantasy_world_tpu.cli import train as train_cli

    def fake_clips(pipe, args, with_plucker=True):
        # the PP path must NOT compute the plucker embedding: its pipeline
        # is encoder-only (no fusion tree), so encode_plucker would KeyError
        assert with_plucker is False
        i = 0
        while True:
            i += 1
            if i == 3:
                # a short clip (fewer latent frames): must be SKIPPED, not
                # crash the concatenate
                yield {"clean_latents": jnp.zeros((1, 4, 1, 4, 4)),
                       "noise": jnp.zeros((1, 4, 1, 4, 4)),
                       "sigma": jnp.float32(0.9),
                       "timestep": jnp.full((1,), 999.0),
                       "context": jnp.zeros((1, 8, 16)),
                       "clip_feature": jnp.zeros((1, 257, 12)),
                       "y": jnp.zeros((1, 4, 1, 4, 4))}
                continue
            yield {
                "clean_latents": jnp.full((1, 4, 2, 4, 4), float(i)),
                "noise": jnp.zeros((1, 4, 2, 4, 4)),
                "sigma": jnp.float32(0.1 * i),
                "timestep": jnp.full((1,), 100.0 * i),
                "context": jnp.full((1, 8, 16), float(i)),
                "clip_feature": jnp.full((1, 257, 12), float(i)),
                "y": jnp.zeros((1, 4, 2, 4, 4)),
                "plucker_fea": jnp.zeros((1, 32, 8)),   # must be dropped
            }

    monkeypatch.setattr(train_cli, "_data_batches", fake_clips)
    monkeypatch.setattr(train_cli, "_clip_dirs",
                        lambda root: ["c1", "c2", "c3", "c4", "c5"])
    # ref latent shape derives from --frames/--height/--width + z_dim, not
    # from the first clip seen: (frames-1)//4+1 = 2, 32//8 = 4
    args = types.SimpleNamespace(pipe_microbatches=2, mesh_data=2,
                                 frames=5, height=32, width=32,
                                 data_root="unused")
    pipe = types.SimpleNamespace(vae_cfg=types.SimpleNamespace(z_dim=4))
    mesh = Mesh(np_.asarray(jax.devices()[:4]).reshape(2, 2),
                ("pipe", "data"))
    batch = next(train_cli._pp_data_batches(pipe, args, mesh))

    assert "plucker_fea" not in batch
    assert batch["clean_latents"].shape == (4, 4, 2, 4, 4)
    assert batch["context"].shape == (4, 8, 16)
    assert batch["clip_feature"].shape == (4, 257, 12)
    assert batch["sigma"].shape == (4, 1, 1, 1, 1)
    # clip 3 (short, mismatched latent shape) was skipped, order preserved
    np_.testing.assert_allclose(np_.asarray(batch["sigma"]).ravel(),
                                [0.1, 0.2, 0.4, 0.5], rtol=1e-6)
    np_.testing.assert_allclose(np_.asarray(batch["timestep"]),
                                [100.0, 200.0, 400.0, 500.0])
    np_.testing.assert_allclose(
        np_.asarray(batch["clean_latents"])[:, 0, 0, 0, 0], [1, 2, 4, 5])


def test_pipeline_constructs_encoder_only():
    """FantasyWorldPipeline without a fusion tree (the PP trainer's batch
    builder) constructs and reports the encoder dtype."""
    import jax.numpy as jnp
    from fantasy_world_tpu.models.fusion.model import FusionConfig
    from fantasy_world_tpu.pipelines.wan_video import FantasyWorldPipeline

    pipe = FantasyWorldPipeline(
        cfg=FusionConfig(),
        params={"vae": {"w": jnp.zeros((2, 2), jnp.bfloat16)}})
    assert pipe._scan_params is None
    assert pipe.param_dtype() == jnp.bfloat16


def test_pp_train_composes_with_model_tp_axis():
    """data=2 x pipe=2 x model=2: the block stack sharded P('pipe', <TP
    rules over 'model'>), batch over 'data' -- the composition the driver
    dryrun's stage 3 reproduces (pipe is the only MANUAL shard_map axis;
    'data'/'model' stay GSPMD-auto inside each stage). Loss and updated
    params must equal the sequential reference."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from fantasy_world_tpu.models.wan.dit import init_wan_dit, wan_dit_forward
    from fantasy_world_tpu.parallel.sharding import stacked_specs
    from fantasy_world_tpu.training.pp import (make_pp_train_step,
                                               split_dit_trainable)

    L, B, F, H, W = 4, 4, 3, 4, 6
    cfg = _tiny_cfg(L)
    params = init_wan_dit(0, cfg, jnp.float32)
    lite, blocks = split_dit_trainable(params)
    batch = _batch(cfg, B, F, H, W, np.random.default_rng(7))

    import jax as _jax
    devs = np.asarray(_jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "pipe", "model"))

    # TP specs for the stacked block tree (paths like self_attn/q/kernel get
    # the megatron rules via the dit/blocks prefix), with the leading layer
    # axis re-pinned to 'pipe' (stacked_specs leaves it None for lax.scan)
    is_spec = lambda x: isinstance(x, P)  # noqa: E731
    specs = stacked_specs(blocks, strip_prefix="dit/blocks/0/", mesh=mesh)
    specs = jax.tree_util.tree_map(lambda s: P("pipe", *list(s)[1:]), specs,
                                   is_leaf=is_spec)
    flat = jax.tree_util.tree_leaves(specs, is_leaf=is_spec)
    assert any("model" in s for s in flat), "TP rules matched no block param"
    blocks_sh = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), blocks,
        specs, is_leaf=is_spec)
    lite_sh = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), lite)
    sharded_batch = dict(batch)
    for k in ("clean_latents", "noise", "context"):
        sharded_batch[k] = jax.device_put(
            batch[k], NamedSharding(mesh, P("data")))

    opt = optax.sgd(1e-2)
    trainable = (lite_sh, blocks_sh)
    opt_state = opt.init(trainable)
    step = make_pp_train_step(cfg, opt, mesh=mesh, microbatches=2)
    (lite2, blocks2), _, loss_pp = jax.jit(step)(
        trainable, opt_state, sharded_batch)

    def seq_loss(tr):
        lt, bl = tr
        p = dict(lt)
        p["blocks"] = [jax.tree_util.tree_map(lambda a: a[i], bl)
                       for i in range(L)]
        noisy = ((1 - batch["sigma"]) * batch["clean_latents"]
                 + batch["sigma"] * batch["noise"])
        pred = wan_dit_forward(p, cfg, noisy, batch["timestep"],
                               batch["context"])
        target = batch["noise"] - batch["clean_latents"]
        return jnp.mean(jnp.square(pred.astype(jnp.float32)
                                   - target.astype(jnp.float32)))

    loss_seq, grads_seq = jax.value_and_grad(seq_loss)((lite, blocks))
    np.testing.assert_allclose(float(loss_pp), float(loss_seq),
                               rtol=2e-5, atol=2e-6)
    updates, _ = opt.update(grads_seq, opt.init((lite, blocks)),
                            (lite, blocks))
    lite_ref, blocks_ref = optax.apply_updates((lite, blocks), updates)
    for got, want in [(lite2, lite_ref), (blocks2, blocks_ref)]:
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6),
            got, want)
