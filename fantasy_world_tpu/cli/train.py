"""Sharded flow-matching fine-tuning of the fusion model.

The reference ships no trainer for FantasyWorld -- only the single-process
loss utilities its Wan2.2 fork carries (diffsynth_wan22/pipelines/
wan_video_new.py:586-719 one_step / training_loss). This CLI is the
missing loop around this repo's pieces: per-block-remat train step over a
('data','seq','model') mesh (training/step.py), batch assembly through the
same conditioning encoders as inference (training/data.py), Orbax
save/resume of (trainable, opt_state, step), and Metrics/StepTimer logging.

Two data modes:
  * --data_root DIR: each clip subdirectory holds ``video.mp4`` (or a
    ``frames/`` image folder) + ``prompt.txt`` (+ optional ``poses.txt``
    RE10K camera file for the Plucker conditioning). Frames are
    center-crop-resized to --height/--width and truncated to --frames.
  * --synthetic: random latent/context batches at a reduced demo config --
    exercises the full sharded step + checkpoint machinery with no
    checkpoints or data on disk (what tests/test_train_cli.py runs on the
    8-device CPU mesh).

A third trainer mode, --pipe_stages S, fine-tunes the PLAIN video DiT
(a homogeneous block stack, unlike the fusion PCB/IRG mix) with the stack
itself sharded over a ('pipe','data') GPipe mesh -- see _run_pipe and
training/pp.py.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="fantasy-world-tpu trainer")
    p.add_argument("--data_root", type=str, default=None,
                   help="directory of clip subdirs (video.mp4|frames/ + "
                        "prompt.txt [+ poses.txt])")
    p.add_argument("--synthetic", action="store_true",
                   help="random batches at a reduced config (no ckpts/data)")
    p.add_argument("--wan_ckpt_path", type=str, default=None)
    p.add_argument("--model_ckpt", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--height", type=int, default=336)
    p.add_argument("--width", type=int, default=592)
    p.add_argument("--frames", type=int, default=81)
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_seq", type=int, default=1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--lora_rank", type=int, default=0,
                   help="train rank-N LoRA factors on the DiT projections "
                        "instead of full fine-tuning (base stays frozen); "
                        "the producing side of the reference's load-time "
                        "LoRA merge (fusion/model_wan22.py:18-118)")
    p.add_argument("--lora_alpha", type=float, default=1.0)
    p.add_argument("--lora_targets", type=str, default="self_attn,cross_attn,ffn",
                   help="comma-separated block-component names to adapt")
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="Orbax state dir; resumes if it already has a step")
    p.add_argument("--save_every", type=int, default=200)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of the train loop "
                        "into this directory (view with xprof)")
    p.add_argument("--pipe_stages", type=int, default=0,
                   help="GPipe pipeline-parallel stages for video-DiT-only "
                        "training (training/pp.py): shards the block stack "
                        "itself over a 'pipe' mesh axis, dividing block-"
                        "param + optimizer HBM by the stage count. 0 (the "
                        "default) = the fusion GSPMD trainer")
    p.add_argument("--pipe_microbatches", type=int, default=2,
                   help="microbatches marching through the pipeline per "
                        "step (bubble fraction = (S-1)/(M+S-1))")
    # synthetic-mode model scale (kept tiny so CPU smoke tests are cheap)
    p.add_argument("--demo_dim", type=int, default=128)
    p.add_argument("--demo_layers", type=int, default=2)
    p.add_argument("--demo_start_index", type=int, default=1)
    return p.parse_args(argv)


def _optimizer(args):
    import optax
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, args.lr, max(1, args.warmup)),
         optax.constant_schedule(args.lr)], [max(1, args.warmup)])
    return optax.adamw(sched, weight_decay=args.weight_decay)


def _checkpointer(path):
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer(), os.path.abspath(path)


def _save_state(ckpt, root, step, trainable, opt_state):
    path = os.path.join(root, f"step_{step:08d}")
    ckpt.save(path, {"trainable": trainable, "opt_state": opt_state,
                     "step": np.asarray(step, np.int64)}, force=True)
    ckpt.wait_until_finished()
    return path


def _latest_step(root):
    if not os.path.isdir(root):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(root)
             if d.startswith("step_") and d.split("_")[1].isdigit()]
    return max(steps) if steps else None


def _restore_state(ckpt, root, step, abstract):
    return ckpt.restore(os.path.join(root, f"step_{step:08d}"), abstract)


def _abstract_like(x):
    """Restore template preserving sharding: a concrete-array template makes
    Orbax place scalars on one device while mesh-sharded leaves land on the
    mesh, and jit then rejects the mixed device sets."""
    import jax
    if isinstance(x, jax.Array):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
    return x


def _resume_state(args, trainable, opt_state, log):
    """Orbax resume shared by both trainers: returns
    (start, ckpt, root, trainable, opt_state)."""
    import jax
    start = 0
    ckpt = root = None
    if args.checkpoint_dir:
        ckpt, root = _checkpointer(args.checkpoint_dir)
        latest = _latest_step(root)
        if latest is not None:
            abstract = {"trainable": jax.tree_util.tree_map(
                            _abstract_like, trainable),
                        "opt_state": jax.tree_util.tree_map(
                            _abstract_like, opt_state),
                        "step": np.asarray(0, np.int64)}
            state = _restore_state(ckpt, root, latest, abstract)
            trainable, opt_state = state["trainable"], state["opt_state"]
            start = int(state["step"])
            log.info("resumed from %s at step %d", root, start)
    return start, ckpt, root, trainable, opt_state


def _train_loop(args, step_fn, batches, trainable, opt_state, start, ckpt,
                root, log) -> float:
    """The step loop shared by both trainers: jitted donated step, host
    loss fetch (the dispatch barrier), metrics, non-finite guard, periodic
    Orbax save. Returns the final loss."""
    import time
    from ..utils.observability import Metrics, profile_trace

    metrics = Metrics()
    loss_val = float("nan")
    with profile_trace(args.profile_dir):
        for step in range(start, args.steps):
            batch = next(batches)
            t0 = time.perf_counter()
            trainable, opt_state, loss = step_fn(trainable, opt_state,
                                                 batch)
            loss_val = float(np.asarray(loss))    # host fetch = barrier
            dt = time.perf_counter() - t0
            metrics.gauge("loss", loss_val)
            metrics.observe("step", dt)
            if step % args.log_every == 0 or step == args.steps - 1:
                log.info("step %d  loss %.5f  %.2fs", step, loss_val, dt)
            if not np.isfinite(loss_val):
                raise SystemExit(f"non-finite loss at step {step}")
            if ckpt and ((step + 1) % args.save_every == 0
                         or step == args.steps - 1):
                path = _save_state(ckpt, root, step + 1, trainable,
                                   opt_state)
                log.info("saved %s", path)
    metrics.log_summary(log)
    return loss_val


def _synthetic_batches(cfg, args, mesh):
    """Infinite iterator of random flow-matching batches at the demo
    geometry, sharded batch-over-'data' like the real path."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..schedulers import FlowMatchScheduler

    B = max(1, args.mesh_data)
    f, h2, w2 = 2, 8, 8
    sched = FlowMatchScheduler().set_timesteps(1000)
    rng = np.random.default_rng(args.seed)
    sharding = NamedSharding(mesh, P("data"))
    while True:
        idx = int(rng.integers(0, len(sched.sigmas)))
        batch = {
            "clean_latents": rng.standard_normal((B, 16, f, h2, w2)),
            "noise": rng.standard_normal((B, 16, f, h2, w2)),
            "sigma": np.float32(sched.sigmas[idx]),
            "timestep": np.full((B,), float(sched.timesteps[idx]), np.float32),
            "context": rng.standard_normal((B, 64, 4096)) * 0.02,
            "clip_feature": rng.standard_normal((B, 257, 1280)) * 0.02,
            "y": rng.standard_normal((B, 20, f, h2, w2)),
            "plucker_fea": rng.standard_normal(
                (B, f * (h2 // 2) * (w2 // 2), 2048)) * 0.02,
        }
        yield {k: (jax.device_put(jnp.asarray(v, jnp.float32), sharding)
                   if np.ndim(v) > 0 else jnp.float32(v))
               for k, v in batch.items()}


def _clip_dirs(root):
    return sorted(d for d in (os.path.join(root, n) for n in os.listdir(root))
                  if os.path.isdir(d))


def _data_batches(pipe, args, with_plucker=True):
    """Cycle clip dirs -> build_train_batch dicts (real-checkpoint mode).

    with_plucker=False skips the camera-pose embedding entirely: the PP
    trainer drops it anyway, and computing it would call
    pipe.encode_plucker, which needs the fusion tree the PP path's
    encoder-only pipeline deliberately does not load."""
    import jax
    from ..data.video import VideoData
    from ..data.re10k import RealEstate10KPoseProcessor
    from ..training.data import build_train_batch

    clips = _clip_dirs(args.data_root)
    if not clips:
        raise SystemExit(f"no clip subdirectories under {args.data_root}")
    rng = jax.random.PRNGKey(args.seed)
    i = 0
    while True:
        clip = clips[i % len(clips)]
        i += 1
        src = os.path.join(clip, "video.mp4")
        if os.path.exists(src):
            video = VideoData(src, height=args.height, width=args.width)
        else:
            # frames/ image-folder mode: must bind image_folder, not
            # video_file (imageio.get_reader rejects a directory)
            video = VideoData(image_folder=os.path.join(clip, "frames"),
                              height=args.height, width=args.width)
        n = min(len(video), args.frames)
        frames = np.stack([np.asarray(video[j]) for j in range(n)])
        with open(os.path.join(clip, "prompt.txt")) as f:
            prompt = f.read().strip()
        plucker = None
        pose_file = os.path.join(clip, "poses.txt")
        if with_plucker and os.path.exists(pose_file):
            proc = RealEstate10KPoseProcessor(
                sample_stride=1, sample_n_frames=n,
                sample_size=(args.height, args.width),
                relative_pose=True, zero_t_first_frame=True, is_i2v=True)
            plucker = proc.get_plucker_embedding(pose_file)
        rng, k = jax.random.split(rng)
        yield build_train_batch(pipe, frames, prompt, k,
                                plucker_embedding=plucker)


def _pp_batches(cfg, args, mesh):
    """Infinite random DiT flow-matching batches, batch-sharded over
    'data' (replicated over 'pipe': every stage sees the full batch and
    the pipeline microbatches it)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..schedulers import FlowMatchScheduler

    B = args.pipe_microbatches * max(1, args.mesh_data)
    f, h2, w2 = 2, 8, 8
    sched = FlowMatchScheduler().set_timesteps(1000)
    rng = np.random.default_rng(args.seed)
    sharding = NamedSharding(mesh, P("data"))
    while True:
        idx = int(rng.integers(0, len(sched.sigmas)))
        batch = {
            "clean_latents": rng.standard_normal((B, cfg.in_dim, f, h2, w2)),
            "noise": rng.standard_normal((B, cfg.in_dim, f, h2, w2)),
            "sigma": np.float32(sched.sigmas[idx]),
            "timestep": np.full((B,), float(sched.timesteps[idx]),
                                np.float32),
            "context": rng.standard_normal((B, 64, cfg.text_dim)) * 0.02,
        }
        yield {k: (jax.device_put(jnp.asarray(v, jnp.float32), sharding)
                   if np.ndim(v) > 0 else jnp.float32(v))
               for k, v in batch.items()}


def _stacked_data_batches(pipe, args, mesh, B, with_plucker):
    """Stack B single-clip batches from training/data.py into one
    data-sharded batch with PER-SAMPLE sigma. Shared by the PP trainer
    (plucker dropped -- the plain DiT has no camera adapters) and the
    GSPMD trainer when --mesh_data > 1 (which previously fed B=1 batches
    into a data-parallel mesh, idling data-axis devices; r4 review)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..utils.observability import get_logger
    log = get_logger("train.batch")
    inner = _data_batches(pipe, args, with_plucker=with_plucker)
    sharding = NamedSharding(mesh, P("data"))
    # the expected latent geometry follows from --frames, NOT from
    # whichever clip happens to come first (a short first clip must not
    # redefine "full length" and skip every real clip)
    ref_shape = (1, pipe.vae_cfg.z_dim, (args.frames - 1) // 4 + 1,
                 args.height // 8, args.width // 8)
    n_clips = len(_clip_dirs(args.data_root))
    skipped = 0

    def next_uniform():
        """Clips shorter than --frames produce fewer latent frames; a
        mixed-shape stack cannot concatenate, so off-shape clips are
        skipped (the non-PP trainer tolerates them via per-clip batches)."""
        nonlocal skipped
        misses = 0
        while True:
            p = next(inner)
            shape = tuple(p["clean_latents"].shape)
            if shape == ref_shape:
                return p
            skipped += 1
            misses += 1
            if skipped in (1, 10) or skipped % 100 == 0:
                log.warning(
                    "skipped %d clip(s) with latent shape %s != %s "
                    "(shorter than --frames?)", skipped, shape, ref_shape)
            if misses > n_clips:       # a full cycle with zero matches
                raise SystemExit(
                    f"no clip under --data_root matches the --frames/"
                    f"--height/--width latent shape {ref_shape} "
                    f"(last seen {shape})")

    while True:
        parts = [next_uniform() for _ in range(B)]
        batch = {}
        keys = ["clean_latents", "noise", "context", "clip_feature", "y"]
        if with_plucker:
            keys.append("plucker_fea")
        for k in keys:
            vals = [p.get(k) for p in parts]
            if any(v is None for v in vals):
                continue
            batch[k] = jax.device_put(
                jnp.concatenate([jnp.asarray(v) for v in vals], axis=0),
                sharding)
        batch["timestep"] = jnp.concatenate(
            [jnp.asarray(p["timestep"]) for p in parts], axis=0)
        # per-clip noise levels: broadcastable (B,1,1,1,1) instead of the
        # single-clip scalar
        batch["sigma"] = jnp.stack(
            [jnp.asarray(p["sigma"]) for p in parts]).reshape(B, 1, 1, 1, 1)
        yield batch


def _pp_data_batches(pipe, args, mesh):
    """Real-clip PP batches: pipe_microbatches x mesh_data clips per batch
    (see _stacked_data_batches)."""
    return _stacked_data_batches(
        pipe, args, mesh, args.pipe_microbatches * max(1, args.mesh_data),
        with_plucker=False)


def _run_pipe(args) -> None:
    """--pipe_stages S: video-DiT GPipe trainer (training/pp.py). The plain
    Wan DiT is a homogeneous block stack, so the blocks themselves shard
    over a ('pipe','data') mesh -- each device holds L/S blocks plus their
    optimizer moments; microbatches march through the stages. The fusion
    stack (PCB/IRG mix) is heterogeneous and stays on the GSPMD trainer."""
    import glob as globmod
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ..models.wan.dit import WanDiTConfig, init_wan_dit
    from ..parallel.sharding import shard_opt_state
    from ..training.pp import make_pp_train_step, split_dit_trainable
    from ..utils.observability import get_logger

    if args.lora_rank:
        raise SystemExit("--pipe_stages does not compose with --lora_rank")
    if args.mesh_seq != 1 or args.mesh_model != 1:
        raise SystemExit("the PP trainer wires a ('pipe','data') mesh; "
                         "seq/model axes compose at the library level "
                         "(parallel/pipeline.py) but are not CLI-wired")
    log = get_logger("train.pp")
    S, D = args.pipe_stages, max(1, args.mesh_data)
    devs = np.asarray(jax.devices())
    if devs.size < S * D:
        raise SystemExit(f"pipe={S} x data={D} needs {S * D} devices, "
                         f"have {devs.size}")
    mesh = Mesh(devs[:S * D].reshape(S, D), ("pipe", "data"))

    pipe = None
    if args.synthetic:
        dim = args.demo_dim
        cfg = WanDiTConfig(dim=dim, in_dim=16, ffn_dim=dim * 2, out_dim=16,
                           text_dim=4096, freq_dim=128, patch_size=(1, 2, 2),
                           num_heads=max(2, dim // 32),
                           num_layers=args.demo_layers,
                           has_image_input=False)
    else:
        cfg = WanDiTConfig()
    # up-front: cfg is constant per mode, so this must fail BEFORE the
    # multi-GB checkpoint read below, not after it
    if cfg.num_layers % S:
        raise SystemExit(f"{cfg.num_layers} blocks not divisible by "
                         f"{S} stages")
    if args.synthetic:
        params = init_wan_dit(args.seed, cfg, jnp.float32)
    else:
        # validated up front -- the DiT conversion below is multi-GB work
        if not (args.wan_ckpt_path and args.model_ckpt and args.data_root):
            raise SystemExit(
                "real-data PP mode needs --wan_ckpt_path (DiT shards; the "
                "conditioning encoders load from the same bundle), "
                "--model_ckpt and --data_root (or --synthetic)")
        from ..convert.orbax_io import (load_sharded_state_dict, cast_tree)
        from ..convert.wan_dit import convert_wan_dit
        from ..models.fusion.model import FusionConfig
        from ..pipelines.wan_video import FantasyWorldPipeline
        from .infer_wan21 import load_fusion_params
        shards = sorted(globmod.glob(os.path.join(
            args.wan_ckpt_path, "diffusion_pytorch_model*.safetensors")))
        if not shards:
            raise SystemExit(f"no DiT shards under {args.wan_ckpt_path}")
        # the pipeline supplies only the frozen conditioning encoders (VAE,
        # T5, CLIP) for batch building -- the fusion tree is NOT loaded, so
        # the multi-GB DiT shards are read exactly once, for the TRAINED
        # params: the plain Wan DiT converted directly from the shards
        fus_cfg = FusionConfig()
        pipe = FantasyWorldPipeline(
            cfg=fus_cfg,
            params=load_fusion_params(args.wan_ckpt_path, args.model_ckpt,
                                      fus_cfg, jnp.bfloat16,
                                      components=("vae", "clip", "t5")),
            tokenizer_path=args.tokenizer_path)
        params = cast_tree(
            convert_wan_dit(load_sharded_state_dict(shards), cfg),
            jnp.bfloat16)
    B = args.pipe_microbatches * D
    log.info("PP trainer: %d blocks over %d stages x data=%d, "
             "M=%d microbatches (bubble %.0f%%), batch %d",
             cfg.num_layers, S, D, args.pipe_microbatches,
             100 * (S - 1) / (args.pipe_microbatches + S - 1), B)

    lite, blocks = split_dit_trainable(params)
    with mesh:
        # each device row holds its stage's L/S block slice (+ optimizer
        # moments via shard_opt_state); lite (embeddings/head) replicates
        blocks = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P("pipe"))),
            blocks)
        lite = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P())), lite)
        trainable = (lite, blocks)
        opt = _optimizer(args)
        opt_state = shard_opt_state(jax.jit(opt.init)(trainable), trainable,
                                    mesh)
        start, ckpt, root, trainable, opt_state = _resume_state(
            args, trainable, opt_state, log)
        if start >= args.steps:
            print(f"train done: checkpoint already at step {start} "
                  f">= --steps {args.steps}")
            return

        step_fn = jax.jit(
            make_pp_train_step(cfg, opt, mesh=mesh,
                               microbatches=args.pipe_microbatches),
            donate_argnums=(0, 1))
        batches = (_pp_batches(cfg, args, mesh) if args.synthetic
                   else _pp_data_batches(pipe, args, mesh))
        loss_val = _train_loop(args, step_fn, batches, trainable, opt_state,
                               start, ckpt, root, log)
    print(f"train done: {args.steps - start} step(s), final loss "
          f"{loss_val:.5f}")


def run(args) -> None:
    import jax
    import jax.numpy as jnp
    from ..models.fusion.model import (FusionConfig, init_fusion,
                                       split_trainable)
    from ..parallel.sharding import (make_mesh, param_specs, shard_opt_state,
                                     stacked_specs, shard_tree)
    from ..training.step import make_train_step
    from ..utils.observability import get_logger

    if args.pipe_stages > 0:
        return _run_pipe(args)
    log = get_logger("train")
    mesh = make_mesh(data=args.mesh_data, seq=args.mesh_seq,
                     model=args.mesh_model)

    if args.synthetic:
        from ..utils.demo import demo_config
        cfg = demo_config(dim=args.demo_dim, layers=args.demo_layers,
                          start_index=args.demo_start_index,
                          agg_dim=max(32, args.demo_dim // 4))
        params = init_fusion(args.seed, cfg, jnp.float32)
        pipe = None
    else:
        if not (args.wan_ckpt_path and args.model_ckpt and args.data_root):
            raise SystemExit("real-data mode needs --wan_ckpt_path, "
                             "--model_ckpt and --data_root (or --synthetic)")
        from ..pipelines.wan_video import FantasyWorldPipeline
        from .infer_wan21 import load_fusion_params
        cfg = FusionConfig()
        all_params = load_fusion_params(args.wan_ckpt_path, args.model_ckpt,
                                        cfg, jnp.bfloat16)
        pipe = FantasyWorldPipeline(cfg=cfg, params=all_params,
                                    tokenizer_path=args.tokenizer_path)
        params = all_params["fusion"]

    lite, scan = split_trainable(params, cfg)
    with mesh:
        lite = shard_tree(lite, mesh, param_specs(lite, mesh=mesh))
        scan = shard_tree(scan, mesh, stacked_specs(scan, mesh=mesh))
        frozen = None
        if args.lora_rank > 0:
            from ..training.lora import init_lora
            targets = tuple(t for t in args.lora_targets.split(",") if t)
            frozen = (lite, scan)
            # f32 factors regardless of base dtype: rank-r trees are tiny
            # and the optimizer state wants full precision anyway
            trainable = init_lora(args.seed + 1, scan, rank=args.lora_rank,
                                  targets=targets, dtype=jnp.float32)
            # rank-r factors are tiny: replicate them over the mesh so the
            # whole train state lives on one device set
            trainable = shard_tree(trainable, mesh,
                                   param_specs(trainable, mesh=mesh))
            log.info("LoRA mode: rank %d over %d stacked kernels (%s)",
                     args.lora_rank, len(trainable), args.lora_targets)
        else:
            trainable = (lite, scan)

        opt = _optimizer(args)
        # mesh-place the state (mu/nu shard like their params, scalars
        # replicate): jit(init) leaves scalars committed to one device,
        # which Orbax restore pins there -- and a later jit over
        # mesh-sharded params rejects the mixed device sets
        opt_state = shard_opt_state(jax.jit(opt.init)(trainable), trainable,
                                    mesh)

        start, ckpt, root, trainable, opt_state = _resume_state(
            args, trainable, opt_state, log)
        if start >= args.steps:
            print(f"train done: checkpoint already at step {start} "
                  f">= --steps {args.steps}")
            return

        if frozen is not None:
            from ..training.lora import make_lora_train_step
            lora_step = jax.jit(
                make_lora_train_step(cfg, opt, alpha=args.lora_alpha,
                                     mesh=mesh, remat=not args.no_remat),
                donate_argnums=(0, 1))

            def step_fn(tr, st, batch):
                return lora_step(tr, st, frozen, batch)
        else:
            step_fn = jax.jit(make_train_step(cfg, opt, mesh=mesh,
                                              remat=not args.no_remat),
                              donate_argnums=(0, 1))
        if args.synthetic:
            batches = _synthetic_batches(cfg, args, mesh)
        elif args.mesh_data > 1:
            batches = _stacked_data_batches(pipe, args, mesh,
                                            args.mesh_data,
                                            with_plucker=True)
        else:
            batches = _data_batches(pipe, args)
        loss_val = _train_loop(args, step_fn, batches, trainable, opt_state,
                               start, ckpt, root, log)
    print(f"train done: {args.steps - start} step(s), final loss "
          f"{loss_val:.5f}")


def main(argv=None) -> None:
    run(parse_args(argv))


if __name__ == "__main__":
    main()
