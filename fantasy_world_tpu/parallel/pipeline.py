"""Pipeline parallelism over a stacked block sequence (GPipe-style).

Goes beyond the reference, which ships no pipeline parallelism at all (its
xdit/USP hooks cover sequence parallel only; SURVEY.md section 2.9 lists PP
as optional) -- but training the 14B fusion stack on small-HBM chips needs
the block stack itself sharded, and on TPU the natural form is an SPMD
collective-permute pipeline (the "pipelining" recipe of the public scaling
playbook): every device holds a contiguous STAGE of blocks, microbatches
march through the stages, and activations hop stage->stage+1 over ICI via
``lax.ppermute`` each tick.

Design (all inside one ``shard_map`` over a 'pipe' mesh axis of size S):

  * the scan-stacked block params (L, ...) are reshaped to (S, L/S, ...)
    and sharded on the stage axis -- each device holds L/S blocks;
  * the batch is split into M microbatches; a ``lax.scan`` runs
    T = M + S - 1 ticks. At tick t, stage s computes microbatch t - s
    (devices outside their active window compute garbage that is never
    read -- the standard SPMD bubble, utilization M / (M + S - 1));
  * stage 0 injects microbatch t while t < M; stage S-1 writes its result
    into the output buffer once t >= S - 1; between ticks every stage's
    output hops to the next stage with a single ring ppermute;
  * the output buffer is psum-replicated off the last stage at the end.

Differentiable end-to-end (``ppermute``/``where``/``dynamic_*`` all carry
transposes), so ``jax.grad`` through ``pipeline_apply`` yields exactly the
sequential gradients -- asserted by tests/test_pipeline_parallel.py.
Composes with the ('data','seq','model') GSPMD mesh by adding 'pipe' as an
outer axis of a 4-D mesh: the ``shard_map`` is entered with
``axis_names={'pipe'}`` so ONLY the pipe axis is manual and the stage
interior stays ordinary GSPMD over the remaining axes (sharding
constraints inside ``stage_fn`` must use bare ``PartitionSpec``s, which
resolve against the surrounding abstract mesh; a ``NamedSharding`` over
the concrete mesh is rejected inside the manual region). Asserted on a
('pipe','data') mesh by tests/test_pipeline_parallel.py.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_pipe_mesh(pipe: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= pipe, f"need {pipe} devices, have {devices.size}"
    return Mesh(devices[:pipe], ("pipe",))


def pipeline_apply(stage_fn: Callable, stacked_params, x: jnp.ndarray,
                   per_mb_args: Sequence = (), static_args: Sequence = (),
                   *, mesh: Mesh, axis: str = "pipe",
                   microbatches: int) -> jnp.ndarray:
    """Run ``x`` through L stacked blocks split over S pipeline stages.

    stage_fn(stage_params, h, *per_mb, *static) -> h applies ONE stage's
    (L/S)-stacked params to one microbatch (typically an inner lax.scan)
    and must preserve h's shape/dtype.

    stacked_params: pytree whose leaves all have leading dim L (L % S == 0).
    x: (B, ...) with B % microbatches == 0.
    per_mb_args: pytrees with leading batch dim B -- microbatched alongside
        x (e.g. context, t_mod).
    static_args: passed through untouched (e.g. RoPE tables, configs are
        best closed over in stage_fn).
    """
    S = mesh.shape[axis]
    M = int(microbatches)
    B = x.shape[0]
    assert B % M == 0, (B, M)
    Bm = B // M

    def to_stages(leaf):
        L = leaf.shape[0]
        assert L % S == 0, f"stack of {L} blocks not divisible by {S} stages"
        return leaf.reshape(S, L // S, *leaf.shape[1:])

    stages = jax.tree_util.tree_map(to_stages, stacked_params)
    x_mb = x.reshape(M, Bm, *x.shape[1:])
    per_mb = jax.tree_util.tree_map(
        lambda a: a.reshape(M, Bm, *a.shape[1:]), tuple(per_mb_args))
    static_args = tuple(static_args)

    def spmd(stage_p, x_mb, per_mb, static):
        # shard_map hands each device its (1, L/S, ...) param slice
        stage_p = jax.tree_util.tree_map(lambda l: l[0], stage_p)
        s = lax.axis_index(axis)
        T = M + S - 1
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            act, out = carry
            inject = jnp.logical_and(s == 0, t < M)
            feed = lax.dynamic_index_in_dim(x_mb, jnp.clip(t, 0, M - 1), 0,
                                            keepdims=False)
            act = jnp.where(inject, feed, act)
            mb_idx = jnp.clip(t - s, 0, M - 1)
            args = jax.tree_util.tree_map(
                lambda a: lax.dynamic_index_in_dim(a, mb_idx, 0,
                                                   keepdims=False), per_mb)
            y = stage_fn(stage_p, act, *args, *static)
            slot = jnp.clip(t - (S - 1), 0, M - 1)
            emit = jnp.logical_and(s == S - 1, t >= S - 1)
            cur = lax.dynamic_index_in_dim(out, slot, 0, keepdims=False)
            out = lax.dynamic_update_index_in_dim(
                out, jnp.where(emit, y.astype(out.dtype), cur), slot, 0)
            # activation hops to the next stage (ring; the S-1 -> 0 edge
            # carries garbage that stage 0's inject window overwrites)
            return (lax.ppermute(y, axis, perm), out), None

        # the carry is device-varying over 'pipe' (each stage holds its own
        # activation); mark the zero init as such or the scan's carry types
        # mismatch under shard_map's varying-axis tracking
        act0 = lax.pcast(jnp.zeros_like(x_mb[0]), axis, to="varying")
        out0 = lax.pcast(jnp.zeros_like(x_mb), axis, to="varying")
        (_, out), _ = lax.scan(tick, (act0, out0), jnp.arange(T))
        # replicate the last stage's buffer so out_specs=P() holds
        return lax.psum(jnp.where(s == S - 1, out, jnp.zeros_like(out)),
                        axis)

    stage_specs = jax.tree_util.tree_map(lambda _: P(axis), stages)
    # only the pipe axis is manual; any other mesh axes ('data','seq',
    # 'model') remain GSPMD-auto inside the stage
    out = shard_map(
        spmd, mesh=mesh,
        in_specs=(stage_specs,
                  P(), jax.tree_util.tree_map(lambda _: P(), per_mb), P()),
        out_specs=P(),
        axis_names=frozenset({axis}))(stages, x_mb, per_mb, static_args)
    return out.reshape(B, *x.shape[1:])


def pipeline_dit_blocks(blocks_stacked, cfg, x, context, t_mod,
                        rope_cos, rope_sin, *, mesh: Mesh,
                        axis: str = "pipe", microbatches: int):
    """Pipeline the Wan DiT block stack (the 73%-of-step-compute unit,
    PERF.md): each stage scans its (L/S)-slice of the stacked blocks with
    ``dit_block_apply``; context/t_mod are per-sample (microbatched), the
    RoPE tables are per-token (broadcast into the stage closure)."""
    from ..models.wan.dit import dit_block_apply

    def stage(stage_p, h, ctx_mb, tmod_mb):
        def body(hc, bp):
            return dit_block_apply(bp, hc, ctx_mb, tmod_mb,
                                   rope_cos, rope_sin, cfg), None
        h, _ = lax.scan(body, h, stage_p)
        return h

    return pipeline_apply(stage, blocks_stacked, x,
                          per_mb_args=(context, t_mod),
                          mesh=mesh, axis=axis, microbatches=microbatches)
