"""FantasyWorld fusion model: joint video + geometry denoiser, TPU-native.

Re-design of FantasyWorldFusionModel (fusion/model_wan21.py:23-324):

  * blocks 0..start_index-1 of the Wan DiT act as Preconditioning Blocks
    (PCB); blocks start_index.. are paired one-to-one with VGGT frame +
    global blocks inside IRG iterations, coupled by bidirectional
    cross-modal attention;
  * the reference's deepcopy-then-Identity module surgery disappears: the
    param tree keeps the full 40-block DiT and 24+24 aggregator stacks, and
    the fusion checkpoint converter writes the trained IRG copies back into
    their original slots (convert/fusion.py);
  * the per-layer loops are lax.scan over leaf-stacked block params --
    one traced block body per homogeneous segment (segments split where the
    camera AdaLN adapters end, reference blocks <= 24), so the 14B model
    compiles in seconds-per-block, not minutes;
  * CFG runs as a batch of 2 (positive/negative context) through one
    forward instead of two sequential calls.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as PS

from ...core.params import prng_split, stack_trees
from ...parallel.sharding import maybe_constrain
from ...ops import rope as rope_ops
from ..wan import dit as dit_mod
from ..wan.dit import WanDiTConfig
from ..vggt import blocks as vblocks
from ..vggt.aggregator import AggregatorConfig, assemble_tokens
from ..vggt.model import VGGTConfig, process_wan_input, head_prediction
from .bicross import BicrossConfig, bicross_apply, init_bicross


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    dit: WanDiTConfig = WanDiTConfig(camera_adapter_end=25)
    vggt: VGGTConfig = VGGTConfig()
    bicross: BicrossConfig = BicrossConfig()
    start_index: int = 16
    camera_control: bool = True
    # Which post-PCB layers are IRG blocks (reference cross_attention_list,
    # fusion/model_wan21.py:187-207). None = all of them -- the shipped
    # config (inference_wan21.py:204-212 passes range(24)). Layers NOT in
    # the list run the plain else-branch: full DiT block + plain aggregator
    # global attention, no bicross coupling.
    cross_attention_list: Optional[Tuple[int, ...]] = None

    @property
    def num_irg(self) -> int:
        return self.dit.num_layers - self.start_index

    def xattn_set(self) -> frozenset:
        if self.cross_attention_list is None:
            return frozenset(range(self.num_irg))
        return frozenset(self.cross_attention_list)


def init_fusion(rng, cfg: FusionConfig, dtype=jnp.bfloat16) -> Dict:
    from ..wan.dit import init_wan_dit
    from ..vggt.model import init_vggt
    rs = prng_split(rng, 3 + cfg.num_irg)
    return {
        "dit": init_wan_dit(rs[0], cfg.dit, dtype),
        "vggt": init_vggt(rs[1], cfg.vggt, dtype),
        "bicross": [init_bicross(rs[3 + i], cfg.bicross, dtype)
                    for i in range(cfg.num_irg)],
    }


# ---------------------------------------------------------------------------
# scan-ready parameter bundling
# ---------------------------------------------------------------------------

def _segments(n: int, boundary: int) -> List[Tuple[int, int]]:
    """Split [0, n) at `boundary` (if interior) into homogeneous runs."""
    if 0 < boundary < n:
        return [(0, boundary), (boundary, n)]
    return [(0, n)]


def irg_runs(cfg: FusionConfig) -> List[Tuple[int, int, bool, bool]]:
    """Contiguous homogeneous runs of the post-PCB layer range: (lo, hi,
    is_irg, has_adapter). A run is scanned with one traced body; boundaries
    fall where the layer leaves cross_attention_list or where the camera
    AdaLN adapters end (reference blocks <= 24)."""
    xa = cfg.xattn_set()
    si = cfg.start_index
    runs: List[List] = []
    for i in range(cfg.num_irg):
        key = (i in xa, cfg.dit.has_adapter(si + i))
        if runs and (runs[-1][2], runs[-1][3]) == key:
            runs[-1][1] = i + 1
        else:
            runs.append([i, i + 1, key[0], key[1]])
    return [tuple(r) for r in runs]


def prepare_scan_params(params: Dict, cfg: FusionConfig) -> Dict:
    """Leaf-stack the per-layer params into scan segments. Run once at load
    time; the result is what the jitted joint_forward consumes."""
    dit_blocks = params["dit"]["blocks"]
    agg = params["vggt"]["aggregator"]
    si = cfg.start_index
    ae = cfg.dit.camera_adapter_end

    pcb_segs = []
    for lo, hi in _segments(si, min(ae, si)):
        pcb_segs.append(stack_trees(dit_blocks[lo:hi]))

    irg_segs = []
    for lo, hi, is_irg, _ in irg_runs(cfg):
        seg = {
            "frame": stack_trees(agg["frame_blocks"][lo:hi]),
            "agg": stack_trees(agg["global_blocks"][lo:hi]),
            "dit": stack_trees(dit_blocks[si + lo:si + hi]),
        }
        if is_irg:
            seg["bicross"] = stack_trees(params["bicross"][lo:hi])
        irg_segs.append(seg)
    return {"pcb": pcb_segs, "irg": irg_segs}


def split_trainable(params: Dict, cfg: FusionConfig, scan: Dict = None):
    """(params, cfg) -> (params_lite, scan_params) with no weight aliasing:
    the per-layer block lists live only in the scan stacks, everything else
    (embeddings, heads, special tokens) in params_lite. joint_forward reads
    blocks exclusively from scan_params, so gradients flow through exactly
    one copy of every weight -- the layout the training step differentiates.
    Pass an already-prepared ``scan`` to skip restacking (the stack of a
    14B tree is a real host-memory spike).
    """
    if scan is None:
        scan = prepare_scan_params(params, cfg)
    lite = {
        "dit": {k: v for k, v in params["dit"].items() if k != "blocks"},
        "vggt": {k: (v if k != "aggregator" else
                     {ak: av for ak, av in v.items()
                      if ak not in ("frame_blocks", "global_blocks")})
                 for k, v in params["vggt"].items()},
    }
    for k in params:
        if k not in ("dit", "vggt", "bicross"):
            lite[k] = params[k]
    return lite, scan


def segment_adapter_flags(cfg: FusionConfig):
    """Static per-segment camera-adapter flags (kept out of the param
    pytree so they never become jit tracers)."""
    si, ae = cfg.start_index, cfg.dit.camera_adapter_end
    pcb = [lo < ae for lo, _ in _segments(si, min(ae, si))]
    irg = [(is_irg, has_ad) for _, _, is_irg, has_ad in irg_runs(cfg)]
    return pcb, irg


# ---------------------------------------------------------------------------
# joint forward
# ---------------------------------------------------------------------------

def _forward_prologue(params: Dict, cfg: FusionConfig, latents, timestep,
                      context, clip_feature, y, control_camera_latents,
                      mesh, control_tokens=None):
    """Embeddings + patchify + rope tables (fusion/model_wan21.py:119-147).
    Cheap relative to the block stack -- runs on every step even when
    TeaCache skips the stack. ``control_tokens``: the hoisted per-clip
    control-camera embedding (dit.control_adapter_tokens) -- pass it
    instead of control_camera_latents to keep the 62-TFLOP adapter out
    of the per-step graph."""
    dcfg = cfg.dit
    dp = params["dit"]
    t, t_mod = dit_mod.time_embedding(dp, dcfg, timestep)
    ctx = dit_mod.text_embedding(dp, context)
    x_in = latents
    if dcfg.require_vae_embedding and y is not None:
        x_in = jnp.concatenate([latents, y], axis=1)
    if dcfg.has_image_input and clip_feature is not None:
        ctx = jnp.concatenate([dit_mod.img_embedding(dp, clip_feature), ctx],
                              axis=1)
    x, (f, h, w) = dit_mod.patchify(dp, dcfg, x_in, control_camera_latents,
                                    control_tokens)
    tok_spec = PS("data", "seq", None)           # (B, L, D) video tokens
    x = maybe_constrain(x, mesh, tok_spec)

    # rope tables (host-precomputed f64 angles). The optimization barrier
    # pins each (L, head_dim) table as-is: without it XLA constant-folds
    # the downstream broadcast-over-heads + pad into ~334 MB f32 constants
    # per table, which balloons the serialized executable from ~15 MB to
    # ~370 MB (measured) -- that blob crosses the TPU tunnel on every AOT
    # load (utils/aot_cache.py) at 60-420 s.
    def pin(tables):
        return tuple(jax.lax.optimization_barrier(jnp.asarray(t))
                     for t in tables)

    cos_d, sin_d = pin(rope_ops.cos_sin_half_from_angles(
        rope_ops.build_angles_3d(dcfg.head_dim, f, h, w)))
    rope_bi_dit = pin(rope_ops.cos_sin_half_from_angles(
        rope_ops.build_angles_3d(cfg.bicross.head_dim, f, h, w)))
    rope_bi_agg = pin(rope_ops.cos_sin_half_from_angles(
        rope_ops.build_angles_3d(cfg.bicross.head_dim, f, h, w,
                                 n_extra_per_frame=cfg.vggt.aggregator.patch_start_idx)))
    return (x, ctx, t, t_mod, (f, h, w),
            (cos_d, sin_d), rope_bi_dit, rope_bi_agg)


def _run_stack(params: Dict, scan_params: Dict, cfg: FusionConfig,
               x, ctx, t_mod, timestep, ropes, rope_bi_dit, rope_bi_agg,
               fhw, plucker_fea, camera_token, uncond, collect_inters,
               mesh, remat):
    """PCB prefix + geometry branch + interleaved IRG loop
    (fusion/model_wan21.py:157-212). Returns (x, inters | None)."""
    dcfg = cfg.dit
    f, h, w = fhw
    B = x.shape[0]
    cos_d, sin_d = ropes
    tok_spec = PS("data", "seq", None)
    apply_pose = cfg.camera_control and plucker_fea is not None
    pcb_flags, irg_flags = segment_adapter_flags(cfg)

    # ---- PCB prefix ------------------------------------------------------
    for seg, has_ad in zip(scan_params["pcb"], pcb_flags):
        def pcb_body(carry, blk):
            out = dit_mod.dit_block_apply(
                blk, carry, ctx, t_mod, cos_d, sin_d, dcfg,
                plucker_fea=plucker_fea,
                apply_pose=apply_pose and has_ad)
            return maybe_constrain(out, mesh, tok_spec), None
        if remat:
            pcb_body = jax.checkpoint(pcb_body, prevent_cse=False)
        x, _ = jax.lax.scan(pcb_body, x, seg)

    # ---- geometry branch input ------------------------------------------
    wan_feats = x.reshape(B, f, h, w, dcfg.dim)
    patch_tokens, e0 = process_wan_input(params["vggt"], cfg.vggt, wan_feats,
                                         timestep)
    tokens, pos = assemble_tokens(params["vggt"]["aggregator"],
                                  cfg.vggt.aggregator, patch_tokens,
                                  camera_token)
    S = f
    P, C = tokens.shape[-2:]
    acfg = cfg.vggt.aggregator
    bcfg_blk = acfg.block_cfg
    # hoist the 2D-rope position gather out of the layer scan: positions are
    # static, so the per-block rope becomes broadcast elementwise (measured
    # ~12 ms/block of gather otherwise; see rope2d_tables_from_positions)
    if bcfg_blk.rope_frequency > 0:
        rope_f = rope_ops.rope2d_tables_from_positions(
            pos.reshape(B * S, P, 2), bcfg_blk.head_dim,
            frequency=bcfg_blk.rope_frequency)
        rope_g = tuple(t.reshape(B, S * P, 1, t.shape[-1]) for t in rope_f)
    else:                                          # pragma: no cover
        rope_f = rope_g = None
    # geometry streams: frames over 'seq' (frame attention is per-frame, so
    # the frame-folded (B*S, P, C) layout shards rows over ('data','seq')
    # with no collective; the global/bicross attentions reshard via XLA)
    frame_spec = PS(("data", "seq"), None, None)  # (B*S, P, C)
    agg_spec = PS("data", "seq", None)            # (B, S*P, C)

    # ---- interleaved IRG loop -------------------------------------------
    inters = []
    for seg, (is_irg, has_ad) in zip(scan_params["irg"], irg_flags):
        def irg_body(carry, blk, has_ad=has_ad):
            x, tokens = carry
            tokens = maybe_constrain(tokens.reshape(B * S, P, C), mesh,
                                     frame_spec)
            tokens = vblocks.vggt_block_apply(
                blk["frame"], bcfg_blk, tokens, rope_f, e0)
            frame_inter = tokens.reshape(B, S, P, C)

            x, mod_dit = dit_mod.dit_block_attn_half(
                blk["dit"], x, ctx, t_mod, cos_d, sin_d, dcfg,
                plucker_fea=plucker_fea,
                apply_pose=apply_pose and has_ad)
            x_agg = maybe_constrain(tokens.reshape(B, S * P, C), mesh,
                                    agg_spec)
            x_agg, mod_agg = vblocks.vggt_block_attn_half(
                blk["agg"], bcfg_blk, x_agg, rope_g, e0)

            if not uncond:
                x, x_agg = bicross_apply(blk["bicross"], cfg.bicross, x,
                                         x_agg, rope_bi_dit, rope_bi_agg)

            x = dit_mod.dit_block_ffn_half(blk["dit"], x, mod_dit, dcfg)
            x = maybe_constrain(x, mesh, tok_spec)
            x_agg = vblocks.vggt_block_ffn_half(blk["agg"], bcfg_blk, x_agg,
                                                mod_agg)
            x_agg = maybe_constrain(x_agg, mesh, agg_spec)
            global_inter = x_agg.reshape(B, S, P, C)
            out = jnp.concatenate([frame_inter, global_inter], axis=-1)
            return (x, x_agg.reshape(B * S, P, C)), out

        def plain_body(carry, blk, has_ad=has_ad):
            # else-branch (fusion/model_wan21.py:196-207): frame attention,
            # full DiT block, plain aggregator global attention -- no
            # cross-modal coupling for layers outside cross_attention_list.
            x, tokens = carry
            tokens = maybe_constrain(tokens.reshape(B * S, P, C), mesh,
                                     frame_spec)
            tokens = vblocks.vggt_block_apply(
                blk["frame"], bcfg_blk, tokens, rope_f, e0)
            frame_inter = tokens.reshape(B, S, P, C)

            x = dit_mod.dit_block_apply(
                blk["dit"], x, ctx, t_mod, cos_d, sin_d, dcfg,
                plucker_fea=plucker_fea,
                apply_pose=apply_pose and has_ad)
            x = maybe_constrain(x, mesh, tok_spec)
            x_agg = maybe_constrain(tokens.reshape(B, S * P, C), mesh,
                                    agg_spec)
            x_agg = vblocks.vggt_block_apply(
                blk["agg"], bcfg_blk, x_agg, rope_g, e0)
            x_agg = maybe_constrain(x_agg, mesh, agg_spec)
            global_inter = x_agg.reshape(B, S, P, C)
            out = jnp.concatenate([frame_inter, global_inter], axis=-1)
            return (x, x_agg.reshape(B * S, P, C)), out

        body = irg_body if is_irg else plain_body
        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        (x, tokens), seg_out = jax.lax.scan(body, (x, tokens), seg)
        inters.append(seg_out)

    return x, (inters if collect_inters else None)


def joint_forward(params: Dict, scan_params: Dict, cfg: FusionConfig,
                  latents: jnp.ndarray, timestep: jnp.ndarray,
                  context: jnp.ndarray,
                  clip_feature: Optional[jnp.ndarray] = None,
                  y: Optional[jnp.ndarray] = None,
                  plucker_fea: Optional[jnp.ndarray] = None,
                  camera_token: Optional[jnp.ndarray] = None,
                  control_camera_latents: Optional[jnp.ndarray] = None,
                  control_tokens: Optional[jnp.ndarray] = None,
                  uncond: bool = False,
                  return_prediction: bool = False,
                  mesh=None, remat: bool = False,
                  ulysses: bool = False, ulysses_min_lq: int = 2048):
    """One denoise evaluation (fusion/model_wan21.py:104-224).

    latents: (B, 16, f, h', w'); context: (B, 512, text_dim);
    y: (B, 20, f, h', w'); clip_feature: (B, 257, 1280);
    plucker_fea: (B, L_tokens, plucker_dim).
    Returns (noise_pred (B, 16, f, h', w'), prediction dict | None).

    mesh: optional jax.sharding.Mesh(('data','seq','model')). When given,
    activations are constrained batch-over-'data' and token/frame-over-'seq'
    at every scan-segment boundary -- the GSPMD re-design of the reference's
    Ulysses token chunking (diffsynth_wan21/pipelines/wan_video.py:808-830):
    instead of explicit chunk + all_gather, XLA inserts the collectives.

    remat: rematerialize each scan-body block on the backward pass -- the
    TPU counterpart of the reference's per-block gradient checkpointing
    (fusion/model_wan21.py:160-169; vram_management/gradient_checkpointing.py).

    ulysses: route the long-sequence attentions (DiT self/cross, aggregator
    global, bicross) through the explicit all_to_all sequence-parallel path
    (parallel/ulysses.py) instead of leaving the resharding to GSPMD -- the
    bandwidth-optimal layout of the reference's USP (ulysses_degree =
    world_size, wan_video_new.py:316-341). Requires mesh; a seq axis of 1
    makes it a no-op.
    """
    from ...parallel.ulysses import ulysses_context
    dcfg = cfg.dit
    dp = params["dit"]
    (x, ctx, t, t_mod, fhw, ropes, rope_bi_dit, rope_bi_agg) = \
        _forward_prologue(params, cfg, latents, timestep, context,
                          clip_feature, y, control_camera_latents, mesh,
                          control_tokens)
    with ulysses_context(mesh if ulysses else None, min_lq=ulysses_min_lq):
        x, inters = _run_stack(params, scan_params, cfg, x, ctx, t_mod,
                               timestep, ropes, rope_bi_dit, rope_bi_agg,
                               fhw, plucker_fea, camera_token, uncond,
                               return_prediction, mesh, remat)
    f, h, w = fhw
    out = dit_mod.head_apply(dp, dcfg, x, t)
    noise_pred = dit_mod.unpatchify(dcfg, out, (f, h, w))

    if not return_prediction:
        return noise_pred, None

    all_inters = jnp.concatenate(inters, axis=0)     # (24, B, S, P, 2C)
    agg_list = [all_inters[i] for i in range(all_inters.shape[0])]
    prediction = head_prediction(params["vggt"], cfg.vggt, agg_list,
                                 (h, w), cfg.vggt.aggregator.patch_start_idx)
    return noise_pred, prediction


def joint_forward_tea(params: Dict, scan_params: Dict, cfg: FusionConfig,
                      latents: jnp.ndarray, timestep: jnp.ndarray,
                      context: jnp.ndarray,
                      clip_feature: Optional[jnp.ndarray] = None,
                      y: Optional[jnp.ndarray] = None,
                      plucker_fea: Optional[jnp.ndarray] = None,
                      skip: jnp.ndarray = None,
                      residual: jnp.ndarray = None,
                      control_camera_latents: Optional[jnp.ndarray] = None,
                      control_tokens: Optional[jnp.ndarray] = None,
                      mesh=None, ulysses: bool = False,
                      ulysses_min_lq: int = 2048):
    """TeaCache-gated denoise evaluation (wan_video.py:691-745 re-designed
    for XLA): when ``skip`` (a scalar bool tracer) is set, the PCB+IRG block
    stack is replaced by ``x += residual`` where ``residual`` is the
    stack output-minus-input saved on the last computed step. The skip
    decision itself is made on the HOST before the denoise scan (it depends
    only on the timestep schedule -- see pipelines/tea_cache.py), so both
    branches compile once under ``lax.cond`` and the device executes only
    the chosen one per step.

    Returns (noise_pred, new_residual). Geometry heads are not supported
    here: the final step always computes, so callers run plain
    ``joint_forward(..., return_prediction=True)`` for it.

    mesh / ulysses: same semantics as joint_forward -- GSPMD activation
    constraints and the explicit all_to_all sequence-parallel attention
    path; both branches of the skip cond keep the token sharding so the
    carried residual stays distributed.
    """
    from ...parallel.ulysses import ulysses_context
    dcfg = cfg.dit
    dp = params["dit"]
    (x, ctx, t, t_mod, fhw, ropes, rope_bi_dit, rope_bi_agg) = \
        _forward_prologue(params, cfg, latents, timestep, context,
                          clip_feature, y, control_camera_latents, mesh,
                          control_tokens)
    f, h, w = fhw

    def compute(x):
        with ulysses_context(mesh if ulysses else None, min_lq=ulysses_min_lq):
            x_out, _ = _run_stack(params, scan_params, cfg, x, ctx, t_mod,
                                  timestep, ropes, rope_bi_dit, rope_bi_agg,
                                  fhw, plucker_fea, None, False, False, mesh,
                                  False)
        return x_out, x_out - x

    def reuse(x):
        return x + residual, residual

    x, new_residual = jax.lax.cond(skip, reuse, compute, x)
    out = dit_mod.head_apply(dp, dcfg, x, t)
    return dit_mod.unpatchify(dcfg, out, (f, h, w)), new_residual
