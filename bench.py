"""Benchmark: sec per denoise step (CFG pair) at BOTH production geometries.

Measures the fusion joint denoise at the REAL token geometries --
wan21 480P (16,317 DiT tokens / 16,422 geometry tokens) and, since round 4,
wan22 480x832 (32,760 DiT tokens / 32,865 geometry tokens, control-camera
patchify, no CLIP branch, dual 14B experts phase-switched so ONE is hot per
step: inference_wan22.py:459-468, fusion/model_wan22.py:231-348) -- at real
component widths (DiT dim 5120 / 40 heads / ffn 13824, VGGT 1024, bicross
1152) and reduced layer counts that fit single-chip HBM; per-layer marginal
cost is measured from three depths and extrapolated to the full 16 PCB +
24 IRG stack, with a held-out depth validating each fit.

The FINAL stdout line is the result; interim lines with the same schema are
emitted after every phase group so a hard kill still leaves a parseable
(partial-flagged) result. The headline metric stays the wan21 step (round
continuity); wan22 lives in points.wan22 with its own fit, holdout residual
and v5p-8 clip projection.

Round-1 fixes (VERDICT.md "What's weak" 1-2):
  * params are built abstractly (core.params.abstract_init) and zero-filled
    on device -- no 512 s host RNG;
  * this platform's block_until_ready does NOT block (measured round 1:
    "1 ms/step" => 12.7 PFLOP/s on a ~197 TFLOP/s chip); every timing here
    syncs by fetching a scalar slice of the output to host;
  * an analytic-FLOPs cross-check marks the result invalid if the implied
    throughput exceeds the chip's physical peak;
  * a JSON line is always emitted, with "partial": true if the deep point
    had to be skipped for budget.

The headline value is bf16 (the reference's precision). When budget
allows, the same depths are re-measured under the int8 w8a8 path
(core/quant.py, the TPU-native form of the reference's fp8 serving
option) and reported as points.int8_full_s / points.int8_speedup.

Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target is a 50-step clip in <=60 s on v5p-8 => 1.1 s/step on 8x459=3672
bf16 TFLOP/s. vs_baseline compares hardware-normalized throughput: the
target implies FLOPs/step / (1.1 s * 3672 TF) utilization; we report
(target MFU) / (our MFU-equivalent time on this chip), i.e. >1 means our
kernels use their silicon better than the target budget assumes.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_SEC_PER_STEP = 1.1          # 50-step clip in <=60 s (BASELINE.md)
TARGET_HW_TFLOPS = 8 * 459.0       # v5p-8 bf16 peak, the target's hardware
CHIP_PEAKS_TFLOPS = {              # bf16 peak per chip generation
    "v5 lite": 197.0, "v5e": 197.0, "v5p": 459.0, "v4": 275.0, "v6": 918.0,
}
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1800"))
# Measured worst-case multiplier on the analytic comm model: partitioned-
# HLO collective bytes of the real sharded+ulysses forward on the 2x2x2
# mesh, INCLUDING the GSPMD resharding all-gathers/permutes the model
# omits, divided by the modeled tp+sp bytes (tools/comm_hlo.py ->
# COMM_HLO.json, 2026-08-20: (1631104+446412)/1521152 = 1.366).
V5P16_COMM_OVERHEAD = 1.37
AUX_REPS = max(1, int(os.environ.get("BENCH_AUX_REPS", "3")))
_T_START = time.perf_counter()

# Two-level compile caching (measured 2026-08 on the tunneled v5e):
#   * the persistent compilation cache skips XLA compile only; ~250-340 s of
#     every run is TRACING + Pallas/Mosaic lowering of the fusion forward,
#     which the cache cannot skip (measured: cache HIT still cost 344 s).
#   * jax.experimental.serialize_executable snapshots the COMPILED
#     executable, skipping trace+lower+compile entirely; reload through the
#     tunnel is ~70 s. The .jax_cache dir lives in the repo workspace, so
#     the driver's end-of-round run reuses executables built here.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass


# Wedge watchdog: the tunnel intermittently stalls a device call forever
# (observed 2026-08-21: a warm 1.2 s step blocked 40+ min at 0% CPU). A
# blocked C call also blocks Python SIGNAL HANDLERS -- the driver's
# `timeout` SIGTERM is queued but never runs, so without a watchdog the
# bench hangs past its budget and emits NOTHING. A daemon thread tracks
# progress (log()/fetch_scalar touch it); after WEDGE_TIMEOUT_S of
# silence it flushes the best-so-far compact line and hard-exits. The
# threshold balances the slowest legitimately-silent period observed (a
# 1804 s COLD first-point compile, r2 -- rare now that AOT pickles cover
# the phases) against the driver's 1800 s budget: a wedge must flush a
# parseable line BEFORE the driver gives up, and a partial line from a
# killed-but-live cold compile beats a wedged nothing.
WEDGE_TIMEOUT_S = float(os.environ.get("BENCH_WEDGE_TIMEOUT_S", "1500"))
_LAST_PROGRESS = [time.perf_counter()]


def _touch_progress():
    _LAST_PROGRESS[0] = time.perf_counter()


def _start_wedge_watchdog():
    import threading

    def watch():
        while True:
            time.sleep(30)
            silent = time.perf_counter() - _LAST_PROGRESS[0]
            if silent > WEDGE_TIMEOUT_S:
                msg = (f"wedge watchdog: no progress for {silent:.0f}s "
                       f"(tunnel stall); emitting best-so-far and exiting")
                print(f"[bench] {msg}", file=sys.stderr, flush=True)
                if _LAST_RECORD is not None and not _STDOUT_EMITTED:
                    rec = dict(_LAST_RECORD, partial=True, error=msg)
                    _write_details(rec)
                    print(make_compact(rec), flush=True)
                elif not _STDOUT_EMITTED:
                    print(json.dumps({
                        "metric":
                            "sec_per_denoise_step_480p_14b_extrapolated",
                        "value": -1.0, "unit": "s", "vs_baseline": 0.0,
                        "error": msg}), flush=True)
                os._exit(166)

    threading.Thread(target=watch, daemon=True).start()


def log(msg):
    _touch_progress()
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def chip_peak_tflops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, val in CHIP_PEAKS_TFLOPS.items():
        if key in kind:
            return val
    return 459.0


def fetch_scalar(x) -> float:
    """Device->host fetch of one element: the only reliable sync barrier on
    the tunneled 'axon' platform (block_until_ready returns early there)."""
    out = float(np.asarray(jax.device_get(x.ravel()[0]), np.float32))
    _touch_progress()
    return out


# The tunneled remote-compile service fails transiently (measured 2026-08-19:
# "read body: response body closed before all bytes were read", sporadic
# HTTP 500 from tpu_compile_helper). Those are retryable; genuine HBM
# exhaustion (RESOURCE_EXHAUSTED) is not. Markers are anchored to the
# tunnel/compile-helper error shapes; the generic RPC words additionally
# require a RuntimeError (XlaRuntimeError subclasses it) so an arbitrary
# failure whose text merely contains "connection" is not silently retried.
_TUNNEL_MARKERS = ("remote_compile", "tpu_compile_helper",
                   "read body", "http 500")
_RPC_MARKERS = ("deadline_exceeded", "deadline exceeded", "unavailable:",
                "connection reset", "connection refused", "connection closed")


def retry_transient(fn, what, attempts=3):
    """Run fn(); retry up to `attempts` times on tunnel/compile-service
    errors. Re-raises immediately on non-transient failures (OOM etc.)."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            msg = f"{type(e).__name__}: {e}".lower()
            transient = (any(m in msg for m in _TUNNEL_MARKERS)
                         or (isinstance(e, (RuntimeError, OSError))
                             and any(m in msg for m in _RPC_MARKERS))) \
                and "resource_exhausted" not in msg
            if not transient or i == attempts - 1:
                raise
            log(f"{what}: transient failure (attempt {i + 1}/{attempts}), "
                f"retrying: {msg[:160]}")
            time.sleep(5.0 * (i + 1))


def make_config(num_layers, start_index, variant="wan21"):
    from fantasy_world_tpu.models.fusion.model import FusionConfig
    from fantasy_world_tpu.models.wan.dit import WanDiTConfig
    from fantasy_world_tpu.models.vggt.model import VGGTConfig
    from fantasy_world_tpu.models.vggt.aggregator import AggregatorConfig
    from fantasy_world_tpu.models.fusion.bicross import BicrossConfig

    n_irg = num_layers - start_index
    dpt_idx = tuple(sorted({n_irg - 1, max(0, n_irg - 2), 0, min(1, n_irg - 1)},
                           reverse=True))[:4]
    while len(dpt_idx) < 4:
        dpt_idx = dpt_idx + (0,)
    if variant == "wan22":
        # Fun-A14B-Control-Camera expert (wan22 wan_video_dit.py:841-859):
        # no CLIP branch, control-camera latents folded into the patch
        # embedding via SimpleAdapter, no per-block camera adapters
        dit = WanDiTConfig(dim=5120, in_dim=36, ffn_dim=13824, out_dim=16,
                           text_dim=4096, num_heads=40,
                           num_layers=num_layers, has_image_input=False,
                           require_vae_embedding=True,
                           add_control_adapter=True,
                           in_dim_control_adapter=24, camera_adapter_end=0)
    else:
        dit = WanDiTConfig(dim=5120, in_dim=36, ffn_dim=13824, out_dim=16,
                           text_dim=4096, num_heads=40,
                           num_layers=num_layers, has_image_input=True,
                           camera_adapter_end=start_index + 1,
                           plucker_dim=2048)
    return FusionConfig(
        dit=dit,
        vggt=VGGTConfig(embed_dim=1024, wan_dim=5120, dpt_layer_idx=dpt_idx,
                        aggregator=AggregatorConfig(embed_dim=1024,
                                                    depth=n_irg)),
        bicross=BicrossConfig(),
        start_index=start_index)


def abstract_tower(cfg, quant=False):
    """Abstract (shape/dtype-only) param tree of a bench tower; shared by
    build (device zero-fill) and the HBM-ladder accounting."""
    from fantasy_world_tpu.core.params import abstract_init
    from fantasy_world_tpu.models.fusion.model import (init_fusion,
                                                       split_trainable)
    with abstract_init():
        host = init_fusion(0, cfg, jnp.bfloat16)
        host = split_trainable(host, cfg)
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), host)
    if quant:
        from fantasy_world_tpu.core.quant import quantize_tree
        abstract = jax.eval_shape(
            lambda t: (quantize_tree(t[0]), quantize_tree(t[1])), abstract)
    return abstract


def tree_gbytes(abstract) -> float:
    return sum(x.size * x.dtype.itemsize for x in
               jax.tree_util.tree_leaves(abstract)) / 1e9


def build(num_layers, start_index, quant=False, variant="wan21"):
    cfg = make_config(num_layers, start_index, variant)
    # abstract shapes (no host RNG), then zero-fill directly in HBM --
    # weight values are irrelevant for timing. The quantized (int8 w8a8,
    # core/quant.py -- the TPU-native form of the reference's fp8 serving
    # option, fusion/model_wan21.py:42) variant derives the quantized tree
    # STRUCTURE abstractly too: quantizing materialized bf16 params on
    # device would keep bf16 + f32 + int8 copies live at once and OOM the
    # deep points (measured RESOURCE_EXHAUSTED at 6 layers).
    # split_trainable (round 4): blocks live ONLY in the scan stacks --
    # until r3 the bench kept params["dit"]["blocks"] AND the stacks, so
    # every tower paid 2x its block weights in HBM; the split is what let
    # the wan22 family and the 10/12-block deep points fit the v5e at all.
    abstract = abstract_tower(cfg, quant)
    make = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), abstract))
    params, scan = make()
    return cfg, params, scan


# CFG-pair production geometries. wan21: 480P (reference
# inference_wan21.py); wan22: 480x832 (inference_wan22.py:459-468 defaults,
# latents 21x60x104 -> 30x52 patch grid, no CLIP tokens).
GEOM = {
    "wan21": dict(F=21, H2=42, W2=74, ctx=512, clip_tokens=257),
    "wan22": dict(F=21, H2=60, W2=104, ctx=512, clip_tokens=0),
}
B = 2                                      # CFG pair


def geom_tokens(variant):
    g = GEOM[variant]
    l_dit = g["F"] * (g["H2"] // 2) * (g["W2"] // 2)
    l_agg_p = 5 + (g["H2"] // 2) * (g["W2"] // 2)
    return l_dit, l_agg_p, g["F"] * l_agg_p


# wan21 constants (parity_main + the comm model's defaults)
F, H2, W2 = GEOM["wan21"]["F"], GEOM["wan21"]["H2"], GEOM["wan21"]["W2"]
L_DIT, L_AGG_P, L_AGG = geom_tokens("wan21")   # 16,317 / 782 / 16,422
L_CTX = 512 + 257                              # text + CLIP tokens


def analytic_flops(num_layers, start_index, variant="wan21") -> float:
    """Matmul FLOPs of one CFG-pair joint forward (2*M*N*K per matmul).
    Attention counted as QK^T + AV; projections 4x dense. Elementwise and
    norm costs excluded (bandwidth-bound, not MXU)."""
    D, FFN, HD = 5120, 13824, 128
    A, AF = 1024, 4096
    BD = 1152
    g = GEOM[variant]
    l_dit, l_agg_p, l_agg = geom_tokens(variant)
    n_ctx = g["ctx"] + g["clip_tokens"]
    n_frames = g["F"]
    fl = 0.0
    # DiT blocks. wan21's cross-attention runs TWO dispatched calls (text
    # k/v then the CLIP image branch re-attending the same query, with its
    # own k_img/v_img projections); wan22 has no image branch -- one call
    # over 512 text tokens. In FLOPs terms both reduce to one k and one v
    # matmul over n_ctx total tokens + scores over n_ctx (wan21: k over
    # 512 + k_img over 257 = one D*D contraction over 769 rows).
    n_dit = num_layers
    per_dit = (
        4 * 2 * l_dit * D * D            # self qkvo
        + 2 * 2 * l_dit * l_dit * D      # self scores + values
        + 2 * 2 * l_dit * D * D          # cross q,o
        + 2 * 2 * n_ctx * D * D          # cross k,v
        + 2 * 2 * l_dit * n_ctx * D      # cross scores + values
        + 2 * 2 * l_dit * D * FFN        # ffn
    )
    fl += n_dit * per_dit
    n_irg = num_layers - start_index
    # VGGT frame blocks: F independent attentions over P tokens
    per_frame = (4 * 2 * l_agg * A * A
                 + n_frames * (2 * 2 * l_agg_p * l_agg_p * A)
                 + 2 * 2 * l_agg * A * AF)
    # VGGT global blocks: one attention over S*P tokens
    per_global = (4 * 2 * l_agg * A * A
                  + 2 * 2 * l_agg * l_agg * A
                  + 2 * 2 * l_agg * A * AF)
    # bicross: q from dit (D->BD), k from agg (A->BD), v both sides, two
    # directions of one score matrix + output projections
    per_bicross = (2 * l_dit * D * BD + 2 * l_agg * A * BD      # q, k
                   + 2 * l_dit * D * BD + 2 * l_agg * A * BD    # v1, v2
                   + 2 * 2 * l_dit * l_agg * BD                 # shared scores both dirs
                   + 2 * l_dit * l_agg * BD * 2                 # two value gathers
                   + 2 * l_dit * BD * D + 2 * l_agg * BD * A)   # out projs
    fl += n_irg * (per_frame + per_global + per_bicross)
    return fl * B


# In-process memo of loaded AOT executables: load_or_compile costs 10-270 s
# through the tunnel PER CALL; before round 4 every aux rep re-loaded its
# executables, which dominated the heads phase (r3: 16 s of compute inside a
# 111 s rep) and was the main source of the 9.8->16.4 s cross-round
# "variance" the r3 VERDICT flagged (weak-#2). Memoized, reps 2+ time pure
# execution.
_AOT_MEMO = {}


def _memo_load(fn, args, name, config):
    from fantasy_world_tpu.utils.aot_cache import load_or_compile
    if name not in _AOT_MEMO:
        _AOT_MEMO[name] = load_or_compile(fn, args, name=name,
                                          cache_dir=_CACHE_DIR,
                                          config=config, log=log)
    return _AOT_MEMO[name]


def _aot_forward(cfg, args, cache_name, variant="wan21"):
    """AOT-compiled joint forward via the library executable cache
    (fantasy_world_tpu/utils/aot_cache.py): loading a serialized
    executable skips trace+lower+compile (~70 s vs ~340 s)."""
    from fantasy_world_tpu.models.fusion.model import joint_forward

    if variant == "wan22":
        fn = lambda p, s, l, t, c, y, ctok: joint_forward(      # noqa: E731
            p, s, cfg, l, t, c, None, y, control_tokens=ctok)[0]
    else:
        fn = lambda p, s, l, t, c, cl, y, pf: joint_forward(    # noqa: E731
            p, s, cfg, l, t, c, cl, y, plucker_fea=pf)[0]
    return _memo_load(fn, args, f"bench_{cache_name}", repr(cfg))


def step_args(params, scan, variant):
    g = GEOM[variant]
    f, h2, w2 = g["F"], g["H2"], g["W2"]
    l_dit = f * (h2 // 2) * (w2 // 2)
    latents = jnp.zeros((B, 16, f, h2, w2), jnp.bfloat16)
    y = jnp.zeros((B, 20, f, h2, w2), jnp.bfloat16)
    ctx = jnp.zeros((B, g["ctx"], 4096), jnp.bfloat16)
    t = jnp.full((B,), 500.0)
    if variant == "wan22":
        # precomputed control-camera tokens: the SimpleAdapter (pixel-
        # unshuffle 8x + stride-2 conv + 5120-ch residual block over the
        # pixel-res trajectory, ~62 TFLOPs) is step-INVARIANT, so the
        # deploy pipeline evaluates it once per clip/expert and feeds the
        # token-space result (dit.control_adapter_tokens; wan_video_22.py)
        # -- the step times the hoisted path; the one-time adapter cost is
        # measured separately (ctrl_adapter_s) and added to the clip
        ctok = jnp.zeros((B, l_dit, 5120), jnp.bfloat16)
        return (params, scan, latents, t, ctx, y, ctok)
    clip = jnp.zeros((B, 257, 1280), jnp.bfloat16)
    plucker = jnp.zeros((B, l_dit, 2048), jnp.bfloat16)
    return (params, scan, latents, t, ctx, clip, y, plucker)


def _timed_reps(fwd, args, reps=3):
    """Warm + compile barrier, measure the bare sync (scalar-fetch) cost,
    then `reps` calls; returns seconds/call. THE timing harness for every
    step-like phase (time_step, time_tea_hit) -- sync-cost accounting
    lives here once so phases cannot silently measure differently."""
    out = fwd(*args)
    fetch_scalar(out)                       # warm + compile barrier
    t0 = time.perf_counter()
    fetch_scalar(out)                       # measure bare fetch cost
    sync_cost = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fwd(*args)
    fetch_scalar(out)
    return max((time.perf_counter() - t0 - sync_cost) / reps, 1e-9)


def time_step(cfg, params, scan, cache_name, reps=3, variant="wan21"):
    args = step_args(params, scan, variant)
    fwd = _aot_forward(cfg, args, cache_name, variant)
    return _timed_reps(fwd, args, reps)


def time_ctrl_adapter(variant="wan22"):
    """One-per-clip cost of the hoisted control-camera adapter
    (dit.control_adapter_tokens): pixel-unshuffle + stride-2 conv + a
    5120-channel residual block over the pixel-res trajectory, ~62 TFLOPs
    at 480x832. The deploy pipeline runs it once per expert instead of on
    every step (the torch reference pays it inside every patchify --
    wan22 wan_video_dit.py WanModel.patchify)."""
    from fantasy_world_tpu.models.wan.dit import (WanDiTConfig,
                                                  control_adapter_tokens)
    g = GEOM[variant]
    dim, cin = 5120, 24 * 64

    def mk(*s):
        return jnp.zeros(s, jnp.bfloat16)

    p = {"control_adapter": {
        "conv": {"kernel": mk(dim, cin, 2, 2), "bias": mk(dim)},
        "residual_blocks": [{
            "conv1": {"kernel": mk(dim, dim, 3, 3), "bias": mk(dim)},
            "conv2": {"kernel": mk(dim, dim, 3, 3), "bias": mk(dim)},
        }],
    }}
    dcfg = WanDiTConfig(dim=dim, in_dim=36, ffn_dim=13824, out_dim=16,
                        text_dim=4096, num_heads=40, num_layers=1,
                        has_image_input=False, add_control_adapter=True,
                        in_dim_control_adapter=24)
    ctrl = jnp.zeros((B, 24, g["F"], g["H2"] * 8, g["W2"] * 8), jnp.bfloat16)

    def fn(pp, c):
        return control_adapter_tokens(pp, dcfg, c)

    fwd = _memo_load(fn, (p, ctrl), f"bench_ctrl_adapter_{variant}",
                     repr(dcfg))
    return _timed_reps(fwd, (p, ctrl), reps=3)


def time_tea_hit(variant="wan21"):
    """Cost of a TeaCache HIT step: ``joint_forward_tea`` with skip=True --
    patchify/prologue + cached-residual add + head/unpatchify; the PCB+IRG
    block stack is lax.cond'd away (pipelines/tea_cache.py; the reference's
    TeaCache, wan_video.py:691-745). The hit branch touches no block
    weights, so its cost is DEPTH-INDEPENDENT: measured on the shallow
    tower, the number carries to the 40-block stack. What fraction of the
    50 steps hit is decided by the host planner from the real model's
    time-embedding weights + threshold, so the bench reports hit cost and
    a clip-seconds-vs-skip-rate curve rather than claiming a rate."""
    from fantasy_world_tpu.models.fusion.model import joint_forward_tea
    _name, nl, si = POINTS[0] if variant == "wan21" else POINTS22[0]
    cfg, params, scan = build(nl, si, variant=variant)
    l_dit, _, _ = geom_tokens(variant)
    res0 = jnp.zeros((B, l_dit, cfg.dit.dim), jnp.bfloat16)
    skip = jnp.asarray(True)
    args0 = step_args(params, scan, variant)
    if variant == "wan22":
        def fn(p, s, l, t, c, y, ctok, sk, re):      # noqa: E306
            return joint_forward_tea(p, s, cfg, l, t, c, None, y,
                                     skip=sk, residual=re,
                                     control_tokens=ctok)[0]
    else:
        def fn(p, s, l, t, c, cl, y, pf, sk, re):
            return joint_forward_tea(p, s, cfg, l, t, c, cl, y,
                                     plucker_fea=pf, skip=sk,
                                     residual=re)[0]
    args = args0 + (skip, res0)
    tagv = "" if variant == "wan21" else f"_{variant}"
    fwd = _memo_load(fn, args, f"bench_tea_hit{tagv}", repr(cfg))
    t = _timed_reps(fwd, args, reps=5)
    del params, scan
    return t


# Latest complete result record. The driver's contract is ONE JSON line on
# stdout; interim checkpoints therefore go to STDERR (forensics on a killed
# run), and a SIGTERM handler (what `timeout` sends first) flushes the
# best-so-far record to stdout so even a driver-side kill yields a
# parseable final line.
#
# r5 (VERDICT r4 weak-#1/next-#1): the driver captures only a 2,000-char
# TAIL of stdout; r4's single line grew to 3,615 chars (wan22 + int8
# families + tea curves) and the round's of-record artifact came back
# `parsed: null`. The stdout line is therefore a COMPACT headline capped at
# COMPACT_CAP chars (every optional phase populated stays under it --
# enforced by tests/test_bench_model.py::test_compact_line_stays_under_cap);
# the full points tree is written to BENCH_DETAILS.json at every emission.
_LAST_RECORD = None
_STDOUT_EMITTED = False
COMPACT_CAP = 1800
DETAILS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_DETAILS.json")


def _variant_summary(pts, step_value=None):
    """Compact per-variant summary: the numbers a reader needs to judge the
    deploy story, none of the per-point forensics (those live in
    BENCH_DETAILS.json)."""
    out = {}
    if step_value is not None:
        out["step_s"] = step_value
    for src, dst in (("projected_clip_seconds", "clip_s"),
                     ("projected_clip_seconds_v5p8_equiv", "v5p8_s"),
                     ("projected_clip_seconds_v5p16_equiv", "v5p16_s"),
                     ("flops_floor_seconds_v5p8_mfu1", "floor_v5p8_mfu1_s"),
                     ("int8_full_s", "int8_step_s"),
                     ("int8_speedup", "int8_speedup"),
                     ("fit_residual_pct", "fit_residual_pct"),
                     ("tea_cache_hit_step_s", "tea_hit_s")):
        if src in pts:
            out[dst] = pts[src]
    vb = pts.get("v5p16_bracket")
    if isinstance(vb, dict):
        out["v5p16_range_s"] = [vb.get("best_s"), vb.get("worst_s")]
    dop = pts.get("deploy_options_v5p16")
    if isinstance(dop, dict):
        out["v5p16_options_s"] = {k[:-2]: v for k, v in dop.items()
                                  if k.endswith("_s")}
    # deepest validated depth point (the extrapolation evidence, one number)
    deepest = None
    for key in ("deep_holdout_bf16", "deep_holdout", "deep_holdout_16",
                "deep_holdout_int8"):
        d = pts.get(key)
        if isinstance(d, dict) and "blocks" in d:
            if deepest is None or d["blocks"] > deepest["blocks"]:
                deepest = d
    if deepest:
        out["deepest_depth_check"] = {
            "blocks": deepest["blocks"], "precision": deepest["precision"],
            "residual_pct": deepest.get("residual_pct")}
    return out


def make_compact(rec):
    """The driver-parseable stdout line: headline metric + per-variant
    summaries, <= COMPACT_CAP chars even with every optional phase
    populated. Falls back to dropping optional sections (never the metric/
    value/vs_baseline core) if a future field pushes it over the cap."""
    points = rec.get("points", {})
    compact = {k: rec[k] for k in
               ("metric", "value", "unit", "vs_baseline", "implied_tflops",
                "chip_peak_tflops", "implied_mfu", "sane", "partial",
                "target_equiv_sec_this_chip") if k in rec}
    for k in ("error", "terminated_by_signal"):
        if k in rec:
            compact[k] = rec[k]
    if isinstance(points, dict):
        w21 = _variant_summary(points)
        if w21:
            compact["wan21"] = w21
        w22p = points.get("wan22")
        if isinstance(w22p, dict) and w22p:
            compact["wan22"] = _variant_summary(w22p,
                                                step_value=w22p.get("value"))
        for key in ("int8_full40", "composed_clip"):    # r5 headline items
            if key in points:
                compact[key] = points[key]
    compact["details_file"] = os.path.basename(DETAILS_PATH)
    line = json.dumps(compact)
    if len(line) > COMPACT_CAP:
        for drop in ("int8_full40", "composed_clip", "wan22", "wan21"):
            compact.pop(drop, None)
            compact["truncated"] = True
            line = json.dumps(compact)
            if len(line) <= COMPACT_CAP:
                break
    return line


def _write_details(rec):
    try:
        with open(DETAILS_PATH, "w") as fh:
            json.dump(rec, fh, indent=1)
    except OSError as e:                    # read-only fs: stdout still wins
        log(f"details write failed: {e}")


def emit(value_s, flops_full, partial, points, to_stdout=False):
    global _LAST_RECORD, _STDOUT_EMITTED
    value_s = float(value_s)               # np.float64 from lstsq fits
    peak = chip_peak_tflops()
    implied = flops_full / value_s / 1e12
    sane = bool(implied <= peak * 1.02)
    # hardware-normalized comparison: scale the v5p-8 target budget to this
    # chip's peak so vs_baseline is a like-for-like utilization ratio
    target_here = TARGET_SEC_PER_STEP * (TARGET_HW_TFLOPS / peak)
    rec = {
        "metric": "sec_per_denoise_step_480p_14b_extrapolated",
        "value": round(value_s, 4),
        "unit": "s",
        "vs_baseline": round(target_here / value_s, 4) if sane else 0.0,
        "implied_tflops": round(implied, 1),
        "chip_peak_tflops": peak,
        "implied_mfu": round(implied / peak, 4),
        "sane": sane,
        "partial": partial,
        "points": points,
        "target_equiv_sec_this_chip": round(target_here, 2),
    }
    if not sane:
        rec["error"] = (f"implied {implied:.0f} TFLOP/s exceeds chip peak "
                        f"{peak:.0f}; timing loop not synchronizing")
    _LAST_RECORD = rec
    _write_details(rec)                    # full tree, every emission
    if to_stdout:
        print(make_compact(rec), flush=True)
        _STDOUT_EMITTED = True
    else:
        log("checkpoint: " + make_compact(rec))
    return sane


def _flush_on_term(signum, frame):
    """`timeout`/driver kills send SIGTERM: flush the best-so-far record
    as THE stdout line (marked) instead of dying silently. If the final
    line already went out (signal raced the tail of main), print nothing —
    stdout must carry exactly one record."""
    if _LAST_RECORD is not None and not _STDOUT_EMITTED:
        rec = dict(_LAST_RECORD, partial=True, terminated_by_signal=signum)
        _write_details(rec)
        print(make_compact(rec), flush=True)
    raise SystemExit(143)


# measurement points: (name, num_layers, start_index) -> PCB count =
# start_index, IRG count = num_layers - start_index. Three points with
# linearly independent (1, n_pcb, n_irg) rows let us solve per-layer-TYPE
# costs instead of assuming PCB and IRG share one time-per-FLOP (VERDICT
# round-1 "What's weak" #1: verify, don't assume). 6 blocks is the deepest
# that fits v5e HBM (8 OOMed, measured). The 'holdout' point (3 PCB + 2
# IRG) is NEVER fed to the fit; its prediction error is reported as
# points.fit_residual_pct (round-2 VERDICT #3: measure fit error, don't
# assume it).
POINTS = [("shallow", 4, 2), ("deep", 6, 3), ("irgheavy", 6, 2)]
HOLDOUT = ("holdout", 5, 3)
# wan22 carries 2x the tokens (32,760 DiT / 32,865 geometry): activations
# roughly double, so the family sits shallower than wan21's. FOUR fit
# points (vs wan21's three): the 5-block 'deep' point swung +/-6% between
# r4 runs and, in an exactly-determined 3-point solve, that noise maps
# straight onto the per-layer coefficients -- the 6-block point makes the
# least-squares over-determined so single-point noise averages down.
POINTS22 = [("w22_shallow", 4, 2), ("w22_deep", 5, 3),
            ("w22_irgheavy", 5, 2), ("w22_deep6", 6, 3)]
HOLDOUT22 = ("w22_holdout", 4, 3)
# deep-range validation (r3 VERDICT next-#2): the fits train on <=6-block
# towers; these points check them far outside that range. split_trainable
# halved the towers' weight HBM (see build), so 10 blocks now fit in BF16
# and 12 in int8 (~350 MB/block vs 700 MB bf16).
BF16_DEEP = ("bf16_deep10", 10, 5)
# two int8 depth checks: 2x and 2.7x beyond the fit's deepest training
# point; 16 blocks is 40% of the full 40-block stack, so the remaining
# extrapolation leap is 2.5x (residuals measured 2026-08-20: 0.1-0.3% at
# 12, 0.43% at 16)
INT8_DEEPS = [("int8_deep12", 12, 6, "deep_holdout"),
              ("int8_deep16", 16, 8, "deep_holdout_16")]
FULL_PCB, FULL_IRG = 16, 24


def extrapolate(measured, variant="wan21"):
    """measured: list of (n_pcb, n_irg, t). Returns (t_full, fit_name,
    predict) where predict(n_pcb, n_irg) evaluates the fit.

    3+ points: solve t = fixed + n_pcb*c_pcb + n_irg*c_irg (falls back if
    the fit goes non-physical); 2 points: linear in analytic FLOPs;
    1 point: pure FLOPs ratio."""
    flops_full = analytic_flops(FULL_PCB + FULL_IRG, FULL_PCB, variant)
    if len(measured) >= 3:
        A = np.array([[1.0, p, i] for p, i, _ in measured])
        t = np.array([m[2] for m in measured])
        coef, *_ = np.linalg.lstsq(A, t, rcond=None)
        fixed, c_pcb, c_irg = coef
        if fixed < 0:
            # the true fixed cost (prologue + head) is small; noise can push
            # the intercept negative -- refit with it pinned at zero
            coef2, *_ = np.linalg.lstsq(A[:, 1:], t, rcond=None)
            fixed, (c_pcb, c_irg) = 0.0, coef2
        if fixed >= 0 and c_pcb > 0 and c_irg > 0:
            pred = lambda p, i: float(fixed + p * c_pcb + i * c_irg)  # noqa: E731
            return pred(FULL_PCB, FULL_IRG), "per-layer-type", pred
        log(f"per-type fit non-physical (fixed={fixed:.3f}, "
            f"c_pcb={c_pcb:.3f}, c_irg={c_irg:.3f}); falling back")
    if len(measured) >= 2:
        (p0, i0, t0), (p1, i1, t1) = measured[0], measured[1]
        f0 = analytic_flops(p0 + i0, p0, variant)
        f1 = analytic_flops(p1 + i1, p1, variant)
        slope = (t1 - t0) / (f1 - f0)
        fixed = max(0.0, t0 - slope * f0)
        pred = lambda p, i: float(fixed + slope                     # noqa: E731
                                  * analytic_flops(p + i, p, variant))
        return fixed + slope * flops_full, "flops-linear", pred
    p0, i0, t0 = measured[0]
    base = analytic_flops(p0 + i0, p0, variant)
    pred = lambda p, i: float(t0 * analytic_flops(p + i, p, variant)  # noqa: E731
                              / base)
    return t0 * flops_full / base, "flops-ratio", pred


def comm_model_bytes(*, n_dit, n_irg, l_dit, l_agg, l_txt, l_img,
                     D, A, BD, tp=2, sp=2, bytes_per=2):
    """Per-chip collective bytes of ONE denoise evaluation under the deploy
    sharding, parametric in geometry so the same formula can be evaluated
    at the reduced config whose partitioned HLO tests/test_comm_hlo.py
    counts (r4 VERDICT next-#7). Token counts (l_*) are GLOBAL; the dp(CFG)
    batch split leaves B=1 per data shard and the seq split divides tokens
    by ``sp`` before any collective moves them.

    tp term: one activation all-reduce after the row-parallel output
    projection of self-attn, cross-attn and ffn in every DiT block
    (PARAM_RULES megatron splits); VGGT/bicross replicate -> 0.
    sp term: 4 ulysses all_to_alls per dispatched attention (q,k,v in +
    out back) for every attention over the min_lq gate: DiT self, the TWO
    cross-attention calls of the image config (text k/v + CLIP branch),
    aggregator global, both bicross directions.
    """
    l_dit, l_agg = l_dit / sp, l_agg / sp      # per-chip shard sizes
    l_txt, l_img = l_txt / sp, l_img / sp
    ar = lambda n, size: 2 * (n - 1) / n * size      # noqa: E731
    a2a = lambda n, size: (n - 1) / n * size         # noqa: E731
    tp_bytes = n_dit * 3 * ar(tp, l_dit * D * bytes_per) if tp > 1 else 0.0
    sp_bytes = 0.0
    if sp > 1:
        sp_bytes = n_dit * 4 * a2a(sp, l_dit * D * bytes_per)     # DiT self
        sp_bytes += n_dit * 2 * (a2a(sp, l_dit * D * bytes_per)   # cross txt:
                                 + a2a(sp, l_txt * D * bytes_per))  # q/o+k/v
        if l_img:
            sp_bytes += n_dit * 2 * (a2a(sp, l_dit * D * bytes_per)  # cross
                                     + a2a(sp, l_img * D * bytes_per))  # img
        sp_bytes += n_irg * 4 * a2a(sp, l_agg * A * bytes_per)    # agg global
        sp_bytes += n_irg * 4 * (a2a(sp, l_dit * BD * bytes_per)  # bicross,
                                 + a2a(sp, l_agg * BD * bytes_per))  # 2 dirs
    return tp_bytes, sp_bytes


def v5p8_comm_model(variant="wan21"):
    """Analytic per-step ICI communication cost of the deploy sharding on a
    v5p-8 (2x2x2 submesh: data=2 CFG pair, seq=2, model=2 -- the mesh the
    multichip dryrun and tests/test_multichip.py validate).

    wan22 differences (GEOM): 2x the DiT/geometry token counts, and the
    cross-attention dispatches ONE ulysses'd call (512 text tokens; no CLIP
    image branch re-attending the query). The dual 14B experts change HBM
    (2 x 14B bf16 = 56 GB / 8 chips = 7 GB weights per chip on v5p's 95 GB
    -- fits with the same sharding) but NOT per-step traffic: the experts
    are phase-switched on the timestep boundary, exactly one is hot per
    step (pipelines/wan_video_22.py DualModelDenoiser).

    Collectives counted per denoise step (bf16 activations, B=1 per data
    shard after the CFG split), mirroring exactly what the deploy sharding
    produces:
      * tensor parallel (model=2): one activation all-reduce after the
        row-parallel output projection of each self-attn, cross-attn and
        ffn in every DiT block (megatron rules, parallel/sharding.py
        PARAM_RULES). The VGGT and bicross towers REPLICATE their params
        over 'model' (sharding.py:56, their trees use attn/mlp/_proj key
        names that no TP rule matches), so they produce no TP collectives.
      * sequence parallel (seq=2): ulysses all_to_alls (4 per attention:
        q,k,v in + out back, parallel/ulysses.py:local) for every
        attention whose query length clears the min_lq=2048 dispatch gate
        (fusion/model.py ulysses_min_lq): DiT self-attn (16,317 q),
        DiT cross-attn -- TWO dispatched calls per block in the deploy
        has_image_input config (dit.py:cross_attention: text k/v at 512
        tokens, then the image branch re-attends the same 16,317-token q
        against the 257 CLIP tokens), aggregator GLOBAL attention
        (16,422 q) and both bicross directions (each a2a's one
        16,317-side and one 16,422-side tensor pair at hidden 1152).
        Per-frame VGGT attention (782 q) stays local.
    Ring all-reduce over an axis of size n moves 2(n-1)/n x bytes per chip;
    all_to_all moves (n-1)/n x bytes per chip. v5p ICI: 9e10 B/s per link
    per direction, 6 links (3D torus); a 2x2x2 submesh gives each mesh axis
    2 links (the +/- ring pair), so W_axis = 1.8e11 B/s. No compute/comm
    overlap is assumed (conservative).

    Returns (seconds_per_step, dict_of_assumptions) -- the defended comm
    term VERDICT r2 next-#6 asked for instead of an implied zero.
    """
    ld_full, _, la_full = geom_tokens(variant)
    g = GEOM[variant]
    tp_bytes, sp_bytes = comm_model_bytes(
        n_dit=FULL_PCB + FULL_IRG, n_irg=FULL_IRG,
        l_dit=ld_full, l_agg=la_full, l_txt=g["ctx"],
        l_img=g["clip_tokens"], D=5120, A=1024, BD=1152)
    w_axis = 1.8e11
    comm_s = (tp_bytes + sp_bytes) / w_axis
    return comm_s, {
        "mesh": "data=2(cfg) seq=2 model=2",
        "variant": variant,
        "tp_gbytes_per_chip_per_step": round(tp_bytes / 1e9, 3),
        "sp_gbytes_per_chip_per_step": round(sp_bytes / 1e9, 3),
        "ici_axis_bandwidth_gbs": round(w_axis / 1e9, 1),
        "assumes": "v5p 9e10 B/s/link/dir, 2 links per submesh axis, "
                   "no compute/comm overlap (conservative)",
    }


def build_vae_decode(variant="wan21", tile=None, stride=None):
    """Params + latents + runner for the production tiled VAE decode.
    Default tile plan is the DEPLOY plan (vae.deploy_tile_plan: full-height
    strips, measured ~2x faster than the reference's (30,52)/(15,26) grid
    at both geometries -- VAE_TILE_SWEEP.json); pass tile/stride explicitly
    for the reference plan (inference_wan21.py:326, wan_video_vae.py:643)
    or the composed-clip co-residency run. SHARED by time_vae_decode (TPU
    timing) and tools/floor_analysis.py (CPU HLO floors) so the floor and
    the measurement are the same program."""
    from fantasy_world_tpu.core.params import abstract_init
    from fantasy_world_tpu.models.wan.vae import (VAEConfig, init_wan_vae,
                                                  vae_decode_tiled,
                                                  deploy_tile_plan)

    g = GEOM[variant]
    if tile is None or stride is None:
        tile, stride = deploy_tile_plan(g["H2"], g["W2"])
    cfg = VAEConfig()
    with abstract_init():
        host = init_wan_vae(0, cfg, jnp.bfloat16)
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), host)
    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), abstract))()
    lat = jnp.zeros((1, 16, g["F"], g["H2"], g["W2"]), jnp.bfloat16)

    def run(p, z):
        return vae_decode_tiled(p, cfg, z, tile, stride)

    return params, lat, run


def time_vae_decode(variant="wan21"):
    """One full-clip VAE decode at the production geometry: wan21 latents
    (1,16,21,42,74) -> (1,3,81,336,592); wan22 (1,16,21,60,104) ->
    (1,3,81,480,832). The single full-tensor conv graph is preferred on
    paper, but its XLA program crashes this platform's remote-compile
    helper (measured 2026-08-18: OK at (21,21,37), HTTP 500 at (21,42,74)),
    and the tiled path is what the reference itself deploys -- so the tiled
    number IS the deployable clip cost here. As of r5 the default plan is
    the measured full-height-strip deploy plan (~2x the reference grid's
    speed; VAE_TILE_SWEEP.json has both configs' numbers)."""
    params, lat, run = build_vae_decode(variant)
    out = run(params, lat)                 # compile
    fetch_scalar(out)
    t0 = time.perf_counter()
    out = run(params, lat)
    fetch_scalar(out)
    return time.perf_counter() - t0


def heads_stage_plan(variant="wan21"):
    """The staged heads decomposition -- camera head; per-DPT-head
    stage1+2 (projection pyramid + temporal upsample) as one graph; the
    strictly per-frame stage 3 in <=27-frame chunks (identical math to the
    monolithic call, which crashes this platform's remote-compile helper
    at 81 frames). SINGLE source of truth shared by time_heads (TPU
    timing) and tools/floor_analysis.py (CPU HLO floors): a staging change
    here changes both, so they cannot silently diverge.

    Returns (cfg, cam_stage, head_stages):
      cam_stage   = (fn, args)
      head_stages = [(hname, head_params, s12_fn, s12_args, make_s3)]
                    where make_s3(outs) -> (s3_fn, first_chunk_args,
                    chunk, n_chunks) given stage-1+2 outputs."""
    from fantasy_world_tpu.models.vggt.model import VGGTConfig, init_vggt
    from fantasy_world_tpu.models.vggt.heads import (
        camera_head_forward, dpt_stage1_project, dpt_stage2_upsample,
        dpt_stage3_fuse)
    from fantasy_world_tpu.models.vggt.aggregator import AggregatorConfig
    from fantasy_world_tpu.core.params import abstract_init

    g = GEOM[variant]
    f_lat = g["F"]
    _, l_agg_p, _ = geom_tokens(variant)
    cfg = VGGTConfig(embed_dim=1024, wan_dim=5120,
                     aggregator=AggregatorConfig(embed_dim=1024, depth=24))
    with abstract_init():
        host = init_vggt(0, cfg, jnp.bfloat16)
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), host)
    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), abstract))()
    # tap tokens are synthetic; untapped layers alias one array so HBM
    # holds 5 tensors, not 24
    taps = sorted(set(cfg.dpt_layer_idx) | {23})
    uniq = {i: jnp.zeros((1, f_lat, l_agg_p, 2048), jnp.bfloat16)
            for i in taps}
    hw = (g["H2"] // 2, g["W2"] // 2)   # patch grid -> DPT out (x16 pixels)
    tap_args = tuple(uniq[i] for i in taps)

    def cam_run(p, last):
        return camera_head_forward(p["camera_head"], cfg.camera_head,
                                   last)[-1]

    cam_stage = (cam_run, (params, uniq[taps[-1]]))

    head_stages = []
    for hname, hcfg in (("depth", cfg.dpt_head(2, "exp")),
                        ("point", cfg.dpt_head(4, "inv_log"))):
        hp = params[f"{hname}_head"]

        def s12_run(hp_, *tap_arrays, _hcfg=hcfg):
            arrs = dict(zip(taps, tap_arrays))
            inters = [arrs.get(i, tap_arrays[0]) for i in range(24)]
            feats = dpt_stage1_project(hp_, _hcfg, inters, hw, 5)
            return tuple(dpt_stage2_upsample(hp_, feats))

        def s3_run(hp_, *outs_chunk, _hcfg=hcfg):
            return dpt_stage3_fuse(hp_, _hcfg, list(outs_chunk), hw)[0]

        def make_s3(outs, _s3=s3_run, _hp=hp):
            # largest divisor of T_out that stays under the ~27-frame
            # graph size the remote-compile helper tolerates (81 -> 27)
            T_out = outs[0].shape[2]
            chunk = next(c for c in range(min(27, T_out), 0, -1)
                         if T_out % c == 0)
            sl0 = tuple(o[:, :, :chunk] for o in outs)
            return _s3, (_hp,) + sl0, chunk, T_out // chunk

        head_stages.append((hname, hp, s12_run, (hp,) + tap_args, make_s3))
    return cfg, cam_stage, head_stages


def time_heads(variant="wan21"):
    """The final-step geometry heads (camera + depth + point DPT with 4x
    temporal upsample to 81 frames) at production widths, staged per
    heads_stage_plan. Each head is compiled as its OWN executable and the
    times summed: the monolithic three-head graph deterministically
    crashes this platform's remote-compile helper (HTTP 500, measured
    2026-08-19 across retries -- same failure mode as the full-tensor VAE
    decode), and the per-head sum is the honest accounting anyway since
    production runs the heads once per clip."""
    cfg, (cam_run, cam_args), head_stages = heads_stage_plan(variant)
    tagv = "" if variant == "wan21" else f"_{variant}"

    def timed(fn, args, name):
        """AOT-compile fn (memoized in-process), run twice (warm/timed),
        return (t, out)."""
        fwd = _memo_load(fn, args, f"bench_heads_{name}{tagv}", repr(cfg))
        out = fwd(*args)
        fetch_scalar(out[0] if isinstance(out, (tuple, list)) else out)
        t0 = time.perf_counter()
        out = fwd(*args)
        fetch_scalar(out[0] if isinstance(out, (tuple, list)) else out)
        return time.perf_counter() - t0, out

    total, _ = timed(cam_run, cam_args, "cam")

    for hname, hp, s12_run, s12_args, make_s3 in head_stages:
        t12, outs = timed(s12_run, s12_args, f"{hname}_s12")
        total += t12
        s3_fn, s3_args, chunk, _n = make_s3(outs)
        t3, _ = timed(s3_fn, s3_args, f"{hname}_s3")
        total += t3                               # first chunk: timed
        fwd3 = _AOT_MEMO[f"bench_heads_{hname}_s3{tagv}"]
        T_out = outs[0].shape[2]
        for t0c in range(chunk, T_out, chunk):    # rest: same executable
            sl = tuple(o[:, :, t0c:t0c + chunk] for o in outs)
            t0 = time.perf_counter()
            out3 = fwd3(hp, *sl)
            fetch_scalar(out3)
            total += time.perf_counter() - t0
        del outs
    return total


def run_heads_once(variant="wan21"):
    """Execute the staged heads ONCE (camera + both DPT heads, all chunks)
    reusing the executables time_heads memoized; returns wall seconds.
    Used by the composed-clip phase, where the heads run inside the same
    device lifetime as the denoise scan and the VAE decode."""
    cfg, (cam_run, cam_args), head_stages = heads_stage_plan(variant)
    tagv = "" if variant == "wan21" else f"_{variant}"
    t0 = time.perf_counter()
    out = _memo_load(cam_run, cam_args, f"bench_heads_cam{tagv}",
                     repr(cfg))(*cam_args)
    fetch_scalar(out)
    for hname, hp, s12_run, s12_args, make_s3 in head_stages:
        outs = _memo_load(s12_run, s12_args, f"bench_heads_{hname}_s12{tagv}",
                          repr(cfg))(*s12_args)
        fetch_scalar(outs[0])
        s3_fn, s3_args, chunk, _n = make_s3(outs)
        fwd3 = _memo_load(s3_fn, s3_args, f"bench_heads_{hname}_s3{tagv}",
                          repr(cfg))
        T_out = outs[0].shape[2]
        for t0c in range(0, T_out, chunk):
            sl = tuple(o[:, :, t0c:t0c + chunk] for o in outs)
            fetch_scalar(fwd3(hp, *sl))
        del outs
    return time.perf_counter() - t0


def composed_clip(nl=16, si=8, cache_name="int8_deep16"):
    """r4 VERDICT next-#3: run 50 denoise steps + the tiled VAE decode +
    the final-step geometry heads in ONE device lifetime -- denoiser, VAE
    and head params all resident at once -- at the deepest int8 tower
    geometry, so inter-program HBM effects (fragmentation between the
    three compiled programs, cache eviction) are measured instead of
    assumed zero. Returns (composed_s, parts) where parts carries the
    in-process isolated phase times for the same programs.

    Mirrors the reference's single-process clip
    (/root/reference/inference_wan21.py:366-399: 50 joint_forward pairs ->
    vae.decode tiled -> heads on the last step's features)."""
    cfg, params, scan = build(nl, si, quant=True)
    log(f"composed: tower built ({nl} blocks int8)")
    args = step_args(params, scan, "wan21")
    fwd = _aot_forward(cfg, args, cache_name)
    # quarter-area tiles: the production (30,52)-tile decode program's
    # workspace alone occupies most of the v5e's 16 GB (measured: the
    # warm OOMs beside even a 4.9 GB tower, while running fine alone), so
    # the composed lifetime decodes at (16,26)/(8,13). Sum-of-parts uses
    # the SAME small-tile program measured in-process (parts.vae_s), so
    # the additivity comparison stays apples-to-apples.
    vparams, lat, vrun = build_vae_decode("wan21", tile=(16, 26),
                                          stride=(8, 13))
    log("composed: vae params built")
    # warm every executable with ALL params resident (the composed wall
    # must time execution, not tunnel AOT loads)
    fetch_scalar(fwd(*args))
    log("composed: step warm ok")
    fetch_scalar(vrun(vparams, lat))
    log("composed: vae warm ok")
    heads_warm_s = run_heads_once("wan21")     # loads + runs all stages
    log("composed: heads warm ok")
    # in-process isolated parts (same HBM state as the composed pass)
    step_s = _timed_reps(fwd, args, reps=3)
    t0 = time.perf_counter()
    fetch_scalar(vrun(vparams, lat))
    vae_s = time.perf_counter() - t0
    heads_s = run_heads_once("wan21")
    # the composed pass: one continuous wall across all three programs.
    # run_heads_once re-builds its (synthetic) inputs host-side before its
    # own timer starts, so the heads term is execution-only -- consistent
    # with the isolated heads_s the additive formula uses.
    t0 = time.perf_counter()
    for _ in range(50):
        out = fwd(*args)
    fetch_scalar(out)
    steps_wall = time.perf_counter() - t0
    fetch_scalar(vrun(vparams, lat))
    steps_vae_wall = time.perf_counter() - t0
    composed_s = steps_vae_wall + run_heads_once("wan21")
    del params, scan, vparams
    return composed_s, {"step_s": step_s, "steps_wall_s": steps_wall,
                        "vae_s": vae_s, "heads_s": heads_s,
                        "heads_warm_s": heads_warm_s}


def run_subphase(argv, timeout_s, what):
    """Run one OOM-prone phase in a FRESH child process (python bench.py
    <argv>), returning its one-line JSON result. Rationale (measured
    2026-08-20/21): ANY RESOURCE_EXHAUSTED poisons the allocating process
    -- afterwards even a 2 GB allocation fails -- and a long-lived dirty
    process OOMs allocations a fresh one fits (fragmentation): the
    composed clip failed at 12 blocks in-process late in the run but its
    parts all fit standalone. Child processes share the tunnel fine
    (verified: a child initializes the device while the parent holds its
    client) and reuse the AOT cache, so the isolation costs one jax
    startup + executable loads."""
    import subprocess
    cmd = [sys.executable, os.path.abspath(__file__)] \
        + [str(a) for a in argv]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"ok": False, "error": f"timeout after {timeout_s}s"}
    tail = (r.stderr or "").strip().splitlines()[-3:]
    for ln in tail:
        log(f"[{what}] {ln[:160]}")
    for line in reversed((r.stdout or "").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except ValueError:
                break
    return {"ok": False,
            "error": f"rc={r.returncode}: {(r.stderr or '')[-300:]}"}


def main():
    import gc
    flops_full = analytic_flops(FULL_PCB + FULL_IRG, FULL_PCB)

    measured = {"wan21": [], "wan22": []}   # variant -> [(pcb, irg, t)]
    measured_q = []                          # int8 (wan21 geometry)
    holdout_t = {"wan21": None, "wan22": None}
    aux = {}                                 # (variant, kind) -> median | None
    points = {"wan22": {}}
    state = {"last_phase_s": None}

    def budget_left(scale=1.1):
        if state["last_phase_s"] is None:
            return True
        elapsed = time.perf_counter() - _T_START
        if elapsed + scale * state["last_phase_s"] > BUDGET_S:
            log(f"budget guard at {elapsed:.0f}s "
                f"(next phase projected {scale * state['last_phase_s']:.0f}s)")
            return False
        return True

    def run_point(name, nl, si, variant="wan21", quant=False):
        """Build + time one step point; returns t or None (OOM/failure)."""
        try:
            t0 = time.perf_counter()
            cfg_p, p_p, s_p = build(nl, si, quant=quant, variant=variant)
            log(f"{name} build {time.perf_counter() - t0:.0f}s")
            t0 = time.perf_counter()
            t_p = retry_transient(
                lambda: time_step(cfg_p, p_p, s_p, name, variant=variant),
                name)
            state["last_phase_s"] = time.perf_counter() - t0
            fl = analytic_flops(nl, si, variant)
            log(f"{name} compile+time {state['last_phase_s']:.0f}s -> "
                f"{t_p * 1e3:.0f} ms/step ({fl / t_p / 1e12:.0f} TFLOP/s)")
            del p_p, s_p
            gc.collect()
            return t_p
        except Exception as e:              # RESOURCE_EXHAUSTED etc.
            state["last_error"] = f"{type(e).__name__}: {str(e)[:300]}"
            log(f"{name} point failed ({state['last_error'][:220]})")
            gc.collect()
            return None

    def run_family(variant, pts, holdout, quant=False, dest=None):
        """Measure a point family + its holdout into `dest`/holdout_t."""
        pts_dest = points["wan22"] if variant == "wan22" else points
        for name, nl, si in pts:
            if (any(len(v) for v in measured.values()) and
                    not budget_left()):
                return
            t_p = run_point(name, nl, si, variant, quant)
            if t_p is None:
                if not any(len(v) for v in measured.values()) \
                        and not quant:
                    # preserve the root cause: the driver-visible error
                    # record must say OOM vs tunnel vs code
                    raise RuntimeError(
                        f"first point {name} failed: "
                        f"{state.get('last_error', 'unknown')}")
                continue
            (dest if dest is not None else measured[variant]).append(
                (si, nl - si, t_p))
            pts_dest[f"{name}_s"] = round(t_p, 4)
        if holdout and budget_left():
            name, nl, si = holdout
            t_p = run_point(name, nl, si, variant, quant)
            if t_p is not None:
                holdout_t[variant] = t_p
                pts_dest[f"{name}_s"] = round(t_p, 4)

    def fit_points(variant, pts_dest):
        ms = measured[variant]
        if not ms:
            return None
        full_v, fit, predict = extrapolate(ms, variant)
        pts_dest["fit"] = fit
        hold = HOLDOUT if variant == "wan21" else HOLDOUT22
        if holdout_t[variant] is not None:
            pred = predict(hold[2], hold[1] - hold[2])
            resid = abs(pred - holdout_t[variant]) / holdout_t[variant] * 100
            pts_dest["fit_residual_pct"] = round(resid, 2)
            if resid > 10.0:
                pts_dest["fit_residual_flag"] = (
                    f"holdout prediction off by {resid:.1f}% (>10%): treat "
                    f"the extrapolated value with suspicion")
                log(f"{variant}: " + pts_dest["fit_residual_flag"])
        return full_v

    def run_aux(variant):
        """VAE decode + geometry heads, AUX_REPS times each, median kept.
        With AOT loads memoized (round 4), rep 1 pays the load and reps 2+
        time pure execution, so the median reflects the device, not the
        tunnel (the r3 9.8->16.4 s swing was load overhead)."""
        pts_dest = points["wan22"] if variant == "wan22" else points
        kinds = [("vae_decode_s", time_vae_decode), ("heads_s", time_heads)]
        if variant == "wan22":
            kinds.append(("ctrl_adapter_s", time_ctrl_adapter))
        for kind, fn in kinds:
            if not budget_left():
                return
            runs = []
            for rep in range(AUX_REPS):
                if runs and not budget_left(scale=0.6):
                    log(f"{variant} {kind}: stopping at {len(runs)} rep(s) "
                        f"for budget")
                    break
                try:
                    t0 = time.perf_counter()
                    runs.append(retry_transient(lambda: fn(variant), kind))
                    state["last_phase_s"] = time.perf_counter() - t0
                    log(f"{variant} {kind[:-2]} rep {rep + 1}/{AUX_REPS} "
                        f"({state['last_phase_s']:.0f}s wall) -> "
                        f"{runs[-1]:.2f} s")
                except Exception as e:
                    log(f"{variant} {kind} failed ({type(e).__name__}: "
                        f"{str(e)[:200]})")
                    break
                gc.collect()
            aux[(variant, kind)] = float(np.median(runs)) if runs else None
            if runs:
                pts_dest[kind] = round(aux[(variant, kind)], 3)
                pts_dest[f"{kind[:-2]}_min_med_max"] = [
                    round(min(runs), 3),
                    round(aux[(variant, kind)], 3), round(max(runs), 3)]
                if kind == "vae_decode_s":
                    from fantasy_world_tpu.models.wan.vae import \
                        deploy_tile_plan
                    g = GEOM[variant]
                    pts_dest["vae_tile_plan"] = list(
                        deploy_tile_plan(g["H2"], g["W2"]))
            gc.collect()

    def project_clip(variant, full_v, pts_dest):
        vae_s = aux.get((variant, "vae_decode_s"))
        heads_s = aux.get((variant, "heads_s"))
        if full_v is None or vae_s is None or heads_s is None:
            return
        # end-to-end clip projection: 50 denoise steps + one tiled-VAE-
        # equivalent full decode + the final-step geometry heads. Encoders
        # (T5/CLIP/VAE-encode, one call each) and host pre/post are <1 s
        # and excluded, matching the reference's own accounting. wan22
        # additionally pays the hoisted control adapter once per expert
        # (2 evaluations/clip; the steps themselves consume precomputed
        # control tokens -- see step_args).
        ctrl_s = aux.get((variant, "ctrl_adapter_s")) or 0.0
        clip_s = 50.0 * float(full_v) + vae_s + heads_s + 2.0 * ctrl_s
        pts_dest["projected_clip_seconds"] = round(clip_s, 1)
        t_hit = pts_dest.get("tea_cache_hit_step_s")
        if t_hit is not None:
            # TeaCache (the reference's own speed option): a planned-skip
            # step costs t_hit instead of the full step. The skip RATE
            # needs the real model's time-embedding weights + threshold
            # (host planner, pipelines/tea_cache.py), so report the curve,
            # not a rate claim. Last step always computes; rates shown are
            # the TeaCache paper/DiffSynth's documented operating range.
            pts_dest["tea_cache"] = {
                "hit_step_s": t_hit,
                # same per-clip constants as projected_clip_seconds (incl.
                # the once-per-expert adapter for wan22): at r=0 the curve
                # reproduces the headline projection exactly
                "clip_seconds_at_skip_rate": {
                    str(r): round(50.0 * ((1.0 - r) * float(full_v)
                                          + r * t_hit)
                                  + vae_s + heads_s + 2.0 * ctrl_s, 1)
                    for r in (0.2, 0.4, 0.6)},
                "note": ("hit = prologue + cached-residual add + head "
                         "(depth-independent, measured on-chip); rate "
                         "requires real weights"),
            }
        peak = chip_peak_tflops()
        # v5p-8 equivalence = peak-FLOPs rescale of the measured compute
        # PLUS the analytic ICI cost of the deploy sharding (the compute
        # rescale alone implied zero-cost collectives, r2 VERDICT weak-#4)
        comm_s, comm_info = v5p8_comm_model(variant)
        pts_dest["v5p8_comm_model"] = dict(
            comm_seconds_per_step=round(comm_s, 4), **comm_info)
        pts_dest["projected_clip_seconds_v5p8_equiv"] = round(
            clip_s * peak / TARGET_HW_TFLOPS + 50.0 * comm_s, 1)
        if variant == "wan22":
            # physics check: 50 CFG-pair steps at the 480x832 geometry are
            # 50 x 4.21 PF = 210 PF of matmuls; v5p-8 peak moves that in
            # >=57 s at MFU=1.0, so the wan21 <=60 s north star CANNOT
            # carry over to wan22 on 8 chips for ANY implementation
            # (the torch reference included). Report the floor, and the
            # deploy size that does clear the bar (v5p-16: compute halves,
            # per-step ICI cost kept unchanged -- conservative, since the
            # doubled axis also halves per-chip shard bytes).
            floor = 50.0 * analytic_flops(FULL_PCB + FULL_IRG, FULL_PCB,
                                          variant) / (TARGET_HW_TFLOPS
                                                      * 1e12)
            pts_dest["flops_floor_seconds_v5p8_mfu1"] = round(floor, 1)
            base16 = clip_s * peak / (2 * TARGET_HW_TFLOPS)
            pts_dest["projected_clip_seconds_v5p16_equiv"] = round(
                base16 + 50.0 * comm_s, 1)
            # r4 VERDICT next-#6: the 60 s deploy claim rested on ONE
            # no-overlap analytic number with an 11% margin. Bracket it:
            #   best  = async collectives fully overlapped with compute
            #           (the a2a/AR shard sizes here are ~4-8 MB -- well
            #           inside what XLA's async pairs hide under a 14B
            #           block's matmuls);
            #   worst = no overlap AND the comm model scaled by the
            #           MEASURED graph factor V5P16_COMM_OVERHEAD
            #           (COMM_HLO.json: partitioned-HLO bytes incl. the
            #           GSPMD resharding all-gathers the model omits,
            #           = 1.37x the modeled tp+sp bytes).
            pts_dest["v5p16_bracket"] = {
                "best_s": round(base16, 1),
                "nominal_s": round(base16 + 50.0 * comm_s, 1),
                "worst_s": round(base16 + 50.0 * comm_s
                                 * V5P16_COMM_OVERHEAD, 1),
                "comm_overhead_factor": V5P16_COMM_OVERHEAD,
                "note": ("best=full compute/comm overlap; nominal="
                         "no-overlap analytic model; worst=no-overlap x "
                         "measured HLO byte factor (COMM_HLO.json)"),
            }
            # deploy option matrix: the bar should not hinge on one bf16
            # number when int8 and TeaCache are measured. Same per-clip
            # constants; tea hit steps skip the block stack, so they pay
            # neither block compute nor its collectives.
            opts = {}
            int8_s = pts_dest.get("int8_full_s")
            if int8_s:
                opts["int8_s"] = round(
                    (50.0 * int8_s + vae_s + heads_s + 2.0 * ctrl_s)
                    * peak / (2 * TARGET_HW_TFLOPS) + 50.0 * comm_s, 1)
            if t_hit is not None:
                steps = 50.0 * (0.8 * float(full_v) + 0.2 * t_hit)
                opts["tea0.2_s"] = round(
                    (steps + vae_s + heads_s + 2.0 * ctrl_s)
                    * peak / (2 * TARGET_HW_TFLOPS) + 40.0 * comm_s, 1)
                if int8_s:
                    steps = 50.0 * (0.8 * int8_s + 0.2 * t_hit)
                    opts["int8_tea0.2_s"] = round(
                        (steps + vae_s + heads_s + 2.0 * ctrl_s)
                        * peak / (2 * TARGET_HW_TFLOPS) + 40.0 * comm_s, 1)
            if opts:
                opts["note"] = ("v5p-16 clip under measured serving "
                                "options; tea rate 0.2 is the conservative "
                                "end of the TeaCache operating range")
                pts_dest["deploy_options_v5p16"] = opts

    def emit_now(partial):
        """Refresh fits/projections and print a full result line. Called
        after every phase group so a hard kill still leaves the last line
        parseable; the FINAL line is the result of record."""
        full21 = fit_points("wan21", points)
        project_clip("wan21", full21, points)
        full22 = fit_points("wan22", points["wan22"])
        if full22 is not None:
            points["wan22"]["metric"] = \
                "sec_per_denoise_step_wan22_480x832_14b_extrapolated"
            points["wan22"]["value"] = round(float(full22), 4)
            points["wan22"]["note"] = (
                "dual 14B experts are phase-switched; exactly one is hot "
                "per step, so step cost == single-expert cost")
            project_clip("wan22", full22, points["wan22"])
        if full21 is not None:
            emit(full21, flops_full, partial, points, to_stdout=not partial)
        return full21

    # ---- phase groups (each followed by a checkpoint emission) ----------
    run_family("wan21", POINTS, HOLDOUT)
    if budget_left(scale=2.5):
        # bf16 deep-range check: predicted by the shallow-regime fit,
        # measured at 10 blocks (2x the deepest fit point)
        name, nl, si = BF16_DEEP
        t_deep = run_point(name, nl, si, "wan21")
        full21_now, _, predict21 = (extrapolate(measured["wan21"])
                                    if measured["wan21"] else (None,) * 3)
        if t_deep is not None and predict21 is not None:
            pred = predict21(si, nl - si)
            points["deep_holdout_bf16"] = {
                "blocks": nl, "pcb": si, "irg": nl - si,
                "precision": "bf16",
                "measured_s": round(t_deep, 4),
                "predicted_s": round(pred, 4),
                "residual_pct": round(abs(pred - t_deep) / t_deep * 100.0,
                                      2),
            }
    emit_now(partial=True)
    run_family("wan22", POINTS22, HOLDOUT22)
    # second wan22 holdout in the UP direction (pcb=2, irg=4): the of-
    # record holdout (3,1) extrapolates DOWN below the fitted irg range
    # [2,3] and reads ~3.5-3.9% there, while the family's four points
    # agree internally to 0.02% -- the headline extrapolates UP, so pin
    # that direction in bf16 too (int8 deep8 already validates it at int8)
    if budget_left(scale=2.0):
        name, nl, si = ("w22_holdout_up", 6, 2)
        t_up = run_point(name, nl, si, "wan22")
        if t_up is not None and len(measured["wan22"]) >= 3:
            _, _, predict22 = extrapolate(measured["wan22"], "wan22")
            pred = float(predict22(si, nl - si))
            points["wan22"][f"{name}_s"] = round(t_up, 4)
            points["wan22"]["fit_residual_up_pct"] = round(
                abs(pred - t_up) / t_up * 100.0, 2)
    emit_now(partial=True)
    if budget_left():
        run_aux("wan21")
        emit_now(partial=True)
    if budget_left():
        run_aux("wan22")
        emit_now(partial=True)
    # int8 serving points + the 12-block deep-range validation (the fit is
    # trained on <=6-block towers; int8 weights let 12 blocks fit HBM, so
    # the deep point checks the extrapolation 2x beyond its training range)
    if budget_left():
        run_family("wan21", [(f"int8_{n}", l, s) for n, l, s in POINTS],
                   None, quant=True, dest=measured_q)
        if len(measured_q) >= 2:
            full_q, fit_q, predict_q = extrapolate(measured_q)
            points["int8_full_s"] = round(float(full_q), 4)
            points["int8_fit"] = fit_q
            full21 = fit_points("wan21", points)
            if full21:
                points["int8_speedup"] = round(float(full21) / float(full_q),
                                               3)
            for name, nl, si, key in INT8_DEEPS:
                if not budget_left(scale=2.5):
                    break
                t_deep = run_point(name, nl, si, "wan21", quant=True)
                if t_deep is not None:
                    pred = predict_q(si, nl - si)
                    points[key] = {
                        "blocks": nl, "pcb": si, "irg": nl - si,
                        "precision": "int8",
                        "measured_s": round(t_deep, 4),
                        "predicted_s": round(pred, 4),
                        "residual_pct": round(
                            abs(pred - t_deep) / t_deep * 100.0, 2),
                    }
            state["predict_q"] = predict_q
    # TeaCache hit-step cost (cheap: one shallow tower per variant)
    for variant in ("wan21", "wan22"):
        if not budget_left():
            break
        try:
            t0 = time.perf_counter()
            t_hit = retry_transient(lambda v=variant: time_tea_hit(v),
                                    f"tea_hit_{variant}")
            state["last_phase_s"] = time.perf_counter() - t0
            dest = points if variant == "wan21" else points["wan22"]
            dest["tea_cache_hit_step_s"] = round(t_hit, 4)
            log(f"tea hit {variant}: {t_hit * 1e3:.1f} ms/step")
            gc.collect()
        except Exception as e:
            log(f"tea hit {variant} failed "
                f"({type(e).__name__}: {str(e)[:200]})")
            gc.collect()
    # int8 at the wan22 geometry (optional last phase, budget-guarded):
    # mirrors the wan21 int8 treatment -- its own 3-point fit, speedup vs
    # bf16, and a deep point 2x outside the training range validating the
    # second geometry's extrapolation at int8 like deep_holdout does for
    # wan21 (the previous evidence was a single 5-block spot measurement)
    if budget_left():
        measured_q22 = []
        run_family("wan22",
                   [(f"int8_{n}", l, s) for n, l, s in POINTS22[:3]],
                   None, quant=True, dest=measured_q22)
        if len(measured_q22) >= 2:
            full_q22, fit_q22, predict_q22 = extrapolate(measured_q22,
                                                         "wan22")
            points["wan22"]["int8_full_s"] = round(float(full_q22), 4)
            points["wan22"]["int8_fit"] = fit_q22
            if points["wan22"].get("value"):
                points["wan22"]["int8_speedup"] = round(
                    float(points["wan22"]["value"]) / float(full_q22), 3)
            if budget_left(scale=2.5):
                t_deep = run_point("int8_w22_deep8", 8, 4, "wan22",
                                   quant=True)
                if t_deep is not None:
                    pred = predict_q22(4, 4)
                    points["wan22"]["deep_holdout_int8"] = {
                        "blocks": 8, "pcb": 4, "irg": 4,
                        "precision": "int8",
                        "measured_s": round(t_deep, 4),
                        "predicted_s": round(float(pred), 4),
                        "residual_pct": round(
                            abs(float(pred) - t_deep) / t_deep * 100.0, 2),
                    }
    # composed clip (r4 VERDICT next-#3): 50 steps + tiled VAE + heads in
    # ONE device lifetime -- all three programs' params resident at once
    # -- vs the additive projected_clip_seconds formula on the same tower.
    # Runs in a FRESH child process (run_subphase): in-process attempts
    # late in the run OOM'd at depths whose parts all fit standalone
    # (fragmentation), and an OOM poisons the parent. 16 blocks first,
    # 12-block fallback; failures are recorded, not fatal.
    if budget_left(scale=2.0) and state.get("predict_q") is not None:
        attempts = []
        for nl, si, cache, base_key in (
                (16, 8, "int8_deep16", "deep_holdout_16"),
                (12, 6, "int8_deep12", "deep_holdout"),
                # measured 2026-08-21: even the 12-block tower + VAE +
                # heads co-resident RESOURCE_EXHAUST a STANDALONE fresh
                # process on the 16 GB v5e -- the fallback ladder ends at
                # a depth whose three programs genuinely fit
                (8, 4, "int8_composed8", None)):
            t0 = time.perf_counter()
            res = run_subphase(["--composed", nl, si, cache], 2700,
                               f"composed{nl}")
            state["last_phase_s"] = time.perf_counter() - t0
            if not res.get("ok"):
                attempts.append(f"{nl}-block: {res.get('error', '')[:140]}")
                log(f"composed clip {nl}-block child failed: "
                    f"{res.get('error', '')[:180]}")
                continue
            parts = res["parts"]
            composed_s = float(res["composed_s"])
            # every term of the sum comes from the SAME process, programs
            # and accounting as the composed pass (in-child isolated
            # measurements) -- the delta then isolates exactly the
            # inter-program effects the additive formula assumes away.
            # The cross-process deep point is recorded alongside so a
            # reader can check the step term against the main phases.
            sum_parts = (50.0 * parts["step_s"] + parts["vae_s"]
                         + parts["heads_s"])
            xproc = (points.get(base_key) or {}).get("measured_s")
            delta = (composed_s - sum_parts) / sum_parts * 100.0
            points["composed_clip"] = {
                "blocks": nl, "precision": "int8",
                "composed_s": round(composed_s, 1),
                "sum_of_parts_s": round(sum_parts, 1),
                "delta_pct": round(delta, 2),
                "vae_tiles": "(16,26)/(8,13)",
            }
            if xproc:
                points["composed_clip"]["cross_process_step_s"] = xproc
            if attempts:
                points["composed_clip"]["note"] = \
                    "shallower fallback; " + "; ".join(attempts)
            points["composed_clip_detail"] = {
                k: round(v, 4) for k, v in parts.items()}
            log(f"composed clip ({nl} blocks): {composed_s:.1f}s vs sum "
                f"{sum_parts:.1f}s ({delta:+.1f}%)")
            break
        else:
            points["composed_clip"] = {"failed": attempts}

    # full-depth int8 HBM ladder (r4 VERDICT next-#2): each depth probes
    # in its own FRESH child process so a genuine wall is measured --
    # in-parent probing was doubly wrong (an OOM poisons the process AND a
    # long-lived dirty arena under-reports what fits). Ascending depths;
    # the first fresh-process failure is the wall.
    predict_q = state.get("predict_q")
    if budget_left(scale=1.5) and predict_q is not None:
        ladder = []
        for nl, si in ((40, 16), (36, 15), (32, 13), (28, 11), (24, 10),
                       (20, 8)):
            cfg_l = make_config(nl, si)
            ladder.append({
                "blocks": nl, "pcb": si,
                "int8_weights_gb": round(
                    tree_gbytes(abstract_tower(cfg_l, True)), 2),
                "bf16_weights_gb": round(
                    tree_gbytes(abstract_tower(cfg_l, False)), 2),
                "attempted": False, "result": "not attempted"})

        deepest = wall = None
        for nl, si in ((20, 8), (24, 10), (28, 11), (32, 13), (36, 15)):
            if not budget_left(scale=2.5):
                break
            entry = next(x for x in ladder if x["blocks"] == nl)
            entry["attempted"] = True
            t0 = time.perf_counter()
            res = run_subphase(["--ladder-depth", nl, si], 3000,
                               f"ladder{nl}")
            state["last_phase_s"] = time.perf_counter() - t0
            log(f"ladder {nl}-block fresh-process step: "
                f"{res if not res.get('ok') else res.get('measured_s')}"
                f" ({state['last_phase_s']:.0f}s)")
            if not res.get("ok"):
                entry["result"] = ("fresh-process failure: "
                                   + res.get("error", "")[:200])
                wall = entry
                break
            t_d = float(res["measured_s"])
            pred = float(predict_q(si, nl - si))
            entry.update(result="ok", measured_s=round(t_d, 4),
                         predicted_s=round(pred, 4),
                         residual_pct=round(abs(pred - t_d) / t_d
                                            * 100.0, 2))
            deepest = entry
        if wall is None and budget_left():
            # the ascent never hit a wall: measure the pure allocation
            # wall at full depth (19.4 GB of int8 weights vs 16 GB HBM)
            e40 = ladder[0]
            e40["attempted"] = True
            res = run_subphase(["--ladder-depth", 40, 16, "--alloc-only"],
                               1200, "ladder40alloc")
            e40["result"] = ("alloc OK (unexpected -- platform paging?)"
                             if res.get("ok") else
                             "weight alloc failed: "
                             + res.get("error", "")[:200])
            if not res.get("ok"):
                wall = e40
        points["int8_hbm_ladder"] = ladder
        # summarize ONLY what this run observed: oom is claimed iff a
        # probe actually failed (on a bigger-HBM chip, or with the budget
        # exhausted before any probe, the record says so instead)
        full40 = {"blocks": 40, "precision": "int8",
                  "int8_weights_gb": ladder[0]["int8_weights_gb"]}
        if wall is not None:
            full40["oom"] = True
            full40["measured_wall_blocks"] = wall["blocks"]
            full40["wall_error"] = str(wall.get("result", ""))[:160]
        elif any(x["attempted"] for x in ladder):
            full40["oom"] = False
            full40["note"] = "no wall observed at the attempted depths"
        else:
            full40["note"] = "ladder not attempted (budget)"
        if deepest:
            full40.update(
                deepest_measured_blocks=deepest["blocks"],
                measured_s=deepest.get("measured_s"),
                predicted_s=deepest.get("predicted_s"),
                residual_pct=deepest.get("residual_pct"))
        points["int8_full40"] = full40

    # r3 semantics: partial == the HEADLINE fit is underdetermined (<2
    # wan21 points); missing optional phases show as absent points keys
    emit_now(partial=len(measured["wan21"]) < 2)


def parity_main(out_path="PARITY_TPU.json"):
    """On-device numerical parity of the COMPILED kernels (r2 VERDICT
    next-#2): until round 3, the Mosaic-compiled flash kernel was only ever
    parity-checked in interpret mode on CPU and *timed* on the chip --
    a real-hardware miscompile or tail-block masking bug at production
    shapes would have been invisible.

    Runs on whatever jax.devices() provides (the tunneled v5e in this
    environment; CPU if forced) and asserts:
      1. the flash-attention kernel at the three production shape classes
         (16,317 ragged DiT tokens D=128; 16,422 VGGT tokens D=64; the
         cross-length bicross D=96) against the XLA einsum path evaluated
         on 512 probe queries -- the FIRST 256 rows and the LAST 256 rows,
         the latter exercising the ragged tail block (full-length XLA at
         16k tokens would materialize a 42 GB score tensor and OOM);
      2. the compiled custom-VJP backward (dq/dk/dv) at a ragged length;
      3. the int8 MXU dot of the serving path vs exact f64 emulation;
      4. a tiny-config joint_forward end-to-end, pallas vs xla dispatch.
    Writes one JSON artifact and exits non-zero on any tolerance breach.
    """
    from fantasy_world_tpu.ops.flash_attention import flash_attention
    from fantasy_world_tpu.ops import attention as attn_mod

    results = {"platform": jax.devices()[0].platform,
               "device_kind": jax.devices()[0].device_kind,
               "checks": []}
    rng = np.random.default_rng(0)

    def bf16(shape):
        return jnp.asarray(rng.standard_normal(shape, np.float32),
                           jnp.bfloat16)

    flash = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, scale=q.shape[-1] ** -0.5))

    for name, qshape, kshape, tol in (
            ("flash_dit_self_D128", (2, L_DIT, 40, 128),
             (2, L_DIT, 40, 128), 2e-2),
            ("flash_vggt_global_D64", (2, L_AGG, 16, 64),
             (2, L_AGG, 16, 64), 2e-2),
            ("flash_bicross_D96", (2, L_DIT, 12, 96),
             (2, L_AGG, 12, 96), 2e-2)):
        t0 = time.perf_counter()
        q, k, v = bf16(qshape), bf16(kshape), bf16(kshape)
        out = flash(q, k, v)
        fetch_scalar(out)
        rows = np.r_[0:256, qshape[1] - 256:qshape[1]]
        ref = attn_mod._xla_attention(q[:, rows], k, v,
                                      qshape[-1] ** -0.5)
        diff = float(jnp.max(jnp.abs(
            out[:, rows].astype(jnp.float32) - ref.astype(jnp.float32))))
        results["checks"].append({
            "name": name, "q_shape": list(qshape), "kv_shape": list(kshape),
            "probe_rows": "first256+last256 (ragged tail)",
            "max_abs_diff": round(diff, 6), "tol": tol, "ok": diff < tol,
            "wall_s": round(time.perf_counter() - t0, 1)})
        log(f"parity {name}: max|pallas-xla| = {diff:.2e} "
            f"(tol {tol}) {'OK' if diff < tol else 'FAIL'}")
        del q, k, v, out, ref

    # backward: the custom-VJP Pallas kernels (dq sweep over k blocks,
    # dk/dv sweep over q blocks with in-kernel delta recomputation) are
    # parity-tested in interpret mode on CPU (tests/test_flash_grad.py);
    # this asserts the MOSAIC-COMPILED backward on the real device, at a
    # ragged token count whose XLA backward still fits in HBM (2237 =
    # 8 full 256-blocks + a 189 tail exercising the masked tail block).
    t0 = time.perf_counter()
    Lg, Hg, Dg = 2237, 8, 128
    q, k, v = bf16((2, Lg, Hg, Dg)), bf16((2, Lg, Hg, Dg)), \
        bf16((2, Lg, Hg, Dg))
    do = bf16((2, Lg, Hg, Dg)).astype(jnp.float32)
    sc = Dg ** -0.5

    def vjp_grads(fn):
        def loss(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) * do)
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)

    gp = vjp_grads(lambda q, k, v: flash_attention(q, k, v, scale=sc))
    fetch_scalar(gp[0])
    gr = vjp_grads(lambda q, k, v: attn_mod._xla_attention(q, k, v, sc))
    diff = max(float(jnp.max(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32))))
        for a, b in zip(gp, gr))
    tol = 5e-2
    results["checks"].append({
        "name": "flash_vjp_ragged_D128",
        "q_shape": [2, Lg, Hg, Dg], "kv_shape": [2, Lg, Hg, Dg],
        "grads": "dq,dk,dv vs jax.grad of the XLA path (bf16 in, f32 loss)",
        "max_abs_diff": round(diff, 6), "tol": tol, "ok": diff < tol,
        "wall_s": round(time.perf_counter() - t0, 1)})
    log(f"parity flash_vjp_ragged_D128: max|pallas-xla| grad diff = "
        f"{diff:.2e} (tol {tol}) {'OK' if diff < tol else 'FAIL'}")
    del q, k, v, do, gp, gr

    # int8 MXU dot, checked in two layers (r3 ADVICE: the previous single
    # end-to-end check re-derived the activation quantization on the HOST,
    # so TPU-vs-host round() flips at scale ties leaked into a tolerance
    # that was advertised as proving the integer dot exact):
    #   (a) BIT-EXACT integer path: quantize the activations ON DEVICE,
    #       pull that exact int8 tensor to host, run the int8xint8->int32
    #       lax.dot_general COMPILED on the device on the same tensor, and
    #       require np.array_equal against an exact f64 host emulation
    #       (f64 holds every int32 partial exactly). Catches an int8-MXU
    #       miscompile/saturation bug outright.
    #   (b) end-to-end qlinear (device quant + dot + f32 rescale) vs a host
    #       f64 emulation built from the SAME device-computed xq/sx: the
    #       only remaining divergence is f32-vs-f64 rescale rounding, so
    #       the tolerance is a few ulp of f32 (1e-5 rel), 100x tighter
    #       than the old check.
    t0 = time.perf_counter()
    from fantasy_world_tpu.core.quant import quantize_linear_params, qlinear
    Kq = Nq = 5120
    Mq = 512
    pq = quantize_linear_params(
        {"kernel": jnp.asarray(rng.standard_normal((Kq, Nq), np.float32))})
    xq_in = jnp.asarray(rng.standard_normal((Mq, Kq), np.float32))

    def dev_quant(x):                      # mirrors qlinear's activation path
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True) / 127.0,
                         1e-12)
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        return xq, sx

    xq_dev, sx_dev = jax.jit(dev_quant)(xq_in)
    y32_dev = jax.jit(lambda xq, kq: jax.lax.dot_general(
        xq, kq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))(xq_dev, pq["kernel_q"])
    fetch_scalar(y32_dev.astype(jnp.float32))
    xq_host = np.asarray(xq_dev, np.int64)
    kq_host = np.asarray(pq["kernel_q"], np.int64)
    y32_ref = (xq_host.astype(np.float64) @ kq_host.astype(np.float64)
               ).astype(np.int64)
    int_exact = bool(np.array_equal(np.asarray(y32_dev, np.int64), y32_ref))
    results["checks"].append({
        "name": "int8_mxu_integer_dot_bitexact",
        "x_shape": [Mq, Kq], "kernel_shape": [Kq, Nq],
        "reference": "exact f64 host emulation on the device-quantized xq",
        "bit_exact": int_exact, "ok": int_exact,
        "wall_s": round(time.perf_counter() - t0, 1)})
    log(f"parity int8 integer dot: bit-exact={int_exact} "
        f"{'OK' if int_exact else 'FAIL'}")

    t0 = time.perf_counter()
    y_dev = np.asarray(jax.jit(qlinear)(pq, xq_in), np.float32)
    y_ref = (y32_ref.astype(np.float64)
             * np.asarray(sx_dev, np.float64)
             * np.asarray(pq["kscale"], np.float64))
    diff = float(np.max(np.abs(y_dev - y_ref)) / np.max(np.abs(y_ref)))
    tol = 1e-5   # f32-vs-f64 rescale rounding only (integer path proven
    #              bit-exact above on the same xq)
    results["checks"].append({
        "name": "int8_mxu_qlinear",
        "x_shape": [Mq, Kq], "kernel_shape": [Kq, Nq],
        "reference": "f64 rescale of the bit-exact int32 dot",
        "max_rel_diff": round(diff, 9), "tol": tol, "ok": diff < tol,
        "wall_s": round(time.perf_counter() - t0, 1)})
    log(f"parity int8_mxu_qlinear: max rel|tpu-f64| = {diff:.2e} "
        f"(tol {tol}) {'OK' if diff < tol else 'FAIL'}")
    del pq, xq_in, xq_dev, y32_dev, y_dev, y_ref, y32_ref, xq_host, kq_host

    # end-to-end: tiny-config CFG joint forward, pallas vs xla dispatch
    t0 = time.perf_counter()
    from fantasy_world_tpu.utils.demo import demo_config
    from fantasy_world_tpu.models.fusion.model import (
        init_fusion, prepare_scan_params, joint_forward)
    cfg = demo_config(dim=256, layers=2, start_index=1, agg_dim=128)
    params = init_fusion(0, cfg, jnp.bfloat16)
    scan = prepare_scan_params(params, cfg)
    Bj, f, h2, w2 = 2, 3, 10, 12
    args = (jnp.asarray(rng.standard_normal((Bj, 16, f, h2, w2),
                                            np.float32), jnp.bfloat16),
            jnp.full((Bj,), 500.0),
            bf16((Bj, 64, 4096)), bf16((Bj, 257, 1280)),
            bf16((Bj, 20, f, h2, w2)),
            bf16((Bj, f * (h2 // 2) * (w2 // 2), 2048)))
    outs = {}
    for backend in ("pallas", "xla"):
        attn_mod.set_default_backend(backend)
        try:
            noise, _ = jax.jit(lambda l, t, c, cl, y, pf: joint_forward(
                params, scan, cfg, l, t, c, cl, y, plucker_fea=pf))(*args)
            fetch_scalar(noise)
            outs[backend] = np.asarray(noise, np.float32)
        finally:
            attn_mod.set_default_backend(None)
    diff = float(np.max(np.abs(outs["pallas"] - outs["xla"])))
    tol = 1e-1
    results["checks"].append({
        "name": "joint_forward_tiny_pallas_vs_xla",
        "config": "dim=256 layers=2 start_index=1 agg=128",
        "max_abs_diff": round(diff, 6), "tol": tol, "ok": diff < tol,
        "wall_s": round(time.perf_counter() - t0, 1)})
    log(f"parity joint_forward: max|pallas-xla| = {diff:.2e} (tol {tol}) "
        f"{'OK' if diff < tol else 'FAIL'}")

    results["ok"] = all(c["ok"] for c in results["checks"])
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({"metric": "tpu_kernel_parity",
                      "value": 1.0 if results["ok"] else 0.0,
                      "unit": "bool", "vs_baseline": 1.0,
                      "checks": len(results["checks"]),
                      "artifact": out_path}))
    if not results["ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    if "--parity" in sys.argv:
        parity_main()
        raise SystemExit(0)
    # child modes for the OOM-prone end phases (spawned by run_subphase;
    # one JSON line on stdout, consumed by the parent -- never the driver)
    if "--composed" in sys.argv:
        i = sys.argv.index("--composed")
        nl, si = int(sys.argv[i + 1]), int(sys.argv[i + 2])
        cache = sys.argv[i + 3]
        try:
            composed_s, parts = composed_clip(nl=nl, si=si,
                                              cache_name=cache)
            print(json.dumps({"ok": True, "composed_s": composed_s,
                              "parts": parts}))
        except Exception as e:
            print(json.dumps({"ok": False,
                              "error": f"{type(e).__name__}: "
                                       f"{str(e)[:300]}"}))
        raise SystemExit(0)
    if "--ladder-depth" in sys.argv:
        i = sys.argv.index("--ladder-depth")
        nl, si = int(sys.argv[i + 1]), int(sys.argv[i + 2])
        try:
            cfg_l, p_l, s_l = build(nl, si, quant=True)
            fetch_scalar(jax.tree_util.tree_leaves(s_l)[0])
            if "--alloc-only" in sys.argv:
                print(json.dumps({"ok": True, "alloc_only": True}))
            else:
                t = time_step(cfg_l, p_l, s_l, f"int8_deep{nl}")
                print(json.dumps({"ok": True, "measured_s": t}))
        except Exception as e:
            print(json.dumps({"ok": False,
                              "error": f"{type(e).__name__}: "
                                       f"{str(e)[:300]}"}))
        raise SystemExit(0)
    import signal
    signal.signal(signal.SIGTERM, _flush_on_term)
    _start_wedge_watchdog()
    try:
        main()
        if not _STDOUT_EMITTED:
            # the run finished but the headline fit stayed underdetermined
            # (final emit was partial -> stderr only, or no fit at all):
            # still honor the one-stdout-line contract
            if _LAST_RECORD is not None:
                rec = dict(_LAST_RECORD, partial=True)
                _write_details(rec)
                print(make_compact(rec), flush=True)
            else:
                print(json.dumps({
                    "metric": "sec_per_denoise_step_480p_14b_extrapolated",
                    "value": -1.0, "unit": "s", "vs_baseline": 0.0,
                    "error": "no measurement points completed",
                }))
    except Exception as e:                  # emit a parseable line no matter what
        if _LAST_RECORD is not None:
            rec = dict(_LAST_RECORD, partial=True,
                       error=f"{type(e).__name__}: {e}"[:500])
            _write_details(rec)
            print(make_compact(rec), flush=True)
        else:
            print(json.dumps({
                "metric": "sec_per_denoise_step_480p_14b_extrapolated",
                "value": -1.0, "unit": "s", "vs_baseline": 0.0,
                "error": f"{type(e).__name__}: {e}"[:500],
            }))
        raise
