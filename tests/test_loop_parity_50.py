"""50-step denoise-loop parity vs the torch reference, with drift curve.

test_loop_parity.py pins 6 steps as the per-round gate; SURVEY §7.3 flags
"error compounds across 100 forwards" as the hard part, and the product
runs FIFTY steps (r3 VERDICT next-#5). This runs the full 50-step CFG loop
tiny-config fp32 against the reference's generate_video orchestration
(fusion/model_wan21.py:226-324) with identical injected noise, records the
PER-STEP relative-L2 drift curve, asserts the final latents and every
geometry-head output within the budgeted tolerance, and writes the whole
record to PARITY_LOOP.json at the repo root (the checked-in artifact, like
PARITY_TPU.json).

Our side is step-instrumented through the SAME jitted executables the
production pipeline dispatches (_denoise_scan on length-1 xs slices +
_final_step); that the instrumentation is faithful is itself asserted by
comparing its final latents against an uninstrumented pipe.denoise() run.
"""
import json
import os

import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity

from test_fusion_e2e import (_build_reference, _our_config,   # noqa: E402
                             B, F, H2, W2)
from test_loop_parity import _reference_loop                  # noqa: E402

STEPS, CFG_SCALE, SEED = 50, 5.0, 42
ARTIFACT = os.path.join(os.path.dirname(__file__), os.pardir,
                        "PARITY_LOOP.json")
# budgets ~30-40x the measured values recorded in the artifact (measured
# 2026-08-20: final latent 2.6e-5, pose_enc 5.9e-4, other heads <= 2e-6;
# fp32 both sides -- see PARITY_LOOP.json "measured" for the values of
# record). The generous multiplier absorbs BLAS/XLA build variation across
# hosts, not algorithmic drift.
TOL_FINAL_LATENT = 1e-3
TOL_HEADS = {"pose_enc": 2e-2, "depth": 1e-3, "depth_conf": 1e-3,
             "world_points": 1e-3, "world_points_conf": 1e-3}


def _our_loop_recorded(pipe, ctx_pos, ctx_neg, clip, y, plucker, steps,
                       seed):
    """The production loop, step-instrumented: identical math/executables
    to pipe.denoise (same _denoise_scan jit on 1-step xs slices, same
    _final_step), with the post-step latents captured each iteration."""
    import jax.numpy as jnp
    from fantasy_world_tpu.pipelines.wan_video import (_denoise_scan,
                                                       _final_step)
    from fantasy_world_tpu.schedulers import FlowMatchScheduler

    cfg, params, scan_params = pipe.cfg, pipe.params["fusion"], \
        pipe._scan_params
    sched = FlowMatchScheduler().set_timesteps(steps)
    lat = pipe.generate_noise((B, cfg.dit.out_dim, F, H2, W2), seed,
                              torch_compat=True).astype(jnp.float32)
    ctx = jnp.concatenate([ctx_pos, ctx_neg], axis=0)
    clip2 = jnp.concatenate([clip] * 2, axis=0)
    y2 = jnp.concatenate([y] * 2, axis=0)
    pl2 = jnp.concatenate([plucker] * 2, axis=0)
    pairs = sched.sigma_pairs()
    ts = jnp.asarray(sched.timesteps)

    rec = []
    for i in range(steps - 1):
        xs = (ts[i:i + 1], jnp.asarray(pairs[i:i + 1, 0]),
              jnp.asarray(pairs[i:i + 1, 1]))
        lat = _denoise_scan(params, scan_params, cfg, lat, xs, ctx, clip2,
                            y2, pl2, CFG_SCALE)
        rec.append(np.asarray(lat, np.float32))    # sync before donation
    lat, pred = _final_step(params, scan_params, cfg, lat,
                            jnp.full((2 * B,), ts[-1]),
                            jnp.float32(pairs[-1, 0]),
                            jnp.float32(pairs[-1, 1]),
                            ctx, clip2, y2, pl2, CFG_SCALE)
    rec.append(np.asarray(lat, np.float32))
    pred = {k: np.asarray(v[:B], np.float32) for k, v in pred.items()}
    return rec, pred


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_generate_video_50step_parity_artifact():
    import jax.numpy as jnp
    from fantasy_world_tpu.convert.fusion import convert_fusion_checkpoint
    from fantasy_world_tpu.pipelines.wan_video import FantasyWorldPipeline

    ref, base_sd = _build_reference()
    cfg = _our_config()
    fusion_sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_fusion_checkpoint(fusion_sd, base_sd, cfg)

    rng = np.random.default_rng(23)
    ctx_pos = rng.standard_normal((B, 20, 32)).astype(np.float32)
    ctx_neg = rng.standard_normal((B, 20, 32)).astype(np.float32) * 0.3
    clip = rng.standard_normal((B, 257, 1280)).astype(np.float32)
    y = rng.standard_normal((B, 4, F, H2, W2)).astype(np.float32)
    plucker = rng.standard_normal(
        (B, F * (H2 // 2) * (W2 // 2), 48)).astype(np.float32) * 0.5

    ref_rec = []
    ref_lat, ref_pred = _reference_loop(
        ref, *(torch.from_numpy(a) for a in
               (ctx_pos, ctx_neg, clip, y, plucker)), STEPS, SEED,
        record=ref_rec)
    assert len(ref_rec) == STEPS

    pipe = FantasyWorldPipeline(cfg=cfg, params={"fusion": params})
    our_rec, our_pred = _our_loop_recorded(
        pipe, *(jnp.asarray(a) for a in
                (ctx_pos, ctx_neg, clip, y, plucker)), STEPS, SEED)
    assert len(our_rec) == STEPS

    # the instrumented loop must BE the production loop: the end-to-end
    # pipe.denoise of the same problem lands on (numerically) the same
    # final latents -- one lax.scan over 49 steps vs 49 one-step scans
    # only reorders XLA fusion, not the math
    e2e_lat, _ = pipe.denoise(
        jnp.asarray(ctx_pos), jnp.asarray(ctx_neg), jnp.asarray(clip),
        jnp.asarray(y), height=H2 * 8, width=W2 * 8,
        num_frames=4 * (F - 1) + 1, num_inference_steps=STEPS,
        cfg_scale=CFG_SCALE, seed=SEED, plucker_fea=jnp.asarray(plucker),
        torch_compat_noise=True)
    instr_vs_e2e = float(
        np.linalg.norm(np.asarray(e2e_lat, np.float32) - our_rec[-1])
        / np.linalg.norm(our_rec[-1]))
    assert instr_vs_e2e < 1e-4, instr_vs_e2e

    def rel(a, b):
        return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))

    curve = [rel(o, r) for o, r in zip(our_rec, ref_rec)]
    final_drift = curve[-1]
    head_drift = {}
    for k in ("pose_enc", "depth", "depth_conf", "world_points",
              "world_points_conf"):
        r = ref_pred[k].float().numpy()
        o = our_pred[k]
        assert o.shape == r.shape, (k, o.shape, r.shape)
        head_drift[k] = rel(o, r)

    artifact = {
        "steps": STEPS, "cfg_scale": CFG_SCALE, "seed": SEED,
        "config": "tiny fusion (dim 96, 2 PCB + 4 IRG), fp32 both sides",
        "reference": "fusion/model_wan21.py:226-324 generate_video loop",
        "per_step_rel_l2": [round(v, 7) for v in curve],
        "measured": {"final_latent_rel_l2": round(final_drift, 7),
                     "heads_rel_l2": {k: round(v, 7)
                                      for k, v in head_drift.items()},
                     "instrumented_vs_e2e_rel_l2": round(instr_vs_e2e, 9)},
        "tolerances": {"final_latent": TOL_FINAL_LATENT,
                       "heads": TOL_HEADS},
        "monotone_note": "drift grows sub-linearly; curve is the evidence",
    }
    with open(ARTIFACT, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(f"\n50-step parity: final latent rel_l2 {final_drift:.2e}; "
          f"max step drift {max(curve):.2e}; heads "
          f"{ {k: round(v, 6) for k, v in head_drift.items()} }")

    assert final_drift <= TOL_FINAL_LATENT, final_drift
    for k, tol in TOL_HEADS.items():
        assert head_drift[k] <= tol, (k, head_drift[k])
    # the torch-compat noise actually engaged (not trivially-zero inputs)
    assert final_drift > 0.0
