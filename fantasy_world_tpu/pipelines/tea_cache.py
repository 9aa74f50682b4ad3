"""TeaCache: drift-gated skipping of the DiT block stack.

Re-design of the reference TeaCache (diffsynth_wan21/pipelines/wan_video.py:
691-745) for the XLA compilation model. The reference decides per step, on
device, whether the timestep-modulation tensor ``t_mod`` has drifted enough
since the last computed step to warrant re-running the 40-block stack; if
not, it reuses the cached stack residual.

Key observation: ``t_mod = time_projection(time_embedding(t))`` depends only
on the (host-known) timestep schedule and the frozen time-embedding weights
-- NOT on the latents. The entire skip/compute schedule can therefore be
precomputed on the host before the denoise loop with one tiny batched
forward over the 50 timesteps, and the loop body becomes a ``lax.cond``
over a static-per-step boolean fed through ``lax.scan`` -- no device-side
data-dependent control flow, no recompilation.

Polynomial rescaling coefficients are the reference's published per-model
constants (wan_video.py:702-707) -- numerical tables, kept verbatim for
behavioural parity.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

# np.poly1d coefficient vectors, highest degree first (wan_video.py:702-707)
TEACACHE_COEFFICIENTS = {
    "Wan2.1-T2V-1.3B": [-5.21862437e+04, 9.23041404e+03, -5.28275948e+02,
                        1.36987616e+01, -4.99875664e-02],
    "Wan2.1-T2V-14B": [-3.03318725e+05, 4.90537029e+04, -2.65530556e+03,
                       5.87365115e+01, -3.15583525e-01],
    "Wan2.1-I2V-14B-480P": [2.57151496e+05, -3.54229917e+04, 1.40286849e+03,
                            -1.35890334e+01, 1.32517977e-01],
    "Wan2.1-I2V-14B-720P": [8.10705460e+03, 2.13393892e+03, -3.72934672e+02,
                            1.66203073e+01, -4.17769401e-02],
}


def modulation_drift_schedule(t_mods: np.ndarray) -> np.ndarray:
    """Relative-L1 drift between consecutive per-step modulations.

    t_mods: (n_steps, ...) stacked t_mod tensors, one per timestep.
    Returns (n_steps,) with drift[0] = 0 (step 0 always computes).
    Mirrors wan_video.py:722-726.
    """
    t_mods = np.asarray(t_mods, np.float32)
    n = t_mods.shape[0]
    drift = np.zeros((n,), np.float64)
    flat = t_mods.reshape(n, -1)
    for i in range(1, n):
        prev = flat[i - 1]
        drift[i] = (np.abs(flat[i] - prev).mean()
                    / max(np.abs(prev).mean(), 1e-12))
    return drift


def plan_skips(drift: np.ndarray, rel_l1_thresh: float,
               model_id: str = "Wan2.1-I2V-14B-480P",
               coefficients=None) -> np.ndarray:
    """Host replay of TeaCache.check's accumulate-and-reset recurrence
    (wan_video.py:716-733). Returns (n_steps,) bool, True = skip the stack.
    First and last steps always compute."""
    if coefficients is None:
        if model_id not in TEACACHE_COEFFICIENTS:
            raise ValueError(
                f"{model_id} is not a supported TeaCache model id; choose "
                f"one of {sorted(TEACACHE_COEFFICIENTS)}")
        coefficients = TEACACHE_COEFFICIENTS[model_id]
    poly = np.poly1d(coefficients)
    n = len(drift)
    skip = np.zeros((n,), bool)
    acc = 0.0
    for i in range(n):
        if i == 0 or i == n - 1:
            acc = 0.0
            continue
        acc += float(poly(drift[i]))
        if acc < rel_l1_thresh:
            skip[i] = True
        else:
            acc = 0.0
    return skip


def compute_skip_schedule(dit_params, dit_cfg, timesteps,
                          rel_l1_thresh: float,
                          model_id: str = "Wan2.1-I2V-14B-480P",
                          coefficients=None) -> np.ndarray:
    """End-to-end host planner: timesteps -> per-step skip booleans.

    Evaluates ``t_mod`` for every timestep in one tiny batched forward
    (the 6*dim modulation vector; microseconds next to one denoise step),
    then replays the reference recurrence.
    """
    from ..models.wan import dit as dit_mod
    ts = jnp.asarray(np.asarray(timesteps, np.float32))
    _, t_mods = dit_mod.time_embedding(dit_params, dit_cfg, ts)
    drift = modulation_drift_schedule(np.asarray(t_mods, np.float32))
    return plan_skips(drift, rel_l1_thresh, model_id, coefficients)


def compute_skip_schedule_dual(dit_params_high, dit_params_low, dit_cfg,
                               timesteps, n_high: int,
                               rel_l1_thresh: float,
                               model_id: str = "Wan2.1-I2V-14B-480P",
                               coefficients=None) -> np.ndarray:
    """Skip planner for the Wan2.2 dual-expert (MoE-over-time) denoiser:
    steps < n_high use the high-noise expert's time-embedding weights, the
    rest the low-noise expert's. Matches the reference semantics where one
    TeaCache instance persists ``previous_modulated_input`` across the
    `switch_DiT_boundary` model swap (wan_video_new.py:1380-1422, 540-546)
    -- the drift at the boundary step compares across experts."""
    from ..models.wan import dit as dit_mod
    ts = jnp.asarray(np.asarray(timesteps, np.float32))
    _, mods_high = dit_mod.time_embedding(dit_params_high, dit_cfg, ts)
    _, mods_low = dit_mod.time_embedding(dit_params_low, dit_cfg, ts)
    mods_high = np.asarray(mods_high, np.float32)
    mods_low = np.asarray(mods_low, np.float32)
    t_mods = np.concatenate([mods_high[:n_high], mods_low[n_high:]], axis=0)
    drift = modulation_drift_schedule(t_mods)
    return plan_skips(drift, rel_l1_thresh, model_id, coefficients)
