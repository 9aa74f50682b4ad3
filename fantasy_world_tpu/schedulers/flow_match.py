"""Rectified-flow (flow-matching) scheduler.

Functional re-design of the reference scheduler
(diffsynth_wan21/schedulers/flow_match.py:5-84): sigma schedule is computed
once on host in float64 numpy and the Euler update is a pure jnp function
usable inside a jitted/scanned denoise loop. The Wan pipelines construct it
with shift=5, sigma_min=0, extra_one_step=True (wan_video.py:30).

Schedule: sigmas = linspace(sigma_max', sigma_min, n[+1])[: n] then shifted
sigma -> shift*sigma / (1 + (shift-1)*sigma); timestep = sigma * 1000.
Euler step: x_{t+1} = x_t + v * (sigma_next - sigma).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class FlowMatchScheduler:
    num_train_timesteps: int = 1000
    shift: float = 5.0
    sigma_max: float = 1.0
    sigma_min: float = 0.0
    inverse_timesteps: bool = False
    extra_one_step: bool = True
    reverse_sigmas: bool = False

    sigmas: np.ndarray = dataclasses.field(default=None, repr=False)
    timesteps: np.ndarray = dataclasses.field(default=None, repr=False)

    def set_timesteps(self, num_inference_steps: int,
                      denoising_strength: float = 1.0,
                      shift: float | None = None) -> "FlowMatchScheduler":
        if shift is not None:
            self.shift = shift
        start = self.sigma_min + (self.sigma_max - self.sigma_min) * denoising_strength
        n = num_inference_steps
        if self.extra_one_step:
            sig = np.linspace(start, self.sigma_min, n + 1, dtype=np.float64)[:-1]
        else:
            sig = np.linspace(start, self.sigma_min, n, dtype=np.float64)
        if self.inverse_timesteps:
            sig = sig[::-1].copy()
        sig = self.shift * sig / (1 + (self.shift - 1) * sig)
        if self.reverse_sigmas:
            sig = 1 - sig
        self.sigmas = sig.astype(np.float32)
        self.timesteps = (sig * self.num_train_timesteps).astype(np.float32)
        return self

    # ---- pure functions usable under jit ---------------------------------

    def step(self, model_output: jnp.ndarray, step_index: int,
             sample: jnp.ndarray, to_final: bool = False) -> jnp.ndarray:
        """Euler update given the *index* into the precomputed schedule.

        Unlike the reference (which re-derives the index by nearest-timestep
        search, flow_match.py:43-53), the denoise loop here carries the step
        index explicitly -- identical result, scan-friendly.
        """
        sigma = self.sigmas[step_index]
        if to_final or step_index + 1 >= len(self.sigmas):
            sigma_next = 1.0 if (self.inverse_timesteps or self.reverse_sigmas) else 0.0
        else:
            sigma_next = self.sigmas[step_index + 1]
        return sample + model_output * (float(sigma_next) - float(sigma))

    def sigma_pairs(self) -> np.ndarray:
        """(n, 2) array of (sigma, sigma_next) for lax.scan-style loops."""
        nxt_final = 1.0 if (self.inverse_timesteps or self.reverse_sigmas) else 0.0
        nxt = np.concatenate([self.sigmas[1:], [nxt_final]]).astype(np.float32)
        return np.stack([self.sigmas, nxt], axis=1)

    def add_noise(self, original: jnp.ndarray, noise: jnp.ndarray,
                  step_index: int) -> jnp.ndarray:
        sigma = float(self.sigmas[step_index])
        return (1 - sigma) * original + sigma * noise

    def training_target(self, sample, noise, step_index=None):
        return noise - sample

    def training_weight(self, num_inference_steps: int) -> np.ndarray:
        """Gaussian timestep weighting (flow_match.py:32-37)."""
        x = self.timesteps.astype(np.float64)
        n = num_inference_steps
        y = np.exp(-2 * ((x - n / 2) / n) ** 2)
        ys = y - y.min()
        return (ys * (n / ys.sum())).astype(np.float32)
