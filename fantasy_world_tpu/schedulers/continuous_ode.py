"""Karras-style continuous-ODE scheduler.

Functional re-design of the reference ContinuousODEScheduler
(diffsynth_wan21/schedulers/continuous_ode.py:4-57): rho-spaced sigma ramp
between sigma_max and sigma_min, EDM-style preconditioned Euler step over
variance-preserving-scaled samples. Schedule math runs on host in float64;
`step` is a pure jnp function indexed by step position (scan-friendly, no
nearest-timestep search).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ContinuousODEScheduler:
    sigma_max: float = 700.0
    sigma_min: float = 0.002
    rho: float = 7.0

    sigmas: np.ndarray = dataclasses.field(default=None, repr=False)
    timesteps: np.ndarray = dataclasses.field(default=None, repr=False)

    def __post_init__(self):
        self.set_timesteps(100)

    def set_timesteps(self, num_inference_steps: int = 100,
                      denoising_strength: float = 1.0,
                      **_) -> "ContinuousODEScheduler":
        ramp = np.linspace(1 - denoising_strength, 1, num_inference_steps,
                           dtype=np.float64)
        min_inv_rho = self.sigma_min ** (1 / self.rho)
        max_inv_rho = self.sigma_max ** (1 / self.rho)
        self.sigmas = ((max_inv_rho + ramp * (min_inv_rho - max_inv_rho))
                       ** self.rho).astype(np.float32)
        self.timesteps = (np.log(self.sigmas.astype(np.float64))
                          * 0.25).astype(np.float32)
        return self

    def step(self, model_output, step_index: int, sample, to_final=False):
        sigma = float(self.sigmas[step_index])
        vp = float(np.sqrt(sigma * sigma + 1))
        sample = sample * vp
        estimated = (-sigma / vp) * model_output + sample / (sigma * sigma + 1)
        if to_final or step_index + 1 >= len(self.sigmas):
            return estimated
        sigma_n = float(self.sigmas[step_index + 1])
        derivative = (sample - estimated) / sigma
        prev = sample + derivative * (sigma_n - sigma)
        return prev / float(np.sqrt(sigma_n * sigma_n + 1))

    def add_noise(self, original, noise, step_index: int):
        sigma = float(self.sigmas[step_index])
        return (original + noise * sigma) / float(np.sqrt(sigma * sigma + 1))

    def training_target(self, sample, noise, step_index: int):
        sigma = float(self.sigmas[step_index])
        vp = float(np.sqrt(sigma * sigma + 1))
        return (-vp / sigma + 1 / (vp * sigma)) * sample + noise / vp

    def training_weight(self, step_index: int) -> float:
        sigma = float(self.sigmas[step_index])
        return float(np.sqrt(1 + sigma * sigma)) / sigma
