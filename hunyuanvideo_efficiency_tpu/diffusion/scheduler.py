"""Flow-matching discrete Euler scheduler (pure functions + thin wrapper).

Reference semantics (hyvideo/diffusion/schedulers/
scheduling_flow_match_discrete.py:48-257):
  sigmas  = linspace(1, 0, N+1), SD3 time-shifted
            sigma' = shift*sigma / (1 + (shift-1)*sigma)
  reverse=True keeps the 1->0 direction; reverse=False flips to 0->1
  timesteps = sigmas[:-1] * num_train_timesteps  (fed to the model)
  step:     x_{i+1} = x_i + v * (sigmas[i+1] - sigmas[i])   in float32

The pure functions below are scan-ready; `FlowMatchDiscreteScheduler` mirrors
the reference's stateful API (set_timesteps / step / step_index) for drop-in
pipeline use.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def sd3_time_shift(t: np.ndarray, shift: float) -> np.ndarray:
    return (shift * t) / (1 + (shift - 1) * t)


def get_sigmas(
    num_inference_steps: int,
    shift: float = 1.0,
    reverse: bool = True,
    num_train_timesteps: int = 1000,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (sigmas[N+1], timesteps[N]) as float32 numpy arrays."""
    sigmas = np.linspace(1.0, 0.0, num_inference_steps + 1, dtype=np.float64)
    sigmas = sd3_time_shift(sigmas, shift)
    if not reverse:
        sigmas = 1.0 - sigmas
    sigmas = sigmas.astype(np.float32)
    timesteps = (sigmas[:-1] * num_train_timesteps).astype(np.float32)
    return sigmas, timesteps


def get_linear_quadratic_sigmas(
    num_inference_steps: int,
    linear_steps: Optional[int] = None,
    num_train_timesteps: int = 1000,
) -> Tuple[np.ndarray, np.ndarray]:
    """MovieGen-style linear-quadratic schedule. The reference accepts the
    flag (config.py:204-216) without wiring it; provided here as a working
    schedule for parity of the CLI surface."""
    if linear_steps is None:
        linear_steps = num_inference_steps // 2
    linear_sigma_schedule = [
        i * 1.0 / (2 * linear_steps) for i in range(linear_steps)]
    threshold_noise = linear_steps / (2 * num_inference_steps)
    quadratic_steps = num_inference_steps - linear_steps
    quadratic_coef = (1 - threshold_noise) / quadratic_steps ** 2 \
        if quadratic_steps else 0.0
    quadratic_sigma_schedule = [
        quadratic_coef * ((i - linear_steps) ** 2) + threshold_noise
        for i in range(linear_steps, num_inference_steps)]
    sigma_schedule = linear_sigma_schedule + quadratic_sigma_schedule + [1.0]
    sigmas = 1.0 - np.asarray(sigma_schedule, dtype=np.float32)
    timesteps = (sigmas[:-1] * num_train_timesteps).astype(np.float32)
    return sigmas, timesteps


def euler_step(sample: jnp.ndarray, model_output: jnp.ndarray,
               sigma: jnp.ndarray, sigma_next: jnp.ndarray) -> jnp.ndarray:
    """One Euler step in fp32 (reference: :236-242)."""
    s = sample.astype(jnp.float32)
    v = model_output.astype(jnp.float32)
    return s + v * (sigma_next - sigma)


class FlowMatchDiscreteScheduler:
    """Stateful wrapper mirroring the reference scheduler API."""

    order = 1
    supported_solver = ("euler",)

    def __init__(self, num_train_timesteps: int = 1000, shift: float = 1.0,
                 reverse: bool = True, solver: str = "euler",
                 n_tokens: Optional[int] = None,
                 use_linear_quadratic_schedule: bool = False,
                 linear_schedule_end: Optional[int] = None):
        if solver not in self.supported_solver:
            raise ValueError(
                f"Solver {solver} not supported. Supported: {self.supported_solver}")
        self.num_train_timesteps = num_train_timesteps
        self.shift = shift
        self.reverse = reverse
        self.solver = solver
        self.use_linear_quadratic_schedule = use_linear_quadratic_schedule
        self.linear_schedule_end = linear_schedule_end
        sigmas = np.linspace(1, 0, num_train_timesteps + 1, dtype=np.float32)
        if not reverse:
            sigmas = sigmas[::-1].copy()
        self.sigmas = sigmas
        self.timesteps = (sigmas[:-1] * num_train_timesteps).astype(np.float32)
        self.num_inference_steps = None
        self._step_index = None

    @property
    def step_index(self):
        return self._step_index

    def set_timesteps(self, num_inference_steps: int, device=None,
                      n_tokens: Optional[int] = None):
        self.num_inference_steps = num_inference_steps
        if self.use_linear_quadratic_schedule:
            self.sigmas, self.timesteps = get_linear_quadratic_sigmas(
                num_inference_steps, self.linear_schedule_end,
                self.num_train_timesteps)
        else:
            self.sigmas, self.timesteps = get_sigmas(
                num_inference_steps, self.shift, self.reverse,
                self.num_train_timesteps)
        self._step_index = None

    def scale_model_input(self, sample, timestep=None):
        return sample

    def index_for_timestep(self, timestep) -> int:
        # exact match where one exists (reference semantics,
        # scheduling_flow_match_discrete.py); otherwise nearest — a caller
        # passing a reduced-precision scalar (e.g. a bf16 device value)
        # gets the intended step instead of an IndexError
        t = float(timestep)
        idx = np.nonzero(self.timesteps == t)[0]
        if len(idx) == 0:
            return int(np.argmin(np.abs(np.asarray(self.timesteps) - t)))
        pos = 1 if len(idx) > 1 else 0
        return int(idx[pos])

    def step(self, model_output, timestep, sample, return_dict: bool = False):
        if self._step_index is None:
            self._step_index = self.index_for_timestep(timestep)
        prev = euler_step(sample, model_output,
                          float(self.sigmas[self._step_index]),
                          float(self.sigmas[self._step_index + 1]))
        self._step_index += 1
        return (prev,)

    def __len__(self):
        return self.num_train_timesteps
