"""Noise schedules (DDPM training + shared tables for DDIM/PLMS samplers).

Numerics match the SD1.5 scheduler config consumed by the reference
(scaled_linear betas 0.00085 -> 0.012, 1000 train steps, epsilon prediction,
steps_offset=1, "leading" timestep spacing; configs/audio-cond_animation/
avsync15_audio-cond_cfg.yaml:8-20).  Tables are host-side numpy folded into
jit programs as constants.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"  # or "v_prediction"
    steps_offset: int = 1

    @property
    def alphas_cumprod(self) -> np.ndarray:
        if self.beta_schedule == "scaled_linear":
            betas = np.linspace(self.beta_start ** 0.5, self.beta_end ** 0.5,
                                self.num_train_timesteps,
                                dtype=np.float64) ** 2
        elif self.beta_schedule == "linear":
            betas = np.linspace(self.beta_start, self.beta_end,
                                self.num_train_timesteps, dtype=np.float64)
        else:
            raise ValueError(self.beta_schedule)
        return np.cumprod(1.0 - betas).astype(np.float32)

    # ---- training-side ops (DDPM) ----
    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        """x_t = sqrt(ac_t) x0 + sqrt(1-ac_t) noise; t: (b,) int."""
        ac = jnp.asarray(self.alphas_cumprod)[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sa = jnp.sqrt(ac).reshape(shape).astype(x0.dtype)
        sb = jnp.sqrt(1.0 - ac).reshape(shape).astype(x0.dtype)
        return sa * x0 + sb * noise

    def velocity(self, x0: jnp.ndarray, noise: jnp.ndarray,
                 t: jnp.ndarray) -> jnp.ndarray:
        """v = sqrt(ac_t) noise - sqrt(1-ac_t) x0."""
        ac = jnp.asarray(self.alphas_cumprod)[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sa = jnp.sqrt(ac).reshape(shape).astype(x0.dtype)
        sb = jnp.sqrt(1.0 - ac).reshape(shape).astype(x0.dtype)
        return sa * noise - sb * x0

    def leading_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Ascending sampled train timesteps, diffusers 'leading' spacing."""
        if not 1 <= num_inference_steps <= self.num_train_timesteps:
            raise ValueError(
                f"num_inference_steps={num_inference_steps} must be in "
                f"[1, {self.num_train_timesteps}]")
        ratio = self.num_train_timesteps // num_inference_steps
        ts = ((np.arange(num_inference_steps) * ratio).round()
              .astype(np.int64) + self.steps_offset)
        if ts[-1] >= self.num_train_timesteps:
            # steps_offset can push the last timestep past the table end
            # (e.g. 1000 steps + offset 1): out of range for alphas_cumprod
            raise ValueError(
                f"last timestep {ts[-1]} >= num_train_timesteps "
                f"{self.num_train_timesteps}; lower num_inference_steps")
        return ts
