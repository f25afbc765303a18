"""DDIM and PLMS (PNDM skip-prk) samplers as scan-friendly pure functions.

The reference drives stateful diffusers scheduler objects from a Python loop
(avgen/pipelines/pipeline_audio_cond_animation.py:330-365).  On TPU the whole
denoise loop must live inside one jit program, so each sampler is compiled
into a *plan*: host-side numpy arrays of per-iteration coefficients (model
timestep, alpha-cumprod pair, ets-combination weights, buffer/branch flags),
plus a `sampler_step` that consumes one plan row and a fixed-size carry
(`SamplerState`).  `lax.scan` / `fori_loop` over plan rows reproduces the
reference's sequences exactly:

  * DDIM (eta=0):  x_{t-1} = sqrt(ac_prev) x0_pred + sqrt(1-ac_prev) eps
  * PLMS: diffusers PNDMScheduler with skip_prk_steps=True — duplicated
    second timestep, trapezoid 2nd step, then 2/3/4-step Adams-Bashforth on
    the eps history; transition formula
      x_prev = sqrt(ac_prev/ac_t) x - (ac_prev - ac_t) eps / denom,
      denom  = ac_t sqrt(1-ac_prev) + sqrt(ac_t (1-ac_t) ac_prev)

Both use final_alpha_cumprod = ac[0] when stepping past t=0 (SD1.5 configs
use set_alpha_to_one=False).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .schedules import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class SamplerPlan:
    """Per-iteration constants; every array has leading dim = num iterations."""
    t_model: np.ndarray        # timestep fed to the UNet (int32)
    sqrt_ac_t: np.ndarray      # sqrt(alpha_cumprod) at the transition source
    sqrt_ac_prev: np.ndarray   # ... at the transition target
    ac_t: np.ndarray
    ac_prev: np.ndarray
    ets_weights: np.ndarray    # (n_iter, 4): [w_current, w_buf0, w_buf1, w_buf2]
    append_flag: np.ndarray    # bool: push current eps into the buffer
    use_cur_sample: np.ndarray  # bool: step from the stashed sample instead
    store_cur_sample: np.ndarray  # bool: stash the pre-step sample
    kind: str                  # "ddim" | "plms"

    @property
    def num_iterations(self) -> int:
        return len(self.t_model)


class SamplerState(NamedTuple):
    latents: jnp.ndarray      # (b, f, h, w, c)
    ets: jnp.ndarray          # (3, b, f-1 or f, h, w, c) eps history buffer
    cur_sample: jnp.ndarray   # stashed sample for the PLMS trapezoid step


def ddim_plan(schedule: DiffusionSchedule, num_steps: int) -> SamplerPlan:
    ac = schedule.alphas_cumprod.astype(np.float64)
    ts = schedule.leading_timesteps(num_steps)[::-1].copy()  # descending
    ratio = schedule.num_train_timesteps // num_steps
    prev = ts - ratio
    ac_t = ac[ts]
    ac_prev = np.where(prev >= 0, ac[np.clip(prev, 0, None)], ac[0])
    n = len(ts)
    w = np.zeros((n, 4), np.float32)
    w[:, 0] = 1.0  # always use the current eps directly
    return SamplerPlan(
        t_model=ts.astype(np.int32),
        sqrt_ac_t=np.sqrt(ac_t).astype(np.float32),
        sqrt_ac_prev=np.sqrt(ac_prev).astype(np.float32),
        ac_t=ac_t.astype(np.float32), ac_prev=ac_prev.astype(np.float32),
        ets_weights=w,
        append_flag=np.zeros(n, bool),
        use_cur_sample=np.zeros(n, bool),
        store_cur_sample=np.zeros(n, bool),
        kind="ddim")


def plms_plan(schedule: DiffusionSchedule, num_steps: int) -> SamplerPlan:
    ac = schedule.alphas_cumprod.astype(np.float64)
    base = schedule.leading_timesteps(num_steps)  # ascending
    ratio = schedule.num_train_timesteps // num_steps
    # duplicated second-to-last timestep, then reversed (diffusers
    # PNDMScheduler.set_timesteps with skip_prk_steps=True)
    seq = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1].copy()
    n = len(seq)  # num_steps + 1 iterations

    t_model = seq.astype(np.int64)
    t_coeff = seq.copy()
    t_prev = seq - ratio
    weights = np.zeros((n, 4), np.float32)
    append = np.zeros(n, bool)
    use_cur = np.zeros(n, bool)
    store_cur = np.zeros(n, bool)
    ADAMS = {
        2: [1.5, -0.5, 0.0],
        3: [23 / 12, -16 / 12, 5 / 12],
    }
    ets_len = 0
    for counter in range(n):
        if counter == 1:
            # re-do the first transition with the trapezoid average, stepping
            # from the stashed original sample
            t_prev[counter] = t_coeff[counter]
            t_coeff[counter] = t_coeff[counter] + ratio
            weights[counter] = [0.5, 0.5, 0.0, 0.0]
            use_cur[counter] = True
        else:
            append[counter] = True
            ets_len = min(ets_len + 1, 4)
            if ets_len == 1:
                weights[counter] = [1.0, 0.0, 0.0, 0.0]
                store_cur[counter] = True
            elif ets_len in ADAMS:
                weights[counter] = [*ADAMS[ets_len], 0.0]
            else:
                weights[counter] = [55 / 24, -59 / 24, 37 / 24, -9 / 24]
    ac_t = ac[t_coeff]
    ac_prev = np.where(t_prev >= 0, ac[np.clip(t_prev, 0, None)], ac[0])
    return SamplerPlan(
        t_model=t_model.astype(np.int32),
        sqrt_ac_t=np.sqrt(ac_t).astype(np.float32),
        sqrt_ac_prev=np.sqrt(ac_prev).astype(np.float32),
        ac_t=ac_t.astype(np.float32), ac_prev=ac_prev.astype(np.float32),
        ets_weights=weights,
        append_flag=append, use_cur_sample=use_cur,
        store_cur_sample=store_cur, kind="plms")


def init_state(plan: SamplerPlan, latents: jnp.ndarray,
               step_slice=slice(None)) -> SamplerState:
    """step_slice selects which frames the sampler steps (frame-0 pinning)."""
    stepped = latents[:, step_slice]
    zeros = jnp.zeros((3,) + stepped.shape, latents.dtype)
    return SamplerState(latents=latents, ets=zeros, cur_sample=stepped)


def sampler_step(kind: str, plan_row: dict, state: SamplerState,
                 eps: jnp.ndarray, step_slice=slice(None),
                 prediction_type: str = "epsilon") -> SamplerState:
    """Advance one sampler iteration.

    kind: "ddim" | "plms" (static).  plan_row: dict of scalars for this
    iteration (jnp scalars are fine inside scan).  eps: the model's epsilon
    (or v, for DDIM) prediction for the *stepped* frames only.
    """
    latents = state.latents
    sample = latents[:, step_slice]

    if prediction_type == "v_prediction":
        if kind != "ddim":
            raise NotImplementedError(
                "v_prediction is only supported with DDIM (as in diffusers)")
        # v = sqrt(ac) eps - sqrt(1-ac) x0  =>  eps = sqrt(1-ac) x + sqrt(ac) v
        ac_t_ = plan_row["ac_t"]
        eps = (jnp.sqrt(1.0 - ac_t_) * sample
               + plan_row["sqrt_ac_t"] * eps).astype(eps.dtype)
    elif prediction_type != "epsilon":
        raise ValueError(prediction_type)

    # combine eps with the history buffer
    w = plan_row["ets_weights"]  # (4,)
    combined = (w[0] * eps + w[1] * state.ets[0] + w[2] * state.ets[1]
                + w[3] * state.ets[2]).astype(eps.dtype)
    new_ets = jnp.where(plan_row["append_flag"],
                        jnp.stack([eps, state.ets[0], state.ets[1]]),
                        state.ets)
    base = jnp.where(plan_row["use_cur_sample"], state.cur_sample, sample)
    new_cur = jnp.where(plan_row["store_cur_sample"], sample,
                        state.cur_sample)

    ac_t = plan_row["ac_t"]
    ac_prev = plan_row["ac_prev"]
    if kind == "ddim":
        x0 = (base - jnp.sqrt(1.0 - ac_t) * combined) / plan_row["sqrt_ac_t"]
        stepped = (plan_row["sqrt_ac_prev"] * x0
                   + jnp.sqrt(1.0 - ac_prev) * combined)
    else:  # plms transition
        sample_coeff = plan_row["sqrt_ac_prev"] / plan_row["sqrt_ac_t"]
        denom = (ac_t * jnp.sqrt(1.0 - ac_prev)
                 + jnp.sqrt(ac_t * (1.0 - ac_t) * ac_prev))
        stepped = sample_coeff * base - (ac_prev - ac_t) * combined / denom

    stepped = stepped.astype(latents.dtype)
    new_latents = latents.at[:, step_slice].set(stepped)
    return SamplerState(latents=new_latents, ets=new_ets, cur_sample=new_cur)


def plan_row_arrays(plan: SamplerPlan) -> dict:
    """Stack the plan into scan xs (host numpy -> device constants)."""
    return dict(
        t_model=jnp.asarray(plan.t_model),
        sqrt_ac_t=jnp.asarray(plan.sqrt_ac_t),
        sqrt_ac_prev=jnp.asarray(plan.sqrt_ac_prev),
        ac_t=jnp.asarray(plan.ac_t),
        ac_prev=jnp.asarray(plan.ac_prev),
        ets_weights=jnp.asarray(plan.ets_weights),
        append_flag=jnp.asarray(plan.append_flag),
        use_cur_sample=jnp.asarray(plan.use_cur_sample),
        store_cur_sample=jnp.asarray(plan.store_cur_sample),
    )
