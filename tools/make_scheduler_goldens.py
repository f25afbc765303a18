"""Mint DDIM/PNDM scheduler goldens from REAL diffusers.

diffusers is not installed in the build sandbox (tests/stubs/diffusers is a
ConfigMixin/ModelMixin shim only, no schedulers), so run this wherever real
diffusers exists:

  python tools/make_scheduler_goldens.py --out tests/fixtures/scheduler_goldens.npz

For each (sampler, num_steps) case it drives the genuine
DDIMScheduler/PNDMScheduler state machine (SD1.5 config: scaled_linear
betas 0.00085->0.012, 1000 train steps, steps_offset=1,
set_alpha_to_one=False, skip_prk_steps=True — the config consumed at
avgen/pipelines/pipeline_audio_cond_animation.py:511) with a deterministic
closed-form "model", recording the timestep sequence and the latent after
every step.  tests/test_samplers.py picks the file up automatically and
asserts our SamplerPlan + sampler_step replay the sequences exactly —
pinning the duplicated-second-step / trapezoid / Adams-Bashforth logic and
the steps_offset convention against the real implementation instead of a
second hand transcription.
"""
import argparse
import os

import numpy as np

CASES = [("ddim", 5), ("ddim", 25), ("ddim", 50),
         ("plms", 5), ("plms", 25), ("plms", 50)]

SHAPE = (1, 4, 8, 8)


def initial_latents():
    rng = np.random.default_rng(99)
    return (rng.standard_normal(SHAPE) * 0.7).astype(np.float32)


def fake_eps(x: np.ndarray, t: int) -> np.ndarray:
    """Deterministic smooth pseudo-model shared by tool and test."""
    return (np.tanh(x * 1.1) * 0.8
            + np.cos(t / 50.0) * 0.1).astype(np.float32)


def _mint_independent(out: dict) -> None:
    """Mint the same trajectories from an INDEPENDENT numpy transcription
    of the diffusers DDIM/PNDM step equations (float64 state machine).

    This transcription is the one already validated end-to-end against the
    reference UNet inside tests/test_reference_parity.py::
    test_fixed_seed_generation_parity (_torch_denoise_loop) — it shares no
    code with asva_tpu.diffusion.samplers, so replaying these goldens
    still cross-checks our jax samplers against a second implementation.
    Used when real diffusers cannot be installed (this sandbox: installs
    prohibited + zero egress); re-mint with real diffusers when available
    (provenance recorded in the file flips to "diffusers")."""
    # SD1.5 scaled_linear betas -> alphas_cumprod (float64)
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000,
                        dtype=np.float64) ** 2
    ac = np.cumprod(1.0 - betas)
    final_alpha = ac[0]          # set_alpha_to_one=False

    def alpha(t):
        return ac[t] if t >= 0 else final_alpha

    for kind, steps in CASES:
        ratio = 1000 // steps
        base = (np.arange(0, steps) * ratio).round().astype(np.int64) + 1
        if kind == "ddim":
            ts = base[::-1].copy()
        else:   # PNDM skip_prk: duplicate the second-to-last entry
            ts = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]
        x = initial_latents().astype(np.float64)
        traj = [x.astype(np.float32)]
        ets, counter, cur_sample = [], 0, None
        for t in ts:
            e = fake_eps(x.astype(np.float32), int(t)).astype(np.float64)
            t_step = int(t)
            prev_t = t_step - ratio
            if kind == "ddim":
                a_t, a_prev = alpha(t_step), alpha(prev_t)
                x0 = (x - np.sqrt(1 - a_t) * e) / np.sqrt(a_t)
                x = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * e
            else:
                sample = x
                if counter != 1:
                    ets = ets[-3:] + [e]
                else:
                    prev_t = t_step
                    t_step = t_step + ratio
                if len(ets) == 1 and counter == 0:
                    model_output = e
                    cur_sample = sample
                elif len(ets) == 1 and counter == 1:
                    model_output = (e + ets[-1]) / 2
                    sample, cur_sample = cur_sample, None
                elif len(ets) == 2:
                    model_output = (3 * ets[-1] - ets[-2]) / 2
                elif len(ets) == 3:
                    model_output = (23 * ets[-1] - 16 * ets[-2]
                                    + 5 * ets[-3]) / 12
                else:
                    model_output = (55 * ets[-1] - 59 * ets[-2]
                                    + 37 * ets[-3] - 9 * ets[-4]) / 24
                a_t, a_prev = alpha(t_step), alpha(prev_t)
                sample_coeff = np.sqrt(a_prev / a_t)
                denom = (a_t * np.sqrt(1 - a_prev)
                         + np.sqrt(a_t * (1 - a_t) * a_prev))
                x = (sample_coeff * sample
                     - (a_prev - a_t) * model_output / denom)
                counter += 1
            traj.append(x.astype(np.float32))
        out[f"{kind}_{steps}_timesteps"] = ts.astype(np.int64)
        out[f"{kind}_{steps}_latents"] = np.stack(traj)
        print(f"{kind} {steps}: {len(ts)} iterations, "
              f"ts={ts[:4]}...{ts[-3:]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="tests/fixtures/scheduler_goldens.npz")
    p.add_argument("--independent", action="store_true",
                   help="mint from the independent numpy transcription "
                        "instead of real diffusers (see _mint_independent)")
    args = p.parse_args()

    if args.independent:
        out = {"provenance":
               np.array("independent-numpy-transcription-float64")}
        _mint_independent(out)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        np.savez_compressed(args.out, **out)
        print(f"wrote {len(out)} arrays to {args.out}")
        return

    import torch
    from diffusers import DDIMScheduler, PNDMScheduler

    common = dict(num_train_timesteps=1000, beta_start=0.00085,
                  beta_end=0.012, beta_schedule="scaled_linear",
                  steps_offset=1, set_alpha_to_one=False,
                  prediction_type="epsilon")
    out = {"provenance": np.array("diffusers")}
    for kind, steps in CASES:
        if kind == "ddim":
            sch = DDIMScheduler(clip_sample=False, **common)
        else:
            sch = PNDMScheduler(skip_prk_steps=True, **common)
        sch.set_timesteps(steps)
        ts = np.asarray(sch.timesteps, np.int64)
        x = torch.from_numpy(initial_latents().copy())
        traj = [x.numpy().copy()]
        for t in ts:
            eps = torch.from_numpy(fake_eps(x.numpy(), int(t)))
            x = sch.step(eps, int(t), x).prev_sample
            traj.append(x.numpy().copy())
        out[f"{kind}_{steps}_timesteps"] = ts
        out[f"{kind}_{steps}_latents"] = np.stack(traj)
        print(f"{kind} {steps}: {len(ts)} iterations, "
              f"ts={ts[:4]}...{ts[-3:]}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **out)
    print(f"wrote {len(out)} arrays to {args.out}")


if __name__ == "__main__":
    main()
