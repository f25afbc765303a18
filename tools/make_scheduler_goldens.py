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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="tests/fixtures/scheduler_goldens.npz")
    args = p.parse_args()

    import torch
    from diffusers import DDIMScheduler, PNDMScheduler

    common = dict(num_train_timesteps=1000, beta_start=0.00085,
                  beta_end=0.012, beta_schedule="scaled_linear",
                  steps_offset=1, set_alpha_to_one=False,
                  prediction_type="epsilon")
    out = {}
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
