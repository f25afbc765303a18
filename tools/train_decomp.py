"""Decompose the full-size train step on the real chip: VAE encode vs
UNet forward vs forward+backward, each as N chained iterations inside ONE
jit (fori_loop with a data dependency) so tunnel dispatch drops out and a
materialized scalar surfaces silent OOMs (CLAUDE.md measurement rules).

Run: python tools/train_decomp.py [--n 3] [--remat_l0|--remat_full]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N = 3
B, F = 4, 12


def timed(name, mk_loop, *args):
    loop = jax.jit(mk_loop)
    out = loop(*args)
    s = float(jnp.sum(out.astype(jnp.float32)))
    assert np.isfinite(s), (name, s)
    t0 = time.perf_counter()
    out = loop(*args)
    s = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:46s} {dt:8.2f} ms/iter", flush=True)
    return dt


def main():
    global N
    if "--n" in sys.argv:
        N = int(sys.argv[sys.argv.index("--n") + 1])
    policy = "saveconv"  # the shipped bench.py --train default
    for p in ("dots", "highres", "full", "l0", "saveconv"):
        if f"--remat_{p}" in sys.argv:
            policy = p

    from __graft_entry__ import _materialize
    from asva_tpu.models.imagebind_audio import (ImageBindAudioConfig,
                                                 SegmaskAudioEncoder)
    from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig
    from asva_tpu.models.vae import AutoencoderKL, VAEConfig
    from asva_tpu.training import AnimationTrainer, trainable_mask
    from asva_tpu.training.optim import merge_params, partition_params

    unet = AudioUNet3D(UNet3DConfig(remat=True, remat_policy=policy),
                       dtype=jnp.bfloat16)
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
    train_p, frozen_p = partition_params(unet_params, mask)
    frozen_args = trainer._frozen()

    rng = np.random.default_rng(0)
    videos = jnp.asarray(rng.random((B, F, 256, 256, 3)), jnp.float32)
    mels = jnp.asarray(rng.standard_normal((B, 128, 204, 1)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((B, 77, 768)), jnp.float32)
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}  policy={policy}  N={N}", flush=True)

    # 1. VAE encode of the B*F frames (protocol-mandated per step)
    def vae_loop(vp, v):
        frames = (v.reshape((B * F,) + v.shape[2:]) - 0.5) / 0.5
        def body(i, acc):
            z = vae.apply(vp, frames + acc[0, 0, 0, 0] * 1e-6,
                          jax.random.fold_in(key, i),
                          method=vae.sample_latents)
            return z
        z0 = jnp.zeros((B * F, 32, 32, 4), jnp.bfloat16)
        return jax.lax.fori_loop(0, N, body, z0)
    timed("VAE encode 48x256^2", vae_loop, vae_params, videos)

    # 2. audio tower
    def audio_loop(ap, m):
        def body(i, acc):
            _, enc, _ = audio_enc.apply(ap, m + acc[0, 0, 0] * 1e-6)
            return enc
        return jax.lax.fori_loop(
            0, N, body, jnp.zeros((B, 229, 768), jnp.bfloat16))
    timed("ImageBind audio tower b4", audio_loop, audio_params, mels)

    # 3. full loss forward (VAE + audio + UNet fwd)
    def fwd_loop(tp, fz, fa, v, m, t):
        def body(i, acc):
            loss = trainer._loss(
                merge_params(tp, fz),
                {"videos": v + acc * 1e-6, "mels": m,
                 "text_encodings": t}, jax.random.fold_in(key, i), *fa)
            return acc + loss
        return jax.lax.fori_loop(0, N, body, jnp.zeros((), jnp.float32))
    timed("loss fwd (VAE+audio+UNet fwd)", fwd_loop, train_p, frozen_p,
          frozen_args, videos, mels, text)

    # 4. loss + grad over trainable subtree
    def grad_loop(tp, fz, fa, v, m, t):
        def body(i, acc):
            loss, grads = jax.value_and_grad(lambda p: trainer._loss(
                merge_params(p, fz),
                {"videos": v + acc * 1e-6, "mels": m,
                 "text_encodings": t}, jax.random.fold_in(key, i),
                *fa))(tp)
            # consume every grad leaf so the backward cannot be DCE'd
            g = jax.tree.reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.float32)), grads, 0.0)
            return acc + loss + g * 1e-12
        return jax.lax.fori_loop(0, N, body, jnp.zeros((), jnp.float32))
    timed("loss fwd+bwd (subtree grads)", grad_loop, train_p, frozen_p,
          frozen_args, videos, mels, text)


if __name__ == "__main__":
    main()
