"""Dual-format checkpointing: train -> module export -> reload -> generate."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from asva_tpu.models.imagebind_audio import (ImageBindAudioConfig,
                                             SegmaskAudioEncoder)
from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig
from asva_tpu.models.vae import AutoencoderKL, VAEConfig
from asva_tpu.pipelines.animation import AnimationPipeline
from asva_tpu.runtime import _is_orbax_dir, _maybe_convert
from asva_tpu.training import (AnimationTrainer, TrainState, build_optimizer,
                               trainable_mask)
from asva_tpu.training.checkpoint import CheckpointManager


def test_train_export_reload_generate(tmp_path, rng):
    f = 4
    unet = AudioUNet3D(UNet3DConfig.tiny())
    vae = AutoencoderKL(VAEConfig.tiny())
    audio_cfg = ImageBindAudioConfig.tiny()
    audio_enc = SegmaskAudioEncoder(audio_cfg, n_segment=f)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    unet_params = unet.init(
        k1, jnp.zeros((1, f, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 7, 768)), jnp.zeros((1, 229, audio_cfg.embed_dim)),
        jnp.ones((1, f, 229), bool))
    vae_params = vae.init(k2, jnp.zeros((1, 16, 16, 3)), k2)
    audio_params = audio_enc.init(k3, jnp.zeros((1, 128, 204, 1)))

    trainer = AnimationTrainer(
        unet=unet, vae=vae, audio_encoder=audio_enc,
        vae_params=vae_params, audio_encoder_params=audio_params,
        null_text_encoding=jnp.zeros((1, 7, 768)))
    mask = trainable_mask(unet_params)
    tx = build_optimizer(1e-3, mask=mask)
    state = TrainState(jnp.zeros((), jnp.int32), unet_params,
                       tx.init(unet_params))
    step_fn = trainer.make_train_step(tx, donate=False)
    batch = {"videos": jnp.asarray(rng.random((2, f, 16, 16, 3)),
                                   dtype=jnp.float32),
             "mels": jnp.asarray(rng.standard_normal((2, 128, 204, 1)),
                                 dtype=jnp.float32),
             "text_encodings": jnp.asarray(rng.standard_normal((2, 7, 768)),
                                           dtype=jnp.float32)}
    for i in range(2):
        state, _ = step_fn(state, batch, jax.random.PRNGKey(i))

    mgr = CheckpointManager(str(tmp_path), 1)
    mgr.save(2, jax.device_get(state), force=True,
             modules={"unet": jax.device_get(state.params)})
    mgr.close()   # async save: block until committed

    mdir = os.path.join(str(tmp_path), "checkpoint-2", "modules", "unet")
    assert _is_orbax_dir(mdir)
    fresh = jax.tree.map(np.zeros_like, unet_params)
    reloaded = _maybe_convert(fresh, mdir, None, "unet")
    for a, b in zip(jax.tree.leaves(reloaded),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    pipe = AnimationPipeline(
        unet=unet, vae=vae, audio_encoder=audio_enc,
        unet_params=reloaded, vae_params=vae_params,
        audio_encoder_params=audio_params)
    videos = pipe(jnp.asarray(rng.random((1, 16, 16, 3)), dtype=jnp.float32),
                  jnp.asarray(rng.standard_normal((1, 128, 204, 1)),
                              dtype=jnp.float32),
                  jnp.asarray(rng.standard_normal((1, 7, 768)),
                              dtype=jnp.float32),
                  video_length=f, num_inference_steps=2, sampler="ddim")
    assert videos.shape == (1, f, 16, 16, 3)
    assert np.isfinite(np.asarray(videos)).all()
