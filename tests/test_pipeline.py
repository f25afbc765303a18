"""End-to-end animation pipeline test on tiny models (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asva_tpu.models.imagebind_audio import (ImageBindAudioConfig,
                                             SegmaskAudioEncoder)
from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig
from asva_tpu.models.vae import AutoencoderKL, VAEConfig
from asva_tpu.pipelines.animation import AnimationPipeline


@pytest.fixture(scope="module")
def tiny_pipeline():
    video_length = 4
    unet_cfg = UNet3DConfig.tiny()
    vae_cfg = VAEConfig.tiny()
    audio_cfg = ImageBindAudioConfig.tiny()

    unet = AudioUNet3D(unet_cfg)
    vae = AutoencoderKL(vae_cfg)
    audio_enc = SegmaskAudioEncoder(audio_cfg, n_segment=video_length)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    sample = jnp.zeros((1, video_length, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    text = jnp.zeros((1, 7, 768))
    audio = jnp.zeros((1, 229, audio_cfg.embed_dim))
    # tiny audio embed dim != 768; UNet audio cross-attn takes any dim
    mask = jnp.ones((1, video_length, 229), bool)
    unet_params = unet.init(k1, sample, t, text, audio, mask)
    img = jnp.zeros((1, 16, 16, 3))
    vae_params = vae.init(k2, img, k2)
    mel = jnp.zeros((1, 128, 204, 1))
    audio_params = audio_enc.init(k3, mel)

    return AnimationPipeline(
        unet=unet, vae=vae, audio_encoder=audio_enc,
        unet_params=unet_params, vae_params=vae_params,
        audio_encoder_params=audio_params)


@pytest.mark.parametrize("sampler,tg,ag", [("ddim", 1.0, 4.0),
                                           ("plms", 1.0, 1.0),
                                           ("plms", 7.5, 4.0)])
def test_pipeline_generates(tiny_pipeline, rng, sampler, tg, ag):
    images = jnp.asarray(rng.random((1, 16, 16, 3)), dtype=jnp.float32)
    mels = jnp.asarray(rng.standard_normal((1, 128, 204, 1)),
                       dtype=jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 7, 768)), dtype=jnp.float32)
    videos = tiny_pipeline(images, mels, text, video_length=4,
                           num_inference_steps=3, sampler=sampler,
                           text_guidance_scale=tg, audio_guidance_scale=ag,
                           rng=jax.random.PRNGKey(1))
    assert videos.shape == (1, 4, 16, 16, 3)
    v = np.asarray(videos)
    assert np.isfinite(v).all() and v.min() >= 0.0 and v.max() <= 1.0


def test_pipeline_non_square(tiny_pipeline, rng):
    """TheGreatestHits runs at 128x256 (h != w): the whole stack — VAE
    encode/decode, UNet spatial attention, frame-0 KV gather — must work
    for rectangular frames (reference configs/.../TheGreatestHits yaml)."""
    images = jnp.asarray(rng.random((1, 16, 32, 3)), dtype=jnp.float32)
    mels = jnp.asarray(rng.standard_normal((1, 128, 204, 1)),
                       dtype=jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 7, 768)), dtype=jnp.float32)
    videos = tiny_pipeline(images, mels, text, video_length=4,
                           num_inference_steps=2, sampler="ddim",
                           rng=jax.random.PRNGKey(2))
    assert videos.shape == (1, 4, 16, 32, 3)
    assert np.isfinite(np.asarray(videos)).all()


def test_pipeline_first_frame_latent_pinned(tiny_pipeline, rng):
    images = jnp.asarray(rng.random((1, 16, 16, 3)), dtype=jnp.float32)
    mels = jnp.asarray(rng.standard_normal((1, 128, 204, 1)),
                       dtype=jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 7, 768)), dtype=jnp.float32)
    latents = tiny_pipeline(images, mels, text, video_length=4,
                            num_inference_steps=2, sampler="ddim",
                            rng=jax.random.PRNGKey(1), decode=False)
    # frame-0 latent equals the (seeded) clean image latent
    img_lat = tiny_pipeline.encode_image(
        images, jax.random.split(jax.random.PRNGKey(1))[0])
    np.testing.assert_allclose(np.asarray(latents[:, 0]),
                               np.asarray(img_lat), atol=1e-6)


def test_pipeline_threads_prediction_type(tiny_pipeline, rng):
    """A v_prediction schedule must reach sampler_step: the same model
    output interpreted as v vs epsilon yields different latents (silently
    sampling v as epsilon was a real bug)."""
    import dataclasses

    from asva_tpu.diffusion.schedules import DiffusionSchedule

    vpipe = dataclasses.replace(
        tiny_pipeline,
        schedule=DiffusionSchedule(prediction_type="v_prediction"))
    images = jnp.asarray(rng.random((1, 16, 16, 3)), dtype=jnp.float32)
    mels = jnp.asarray(rng.standard_normal((1, 128, 204, 1)),
                       dtype=jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 7, 768)), dtype=jnp.float32)
    kwargs = dict(video_length=4, num_inference_steps=2, sampler="ddim",
                  rng=jax.random.PRNGKey(4), decode=False)
    lat_v = vpipe(images, mels, text, **kwargs)
    lat_e = tiny_pipeline(images, mels, text, **kwargs)
    assert np.isfinite(np.asarray(lat_v)).all()
    assert not np.allclose(np.asarray(lat_v), np.asarray(lat_e))


def test_pipeline_seed_determinism(tiny_pipeline, rng):
    images = jnp.asarray(rng.random((1, 16, 16, 3)), dtype=jnp.float32)
    mels = jnp.asarray(rng.standard_normal((1, 128, 204, 1)),
                       dtype=jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 7, 768)), dtype=jnp.float32)
    kwargs = dict(video_length=4, num_inference_steps=2, sampler="plms")
    v1 = tiny_pipeline(images, mels, text, rng=jax.random.PRNGKey(5), **kwargs)
    v2 = tiny_pipeline(images, mels, text, rng=jax.random.PRNGKey(5), **kwargs)
    v3 = tiny_pipeline(images, mels, text, rng=jax.random.PRNGKey(6), **kwargs)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    assert not np.allclose(np.asarray(v1), np.asarray(v3))
