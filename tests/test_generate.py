"""generate_videos integration test (tiny models, CPU): image+wav -> mp4."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from asva_tpu.data.media import media_available

pytestmark = pytest.mark.skipif(not media_available(),
                                reason="libasva_media.so not built")


@pytest.fixture(scope="module")
def tiny_pipeline():
    from asva_tpu.models.imagebind_audio import (ImageBindAudioConfig,
                                                 SegmaskAudioEncoder)
    from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig
    from asva_tpu.models.vae import AutoencoderKL, VAEConfig
    from asva_tpu.pipelines.animation import AnimationPipeline
    f = 4
    unet = AudioUNet3D(UNet3DConfig.tiny())
    vae = AutoencoderKL(VAEConfig.tiny())
    audio_cfg = ImageBindAudioConfig.tiny()
    audio_enc = SegmaskAudioEncoder(audio_cfg, n_segment=f)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    unet_params = unet.init(
        k1, jnp.zeros((1, f, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768)), jnp.zeros((1, 229, audio_cfg.embed_dim)),
        jnp.ones((1, f, 229), bool))
    vae_params = vae.init(k2, jnp.zeros((1, 16, 16, 3)), k2)
    audio_params = audio_enc.init(k3, jnp.zeros((1, 128, 204, 1)))
    return AnimationPipeline(
        unet=unet, vae=vae, audio_encoder=audio_enc,
        unet_params=unet_params, vae_params=vae_params,
        audio_encoder_params=audio_params), f


def test_generate_videos_from_image_and_wav(tiny_pipeline, tmp_path):
    from scipy.io import wavfile
    from PIL import Image
    from asva_tpu.pipelines.generate import generate_videos
    from asva_tpu.data.media import MediaReader

    pipeline, f = tiny_pipeline
    rng = np.random.default_rng(0)
    img_path = str(tmp_path / "cond.png")
    Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(
        img_path)
    wav_path = str(tmp_path / "cond.wav")
    t = np.arange(int(3.0 * 16000)) / 16000
    wavfile.write(wav_path, 16000,
                  (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))

    tmpl = str(tmp_path / "out" / "gen")
    generate_videos(
        pipeline, image_path=img_path, audio_path=wav_path,
        image_size=(16, 16), video_fps=6, video_num_frame=f,
        num_clips_per_video=2, num_inference_steps=2,
        audio_guidance_scale=4.0, seed=0, save_template=tmpl,
        sampler="ddim")
    for k in range(2):
        path = f"{tmpl}_clip-{k:02d}.mp4"
        assert os.path.exists(path), path
        with MediaReader(path) as r:
            assert r.size == (16, 16)
            clip = r.read_video_clip(0, f / 6, 6, f)
            assert clip.shape == (f, 16, 16, 3)
            assert r.audio_sample_rate == 16000


def test_generate_videos_from_video(tiny_pipeline, tmp_path):
    from asva_tpu.data.media import write_video
    from asva_tpu.pipelines.generate import generate_videos

    pipeline, f = tiny_pipeline
    rng = np.random.default_rng(1)
    src = str(tmp_path / "src.mp4")
    frames = (rng.random((36, 32, 32, 3)) * 255).astype(np.uint8)
    t = np.arange(int(3.0 * 16000)) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]
    write_video(src, frames, 12.0, audio, 16000)

    out = generate_videos(
        pipeline, video_path=src, image_size=(16, 16), video_fps=6,
        video_num_frame=f, num_clips_per_video=1, num_inference_steps=2,
        audio_guidance_scale=1.0, text_guidance_scale=1.0, seed=3,
        sampler="plms")
    assert out is not None and len(out) == 1
    gen_frames, gen_audio = out[0]
    assert gen_frames.shape == (f, 16, 16, 3)
    assert gen_frames.dtype == np.uint8


def test_batched_generation_bit_matches_per_clip(tiny_pipeline, rng):
    """batch_clips / broadcast_rng must reproduce the per-clip re-seeded
    protocol exactly (same noise per clip, reference :432-433)."""
    pipeline, f = tiny_pipeline
    b = 3
    images = jnp.asarray(rng.random((b, 16, 16, 3)), jnp.float32)
    mels = jnp.asarray(rng.standard_normal((b, 128, 204, 1)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((b, 77, 768)), jnp.float32)

    batched = pipeline(images, mels, text, video_length=f,
                       num_inference_steps=2, audio_guidance_scale=4.0,
                       sampler="ddim", rng=jax.random.PRNGKey(7),
                       broadcast_rng=True)
    for k in range(b):
        single = pipeline(images[k:k + 1], mels[k:k + 1], text[k:k + 1],
                          video_length=f, num_inference_steps=2,
                          audio_guidance_scale=4.0, sampler="ddim",
                          rng=jax.random.PRNGKey(7), broadcast_rng=True)
        np.testing.assert_allclose(np.asarray(batched[k]),
                                   np.asarray(single[0]), atol=1e-5)
