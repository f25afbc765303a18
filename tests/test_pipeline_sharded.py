"""Multi-chip (8 virtual CPU devices) batched generation test."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asva_tpu.models.imagebind_audio import (ImageBindAudioConfig,
                                             SegmaskAudioEncoder)
from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig
from asva_tpu.models.vae import AutoencoderKL, VAEConfig
from asva_tpu.parallel import make_mesh
from asva_tpu.pipelines.animation import AnimationPipeline


def test_sharded_generation_batch8(rng):
    video_length = 4
    unet = AudioUNet3D(UNet3DConfig.tiny())
    vae = AutoencoderKL(VAEConfig.tiny())
    audio_cfg = ImageBindAudioConfig.tiny()
    audio_enc = SegmaskAudioEncoder(audio_cfg, n_segment=video_length)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    unet_params = unet.init(
        k1, jnp.zeros((1, video_length, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 7, 768)), jnp.zeros((1, 229, audio_cfg.embed_dim)),
        jnp.ones((1, video_length, 229), bool))
    vae_params = vae.init(k2, jnp.zeros((1, 16, 16, 3)), k2)
    audio_params = audio_enc.init(k3, jnp.zeros((1, 128, 204, 1)))

    mesh = make_mesh(8, fsdp=1)
    pipe = AnimationPipeline(
        unet=unet, vae=vae, audio_encoder=audio_enc,
        unet_params=unet_params, vae_params=vae_params,
        audio_encoder_params=audio_params, mesh=mesh)

    b = 8
    images = jnp.asarray(rng.random((b, 16, 16, 3)), dtype=jnp.float32)
    mels = jnp.asarray(rng.standard_normal((b, 128, 204, 1)),
                       dtype=jnp.float32)
    text = jnp.asarray(rng.standard_normal((b, 7, 768)), dtype=jnp.float32)
    with jax.sharding.set_mesh(mesh):
        videos = pipe(images, mels, text, video_length=video_length,
                      num_inference_steps=2, sampler="ddim",
                      audio_guidance_scale=4.0,
                      rng=jax.random.PRNGKey(1))
    assert videos.shape == (b, video_length, 16, 16, 3)
    assert np.isfinite(np.asarray(videos)).all()

    # per-sample independence: single-sample run matches the batched row,
    # modulo the per-batch RNG folding (so just check determinism instead)
    with jax.sharding.set_mesh(mesh):
        videos2 = pipe(images, mels, text, video_length=video_length,
                       num_inference_steps=2, sampler="ddim",
                       audio_guidance_scale=4.0,
                       rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(videos), np.asarray(videos2))


def test_sequence_parallel_generation_matches_unsharded(rng):
    """Frame-axis (sequence) parallelism: a (data=2, seq=4) mesh shards the
    12-frame latent video over 4 virtual devices; the result must match the
    unsharded pipeline bitwise-to-tolerance (GSPMD inserts the temporal
    all-gathers / frame-0 broadcasts / conv_temp halos)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from asva_tpu.models.imagebind_audio import (ImageBindAudioConfig,
                                                 SegmaskAudioEncoder)
    from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig
    from asva_tpu.models.vae import AutoencoderKL, VAEConfig
    from asva_tpu.parallel import make_gen_mesh
    from asva_tpu.pipelines.animation import AnimationPipeline

    f = 8  # shards 2 frames per seq device
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

    def make(mesh):
        return AnimationPipeline(
            unet=unet, vae=vae, audio_encoder=audio_enc,
            unet_params=unet_params, vae_params=vae_params,
            audio_encoder_params=audio_params, mesh=mesh)

    b = 2
    images = jnp.asarray(rng.random((b, 16, 16, 3)), jnp.float32)
    mels = jnp.asarray(rng.standard_normal((b, 128, 204, 1)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((b, 77, 768)), jnp.float32)

    kwargs = dict(video_length=f, num_inference_steps=2,
                  audio_guidance_scale=4.0, sampler="ddim",
                  rng=jax.random.PRNGKey(3))
    base = np.asarray(make(None)(images, mels, text, **kwargs))
    mesh = make_gen_mesh(8, seq=4)
    assert dict(mesh.shape) == {"data": 2, "seq": 4}
    sharded = make(mesh)(images, mels, text, **kwargs)
    # the latent video really is frame-sharded inside the program
    np.testing.assert_allclose(np.asarray(sharded), base, atol=2e-5)
