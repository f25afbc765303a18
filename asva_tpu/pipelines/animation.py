"""Audio-conditioned animation inference pipeline.

TPU-native counterpart of the reference AudioCondAnimationPipeline
(avgen/pipelines/pipeline_audio_cond_animation.py:264-375), re-designed as a
single jit-compiled program per (num_steps, sampler, cfg-mode) combination:

  * conditioning encoders (audio tower, VAE encode) run on device,
  * the denoise loop is a `lax.scan` over precomputed sampler-plan rows, so
    all `num_steps` UNet invocations compile into one XLA program,
  * classifier-free guidance stacks {uncond, text, text+audio} along the
    batch axis exactly like the reference (k in {1,2,3}); the dual-CFG
    combine is
        eps = uncond + tg*(text - uncond) + ag*(text_audio - text)
  * frame 0 of the latent video is the clean image latent and is pinned:
    the sampler steps frames 1..f-1 only (reference :363-365).

Compiled programs are cached per static configuration; repeated calls with
the same shapes reuse them.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..diffusion.samplers import (ddim_plan, init_state, plan_row_arrays,
                                  plms_plan, sampler_step)
from ..diffusion.schedules import DiffusionSchedule
from ..models.imagebind_audio import segment_token_indices
from ..ops.mel import waveform_to_mel


@dataclasses.dataclass(eq=False)  # identity hash: self is a static jit arg
class AnimationPipeline:
    unet: object                 # AudioUNet3D
    vae: object                  # AutoencoderKL
    audio_encoder: object        # SegmaskAudioEncoder
    unet_params: dict
    vae_params: dict
    audio_encoder_params: dict
    schedule: DiffusionSchedule = DiffusionSchedule()
    null_text_encoding: Optional[jnp.ndarray] = None  # (1, 77, 768)
    mesh: Optional[object] = None  # jax.sharding.Mesh for multi-chip batches
    _null_audio: Optional[jnp.ndarray] = dataclasses.field(
        default=None, init=False, repr=False)
    _programs: dict = dataclasses.field(
        default_factory=dict, init=False, repr=False)

    def _batch_axes(self):
        return tuple(a for a in self.mesh.axis_names if a != "seq")

    def _shard_batch(self, tree):
        """Shard leading (batch) axes over the mesh's data axes; params stay
        replicated — generation scales clips/sec linearly with chips.  A
        "seq" mesh axis is NOT consumed by the batch: it shards the frame
        axis (see _seq_constraint)."""
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(self.mesh, P(self._batch_axes()))
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    def _seq_constraint(self, latents):
        """Frame-axis (sequence) parallelism: constrain (b, f, ...) video
        latents to P(data, seq) so every UNet op runs frame-sharded; the
        SPMD partitioner inserts the temporal-attention all-gathers, the
        conv_temp halo exchanges and the frame-0 broadcasts.  Enables
        videos longer than a single chip's latency/memory budget — a
        capability the reference lacks (SURVEY §5.7)."""
        if self.mesh is None or "seq" not in self.mesh.axis_names:
            return latents
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P(self._batch_axes(), "seq")
        return jax.lax.with_sharding_constraint(
            latents, NamedSharding(self.mesh, spec))

    def _ctx_constraint(self, x):
        """Fully REPLICATE conditioning tensors under seq parallelism.

        The text/audio contexts are cross-attention K/V sources: every seq
        (frame) shard reads all of them, and they are tiny (<=229x768 per
        item), so replication is the right layout — including over the
        data axis (the contexts are then broadcast/stacked with batch-1
        null contexts, and a P(data)-sharded operand there is what
        triggered the partitioner's 'involuntary full rematerialization'
        reshard in r2's first attempt)."""
        if self.mesh is None or "seq" not in self.mesh.axis_names:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P()))

    def _replicate(self, tree):
        """device_put to a fully-replicated layout BEFORE entering the
        denoise program.  Null contexts come out of the encoder jits with
        whatever layout GSPMD picked; handing them to the program already
        replicated avoids the reshard (an in-program constraint would be
        exactly the involuntary-remat copy the constraint tries to kill)."""
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(self.mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    # ---------------- conditioning ----------------

    def encode_audio_waveform(self, waveforms) -> jnp.ndarray:
        """List/array of (c, T) 16 kHz waveforms -> (b, 128, 204, 1) mels."""
        mels = [waveform_to_mel(jnp.asarray(w)) for w in waveforms]
        return jnp.stack(mels)

    # NOTE: params are always jit ARGUMENTS (never closure constants) — a
    # closure would embed gigabytes of weights into the compiled program
    # payload (fatal on remote-compile backends) and force a retrace on any
    # parameter update.

    @functools.partial(jax.jit, static_argnums=0)
    def _encode_audio(self, audio_encoder_params, mels: jnp.ndarray):
        _, enc, masks = self.audio_encoder.apply(audio_encoder_params, mels)
        return enc, masks

    def null_audio_encoding(self) -> jnp.ndarray:
        """Encoding of a zero mel — a constant of the frozen tower, cached
        so repeated pipeline calls don't pay a second tower pass (the
        reference recomputes it per call, pipeline...py:159-196)."""
        if self._null_audio is None:
            cfg = self.audio_encoder.config
            zero = jnp.zeros((1, cfg.mel_bins, cfg.mel_frames, 1))
            null_enc, _ = self._encode_audio(self.audio_encoder_params, zero)
            self._null_audio = null_enc
        return self._null_audio

    def encode_audio(self, mels: jnp.ndarray):
        """mels (b, 128, 204, 1) -> (encodings (b,229,768), masks (b,s,229),
        null_encodings (1,229,768))."""
        enc, masks = self._encode_audio(self.audio_encoder_params, mels)
        return enc, masks, self.null_audio_encoding()

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _encode_image(self, vae_params, images: jnp.ndarray, rng: jax.Array,
                      broadcast: bool = False):
        images = images * 2.0 - 1.0
        if not broadcast:
            return self.vae.apply(vae_params, images, rng,
                                  method=self.vae.sample_latents)
        # broadcast_rng: one noise draw shared by every batch element —
        # bit-identical to generating each clip separately with the same
        # seed (the reference re-seeds its generator per clip, :432-433)
        mean, logvar = self.vae.apply(vae_params, images,
                                      method=self.vae.encode)
        noise = jax.random.normal(rng, (1,) + mean.shape[1:], mean.dtype)
        z = mean + jnp.exp(0.5 * logvar) * noise
        return z * self.vae.config.scaling_factor

    def encode_image(self, images: jnp.ndarray, rng: jax.Array,
                     broadcast: bool = False):
        """images (b, h, w, 3) in [0,1] -> sampled scaled latents."""
        return self._encode_image(self.vae_params, images, rng, broadcast)

    # ---------------- denoise program ----------------

    def _denoise_program(self, num_steps: int, sampler: str,
                         text_gs: float, audio_gs: float):
        # per-INSTANCE program cache: an lru_cache on the method would key
        # on self and pin dropped pipelines (multi-GB params captured by
        # the program closures) in a class-level cache forever
        key = (num_steps, sampler, text_gs, audio_gs)
        cached = self._programs.get(key)
        if cached is not None:
            return cached
        plan = (plms_plan if sampler == "plms" else ddim_plan)(
            self.schedule, num_steps)
        rows = plan_row_arrays(plan)
        do_text = text_gs > 1.0
        do_audio = audio_gs > 1.0
        sl = slice(1, None)  # frame-0 pinned
        # generation path: fuse attn1+audio-x+text-x per transformer block
        # into one Pallas program (VMEM-resident residual stream); same
        # param tree, so unet_params pass through unchanged
        unet = self.unet.clone(fuse_blocks=True)

        def program(unet_params, latents, text_ctx, null_text_ctx,
                    audio_ctx, null_audio_ctx, audio_token_indices):
            b = latents.shape[0]
            # batch-carrying contexts: fully replicated (tiny; every seq
            # shard reads them all — see _ctx_constraint).  The batch-1
            # null contexts/token indices are NOT constrained here — they
            # arrive replicated via _replicate(); an in-program constraint
            # would materialize exactly the reshard copy the replication
            # avoids.
            text_ctx = self._ctx_constraint(text_ctx)
            audio_ctx = self._ctx_constraint(audio_ctx)

            def rep(x):
                return jnp.broadcast_to(x, (b,) + x.shape[1:])

            # CFG stacking, mirroring the reference's encode_text/audio order
            if do_text and do_audio:
                text_stack = jnp.concatenate(
                    [rep(null_text_ctx), text_ctx, text_ctx])
                audio_stack = jnp.concatenate(
                    [rep(null_audio_ctx), rep(null_audio_ctx), audio_ctx])
                k = 3
            elif do_text:
                text_stack = jnp.concatenate([rep(null_text_ctx), text_ctx])
                audio_stack = jnp.concatenate([audio_ctx, audio_ctx])
                k = 2
            elif do_audio:
                text_stack = jnp.concatenate([text_ctx, text_ctx])
                audio_stack = jnp.concatenate([rep(null_audio_ctx), audio_ctx])
                k = 2
            else:
                text_stack, audio_stack, k = text_ctx, audio_ctx, 1

            state = init_state(plan, latents, step_slice=sl)

            def body(state, row):
                x = jnp.concatenate([self._seq_constraint(state.latents)] * k)
                t = jnp.broadcast_to(row["t_model"], (k * b,))
                eps = unet.apply(unet_params, x, t, text_stack,
                                 audio_stack, None, audio_token_indices)
                if do_text and do_audio:
                    e_u, e_t, e_ta = jnp.split(eps, 3)
                    eps = e_u + text_gs * (e_t - e_u) + audio_gs * (e_ta - e_t)
                elif do_text:
                    e_a, e_ta = jnp.split(eps, 2)
                    eps = e_a + text_gs * (e_ta - e_a)
                elif do_audio:
                    e_t, e_ta = jnp.split(eps, 2)
                    eps = e_t + audio_gs * (e_ta - e_t)
                state = sampler_step(
                    plan.kind, row, state, eps[:, sl], step_slice=sl,
                    prediction_type=self.schedule.prediction_type)
                return state, ()

            state, _ = jax.lax.scan(body, state, rows)
            return state.latents

        compiled = jax.jit(program)
        self._programs[key] = compiled
        return compiled

    @functools.partial(jax.jit, static_argnums=0)
    def _decode_latents(self, vae_params, latents: jnp.ndarray):
        b, f = latents.shape[:2]
        flat = latents.reshape((b * f,) + latents.shape[2:])
        flat = flat / self.vae.config.scaling_factor
        imgs = self.vae.apply(vae_params, flat, method=self.vae.decode)
        imgs = jnp.clip(imgs / 2.0 + 0.5, 0.0, 1.0)
        return imgs.reshape((b, f) + imgs.shape[1:])

    def decode_latents(self, latents: jnp.ndarray) -> jnp.ndarray:
        """(b, f, hh, ww, 4) scaled latents -> (b, f, h, w, 3) in [0, 1]."""
        return self._decode_latents(self.vae_params, latents)

    # ---------------- main entry ----------------

    def __call__(
        self,
        images: jnp.ndarray,                  # (b, h, w, 3) in [0, 1]
        audio_mels: jnp.ndarray,              # (b, 128, 204, 1)
        text_encodings: jnp.ndarray,          # (b, 77, 768)
        video_length: int = 12,
        num_inference_steps: int = 20,
        audio_guidance_scale: float = 4.0,
        text_guidance_scale: float = 1.0,
        sampler: str = "plms",
        rng: Optional[jax.Array] = None,
        decode: bool = True,
        broadcast_rng: bool = False,
    ):
        """broadcast_rng: draw the VAE-sampling and init-latent noise ONCE
        (batch 1) and share it across the batch — a batched call is then
        bit-identical to per-clip calls with the same seed, so the dataset
        sweep can batch clips without changing the eval protocol."""
        rng = jax.random.PRNGKey(0) if rng is None else rng
        rng_vae, rng_noise = jax.random.split(rng)

        images, audio_mels, text_encodings = self._shard_batch(
            (images, audio_mels, text_encodings))
        image_latents = self.encode_image(images, rng_vae,
                                          broadcast=broadcast_rng)
        b, hh, ww, c = image_latents.shape
        nb = 1 if broadcast_rng else b
        noise = jax.random.normal(
            rng_noise, (nb, video_length - 1, hh, ww, c),
            image_latents.dtype)
        noise = jnp.broadcast_to(noise, (b,) + noise.shape[1:])
        latents = self._seq_constraint(
            jnp.concatenate([image_latents[:, None], noise], axis=1))

        audio_ctx, audio_masks, null_audio_ctx = self.encode_audio(audio_mels)
        if audio_masks.shape[1] != video_length:
            raise ValueError(
                f"audio encoder n_segment={audio_masks.shape[1]} must equal "
                f"video_length={video_length}")
        # static per-frame token gather == the boolean segment masks, but
        # with no (n x 229) logits: each frame attends exactly its 25 tokens
        token_idx = jnp.asarray(segment_token_indices(
            video_length, self.audio_encoder.config.patch_grid))
        if self.null_text_encoding is not None:
            null_text = self.null_text_encoding
        else:
            # the reference's uncond CFG branch uses the PRECOMPUTED
            # empty-string CLIP encoding (openai-clip-l_null_text_encoding
            # .pt); zeros is a stand-in for weightless test runs only
            import warnings
            warnings.warn(  # deduped per location by the default filter
                "AnimationPipeline: null_text_encoding missing — the "
                "uncond CFG branch uses a ZEROS text context instead of "
                "the empty-string CLIP encoding; reference numerics will "
                "differ")
            null_text = jnp.zeros_like(text_encodings[:1])

        null_text, null_audio_ctx, token_idx = self._replicate(
            (null_text, null_audio_ctx, token_idx))
        program = self._denoise_program(
            num_inference_steps, sampler,
            float(text_guidance_scale), float(audio_guidance_scale))
        latents = program(self.unet_params, latents, text_encodings,
                          null_text, audio_ctx, null_audio_ctx, token_idx)
        if not decode:
            return latents
        return self.decode_latents(latents)
