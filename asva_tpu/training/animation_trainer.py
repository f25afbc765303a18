"""AVSyncD diffusion training: loss, train state, and sharded train step.

Behavioral contract (reference
avgen/models/trainers/audio_cond_animation_trainer.py:70-150):
  * VAE-encode frames without gradients; latents scaled by 0.18215,
  * audio tower runs frozen; null audio encodings come from a zero mel,
  * per-sample Bernoulli condition dropout swaps text -> null text encoding
    (prob text_cond_drop_prob) and audio -> null audio (audio_cond_drop_prob),
  * uniform random train timestep per sample; DDPM add_noise; frame-0 latent
    re-pinned clean; epsilon (or v) target,
  * MSE over frames 1..f-1 (frame 0 excluded unless loss_on_first_frame).

TPU re-design: the whole step (encoders + UNet fwd/bwd + optax update) is
one jit program over the (data, fsdp) mesh; gradient cross-replica sums are
inserted by the SPMD partitioner.  Gradient accumulation is a host-level
loop of `accumulate_step` followed by `apply_step` (optax.MultiSteps would
also work but doubles optimizer memory for the masked params).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..diffusion.schedules import DiffusionSchedule


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any          # UNet params (the only trained module)
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class AnimationTrainConfig:
    text_cond_drop_prob: float = 0.0
    audio_cond_drop_prob: float = 0.2
    loss_on_first_frame: bool = False
    prediction_type: str = "epsilon"  # or "v_prediction"


@dataclasses.dataclass(eq=False)
class AnimationTrainer:
    unet: Any
    vae: Any
    audio_encoder: Any
    vae_params: Any
    audio_encoder_params: Any
    null_text_encoding: jnp.ndarray       # (1, 77, 768)
    schedule: DiffusionSchedule = DiffusionSchedule()
    config: AnimationTrainConfig = AnimationTrainConfig()
    _null_audio: Any = dataclasses.field(default=None, init=False,
                                         repr=False)

    def null_audio_encoding(self) -> jnp.ndarray:
        """Encoding of a zero mel — constant while the audio tower is
        frozen, so it is computed once instead of one tower pass per train
        step (reference recomputes it every forward,
        audio_cond_animation_trainer.py:108-111)."""
        if self._null_audio is None:
            cfg = self.audio_encoder.config
            zero = jnp.zeros((1, cfg.mel_bins, cfg.mel_frames, 1))
            _, enc, _ = jax.jit(self.audio_encoder.apply)(
                self.audio_encoder_params, zero)
            self._null_audio = jax.lax.stop_gradient(enc)
        return self._null_audio

    def _frozen(self):
        return (self.vae_params, self.audio_encoder_params,
                self.null_text_encoding, self.null_audio_encoding())

    def loss_fn(self, unet_params, batch: dict, rng: jax.Array) -> jnp.ndarray:
        """batch: videos (b,f,h,w,3) in [0,1], mels (b,128,204,1),
        text_encodings (b,77,768)."""
        return self._loss(unet_params, batch, rng, *self._frozen())

    def _loss(self, unet_params, batch: dict, rng: jax.Array, vae_params,
              audio_encoder_params, null_text_encoding,
              null_audio_enc) -> jnp.ndarray:
        # frozen params arrive as ARGUMENTS so jitted steps never embed them
        # as compile-time constants (remote-compile payload limits; see
        # pipelines/animation.py note)
        cfg = self.config
        videos = batch["videos"]
        b, f = videos.shape[0], videos.shape[1]
        if "mels" not in batch:  # on-device mel from raw 16 kHz waveforms
            from ..ops.mel import waveform_to_mel
            batch = dict(batch,
                         mels=jax.vmap(waveform_to_mel)(batch["waveforms"]))
        r_vae, r_t, r_noise, r_tdrop, r_adrop = jax.random.split(rng, 5)

        # 1. frozen encoders
        frames = (videos.reshape((b * f,) + videos.shape[2:]) - 0.5) / 0.5
        latents = self.vae.apply(vae_params, frames, r_vae,
                                 method=self.vae.sample_latents)
        latents = latents.reshape((b, f) + latents.shape[1:])
        latents = jax.lax.stop_gradient(latents)

        _, audio_enc, audio_masks = self.audio_encoder.apply(
            audio_encoder_params, batch["mels"])
        audio_enc = jax.lax.stop_gradient(audio_enc)
        # static per-frame token gather (equivalent to the boolean masks but
        # with no (n x n_ctx) logits; see CrossAttention.context_indices)
        from ..models.imagebind_audio import segment_token_indices
        token_idx = jnp.asarray(segment_token_indices(
            self.audio_encoder.n_segment,
            self.audio_encoder.config.patch_grid))

        # 2. per-sample condition dropout
        text_keep = (jax.random.uniform(r_tdrop, (b, 1, 1))
                     >= cfg.text_cond_drop_prob)
        audio_keep = (jax.random.uniform(r_adrop, (b, 1, 1))
                      >= cfg.audio_cond_drop_prob)
        text_enc = jnp.where(text_keep, batch["text_encodings"],
                             null_text_encoding.astype(videos.dtype))
        audio_enc = jnp.where(audio_keep, audio_enc, null_audio_enc)
        # masks are input-independent, so dropout does not alter them

        # 3. diffusion corruption with frame-0 pinning
        t = jax.random.randint(r_t, (b,), 0,
                               self.schedule.num_train_timesteps)
        noise = jax.random.normal(r_noise, latents.shape, latents.dtype)
        noisy = self.schedule.add_noise(latents, noise, t)
        noisy = jnp.concatenate([latents[:, 0:1], noisy[:, 1:]], axis=1)

        if cfg.prediction_type == "epsilon":
            target = noise
        elif cfg.prediction_type == "v_prediction":
            target = self.schedule.velocity(latents, noise, t)
        else:
            raise ValueError(cfg.prediction_type)

        pred = self.unet.apply(unet_params, noisy, t, text_enc, audio_enc,
                               None, token_idx)

        if cfg.loss_on_first_frame:
            err = pred.astype(jnp.float32) - target.astype(jnp.float32)
        else:
            err = (pred[:, 1:].astype(jnp.float32)
                   - target[:, 1:].astype(jnp.float32))
        return jnp.mean(jnp.square(err))

    # ---------------- jitted step builders ----------------
    #
    # When `mask` (the trainable_mask pytree) is given, the step
    # differentiates ONLY the trainable subtree: the frozen SD1.5 image
    # weights enter as non-differentiated arguments, so XLA never emits
    # their weight-gradient contractions (a full extra conv pass at frozen
    # levels) nor a params-sized gradient buffer — matching the torch
    # reference where requires_grad=False params get no wgrad
    # (scripts/animation_train.py:115-121).  The optimizer then runs over
    # the trainable subtree alone (build it WITHOUT a mask) and its state
    # must be tx.init(trainable_subtree).

    def make_train_step(self, tx: optax.GradientTransformation,
                        donate: bool = True, mask=None) -> Callable:
        from .optim import merge_params, partition_params

        def step(state: TrainState, batch: dict, rng: jax.Array, frozen):
            if mask is None:
                loss, grads = jax.value_and_grad(self._loss)(
                    state.params, batch, rng, *frozen)
                updates, opt_state = tx.update(grads, state.opt_state,
                                               state.params)
                params = optax.apply_updates(state.params, updates)
                return TrainState(state.step + 1, params, opt_state), loss
            train_p, frozen_p = partition_params(state.params, mask)
            frozen_p = jax.lax.stop_gradient(frozen_p)
            loss, grads = jax.value_and_grad(
                lambda tp: self._loss(merge_params(tp, frozen_p), batch,
                                      rng, *frozen))(train_p)
            updates, opt_state = tx.update(grads, state.opt_state, train_p)
            train_p = optax.apply_updates(train_p, updates)
            return TrainState(state.step + 1,
                              merge_params(train_p, frozen_p),
                              opt_state), loss

        jitted = jax.jit(step, donate_argnums=(0,) if donate else ())
        frozen = self._frozen()
        return lambda state, batch, rng: jitted(state, batch, rng, frozen)

    def make_grad_step(self, mask=None) -> Callable:
        """For gradient accumulation: returns (loss, grads) — grads over
        the trainable subtree only when `mask` is given (so accumulation
        buffers are trainable-sized, not params-sized)."""
        from .optim import merge_params, partition_params

        def gstep(params, batch: dict, rng: jax.Array, frozen):
            if mask is None:
                return jax.value_and_grad(self._loss)(params, batch, rng,
                                                      *frozen)
            train_p, frozen_p = partition_params(params, mask)
            frozen_p = jax.lax.stop_gradient(frozen_p)
            return jax.value_and_grad(
                lambda tp: self._loss(merge_params(tp, frozen_p), batch,
                                      rng, *frozen))(train_p)
        jitted = jax.jit(gstep)
        frozen = self._frozen()
        return lambda params, batch, rng: jitted(params, batch, rng, frozen)

    def make_apply_step(self, tx: optax.GradientTransformation,
                        mask=None) -> Callable:
        from .optim import merge_params, partition_params

        def astep(state: TrainState, grads):
            if mask is None:
                updates, opt_state = tx.update(grads, state.opt_state,
                                               state.params)
                params = optax.apply_updates(state.params, updates)
                return TrainState(state.step + 1, params, opt_state)
            train_p, frozen_p = partition_params(state.params, mask)
            updates, opt_state = tx.update(grads, state.opt_state, train_p)
            train_p = optax.apply_updates(train_p, updates)
            return TrainState(state.step + 1,
                              merge_params(train_p, frozen_p), opt_state)
        return jax.jit(astep, donate_argnums=(0,))
