"""asva_tpu — a TPU-native (JAX / XLA / Pallas / pjit) audio-synchronized
visual animation framework.

Re-designed from scratch with the capabilities of lzhangbj/ASVA (ECCV 2024):
  * AVSyncD: audio-conditioned image-animation latent diffusion
    (first-frame-conditioned inflated SD1.5 video UNet with per-block audio
    cross-attention and temporal attention).
  * AVSync classifier: contrastive audio-video synchronization scorer.
  * Evaluation harness: FID / FVD / IA / IT / RelSync / AlignSync.

Conventions (TPU-first, deliberately different from the torch reference):
  * Video tensors are channels-last: (batch, frame, height, width, channel).
  * Audio mel spectrograms are (batch, n_mels, time, 1).
  * All model code is functional flax.linen; samplers are pure functions
    driven by `lax.fori_loop` under `jax.jit`.
  * Distribution is declarative: `jax.sharding.Mesh` + NamedSharding,
    never hand-written collectives in model code.
"""

__version__ = "0.1.0"
