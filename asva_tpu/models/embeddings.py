"""Timestep / positional embeddings.

Numerics match diffusers' `get_timestep_embedding` (used by `Timesteps`) and
`TimestepEmbedding` as consumed by the reference UNet
(avgen/models/unets/audio_cond_unet_3d_condition.py:243,250) and by the
temporal positional embedding
(avgen/models/unets/transformers/ff_spatio_audio_temp_transformer_3d.py:250-257).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """(N,) int/float timesteps -> (N, dim) float32 sinusoidal embedding."""
    import numpy as np
    half_dim = dim // 2
    # fold frequencies as float64 host constants (dim is static under jit)
    freqs = np.exp(-np.log(max_period) * np.arange(half_dim, dtype=np.float64)
                   / (half_dim - downscale_freq_shift)).astype(np.float32)
    emb = jnp.asarray(freqs)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        emb = jnp.concatenate([cos, sin], axis=-1)
    else:
        emb = jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """2-layer SiLU MLP: in_dim -> time_embed_dim -> time_embed_dim."""
    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray,
                 condition: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if condition is not None:  # cond_proj path (unused by AVSyncD configs)
            sample = sample + nn.Dense(sample.shape[-1], use_bias=False,
                                       dtype=self.dtype, name="cond_proj")(condition)
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        x = nn.silu(x)
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x
