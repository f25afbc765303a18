"""AutoencoderKL (SD1.5 VAE) in flax, channels-last.

Architecture constants follow the stable-diffusion-v1-5 `vae/config.json`
the reference loads at avgen/pipelines/pipeline_audio_cond_animation.py:513:
block_out_channels (128, 256, 512, 512), 2 resnet layers per encoder block,
3 per decoder block, latent_channels 4, scaling_factor 0.18215, GroupNorm
32/1e-6, SiLU, single-head mid attention with biased q/k/v projections, and
the encoder downsample's asymmetric (0,1)x(0,1) padding.

Usage: frames are folded into the batch axis — the reference encodes/decodes
video per frame (avgen/models/trainers/audio_cond_animation_trainer.py:82-85).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet3d.primitives import Upsample2xConv2D
from ..ops.norms import SpatialGroupNorm


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215

    @classmethod
    def tiny(cls, **kw) -> "VAEConfig":
        d = dict(block_out_channels=(8, 16), layers_per_block=1,
                 norm_num_groups=4)
        d.update(kw)
        return cls(**d)


class VAEResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = SpatialGroupNorm(self.groups, 1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(h)
        h = SpatialGroupNorm(self.groups, 1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial tokens with residual."""
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        res = x
        y = SpatialGroupNorm(self.groups, 1e-6, name="group_norm")(x)
        y = y.reshape(n, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        scale = 1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32))
        logits = jnp.einsum("nqc,nkc->nqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        y = jnp.einsum("nqk,nkc->nqc", attn, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        y = nn.Dense(c, dtype=self.dtype, name="to_out")(y)
        return res + y.reshape(n, h, w, c)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        g = cfg.norm_num_groups
        h = nn.Conv(cfg.block_out_channels[0], (3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VAEResnetBlock(ch, g, dtype=self.dtype,
                                   name=f"down_{i}_resnet_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                # asymmetric pad: right/bottom only (diffusers VAE downsample)
                h = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)), dtype=self.dtype,
                            name=f"down_{i}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = VAEResnetBlock(ch, g, dtype=self.dtype, name="mid_resnet_0")(h)
        h = VAEAttention(g, dtype=self.dtype, name="mid_attn")(h)
        h = VAEResnetBlock(ch, g, dtype=self.dtype, name="mid_resnet_1")(h)
        h = SpatialGroupNorm(g, 1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3),
                       padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        g = cfg.norm_num_groups
        rev = tuple(reversed(cfg.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(z)
        h = VAEResnetBlock(rev[0], g, dtype=self.dtype, name="mid_resnet_0")(h)
        h = VAEAttention(g, dtype=self.dtype, name="mid_attn")(h)
        h = VAEResnetBlock(rev[0], g, dtype=self.dtype, name="mid_resnet_1")(h)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnetBlock(ch, g, dtype=self.dtype,
                                   name=f"up_{i}_resnet_{j}")(h)
            if i < len(rev) - 1:
                # conv3x3(nearest_up2(h)) on the pre-upsample grid — exact
                # kernel-folding decomposition, 2.25x fewer MACs, no 4x
                # intermediate (see unet3d.primitives.Upsample2xConv2D;
                # param path/shape identical to the naive nn.Conv)
                h = Upsample2xConv2D(ch, ch, dtype=self.dtype,
                                     name=f"up_{i}_upsample")(h)
        h = SpatialGroupNorm(g, 1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """encode() returns (mean, logvar) after quant_conv; decode() maps latents
    to images.  Latent scaling by cfg.scaling_factor is the caller's job
    (matches the reference pipeline)."""
    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Dense(2 * self.config.latent_channels,
                                   dtype=self.dtype)
        self.post_quant_conv = nn.Dense(self.config.latent_channels,
                                        dtype=self.dtype)

    def encode(self, images: jnp.ndarray):
        moments = self.quant_conv(self.encoder(images))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean, logvar

    def sample_latents(self, images: jnp.ndarray, rng: jax.Array,
                       scale: bool = True) -> jnp.ndarray:
        mean, logvar = self.encode(images)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return z * self.config.scaling_factor if scale else z

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(latents))

    def __call__(self, images: jnp.ndarray, rng: jax.Array):
        mean, logvar = self.encode(images)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return self.decode(z), mean, logvar
