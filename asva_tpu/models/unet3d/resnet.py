"""FF spatio-temporal resnet blocks (channels-last).

Reference: avgen/models/unets/resnets/ff_spatio_temp_resnet_3d.py.
Note the GroupNorm here spans ALL frames (VideoGroupNorm), because the torch
module applied nn.GroupNorm to the 5-D (b, c, f, h, w) tensor.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ...ops.norms import VideoGroupNorm
from .primitives import FFInflatedConv, FFInflatedUpsample2xConv


class FFResnetBlock(nn.Module):
    """norm1 -> silu -> ffconv1 -> (+ per-frame temb) -> norm2 -> silu ->
    ffconv2 -> + shortcut.  temb is (b, f, temb_channels)."""
    out_channels: int
    temb_channels: Optional[int] = 1280
    groups: int = 32
    eps: float = 1e-5
    time_embedding_norm: str = "default"  # or "scale_shift"
    output_scale_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x,
                 temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # A tuple input is the channel parts of a virtual concat (up-path
        # [hidden, skip]): norm1 pools joint group stats over the parts and
        # conv1/conv_shortcut run split-kernel — the concat never
        # materializes and the split convs tile better (see Conv2DParams).
        parts = tuple(x) if isinstance(x, (tuple, list)) else None
        if parts is not None:
            in_channels = sum(int(p.shape[-1]) for p in parts)
            h = VideoGroupNorm(self.groups, self.eps, name="norm1")(parts)
            h = tuple(nn.silu(p) for p in h)
        else:
            in_channels = x.shape[-1]
            h = VideoGroupNorm(self.groups, self.eps, name="norm1")(x)
            h = nn.silu(h)
        h = FFInflatedConv(self.out_channels, 3, 1, 1, dtype=self.dtype,
                           name="conv1")(h)

        if temb is not None and self.temb_channels is not None:
            proj_dim = (self.out_channels * 2
                        if self.time_embedding_norm == "scale_shift"
                        else self.out_channels)
            t = nn.Dense(proj_dim, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb))
            t = t[:, :, None, None, :]  # (b, f, 1, 1, c)
            if self.time_embedding_norm == "default":
                h = h + t

        h = VideoGroupNorm(self.groups, self.eps, name="norm2")(h)
        if (temb is not None and self.temb_channels is not None
                and self.time_embedding_norm == "scale_shift"):
            scale, shift = jnp.split(t, 2, axis=-1)
            h = h * (1 + scale) + shift
        h = nn.silu(h)
        h = FFInflatedConv(self.out_channels, 3, 1, 1, dtype=self.dtype,
                           name="conv2")(h)

        if in_channels != self.out_channels:
            x = FFInflatedConv(self.out_channels, 1, 1, 0, dtype=self.dtype,
                               name="conv_shortcut")(
                parts if parts is not None else x)
        elif parts is not None:  # identity residual needs the real concat
            x = jnp.concatenate(parts, axis=-1)
        return (x + h) / self.output_scale_factor


class FFDownsample(nn.Module):
    """Stride-2 FF conv (torch pad 1 both sides, matching explicit padding)."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return FFInflatedConv(self.out_channels, 3, 2, 1, dtype=self.dtype,
                              name="conv")(x)


class FFUpsample(nn.Module):
    """Nearest x2 spatial upsample + FF conv (frame axis untouched).

    decomposed=True (default) evaluates conv3x3(nearest_up2(x)) as four
    2x2 convs ON THE PRE-UPSAMPLE GRID + pixel interleave — exact algebra
    (nearest duplication means each 3x3 tap row hits only 2 distinct
    source rows, so kernel weights fold: see FFInflatedUpsample2xConv).
    2.25x fewer conv MACs and the 4x-sized upsampled activation is never
    materialized; the upsample convs are ~17% of the eval's conv FLOPs.
    Param tree identical to the naive path (checkpoints interchangeable);
    equivalence pinned by tests/test_primitives.py."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    decomposed: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.decomposed:
            return FFInflatedUpsample2xConv(self.out_channels,
                                            dtype=self.dtype, name="conv")(x)
        # nearest-neighbour x2 on (h, w): exact repeat, matches
        # F.interpolate(mode="nearest", scale_factor=[1, 2, 2]).
        x = jnp.repeat(x, 2, axis=2)
        x = jnp.repeat(x, 2, axis=3)
        return FFInflatedConv(self.out_channels, 3, 1, 1, dtype=self.dtype,
                              name="conv")(x)
