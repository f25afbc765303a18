"""UNet down / mid / up blocks (reference: avgen/models/unets/unet_3d_blocks.py).

Block-type strings are kept identical to the reference configs so YAML
configs can be consumed unchanged:
  FFSpatioTempResDownBlock3D / FFSpatioTempResUpBlock3D
  FFSpatioTempCrossAttnDownBlock3D / ...UpBlock3D / ...UNetMidBlock3D
  FFSpatioAudioTempCrossAttnDownBlock3D / ...UpBlock3D / ...UNetMidBlock3D
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .resnet import FFDownsample, FFResnetBlock, FFUpsample
from .transformer import SpatioAudioTempTransformer3D


class DownBlock(nn.Module):
    out_channels: int
    num_layers: int = 2
    groups: int = 32
    eps: float = 1e-5
    add_downsample: bool = True
    # attention config; has_attention=False => pure resnet block
    has_attention: bool = False
    use_audio: bool = False
    num_heads: int = 8
    fuse_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, text_context=None, audio_context=None,
                 audio_mask=None, audio_token_indices=None
                 ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        residuals = []
        head_dim = self.out_channels // self.num_heads
        for i in range(self.num_layers):
            x = FFResnetBlock(self.out_channels, groups=self.groups,
                              eps=self.eps, dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb)
            if self.has_attention:
                x = SpatioAudioTempTransformer3D(
                    self.num_heads, head_dim, norm_num_groups=self.groups,
                    use_audio=self.use_audio,
                    fuse_blocks=self.fuse_blocks, dtype=self.dtype,
                    name=f"attentions_{i}")(
                    x, text_context, audio_context, audio_mask,
                    audio_token_indices)
            residuals.append(x)
        if self.add_downsample:
            x = FFDownsample(self.out_channels, dtype=self.dtype,
                             name="downsample")(x)
            residuals.append(x)
        return x, residuals


class MidBlock(nn.Module):
    channels: int
    num_layers: int = 1
    groups: int = 32
    eps: float = 1e-5
    use_audio: bool = True
    num_heads: int = 8
    fuse_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, text_context=None, audio_context=None,
                 audio_mask=None, audio_token_indices=None) -> jnp.ndarray:
        head_dim = self.channels // self.num_heads
        x = FFResnetBlock(self.channels, groups=self.groups, eps=self.eps,
                          dtype=self.dtype, name="resnets_0")(x, temb)
        for i in range(self.num_layers):
            x = SpatioAudioTempTransformer3D(
                self.num_heads, head_dim, norm_num_groups=self.groups,
                use_audio=self.use_audio, fuse_blocks=self.fuse_blocks,
                dtype=self.dtype,
                name=f"attentions_{i}")(
                x, text_context, audio_context, audio_mask,
                audio_token_indices)
            x = FFResnetBlock(self.channels, groups=self.groups, eps=self.eps,
                              dtype=self.dtype, name=f"resnets_{i + 1}")(x, temb)
        return x


class UpBlock(nn.Module):
    out_channels: int
    num_layers: int = 3  # reference uses layers_per_block + 1
    groups: int = 32
    eps: float = 1e-5
    add_upsample: bool = True
    has_attention: bool = False
    use_audio: bool = False
    num_heads: int = 8
    fuse_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_states: List[jnp.ndarray], temb,
                 text_context=None, audio_context=None,
                 audio_mask=None, audio_token_indices=None) -> jnp.ndarray:
        head_dim = self.out_channels // self.num_heads
        for i in range(self.num_layers):
            res = res_states.pop()
            # pass the skip concat as channel PARTS: the resnet pools joint
            # GroupNorm stats and runs split-kernel convs, so the wide
            # (e.g. 960/1920-channel) concat never materializes and each
            # conv tiles at its clean width (see primitives.Conv2DParams)
            x = FFResnetBlock(self.out_channels, groups=self.groups,
                              eps=self.eps, dtype=self.dtype,
                              name=f"resnets_{i}")((x, res), temb)
            if self.has_attention:
                x = SpatioAudioTempTransformer3D(
                    self.num_heads, head_dim, norm_num_groups=self.groups,
                    use_audio=self.use_audio,
                    fuse_blocks=self.fuse_blocks, dtype=self.dtype,
                    name=f"attentions_{i}")(
                    x, text_context, audio_context, audio_mask,
                    audio_token_indices)
        if self.add_upsample:
            x = FFUpsample(self.out_channels, dtype=self.dtype,
                           name="upsample")(x)
        return x
