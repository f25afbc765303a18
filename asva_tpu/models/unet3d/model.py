"""AudioUNet3D — first-frame-conditioned audio-driven video diffusion UNet.

TPU-native re-design of the reference AudioUNet3DConditionModel
(avgen/models/unets/audio_cond_unet_3d_condition.py:56-798):
  * channels-last (b, f, h, w, c) tensors;
  * per-frame time embedding (b, f, c) — reference repeats emb at :681;
  * text context (b, 77, 768) and audio context (b, 229, 768) are passed
    once and broadcast across frames inside the attention (the reference
    materializes per-frame copies);
  * audio_mask (b, f, 229) boolean segment masks (True = attend);
  * optional remat per block replaces torch per-block grad-checkpointing.

Unsupported reference knobs (never enabled by any ASVA config) are omitted:
class embeddings, addition text-time embeddings, encoder_hid projection,
fourier time embedding, dual cross attention, linear projections.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..embeddings import TimestepEmbedding, sinusoidal_timestep_embedding
from .blocks import DownBlock, MidBlock, UpBlock
from .primitives import FFInflatedConv

DOWN_AUDIO = "FFSpatioAudioTempCrossAttnDownBlock3D"
DOWN_TEXT = "FFSpatioTempCrossAttnDownBlock3D"
DOWN_RES = "FFSpatioTempResDownBlock3D"
UP_AUDIO = "FFSpatioAudioTempCrossAttnUpBlock3D"
UP_TEXT = "FFSpatioTempCrossAttnUpBlock3D"
UP_RES = "FFSpatioTempResUpBlock3D"
MID_AUDIO = "FFSpatioAudioTempCrossAttnUNetMidBlock3D"
MID_TEXT = "FFSpatioTempCrossAttnUNetMidBlock3D"


@dataclasses.dataclass(frozen=True)
class UNet3DConfig:
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (DOWN_AUDIO, DOWN_AUDIO, DOWN_AUDIO,
                                         DOWN_RES)
    mid_block_type: str = MID_AUDIO
    up_block_types: Tuple[str, ...] = (UP_RES, UP_AUDIO, UP_AUDIO, UP_AUDIO)
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    cross_attention_dim: int = 768
    audio_cross_attention_dim: int = 768
    attention_head_dim: int = 8  # == number of heads (diffusers SD1.5 naming)
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    remat: bool = False
    # "full": recompute whole blocks in backward (min memory, most
    # recompute); "dots": jax.checkpoint dots_with_no_batch_dims_saveable —
    # matmul outputs are SAVED, only elementwise/norm chains recompute
    # (faster backward, but OOMs the 1.2B UNet at batch 4 on one 16 GB
    # chip); "highres": remat ONLY the two highest-resolution levels —
    # the deep 8x8/4x4 levels hold ~half the FLOPs but tiny activations,
    # so skipping their recompute costs little memory; "l0": remat only
    # the 32x32 level (stores level-1 activations too — more memory than
    # highres, less recompute); "saveconv": like highres but the rematted
    # levels SAVE their FFInflatedConv 2D-conv outputs (checkpoint_name
    # "conv_out") — backward never re-runs a conv (frozen kernels need no
    # wgrad; dgrad needs only weights) at ~0.8 GB extra activations;
    # "saveconv0": mixed — level 0 keeps the saveconv named saves, level 1
    # fully remats (drops level-1's ~1 GB of saved conv/sublayer tensors
    # at batch 6 for a larger-batch memory frontier)
    remat_policy: str = "full"

    @classmethod
    def tiny(cls, **kw) -> "UNet3DConfig":
        """Small config for unit tests."""
        defaults = dict(block_out_channels=(32, 64), layers_per_block=1,
                        down_block_types=(DOWN_AUDIO, DOWN_RES),
                        up_block_types=(UP_RES, UP_AUDIO),
                        norm_num_groups=8, attention_head_dim=2)
        defaults.update(kw)
        return cls(**defaults)


class AudioUNet3D(nn.Module):
    config: UNet3DConfig = UNet3DConfig()
    dtype: jnp.dtype = jnp.float32
    # generation-path flag: fuse attn1+audio-x+text-x into one Pallas
    # program per transformer block (see transformer.py; param tree is
    # unchanged — pipelines enable it via unet.clone(fuse_blocks=True))
    fuse_blocks: bool = False

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,                    # (b, f, h, w, c_in)
        timesteps: jnp.ndarray,                 # (b,) or scalar
        text_context: Optional[jnp.ndarray],    # (b, 77, 768) or (b,f,77,768)
        audio_context: Optional[jnp.ndarray] = None,  # (b, 229, 768)
        audio_mask: Optional[jnp.ndarray] = None,     # (b, f, 229) bool
        audio_token_indices: Optional[jnp.ndarray] = None,  # (f, m) int
    ) -> jnp.ndarray:
        cfg = self.config
        b, f = sample.shape[0], sample.shape[1]
        num_heads = cfg.attention_head_dim

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (b,))

        # 1. time embedding, broadcast per frame
        t_emb = sinusoidal_timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift).astype(self.dtype)
        emb = TimestepEmbedding(cfg.block_out_channels[0] * 4,
                                dtype=self.dtype, name="time_embedding")(t_emb)
        emb = jnp.broadcast_to(emb[:, None, :], (b, f, emb.shape[-1]))

        # 2. input conv
        sample = sample.astype(self.dtype)
        x = FFInflatedConv(cfg.block_out_channels[0], 3, 1, 1,
                           dtype=self.dtype, name="conv_in")(sample)

        def maybe_remat(cls_, level: int = 0):
            if not cfg.remat:
                return cls_
            if cfg.remat_policy == "dots":
                policy = jax.checkpoint_policies.\
                    dots_with_no_batch_dims_saveable
                return nn.remat(cls_, policy=policy)
            if (cfg.remat_policy in ("highres", "saveconv", "saveconv0")
                    and level >= 2):
                return cls_
            if cfg.remat_policy == "l0" and level >= 1:
                return cls_
            if (cfg.remat_policy == "saveconv"
                    or (cfg.remat_policy == "saveconv0" and level == 0)):
                # "attn_res": the fused-attention o/lse residuals
                # (ops/pallas_fused._attn_fwd) — saving them means the
                # flash attention forward kernel runs once per step, never
                # in the remat recompute or the sub-layer's own backward
                # "block_out": transformer-block outputs (see
                # transformer.py) — skips the FF fused-forward kernel
                # re-runs in the recompute for ~240 MB of extra saves
                policy = jax.checkpoint_policies.save_only_these_names(
                    "conv_out", "sublayer_x", "attn_res", "block_out")
                return nn.remat(cls_, policy=policy)
            return nn.remat(cls_)

        # 3. down path
        res_stack = [x]
        out_ch = cfg.block_out_channels[0]
        for i, btype in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            block = maybe_remat(DownBlock, level=i)(
                out_channels=out_ch,
                num_layers=cfg.layers_per_block,
                groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                add_downsample=not is_final,
                has_attention=btype in (DOWN_AUDIO, DOWN_TEXT),
                use_audio=btype == DOWN_AUDIO,
                fuse_blocks=self.fuse_blocks,
                num_heads=num_heads, dtype=self.dtype,
                name=f"down_blocks_{i}")
            x, residuals = block(x, emb, text_context, audio_context,
                                 audio_mask, audio_token_indices)
            res_stack.extend(residuals)

        # 4. mid
        x = maybe_remat(MidBlock, level=len(cfg.block_out_channels) - 1)(
            channels=cfg.block_out_channels[-1], groups=cfg.norm_num_groups,
            eps=cfg.norm_eps, use_audio=cfg.mid_block_type == MID_AUDIO,
            fuse_blocks=self.fuse_blocks,
            num_heads=num_heads, dtype=self.dtype, name="mid_block")(
            x, emb, text_context, audio_context, audio_mask,
            audio_token_indices)

        # 5. up path
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, btype in enumerate(cfg.up_block_types):
            is_final = i == len(cfg.block_out_channels) - 1
            out_ch = rev_channels[i]
            n_layers = cfg.layers_per_block + 1
            skips = res_stack[-n_layers:]
            del res_stack[-n_layers:]
            # up level i mirrors down level (L-1-i) in resolution
            block = maybe_remat(
                UpBlock, level=len(cfg.block_out_channels) - 1 - i)(
                out_channels=out_ch, num_layers=n_layers,
                groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                add_upsample=not is_final,
                has_attention=btype in (UP_AUDIO, UP_TEXT),
                use_audio=btype == UP_AUDIO,
                fuse_blocks=self.fuse_blocks,
                num_heads=num_heads, dtype=self.dtype,
                name=f"up_blocks_{i}")
            x = block(x, skips, emb, text_context, audio_context,
                      audio_mask, audio_token_indices)

        # 6. out
        from ...ops.norms import VideoGroupNorm  # local import to avoid cycle
        x = VideoGroupNorm(cfg.norm_num_groups, cfg.norm_eps,
                           name="conv_norm_out")(x)
        x = nn.silu(x)
        x = FFInflatedConv(cfg.out_channels, 3, 1, 1, dtype=self.dtype,
                           name="conv_out")(x)
        return x
