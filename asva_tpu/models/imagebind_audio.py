"""ImageBind-huge audio branch + AVSyncD segment-mask logic, in flax.

Re-implements the behavior of the reference's ImageBindSegmaskAudioEncoder
(avgen/models/audio_encoders/segmask_imagebind.py:42-123), which wraps the
public ImageBind audio tower:

  preprocessor: Conv2d(1 -> 768, kernel 16, stride 10, no bias) on the
    (128, 204) mel image -> 12x19 = 228 patches, LayerNorm, prepend CLS
    token, add learnable positional embedding (1, 229, 768).
  trunk: 12 transformer blocks (12 heads, MLP x4, GELU, qkv+out biases,
    torch-MultiheadAttention bias_k/bias_v appended as an extra KV token —
    imagebind_huge builds the audio trunk with add_bias_kv=True and
    pre_transformer_ln=False), NO pre/final norm — token encodings are
    returned un-normalized.
  head: LayerNorm -> CLS select -> Linear(768 -> 1024, no bias).
  postprocessor: L2-normalize then MULTIPLY by logit_scale=20
    (LearnableLogitScaling; consumers divide by 20 to recover unit
    vectors — only for normalized cls embeddings).

ASVA additions: a trainable `final_layer_norm` applied to the trunk tokens
(reference :60,:101) and per-frame audio segment masks: the 19 time-patch
columns are split into `n_segment` chunks of ceil(19/n) columns at
round(linspace) starts; video frame i may only attend to its time slice
(CLS always visible) (reference `_auto_split` :62-78, mask assembly
:104-114).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.norms import AdaptiveOrLayerNorm


@dataclasses.dataclass(frozen=True)
class ImageBindAudioConfig:
    embed_dim: int = 768
    out_embed_dim: int = 1024
    num_blocks: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    kernel_size: int = 16
    stride: int = 10
    mel_bins: int = 128
    mel_frames: int = 204
    # imagebind_huge audio trunk flags (vision uses the opposite pair)
    add_bias_kv: bool = True
    pre_trunk_norm: bool = False

    @property
    def patch_grid(self) -> Tuple[int, int]:
        g = lambda n: (n - self.kernel_size) // self.stride + 1
        return g(self.mel_bins), g(self.mel_frames)  # (12, 19)

    @property
    def num_tokens(self) -> int:
        gh, gw = self.patch_grid
        return gh * gw + 1  # + CLS

    @classmethod
    def tiny(cls, **kw) -> "ImageBindAudioConfig":
        d = dict(embed_dim=32, out_embed_dim=16, num_blocks=2, num_heads=2)
        d.update(kw)
        return cls(**d)


def segment_masks(n_segment: int, patch_grid: Tuple[int, int]) -> np.ndarray:
    """(n_segment, 1 + gh*gw) boolean masks; True = attend.

    Chunk starts are round(linspace(0, t - chunk, n)) over the gw time
    columns; every mel-frequency row of a selected column is visible; CLS is
    always visible.
    """
    gh, gw = patch_grid
    chunk = int(math.ceil(gw / n_segment))
    starts = np.round(np.linspace(0, gw - chunk, n_segment,
                                  endpoint=True)).astype(np.int64)
    time_mask = np.zeros((n_segment, gw), dtype=bool)
    for i, s in enumerate(starts):
        time_mask[i, s:s + chunk] = True
    full = np.repeat(time_mask[:, None, :], gh, axis=1)  # (s, gh, gw)
    full = full.reshape(n_segment, gh * gw)              # row-major == token order
    cls_col = np.ones((n_segment, 1), dtype=bool)
    return np.concatenate([cls_col, full], axis=1)


def segment_token_indices(n_segment: int,
                          patch_grid: Tuple[int, int]) -> np.ndarray:
    """(n_segment, m) STATIC token indices equivalent to `segment_masks`.

    Every frame's mask selects the same count (CLS + chunk_cols * gh), so
    the boolean mask is losslessly convertible to a dense per-frame gather —
    the TPU-fast formulation of the masked audio cross-attention."""
    masks = segment_masks(n_segment, patch_grid)
    counts = masks.sum(axis=1)
    assert (counts == counts[0]).all(), counts
    return np.stack([np.nonzero(row)[0] for row in masks]).astype(np.int32)


class TrunkBlock(nn.Module):
    """Pre-norm ViT block; fused qkv Dense in torch [q;k;v] layout.

    add_bias_kv mirrors torch nn.MultiheadAttention(add_bias_kv=True): one
    learned (1, 1, e) bias_k / bias_v appended to the *projected* K and V as
    an extra attended position (imagebind_huge audio/depth/thermal trunks)."""
    embed_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    add_bias_kv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        e, h = self.embed_dim, self.num_heads
        d = e // h
        y = AdaptiveOrLayerNorm(1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * e, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.add_bias_kv:
            bias_k = self.param("bias_k", nn.initializers.normal(0.02),
                                (1, 1, e))
            bias_v = self.param("bias_v", nn.initializers.normal(0.02),
                                (1, 1, e))
            ones = (x.shape[0], 1, e)
            k = jnp.concatenate(
                [k, jnp.broadcast_to(bias_k.astype(k.dtype), ones)], axis=1)
            v = jnp.concatenate(
                [v, jnp.broadcast_to(bias_v.astype(v.dtype), ones)], axis=1)
        shape_q = y.shape[:-1] + (h, d)
        shape_kv = k.shape[:-1] + (h, d)
        from ..ops.attention import dot_product_attention
        attn = dot_product_attention(q.reshape(shape_q), k.reshape(shape_kv),
                                     v.reshape(shape_kv))
        attn = attn.reshape(y.shape[:-1] + (e,))
        x = x + nn.Dense(e, dtype=self.dtype, name="out_proj")(attn)

        y = AdaptiveOrLayerNorm(1e-6, name="norm2")(x)
        y = nn.Dense(int(e * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(e, dtype=self.dtype, name="fc2")(y)
        return x + y


class ImageBindAudioEncoder(nn.Module):
    """mel (b, 128, 204, 1) -> (cls_embeds (b,1024), tokens (b,229,768))."""
    config: ImageBindAudioConfig = ImageBindAudioConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, normalize: bool = False):
        cfg = self.config
        b = mel.shape[0]
        e = cfg.embed_dim
        x = nn.Conv(e, (cfg.kernel_size, cfg.kernel_size),
                    strides=(cfg.stride, cfg.stride), padding="VALID",
                    use_bias=False, dtype=self.dtype,
                    name="stem_proj")(mel.astype(self.dtype))
        gh, gw = cfg.patch_grid
        x = x.reshape(b, gh * gw, e)
        x = AdaptiveOrLayerNorm(1e-5, name="stem_norm")(x)
        cls_tok = self.param("cls_token", nn.initializers.zeros, (1, 1, e))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok.astype(x.dtype), (b, 1, e)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.num_tokens, e))
        x = x + pos.astype(x.dtype)

        if cfg.pre_trunk_norm:
            x = AdaptiveOrLayerNorm(1e-6, name="pre_norm")(x)
        for i in range(cfg.num_blocks):
            x = TrunkBlock(e, cfg.num_heads, cfg.mlp_ratio,
                           add_bias_kv=cfg.add_bias_kv, dtype=self.dtype,
                           name=f"blocks_{i}")(x)
        tokens = x  # pre-final-norm, as the reference returns them

        y = AdaptiveOrLayerNorm(1e-6, name="head_norm")(tokens[:, 0])
        cls_embeds = nn.Dense(cfg.out_embed_dim, use_bias=False,
                              dtype=self.dtype, name="head_proj")(y)
        if normalize:
            cls_embeds = cls_embeds / jnp.linalg.norm(
                cls_embeds, axis=-1, keepdims=True)
            cls_embeds = cls_embeds * 20.0  # LearnableLogitScaling(20, frozen)
        return cls_embeds, tokens


class SegmaskAudioEncoder(nn.Module):
    """Full AVSyncD audio conditioner: ImageBind tower + trainable final
    LayerNorm + per-frame segment masks."""
    config: ImageBindAudioConfig = ImageBindAudioConfig()
    n_segment: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, normalize: bool = False):
        cls_embeds, tokens = ImageBindAudioEncoder(
            self.config, dtype=self.dtype, name="imagebind")(mel, normalize)
        encodings = AdaptiveOrLayerNorm(1e-6, name="final_layer_norm")(tokens)
        masks = jnp.asarray(segment_masks(self.n_segment,
                                          self.config.patch_grid))
        masks = jnp.broadcast_to(masks[None], (mel.shape[0],) + masks.shape)
        return cls_embeds, encodings, masks
