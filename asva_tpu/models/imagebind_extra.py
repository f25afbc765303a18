"""ImageBind-huge vision and text towers (flax) for the CLIP-consistency
metrics.

The reference's eval CLIPModel wraps imagebind_huge and compares unit
embeddings: ia_sim = <vision, audio/20>, it_sim = <vision, text/scale>
(avgen/evaluations/models/clip.py:29-74).  Towers:

  vision: ViT-H — images are duplicated to a 2-frame "video", patchified by
    a (2, 14, 14) conv stride (2, 14, 14) (224^2 -> 256 tokens) + CLS,
    learnable pos embed, 32 blocks width 1280 / 16 heads, head =
    LN -> CLS -> Linear(1280 -> 1024, no bias), postprocess = L2 normalize.
  text: CLIP-style — 77 tokens, width 1024, 24 blocks / 16 heads, causal,
    token+pos embeddings, final LN, projection to 1024, EOS (argmax token id)
    pooling; postprocess = normalize then scale by clipped exp(log logit
    scale) — the eval divides it back out, leaving unit vectors.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.norms import AdaptiveOrLayerNorm
from .imagebind_audio import TrunkBlock


@dataclasses.dataclass(frozen=True)
class ImageBindVisionConfig:
    embed_dim: int = 1280
    out_embed_dim: int = 1024
    num_blocks: int = 32
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14

    @classmethod
    def tiny(cls, **kw):
        d = dict(embed_dim=32, out_embed_dim=16, num_blocks=2, num_heads=2,
                 image_size=28, patch_size=14)
        d.update(kw)
        return cls(**d)


class ImageBindVisionEncoder(nn.Module):
    config: ImageBindVisionConfig = ImageBindVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, normalize: bool = True):
        """images (b, 224, 224, 3), CLIP-normalized -> (b, 1024) unit emb."""
        cfg = self.config
        b = images.shape[0]
        e = cfg.embed_dim
        # PadIm2Video: duplicate the image to 2 frames; the (2,14,14) conv
        # stem then sums both copies -> equivalent to a (14,14) conv with the
        # temporal kernel taps summed; we keep the (2,14,14) kernel for
        # checkpoint compatibility and feed (b, 2, h, w, 3).
        video = jnp.broadcast_to(images[:, None],
                                 (b, 2) + images.shape[1:])
        x = nn.Conv(e, (2, cfg.patch_size, cfg.patch_size),
                    strides=(2, cfg.patch_size, cfg.patch_size),
                    padding="VALID", use_bias=False, dtype=self.dtype,
                    name="stem_proj")(video)
        n = (cfg.image_size // cfg.patch_size) ** 2
        x = x.reshape(b, n, e)
        cls_tok = self.param("cls_token", nn.initializers.zeros, (1, 1, e))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok.astype(x.dtype), (b, 1, e)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n + 1, e))
        x = x + pos.astype(x.dtype)
        x = AdaptiveOrLayerNorm(1e-6, name="pre_norm")(x)  # trunk pre-LN
        for i in range(cfg.num_blocks):
            x = TrunkBlock(e, cfg.num_heads, dtype=self.dtype,
                           name=f"blocks_{i}")(x)
        y = AdaptiveOrLayerNorm(1e-6, name="head_norm")(x[:, 0])
        emb = nn.Dense(cfg.out_embed_dim, use_bias=False, dtype=self.dtype,
                       name="head_proj")(y)
        if normalize:
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb


@dataclasses.dataclass(frozen=True)
class ImageBindTextConfig:
    vocab_size: int = 49408
    embed_dim: int = 1024
    out_embed_dim: int = 1024
    num_blocks: int = 24
    num_heads: int = 16
    context_length: int = 77

    @classmethod
    def tiny(cls, **kw):
        d = dict(vocab_size=64, embed_dim=32, out_embed_dim=16, num_blocks=2,
                 num_heads=2, context_length=12)
        d.update(kw)
        return cls(**d)


class ImageBindTextEncoder(nn.Module):
    config: ImageBindTextConfig = ImageBindTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, normalize: bool = True):
        """input_ids (b, 77) -> (b, 1024) unit embeddings (EOS-pooled)."""
        cfg = self.config
        b, n = input_ids.shape
        e = cfg.embed_dim
        x = nn.Embed(cfg.vocab_size, e, dtype=self.dtype,
                     name="token_embedding")(input_ids)
        # (1, context, e) — matches modality_preprocessors.text.pos_embed
        pos = self.param("pos_embed", nn.initializers.normal(0.01),
                         (1, cfg.context_length, e))
        x = x + pos[:, :n].astype(x.dtype)
        causal = jnp.asarray(np.tril(np.ones((n, n), bool))[None, None])
        # ImageBind text uses the same BlockWithMasking trunk with a causal
        # mask; reuse TrunkBlock's layout by folding the mask into attention
        for i in range(cfg.num_blocks):
            x = _MaskedTrunkBlock(e, cfg.num_heads, dtype=self.dtype,
                                  name=f"blocks_{i}")(x, causal)
        x = AdaptiveOrLayerNorm(1e-6, name="final_ln")(x)
        eos = jnp.argmax(input_ids, axis=-1)  # highest id == EOT token
        pooled = x[jnp.arange(b), eos]
        emb = nn.Dense(cfg.out_embed_dim, use_bias=False, dtype=self.dtype,
                       name="text_proj")(pooled)
        if normalize:
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb


class _MaskedTrunkBlock(nn.Module):
    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        from ..ops.attention import dot_product_attention
        e, h = self.embed_dim, self.num_heads
        d = e // h
        y = AdaptiveOrLayerNorm(1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * e, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = y.shape[:-1] + (h, d)
        attn = dot_product_attention(q.reshape(shape), k.reshape(shape),
                                     v.reshape(shape), mask=mask)
        x = x + nn.Dense(e, dtype=self.dtype, name="out_proj")(
            attn.reshape(y.shape))
        y = AdaptiveOrLayerNorm(1e-6, name="norm2")(x)
        y = nn.Dense(4 * e, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        return x + nn.Dense(e, dtype=self.dtype, name="fc2")(y)
