"""CLIP ViT-L/14 text encoder (flax) — SD1.5's frozen text conditioner.

The reference loads HF CLIPTextModel from the SD1.5 checkpoint
(avgen/pipelines/pipeline_audio_cond_animation.py:512); all ASVA datasets
ship precomputed class text encodings, so this model is only needed for
free-form prompts (animation_demo path) and for generating null-text
encodings.  Architecture: vocab 49408, width 768, 12 layers, 12 heads,
77 positions, quick-gelu, causal mask, final LayerNorm; the conditioning is
the full last_hidden_state (b, 77, 768).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import dot_product_attention
from ..ops.norms import AdaptiveOrLayerNorm


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    intermediate_size: int = 3072

    @classmethod
    def tiny(cls, **kw):
        d = dict(vocab_size=100, hidden_size=32, num_layers=2, num_heads=2,
                 max_positions=16, intermediate_size=64)
        d.update(kw)
        return cls(**d)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPTextBlock(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray):
        cfg = self.config
        h = AdaptiveOrLayerNorm(1e-5, name="ln1")(x)
        e, heads = cfg.hidden_size, cfg.num_heads
        d = e // heads
        q = nn.Dense(e, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(e, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(e, dtype=self.dtype, name="v_proj")(h)
        shape = h.shape[:-1] + (heads, d)
        attn = dot_product_attention(q.reshape(shape), k.reshape(shape),
                                     v.reshape(shape), mask=causal_mask)
        attn = attn.reshape(h.shape)
        x = x + nn.Dense(e, dtype=self.dtype, name="out_proj")(attn)

        h = AdaptiveOrLayerNorm(1e-5, name="ln2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(e, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids (b, 77) -> last_hidden_state (b, 77, hidden)."""
        cfg = self.config
        b, n = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                       dtype=self.dtype, name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.max_positions, cfg.hidden_size))
        x = tok + pos[None, :n].astype(tok.dtype)
        causal = np.tril(np.ones((n, n), bool))[None, None]  # (1,1,n,n)
        causal = jnp.asarray(causal)
        for i in range(cfg.num_layers):
            x = CLIPTextBlock(cfg, dtype=self.dtype, name=f"blocks_{i}")(
                x, causal)
        return AdaptiveOrLayerNorm(1e-5, name="final_ln")(x)


def tokenize(texts, max_length: int = 77,
             tokenizer_path: str = "pretrained/stable-diffusion-v1-5/tokenizer"):
    """CLIP BPE tokenization (host-side, slow path only; all dataset flows
    use precomputed encodings).  Self-contained — no transformers needed.

    tokenizer_path may hold the SD1.5 tokenizer files (vocab.json +
    merges.txt, the reference's checkpoint layout) or ImageBind's
    bpe_simple_vocab_16e6.txt.gz; see models/clip_bpe.py.
    """
    from .clip_bpe import ClipBPETokenizer
    tok = ClipBPETokenizer.from_pretrained(tokenizer_path)
    # eot-padding: the SD1.5 text encoder consumes all 77 positions
    return jnp.asarray(tok(texts, context_length=max_length, pad="eot"))
