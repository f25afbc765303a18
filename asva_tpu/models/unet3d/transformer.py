"""Spatio(-audio)-temporal transformer blocks.

Reference:
  avgen/models/unets/transformers/ff_spatio_audio_temp_transformer_3d.py
  (audio variant; the text-only variant, ff_spatio_temp_transformer_3d.py,
  is the same block minus the audio cross-attention).

Sub-layer order inside the block (reference :278-372):
  1. first-frame spatial attention      (attn1, K/V from frame 0)
  2. audio cross-attention              (attn_audio, per-frame segment mask)
  3. text cross-attention               (attn2)
  4. temporal attention over frames     (attn_temp, zero-init out, sinusoidal
                                         MLP positional embedding added to the
                                         normed input only)
  5. GEGLU feed-forward
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ...ops.norms import (AdaptiveOrLayerNorm, LayerNormParams,
                          SpatialGroupNorm)
from ..embeddings import TimestepEmbedding, sinusoidal_timestep_embedding
from .primitives import (TEMPORAL_PAIRLOOP_MAX_D_GEN, CrossAttention,
                         DenseParams, FFSpatialAttention, TemporalAttention)


class GEGLUFeedForward(nn.Module):
    """Dense(dim -> 8*dim) split in two; value * gelu(gate); Dense(4*dim -> dim).

    Matches diffusers FeedForward(activation_fn="geglu") with exact (erf)
    gelu.  When `ln` (a LayerNormParams) is passed, computes the residual
    sub-layer x + FF(LN(x)) — on TPU through the fused Pallas kernel
    (ops/pallas_fused.fused_ln_geglu), which keeps the (tokens x 8*dim)
    GEGLU intermediate VMEM-resident instead of round-tripping ~250 MB of
    HBM per level-0 block.
    """
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        inner = self.dim * self.mult
        self.proj_in = DenseParams(inner * 2, self.dim, dtype=self.dtype)
        self.proj_out = DenseParams(self.dim, inner, dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, ln=None) -> jnp.ndarray:
        if ln is None:
            return self._ff(x)

        from ...ops import pallas_fused
        c = x.shape[-1]
        m = 1
        for s in x.shape[:-1]:
            m *= s
        ok, bm = pallas_fused.supports_ff(m, c, x.dtype)
        if pallas_fused.enabled() and ok and c == self.dim:
            out = pallas_fused.fused_ln_geglu(
                x.reshape(m, c), ln.scale[None], ln.bias[None],
                self.proj_in.kernel.astype(self.dtype),
                self.proj_in.bias[None].astype(self.dtype),
                self.proj_out.kernel.astype(self.dtype),
                self.proj_out.bias[None].astype(self.dtype),
                ln.epsilon, bm)
            return out.reshape(x.shape)
        return x + self._ff(ln(x))

    def _ff(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.proj_in(x)
        value, gate = jnp.split(h, 2, axis=-1)
        h = value * nn.gelu(gate, approximate=False)
        return self.proj_out(h)


class SpatioAudioTempTransformerBlock(nn.Module):
    """One BasicTransformerBlock on (b, f, n, c) spatial-token tensors.

    fuse_blocks=True (generation path): the first three residual
    sub-layers (attn1 + audio-x + text-x) run as ONE Pallas program
    (ops/pallas_fused.fused_ln_attn3) — the residual stream stays in VMEM
    across them instead of round-tripping HBM between three kernels.
    Param tree is identical either way (the prepare calls touch exactly
    the parameters the sequential calls touch); training keeps the
    sequential path whose per-sub-layer custom_vjp saves flash o/lse
    residuals."""
    dim: int
    num_heads: int
    head_dim: int
    use_audio: bool = True
    fuse_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                       # (b, f, n, c)
        text_context: Optional[jnp.ndarray],  # (b, m, d) or (b, f, m, d)
        audio_context: Optional[jnp.ndarray] = None,  # (b, ma, da) / (b,f,ma,da)
        audio_mask: Optional[jnp.ndarray] = None,     # (b, f, ma) bool
        audio_token_indices=None,             # STATIC (f, m) int, fast path
    ) -> jnp.ndarray:
        f = x.shape[1]

        # "sublayer_x" markers: under the saveconv remat policy each
        # sub-layer's input is SAVED, so the backward's chain recompute
        # never re-runs the fused Pallas forwards (their custom_vjp
        # rebuilds gradients from these inputs directly)
        from jax.ad_checkpoint import checkpoint_name

        def ckpt(v):
            return checkpoint_name(v, "sublayer_x")

        attn1 = FFSpatialAttention(self.num_heads, self.head_dim,
                                   dtype=self.dtype, name="attn1")
        norm1 = LayerNormParams(self.dim, name="norm1")

        fused3 = None
        if (self.fuse_blocks and self.use_audio
                and text_context is not None and text_context.ndim == 3
                and audio_context is not None and audio_context.ndim == 3
                and audio_token_indices is not None
                and self.num_heads * self.head_dim == self.dim):
            from ...ops import pallas_fused
            n = x.shape[2]
            lane = lambda m: -(-m // 128) * 128  # noqa: E731
            m_a = int(jnp.asarray(audio_token_indices).shape[1])
            m_t = int(text_context.shape[1])
            ok, bm, ph = pallas_fused.supports_attn3(
                n, lane(n), lane(m_a), lane(m_t), self.dim, self.num_heads,
                x.dtype)
            if pallas_fused.enabled() and ok:
                fused3 = (bm, ph)

        if fused3 is not None:
            from ...ops import pallas_fused
            norm_audio = LayerNormParams(self.dim, name="norm_audio")
            norm2 = LayerNormParams(self.dim, name="norm2")
            b1, kl1 = attn1(x, ln=norm1, prepare=True)
            ba, kla = CrossAttention(self.num_heads, self.head_dim,
                                     dtype=self.dtype, name="attn_audio")(
                x, audio_context, mask=audio_mask,
                context_indices=audio_token_indices, ln=norm_audio,
                prepare=True)
            bt, klt = CrossAttention(self.num_heads, self.head_dim,
                                     dtype=self.dtype, name="attn2")(
                x, text_context, ln=norm2, prepare=True)
            bm, ph = fused3
            x = pallas_fused.fused_ln_attn3(
                x, *b1, *ba, *bt,
                (norm1.epsilon, norm_audio.epsilon, norm2.epsilon),
                self.num_heads, (kl1, kla, klt), bm, ph)
        else:
            # 1. first-frame spatial attention (residual sub-layer; fused
            #    LN+attn+residual Pallas kernel on TPU)
            x = attn1(ckpt(x), ln=norm1)

            # 2. audio cross-attention with per-frame segment mask
            if self.use_audio:
                x = CrossAttention(self.num_heads, self.head_dim,
                                   dtype=self.dtype, name="attn_audio")(
                    ckpt(x), audio_context, mask=audio_mask,
                    context_indices=audio_token_indices,
                    ln=LayerNormParams(self.dim, name="norm_audio"))

            # 3. text cross-attention
            if text_context is not None:
                x = CrossAttention(self.num_heads, self.head_dim,
                                   dtype=self.dtype, name="attn2")(
                    ckpt(x), text_context,
                    ln=LayerNormParams(self.dim, name="norm2"))

        # 4. temporal attention (sinusoidal-MLP position added pre-norm only)
        pos = sinusoidal_timestep_embedding(
            jnp.arange(f, dtype=jnp.float32), self.dim)
        pos = TimestepEmbedding(self.dim, dtype=self.dtype,
                                name="pos_embedding_temp")(
            pos.astype(self.dtype))
        pos = pos[None, :, None, :]  # (1, f, 1, c)
        x = ckpt(x)
        h = AdaptiveOrLayerNorm(name="norm_temp")(x + pos)
        # fuse_blocks marks the generation path, where the wide pair-loop
        # gate is a measured win (training prefers einsum at d>64 — see
        # primitives.TEMPORAL_PAIRLOOP_MAX_D)
        x = x + TemporalAttention(self.num_heads, self.head_dim,
                                  pairloop_max_d=(TEMPORAL_PAIRLOOP_MAX_D_GEN
                                                  if self.fuse_blocks
                                                  else None),
                                  dtype=self.dtype, name="attn_temp")(h)

        # 5. feed-forward (residual sub-layer; fused LN+GEGLU+residual
        #    Pallas kernel on TPU)
        x = GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")(
            ckpt(x), ln=LayerNormParams(self.dim, name="norm3"))
        # "block_out": with every sub-layer INPUT saved, the only reason
        # the remat recompute re-runs a fused forward kernel is to rebuild
        # this block output for the downstream chain (proj_out -> next
        # resnet GN vjp).  Saving it lets the backward skip the FF kernel
        # re-run entirely (the other sub-layers' outputs are already dead
        # — each equals the next sub-layer's saved input).
        return checkpoint_name(x, "block_out")


class SpatioAudioTempTransformer3D(nn.Module):
    """GroupNorm -> proj_in -> N blocks -> proj_out -> +residual.

    Input/output: (b, f, h, w, c).  The GroupNorm here is PER-FRAME
    (reference applies it to the frame-folded 4-D tensor).  proj_in/out are
    1x1 convs in the reference == Dense in channels-last.
    """
    num_heads: int
    head_dim: int
    num_layers: int = 1
    norm_num_groups: int = 32
    use_audio: bool = True
    fuse_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        text_context: Optional[jnp.ndarray],
        audio_context: Optional[jnp.ndarray] = None,
        audio_mask: Optional[jnp.ndarray] = None,
        audio_token_indices=None,
    ) -> jnp.ndarray:
        b, f, hh, ww, c = x.shape
        inner = self.num_heads * self.head_dim
        residual = x
        h = SpatialGroupNorm(self.norm_num_groups, 1e-6, name="norm")(x)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(b, f, hh * ww, inner)
        for i in range(self.num_layers):
            h = SpatioAudioTempTransformerBlock(
                inner, self.num_heads, self.head_dim, use_audio=self.use_audio,
                fuse_blocks=self.fuse_blocks,
                dtype=self.dtype, name=f"blocks_{i}")(
                h, text_context, audio_context, audio_mask,
                audio_token_indices)
        h = h.reshape(b, f, hh, ww, inner)
        h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
        return h + residual
