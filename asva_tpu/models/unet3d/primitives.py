"""First-frame ("FF") inflation primitives, channels-last and TPU-shaped.

Reference semantics (avgen/models/unets/utils.py):
  * InflatedConv: a 2D conv applied independently per frame (:11-19).
  * FFInflatedConv: per-frame 2D conv followed by a residual zero-init
    linear mix of [first-frame, previous-frame, current-frame] features
    (:22-57).  We keep one (3C, C) kernel for checkpoint compatibility but
    evaluate it as three C->C matmuls so the first-frame term is computed
    once and broadcast over frames instead of materializing a 3C tensor.
  * FFAttention: spatial attention whose K/V come from frame 0 only while
    queries come from every frame (:105-162).  On TPU this is a broadcast
    K/V attention — K/V are projected once for frame 0, never repeated.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple, Union

import jax
import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from ...ops.attention import dot_product_attention


def _pair(v: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)  # type: ignore[return-value]


class InflatedConv(nn.Module):
    """Per-frame 2D convolution on (b, f, h, w, c) with torch-style padding."""
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, f = x.shape[0], x.shape[1]
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        x = x.reshape((b * f,) + x.shape[2:])
        x = nn.Conv(self.features, (kh, kw), strides=_pair(self.strides),
                    padding=((ph, ph), (pw, pw)), dtype=self.dtype,
                    name="conv")(x)
        return x.reshape((b, f) + x.shape[1:])


class Conv2DParams(nn.Module):
    """nn.Conv-equivalent 2D conv whose input may arrive PRE-CONCAT as a
    tuple of channel parts: conv(concat(parts), K) == sum_p conv(part_p, K_p)
    with K split along its input-channel axis.  Param path/shape/init are
    identical to nn.Conv (kernel (kh, kw, Cin, Cout) lecun_normal, bias
    zeros) so checkpoints are interchangeable.

    The split evaluation exists because XLA tiles two clean-width convs
    measurably better than one odd-width concat conv (v5e micro, 48x32x32
    960->320: 95 -> 123 TFLOPS; 48x16x16 1920->640: 112 -> 135) AND the
    concat itself never materializes in HBM — the up-path skip concats are
    the largest conv cost in both the eval and train profiles."""
    features: int
    in_features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[Tuple[int, int], Tuple[int, int]]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, parts: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dn = jax.lax.conv_dimension_numbers(
            parts[0].shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        out = None
        off = 0
        for p in parts:
            ci = int(p.shape[-1])
            y = jax.lax.conv_general_dilated(
                p.astype(self.dtype),
                kernel[:, :, off:off + ci, :].astype(self.dtype),
                self.strides, self.padding, dimension_numbers=dn)
            out = y if out is None else out + y
            off += ci
        assert off == self.in_features, (off, self.in_features)
        return out + bias.astype(out.dtype)


class FFInflatedConv(nn.Module):
    """Per-frame 2D conv + residual zero-init 3-tap temporal linear mix.

    Accepts either one (b, f, h, w, c) tensor or a tuple of channel parts
    standing for their (never-materialized) concat — see Conv2DParams."""
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        parts = tuple(x) if isinstance(x, (tuple, list)) else (x,)
        b, f = parts[0].shape[0], parts[0].shape[1]
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        cin = sum(int(p.shape[-1]) for p in parts)
        flat = tuple(p.reshape((b * f,) + p.shape[2:]) for p in parts)
        y = Conv2DParams(self.features, cin, (kh, kw), _pair(self.strides),
                         ((ph, ph), (pw, pw)), dtype=self.dtype,
                         name="conv")(flat)
        y = y.reshape((b, f) + y.shape[1:])  # (b, f, h, w, C)
        # marker for the "saveconv" remat policy (model.py): saving the 2D
        # conv output lets backward skip re-running the conv entirely — its
        # dgrad needs only weights, its (frozen) kernel gets no wgrad, and
        # the trainable 3-tap mix's wgrad input IS this tensor.
        from jax.ad_checkpoint import checkpoint_name
        y = checkpoint_name(y, "conv_out")

        c = self.features
        # One (3C, C) kernel == torch Linear(3C, C); zero-init so a freshly
        # inflated model reproduces the 2D network exactly.
        kernel = self.param("temp_kernel", nn.initializers.zeros, (3 * c, c))
        bias = self.param("temp_bias", nn.initializers.zeros, (c,))
        k_head, k_prev, k_curr = (kernel[:c], kernel[c:2 * c], kernel[2 * c:])
        k_head = k_head.astype(y.dtype)
        k_prev = k_prev.astype(y.dtype)
        k_curr = k_curr.astype(y.dtype)

        head = y[:, 0:1] @ k_head                    # (b,1,h,w,C), broadcast
        # prev-frame term: shift AFTER the matmul (shift commutes with the
        # per-position linear map), avoiding a full shifted copy of y
        zp = y @ k_prev
        prev = jnp.concatenate([zp[:, 0:1], zp[:, :-1]], axis=1)
        mix = head + prev + (y @ k_curr)
        return y + mix + bias.astype(y.dtype)


class Upsample2xConv2D(nn.Module):
    """conv3x3(nearest_up2(x)) evaluated on the PRE-upsample grid.

    Nearest x2 duplicates each source pixel 2x2, so for an output pixel of
    parity (dh, dw) the 3 taps along an axis hit only 2 distinct source
    positions and the 3x3 kernel folds to a 2x2 one per parity:
      row offsets for dh=0 map (k0, k1, k2) -> (-1: k0, 0: k1+k2),
      for dh=1 -> (0: k0+k1, +1: k2)   (same along columns).
    Four 2x2 convs (16 C^2 HW MACs) replace one 3x3 conv on the 2x grid
    (36 C^2 HW) and the 4x activation never exists.  Zero-padding edges
    match the naive path exactly (the folded tap that would read the pad
    row reads the pad row here too).  Param path/shape/init identical to
    Conv2DParams ("conv/{kernel,bias}" of a 3x3 conv)."""
    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:   # (n, H, W, C)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        n, hh, ww = x.shape[0], x.shape[1], x.shape[2]
        fold = jnp.asarray(np.array([[[1, 0, 0], [0, 1, 1]],
                                     [[1, 1, 0], [0, 0, 1]]], np.float32))
        pads = {0: (1, 0), 1: (0, 1)}   # folded tap offsets {-1,0} / {0,+1}
        dn = None
        planes = []
        xin = x.astype(self.dtype)
        for dh in (0, 1):
            for dw in (0, 1):
                # fold in fp32, cast after (matches the naive path's fp32
                # kernel being cast once, up to one rounding of the sum)
                ke = jnp.einsum("ar,rsio,bs->abio", fold[dh],
                                kernel, fold[dw]).astype(self.dtype)
                if dn is None:
                    dn = jax.lax.conv_dimension_numbers(
                        xin.shape, ke.shape, ("NHWC", "HWIO", "NHWC"))
                planes.append(jax.lax.conv_general_dilated(
                    xin, ke, (1, 1), (pads[dh], pads[dw]),
                    dimension_numbers=dn))
        p = jnp.stack(planes)            # (4=dh*2+dw, n, H, W, C)
        c = self.features
        p = p.reshape(2, 2, n, hh, ww, c)
        p = p.transpose(2, 3, 0, 4, 1, 5)        # (n, H, 2, W, 2, C)
        out = p.reshape(n, hh * 2, ww * 2, c)
        return out + bias.astype(out.dtype)


class FFInflatedUpsample2xConv(nn.Module):
    """FFInflatedConv(3, 1, 1) applied to nearest_up2(x), computed without
    ever materializing the upsampled tensor (see _Upsample2xConvCore).
    Param tree identical to FFInflatedConv: conv/{kernel,bias} +
    {temp_kernel, temp_bias}; temporal mix code mirrors FFInflatedConv."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:   # (b, f, h, w, c)
        b, f = x.shape[0], x.shape[1]
        flat = x.reshape((b * f,) + x.shape[2:])
        y = Upsample2xConv2D(self.features, int(x.shape[-1]),
                                dtype=self.dtype, name="conv")(flat)
        y = y.reshape((b, f) + y.shape[1:])
        from jax.ad_checkpoint import checkpoint_name
        y = checkpoint_name(y, "conv_out")

        c = self.features
        kernel = self.param("temp_kernel", nn.initializers.zeros, (3 * c, c))
        bias = self.param("temp_bias", nn.initializers.zeros, (c,))
        k_head, k_prev, k_curr = (kernel[:c], kernel[c:2 * c], kernel[2 * c:])
        k_head = k_head.astype(y.dtype)
        k_prev = k_prev.astype(y.dtype)
        k_curr = k_curr.astype(y.dtype)
        head = y[:, 0:1] @ k_head
        zp = y @ k_prev
        prev = jnp.concatenate([zp[:, 0:1], zp[:, :-1]], axis=1)
        mix = head + prev + (y @ k_curr)
        return y + mix + bias.astype(y.dtype)


class DenseParams(nn.Module):
    """nn.Dense-equivalent with setup-declared params.

    Same param paths (<name>/{kernel,bias}), same default inits
    (lecun_normal / zeros) and same dtype-promotion math as
    nn.Dense(dtype=dtype) — but the raw `kernel`/`bias` are attribute-
    accessible so fused Pallas kernels (ops/pallas_fused.py) can consume
    them without a separate HBM round trip per projection."""
    features: int
    in_features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_features, self.features))
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros,
                                   (self.features,))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jax.lax.dot_general(
            x.astype(self.dtype), self.kernel.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())))
        if self.use_bias:
            y = y + self.bias.astype(self.dtype)
        return y


class MultiHeadProjections(nn.Module):
    """q/k/v/out projections with diffusers' layout (bias only on out)."""
    inner_dim: int
    num_heads: int
    q_in: Optional[int] = None   # query input dim (defaults to inner_dim)
    kv_dim: Optional[int] = None  # context input dim (defaults to q_in)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        q_in = self.q_in if self.q_in is not None else self.inner_dim
        kv_in = self.kv_dim if self.kv_dim is not None else q_in
        self.to_q = DenseParams(self.inner_dim, q_in, use_bias=False,
                                dtype=self.dtype)
        self.to_k = DenseParams(self.inner_dim, kv_in, use_bias=False,
                                dtype=self.dtype)
        self.to_v = DenseParams(self.inner_dim, kv_in, use_bias=False,
                                dtype=self.dtype)
        self.to_out = DenseParams(self.inner_dim, self.inner_dim,
                                  use_bias=True, dtype=self.dtype)

    def split(self, x: jnp.ndarray) -> jnp.ndarray:
        return x.reshape(x.shape[:-1] + (self.num_heads,
                                         self.inner_dim // self.num_heads))

    def merge(self, x: jnp.ndarray) -> jnp.ndarray:
        return x.reshape(x.shape[:-2] + (self.inner_dim,))


class FFSpatialAttention(nn.Module):
    """Spatial self-attention with K/V from frame 0 only.

    Input: (b, f, n, c) spatial tokens per frame.  K/V are projected from
    frame 0 and shared across all frames' queries.  On TPU, large shapes run
    the VMEM-resident Pallas kernel (ops/pallas_attn.py) — all 12 frames'
    queries attend the SAME frame-0 K/V, so the kernel holds K/V on-chip and
    the (f*n x n) fp32 logits never touch HBM.

    When `ln` (a LayerNormParams) is passed, the module computes the whole
    residual sub-layer x + Attn(LN(x)) — on TPU through the fully fused
    ops/pallas_fused.fused_ln_attn kernel, which also keeps the LN output,
    q projection and out projection off HBM (K/V are projected from the
    normed frame 0 outside the kernel: 2x1.3 MB vs the ~90 MB of level-0
    round trips it removes).
    """
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, ln=None, prepare: bool = False):
        inner = self.num_heads * self.head_dim
        b, f, n, c = x.shape
        proj = MultiHeadProjections(inner, self.num_heads, q_in=c,
                                    dtype=self.dtype, name="proj")
        if prepare:
            # bundle for ops/pallas_fused.fused_ln_attn3 (whole-block
            # fusion): frame-0 K/V pre-projected + lane-padded; returns
            # ((ls, lb, wq, wo, bo, k, v), kv_len).  Touches every param
            # the call path touches, so the tree is identical either way.
            sk = -(-n // 128) * 128
            h0 = ln(x[:, 0])
            k0, v0 = proj.to_k(h0), proj.to_v(h0)
            if sk != n:
                pad = [(0, 0), (0, sk - n), (0, 0)]
                k0, v0 = jnp.pad(k0, pad), jnp.pad(v0, pad)
            return ((ln.scale[None], ln.bias[None],
                     proj.to_q.kernel.astype(self.dtype),
                     proj.to_out.kernel.astype(self.dtype),
                     proj.to_out.bias[None].astype(self.dtype),
                     k0, v0), (n if n < sk else None))
        if ln is None:
            return self._attend(x, proj)

        from ...ops import pallas_fused
        sk = -(-n // 128) * 128      # frame-0 KV padded to a lane multiple
        ok, bm = pallas_fused.supports_attn(f * n, sk, inner, self.num_heads,
                                            x.dtype)
        if pallas_fused.enabled() and ok and inner == c:
            h0 = ln(x[:, 0])                           # (b, n, c) normed f0
            k0, v0 = proj.to_k(h0), proj.to_v(h0)
            if sk != n:
                pad = [(0, 0), (0, sk - n), (0, 0)]
                k0, v0 = jnp.pad(k0, pad), jnp.pad(v0, pad)
            out = pallas_fused.fused_ln_attn(
                x.reshape(b, f * n, c), ln.scale[None], ln.bias[None],
                proj.to_q.kernel.astype(self.dtype),
                proj.to_out.kernel.astype(self.dtype),
                proj.to_out.bias[None].astype(self.dtype),
                k0, v0, ln.epsilon, self.num_heads,
                n if n < sk else None, bm)
            return out.reshape(b, f, n, c)
        return x + self._attend(ln(x), proj)

    def _attend(self, x: jnp.ndarray, proj) -> jnp.ndarray:
        b, f, n, _ = x.shape
        q = proj.split(proj.to_q(x))                   # (b, f, n, H, D)
        first = x[:, 0:1]                              # (b, 1, n, c)
        k = proj.split(proj.to_k(first))               # (b, 1, n, H, D)
        v = proj.split(proj.to_v(first))

        from ...ops import pallas_attn
        h, d = self.num_heads, self.head_dim
        if (jax.default_backend() == "tpu"
                and pallas_attn.supports(f * n, n, d, x.dtype)):
            qf = q.transpose(0, 3, 1, 2, 4).reshape(b * h, f * n, d)
            kf = k[:, 0].transpose(0, 2, 1, 3).reshape(b * h, n, d)
            vf = v[:, 0].transpose(0, 2, 1, 3).reshape(b * h, n, d)
            of = pallas_attn.vmem_attention(qf, kf, vf)
            out = of.reshape(b, h, f, n, d).transpose(0, 2, 3, 1, 4)
        else:
            out = dot_product_attention(q, k, v)
        return proj.to_out(proj.merge(out))


class CrossAttention(nn.Module):
    """Cross attention; context may have fewer leading axes than x (it is
    broadcast), and an optional boolean mask (True = attend) may be given
    per (batch, frame) against context tokens.

    Fast path: `context_indices` — a STATIC (f, m) integer array selecting,
    per frame, the context tokens that frame may attend (the AVSyncD audio
    segment masks select exactly 25 of 229 tokens per frame).  K/V are
    projected once over all tokens and gathered per frame, so the attention
    runs dense over m tokens with no mask and no (n x n_ctx) logits — a
    large HBM-traffic win on TPU.  Requires every frame to select the same
    number of tokens (true for the reference's `_auto_split` masks)."""
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 context_indices=None, ln=None, prepare: bool = False):
        inner = self.num_heads * self.head_dim
        b, f, n, c = x.shape
        proj = MultiHeadProjections(inner, self.num_heads, q_in=c,
                                    kv_dim=context.shape[-1],
                                    dtype=self.dtype, name="proj")
        if prepare:
            # bundle for ops/pallas_fused.fused_ln_attn3: K/V pre-projected,
            # static-gathered per frame (audio, 4-D) or shared (text, 3-D),
            # lane-padded; returns ((ls, lb, wq, wo, bo, k, v), kv_len)
            if context_indices is not None:
                idx = jnp.asarray(context_indices)
                m_tok = int(idx.shape[1])
                sk = -(-m_tok // 128) * 128
                k = jnp.take(proj.to_k(context), idx, axis=1)  # (b,f,m,c)
                v = jnp.take(proj.to_v(context), idx, axis=1)
                pad = [(0, 0), (0, 0), (0, sk - m_tok), (0, 0)]
                k, v = jnp.pad(k, pad), jnp.pad(v, pad)
                kv_len = m_tok
            else:
                m_tok = int(context.shape[1])
                sk = -(-m_tok // 128) * 128
                pad = [(0, 0), (0, sk - m_tok), (0, 0)]
                k = jnp.pad(proj.to_k(context), pad)
                v = jnp.pad(proj.to_v(context), pad)
                kv_len = m_tok if m_tok < sk else None
            return ((ln.scale[None], ln.bias[None],
                     proj.to_q.kernel.astype(self.dtype),
                     proj.to_out.kernel.astype(self.dtype),
                     proj.to_out.bias[None].astype(self.dtype),
                     k, v), kv_len)
        if ln is None:
            return self._attend(x, context, mask, context_indices, proj)

        from ...ops import pallas_fused
        # fused residual sub-layer x + CrossAttn(LN(x)): broadcastable
        # (b, m, d) context, either static-gathered per frame (audio) or
        # shared (text); K/V are tiny (<=229 tokens) and pre-projected
        if (pallas_fused.enabled() and inner == c
                and context.ndim == x.ndim - 1
                and (mask is None or context_indices is not None)):
            if context_indices is not None:
                idx = jnp.asarray(context_indices)
                m_tok = int(idx.shape[1])
                sk = -(-m_tok // 128) * 128
                ok, bm = pallas_fused.supports_attn(
                    n, sk, inner, self.num_heads, x.dtype)
                if ok:
                    k = jnp.take(proj.to_k(context), idx, axis=1)
                    v = jnp.take(proj.to_v(context), idx, axis=1)
                    pad = [(0, 0), (0, 0), (0, sk - m_tok), (0, 0)]
                    k = jnp.pad(k, pad).reshape(b * f, sk, inner)
                    v = jnp.pad(v, pad).reshape(b * f, sk, inner)
                    out = pallas_fused.fused_ln_attn(
                        x.reshape(b * f, n, c),
                        ln.scale[None], ln.bias[None],
                        proj.to_q.kernel.astype(self.dtype),
                        proj.to_out.kernel.astype(self.dtype),
                        proj.to_out.bias[None].astype(self.dtype),
                        k, v, ln.epsilon, self.num_heads, m_tok, bm)
                    return out.reshape(b, f, n, c)
            else:
                m_tok = int(context.shape[1])
                sk = -(-m_tok // 128) * 128
                ok, bm = pallas_fused.supports_attn(
                    f * n, sk, inner, self.num_heads, x.dtype)
                if ok:
                    pad = [(0, 0), (0, sk - m_tok), (0, 0)]
                    k = jnp.pad(proj.to_k(context), pad)
                    v = jnp.pad(proj.to_v(context), pad)
                    out = pallas_fused.fused_ln_attn(
                        x.reshape(b, f * n, c),
                        ln.scale[None], ln.bias[None],
                        proj.to_q.kernel.astype(self.dtype),
                        proj.to_out.kernel.astype(self.dtype),
                        proj.to_out.bias[None].astype(self.dtype),
                        k, v, ln.epsilon, self.num_heads,
                        m_tok if m_tok < sk else None, bm)
                    return out.reshape(b, f, n, c)
        return x + self._attend(ln(x), context, mask, context_indices, proj)

    def _attend(self, x: jnp.ndarray, context: jnp.ndarray,
                mask, context_indices, proj) -> jnp.ndarray:
        q = proj.split(proj.to_q(x))        # (b, f, n, H, D)
        k = proj.split(proj.to_k(context))  # (b, [f,] m, H, D)
        v = proj.split(proj.to_v(context))
        if context_indices is not None and k.ndim == q.ndim - 1:
            # static gather: (b, n_ctx, H, D) -> (b, f, m, H, D)
            idx = jnp.asarray(context_indices)
            k = jnp.take(k, idx, axis=1)
            v = jnp.take(v, idx, axis=1)
            mask = None
        elif (mask is None and k.ndim == q.ndim - 1 and q.ndim == 5
              and jax.default_backend() == "tpu"):
            # unmasked broadcast context (the text path): VMEM kernel with
            # the short KV zero-padded to a lane multiple
            from ...ops import pallas_attn
            b, f, n, h, d = q.shape
            m = k.shape[1]
            m_pad = -(-m // 128) * 128
            if pallas_attn.supports(f * n, m_pad, d, x.dtype):
                qf = q.transpose(0, 3, 1, 2, 4).reshape(b * h, f * n, d)
                kf = k.transpose(0, 2, 1, 3).reshape(b * h, m, d)
                vf = v.transpose(0, 2, 1, 3).reshape(b * h, m, d)
                pad = [(0, 0), (0, m_pad - m), (0, 0)]
                kf = jnp.pad(kf, pad)
                vf = jnp.pad(vf, pad)
                of = pallas_attn.vmem_cross_attention(qf, kf, vf, m)
                out = of.reshape(b, h, f, n, d).transpose(0, 2, 3, 1, 4)
                return proj.to_out(proj.merge(out))
        while k.ndim < q.ndim:              # broadcast context over frames
            k = k[:, None]
            v = v[:, None]
        if mask is not None:
            # mask: (b, f, m) -> (b, f, 1(H), 1(n), m)
            mask = mask[:, :, None, None, :]
        out = dot_product_attention(q, k, v, mask=mask)
        return proj.to_out(proj.merge(out))


# pair-loop gate for TemporalAttention: head dims <= this use the unrolled
# per-(f,g) multiply+reduce form instead of the bnhfg einsum (see the
# in-class comment).  Module-level so tools/temporal_gate_bench.py can
# probe the frontier on real hardware.  r2 shipped 64 (level 0 only); the
# r5 whole-module chained probe (v5e, net of carry) shows the FORWARD
# pair loop wins at EVERY UNet level: L1 c640 1.137 -> 0.881 ms (-22%),
# L2 c1280 1.402 -> 1.024 ms (-27%) — the original "level-2 prefers
# einsum" read predated the narrow-head/channels-last layout work.
# Measured e2e (v5e): generation 0.8456 -> 0.8674 clips/s with the wide
# gate, but TRAINING regresses with the wide pair loop in EITHER backward
# form — 2.4343 -> 2.3874 steps/s with the unrolled form autodiffed, and
# 2.4529 -> 2.3229 with the hybrid custom_vjp below (pair-loop forward,
# einsum backward): the "remat recompute DCEs the dead pair-loop output"
# hypothesis does NOT hold in the real saveconv program, so training pays
# the pair-loop forward twice plus the einsum vjp.  MEASURED DEAD END
# (don't redo); the wide gate stays generation-only (fuse_blocks passes
# TEMPORAL_PAIRLOOP_MAX_D_GEN) and the training default stays 64.
TEMPORAL_PAIRLOOP_MAX_D = int(
    os.environ.get("ASVA_TEMPORAL_PAIRLOOP_MAX_D", 64))
TEMPORAL_PAIRLOOP_MAX_D_GEN = 160
# head dims <= this keep plain autodiff through the unrolled form (the r2
# measured-good configuration at level 0); above it the hybrid fwd/bwd
# split applies (reached only on the generation-only wide gate, where the
# backward never runs — kept so a differentiated wide pair loop gets the
# einsum gradient rather than the slower unrolled vjp).  Env overrides
# are for on-chip probes only.
TEMPORAL_HYBRID_MIN_D = int(os.environ.get("ASVA_TEMPORAL_HYBRID_MIN_D", 64))


def _temporal_pairloop(q, k, v, scale: float):
    """Frame-axis attention, unrolled per-(f,g) multiply + lane-reduce form.
    q/k/v (b, f, n, h, d) -> out (b, f, n, h, d) in q.dtype."""
    f = q.shape[1]
    logits = jnp.stack([
        jnp.stack([
            jnp.sum(q[:, fi].astype(jnp.float32)
                    * k[:, gi].astype(jnp.float32), axis=-1)
            for gi in range(f)], axis=-1)
        for fi in range(f)], axis=-2)                # (b, n, h, f, g) fp32
    w = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    return jnp.stack([
        sum(w[..., fi, gi, None] * v[:, gi] for gi in range(f))
        for fi in range(f)], axis=1).astype(q.dtype)  # (b, f, n, h, d)


def _temporal_einsum(q, k, v, scale: float):
    """The bnhfg einsum form of the same function."""
    logits = jnp.einsum("bfnhd,bgnhd->bnhfg", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bnhfg,bgnhd->bfnhd", w, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _temporal_attn_hybrid(q, k, v, scale: float):
    """Pair-loop forward (fastest measured form at every UNet level) with
    the einsum form's vjp as the backward — the unrolled form's autodiff
    was the measured training regression at d > 64 (see gate note)."""
    return _temporal_pairloop(q, k, v, scale)


def _temporal_hybrid_fwd(q, k, v, scale):
    return _temporal_pairloop(q, k, v, scale), (q, k, v)


def _temporal_hybrid_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _temporal_einsum(q_, k_, v_, scale), q, k, v)
    return vjp(g)


_temporal_attn_hybrid.defvjp(_temporal_hybrid_fwd, _temporal_hybrid_bwd)


class TemporalAttention(nn.Module):
    """Self-attention over the frame axis for each spatial location.

    Input: (b, f, n, c); attention runs over f with batch (b, n).
    `to_out` kernel is zero-init (reference:
    ff_spatio_audio_temp_transformer_3d.py:267) so the inflated model starts
    as identity.
    """
    num_heads: int
    head_dim: int
    # None: the module default (TEMPORAL_PAIRLOOP_MAX_D); the transformer
    # block passes TEMPORAL_PAIRLOOP_MAX_D_GEN on the fuse_blocks
    # (generation-only) path where the wide pair loop is a measured win
    pairloop_max_d: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.num_heads * self.head_dim
        to_q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="proj_to_q")
        to_k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="proj_to_k")
        to_v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="proj_to_v")
        to_out = nn.Dense(inner, use_bias=True, dtype=self.dtype,
                          kernel_init=nn.initializers.zeros, name="proj_to_out")
        # attend over the frame axis directly in (b, f, n, h, d) layout —
        # no (b, n, f, c) transpose materialization
        hd = (self.num_heads, self.head_dim)
        f = x.shape[1]
        q = to_q(x).reshape(x.shape[:-1] + hd)   # (b, f, n, h, d)
        k = to_k(x).reshape(x.shape[:-1] + hd)
        v = to_v(x).reshape(x.shape[:-1] + hd)
        # python-float scale computed with fp32 sqrt/divide semantics so the
        # weak-typed multiply is bit-identical to the previous on-device
        # fp32 scalar
        scale = float(np.float32(1.0) / np.sqrt(np.float32(self.head_dim)))
        max_d = (TEMPORAL_PAIRLOOP_MAX_D if self.pairloop_max_d is None
                 else self.pairloop_max_d)
        if f <= 16 and self.head_dim <= max_d:
            # unrolled per-(f,g) fused multiply + lane-reduce.  The einsum
            # form lowers to b*n*h batched (f x d)@(d x f) matmuls — tiny
            # 12x12xd tiles that waste >90% of the MXU/VPU lanes and force
            # operand transposes; the pair loop reads the same bytes with
            # plain elementwise ops (whole-module chained on v5e, net of
            # carry: L0 in r2 5.07 -> 3.35 ms; r5 re-probe L1 c640
            # 1.137 -> 0.881, L2 c1280 1.402 -> 1.024 — see the gate
            # constant note and tools/temporal_gate_bench.py).  Small head
            # dims keep plain autodiff (r2 measured-good at level 0); wide
            # ones use the hybrid custom_vjp (einsum backward) that the
            # gate note explains.
            if self.head_dim <= TEMPORAL_HYBRID_MIN_D:
                out = _temporal_pairloop(q, k, v, scale).astype(x.dtype)
            else:
                out = _temporal_attn_hybrid(q, k, v, scale).astype(x.dtype)
        else:
            out = _temporal_einsum(q, k, v, scale).astype(x.dtype)
        return to_out(out.reshape(x.shape[:-1] + (inner,)))
