"""Normalization layers for channels-last video tensors.

Two distinct group-norm statistics conventions exist in the AVSyncD UNet
(reference: avgen/models/unets/resnets/ff_spatio_temp_resnet_3d.py:130 vs
avgen/models/unets/transformers/ff_spatio_audio_temp_transformer_3d.py:62):

  * Resnet blocks apply torch GroupNorm to a 5-D (b, c, f, h, w) tensor, so
    the statistics span (c/g, f, h, w) — ALL frames together.
  * Transformer blocks apply GroupNorm to the per-frame folded 4-D tensor
    ((b f), c, h, w), so the statistics are per-frame.

A naive per-frame port of the resnet norm silently diverges; we keep both as
separate modules.  Statistics are always computed in float32 and the result
cast back to the input dtype.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _group_stats_normalize_parts(parts: tuple, num_groups: int, eps: float,
                                 reduce_axes: tuple[int, ...]) -> list:
    """Normalize channel PARTS of a virtual concat (..., C1)+(..., C2)+... by
    joint group statistics over `reduce_axes` + channel group — the concat is
    never materialized.  Group boundaries may straddle the part boundary
    (e.g. 960ch/32g = 30ch groups split at 640): each part contributes its
    channel rows of the shared (C, G) indicator, so straddling groups pool
    statistics from both parts exactly as the concatenated tensor would.

    TPU formulation: group sums are computed with a (C, G) group-indicator
    MATMUL and mapped back per channel with its transpose, so every op is
    128-lane aligned.  The naive reshape to (..., G, C//G) makes the minor
    axis 10-40 wide and de-vectorizes the reduction AND the normalize —
    measured 0.67 ms for one GroupNorm+SiLU at level-0 eval shapes (~35x
    its byte floor) vs ~0.1 ms for this form.  Statistics are fp32
    E[x^2]-E[x]^2, same as before.

    `reduce_axes` must be the contiguous axes between the leading kept axes
    and the channel axis (true for both callers).
    """
    orig_dtype = parts[0].dtype
    c = sum(int(p.shape[-1]) for p in parts)
    g = num_groups
    lead = parts[0].shape[:reduce_axes[0]]
    k = 1
    for s in lead:
        k *= s
    ind = jnp.repeat(jnp.eye(g, dtype=jnp.float32), c // g, axis=0)  # (C, G)
    # the indicator dots MUST run in true fp32: the platform default uses
    # bf16 passes, whose ~2^-9 relative error is amplified by the
    # E[x^2]-E[x]^2 cancellation (low-variance/large-mean groups could even
    # go negative -> NaN rsqrt).  These are tiny (K,C)x(C,G) matmuls —
    # HIGHEST precision costs nothing.
    hi = jax.lax.Precision.HIGHEST
    xrs = []
    s1_g = None
    s2_g = None
    r = None
    off = 0
    for p in parts:
        cp = int(p.shape[-1])
        xr = p.reshape(k, -1, cp)                     # (K, R, Cp), orig dtype
        r = xr.shape[1]                               # same R for all parts
        ind_p = ind[off:off + cp]
        # SEPARATE fp32 upcasts so each fuses into its consumer as a
        # producer (one pass over x each), no materialized fp32 copy
        s1 = jnp.sum(xr.astype(jnp.float32), axis=1)  # (K, Cp)
        s2 = jnp.sum(jnp.square(xr.astype(jnp.float32)), axis=1)
        s1p = jnp.matmul(s1, ind_p, precision=hi)     # (K, G)
        s2p = jnp.matmul(s2, ind_p, precision=hi)
        s1_g = s1p if s1_g is None else s1_g + s1p
        s2_g = s2p if s2_g is None else s2_g + s2p
        xrs.append((xr, ind_p))
        off += cp
    denom = 1.0 / (r * (c // g))
    mean_g = s1_g * denom                             # (K, G)
    msq_g = s2_g * denom
    var_g = jnp.maximum(msq_g - jnp.square(mean_g), 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    outs = []
    for p, (xr, ind_p) in zip(parts, xrs):
        mean_c = jnp.matmul(mean_g, ind_p.T, precision=hi)    # (K, Cp)
        inv_c = jnp.matmul(inv_g, ind_p.T, precision=hi)
        y = (xr.astype(jnp.float32) - mean_c[:, None, :]) * inv_c[:, None, :]
        outs.append(y.reshape(p.shape).astype(orig_dtype))
    return outs


def _group_stats_normalize(x: jnp.ndarray, num_groups: int, eps: float,
                           reduce_axes: tuple[int, ...]) -> jnp.ndarray:
    return _group_stats_normalize_parts((x,), num_groups, eps,
                                        reduce_axes)[0]


class VideoGroupNorm(nn.Module):
    """GroupNorm over (frame, height, width, channel-group) — all frames.

    Input: (b, f, h, w, c).  Matches torch nn.GroupNorm applied to
    (b, c, f, h, w).

    A TUPLE input is treated as the channel parts of a virtual concat
    (joint statistics, per-part output) so up-path skip concats never
    materialize — see _group_stats_normalize_parts.
    """
    num_groups: int = 32
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        parts = tuple(x) if isinstance(x, (tuple, list)) else (x,)
        c = sum(int(p.shape[-1]) for p in parts)
        assert c % self.num_groups == 0, (c, self.num_groups)
        ys = _group_stats_normalize_parts(
            parts, self.num_groups, self.epsilon,
            reduce_axes=tuple(range(1, parts[0].ndim - 1)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        outs = []
        off = 0
        for y in ys:
            cp = int(y.shape[-1])
            outs.append(y * scale[off:off + cp].astype(y.dtype)
                        + bias[off:off + cp].astype(y.dtype))
            off += cp
        if not isinstance(x, (tuple, list)):
            return outs[0]
        return tuple(outs)


class SpatialGroupNorm(nn.Module):
    """Per-frame GroupNorm: stats over (h, w, channel-group) only.

    Input: (b, f, h, w, c) or (n, h, w, c).  Matches torch nn.GroupNorm
    applied to the per-frame folded ((b f), c, h, w) tensor.
    """
    num_groups: int = 32
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        assert c % self.num_groups == 0, (c, self.num_groups)
        # reduce over the last two spatial axes (h, w); works for both
        # (b, f, h, w, c) and (n, h, w, c) inputs.
        y = _group_stats_normalize(x, self.num_groups, self.epsilon,
                                   reduce_axes=(x.ndim - 3, x.ndim - 2))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return y * scale.astype(y.dtype) + bias.astype(y.dtype)


class LayerNormParams(nn.Module):
    """LayerNorm with setup-declared params (same math and param paths as
    AdaptiveOrLayerNorm: <name>/{scale,bias}) so fused Pallas kernels can
    read `scale`/`bias` directly while the unfused path calls the module."""
    features: int
    epsilon: float = 1e-5

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * self.scale + self.bias
        return y.astype(dtype)


class AdaptiveOrLayerNorm(nn.Module):
    """Plain LayerNorm (fp32 stats).  AdaLayerNorm variants of the reference
    are never enabled in AVSyncD configs, so only the plain path exists;
    the module name records the original role."""
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        c = x.shape[-1]
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (c,))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (c,))
        return y.astype(dtype)
