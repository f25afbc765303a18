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


def _group_stats_normalize(x: jnp.ndarray, num_groups: int, eps: float,
                           reduce_axes: tuple[int, ...]) -> jnp.ndarray:
    """Normalize (..., C) by group statistics over `reduce_axes` + channel group.

    x is reshaped so the channel axis (last) is split into (groups, C//groups);
    reduction runs over `reduce_axes` (referring to x's axes) and the per-group
    channel axis.
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    c = x.shape[-1]
    gshape = x.shape[:-1] + (num_groups, c // num_groups)
    xg = x32.reshape(gshape)
    # reduce over the given spatial axes plus the within-group channel axis
    axes = tuple(reduce_axes) + (xg.ndim - 1,)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xg), axis=axes, keepdims=True) - jnp.square(mean)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(x.shape).astype(orig_dtype)


class VideoGroupNorm(nn.Module):
    """GroupNorm over (frame, height, width, channel-group) — all frames.

    Input: (b, f, h, w, c).  Matches torch nn.GroupNorm applied to
    (b, c, f, h, w).
    """
    num_groups: int = 32
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        assert c % self.num_groups == 0, (c, self.num_groups)
        y = _group_stats_normalize(x, self.num_groups, self.epsilon,
                                   reduce_axes=tuple(range(1, x.ndim - 1)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return y * scale.astype(y.dtype) + bias.astype(y.dtype)


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
