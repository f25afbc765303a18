"""Inception-I3D (Kinetics-400) in flax — FVD feature extractor.

Replaces the reference's TorchScript i3d blob
(avgen/evaluations/models/download.py:48-55; consumed with
return_features=True, i.e. the 400-d logits before softmax, in
avgen/evaluations/fvd/compute_fvd.py:36-45).  Standard InceptionI3d layout
(Unit3D = conv3d SAME + BN + relu), input (b, f, 224, 224, 3) in [-1, 1],
channels-last.  BN eps defaults to 1e-5 matching the reference's own torch
implementation (avgen/evaluations/models/pytorch_i3d.py:73
``nn.BatchNorm3d(..., eps=1e-5 default)``), the in-sandbox parity truth
(tests/test_eval_script_e2e.py); override ``bn_eps`` if a converted blob's
internal BN uses TF's 1e-3.

Head note: the reference pools with ``AvgPool3d([2,7,7], stride=1)`` then
logits then time-mean (pytorch_i3d.py:280-318) — a SLIDING temporal window
(output t'-1 windows for head extent t'), implemented exactly here, so
features are correct for ANY frame count (e.g. f=24 reaches the head with
t'=3, where a global temporal mean would diverge; parity-tested at f=16
and f=24 in tests/test_eval_script_e2e.py).  For the 12-frame protocol
t'=2 and the window degenerates to the global mean.  Window sizes are
clamped to the input extent (min(2,t'), min(7,h)) so tiny smoke inputs
still run; torch itself errors below the kernel size, so clamping only
engages on inputs the reference cannot process at all.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


def _same_pad(kernel: Tuple[int, int, int], strides: Tuple[int, int, int],
              in_shape):
    """TF-SAME padding for conv3d (torch I3D computes this manually)."""
    pads = []
    for k, s, n in zip(kernel, strides, in_shape):
        out = -(-n // s)
        total = max((out - 1) * s + k - n, 0)
        pads.append((total // 2, total - total // 2))
    return pads


class Unit3D(nn.Module):
    out: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    use_bias: bool = False
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pads = _same_pad(self.kernel, self.strides, x.shape[1:4])
        x = nn.Conv(self.out, self.kernel, strides=self.strides,
                    padding=pads, use_bias=self.use_bias, dtype=self.dtype,
                    name="conv3d")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             epsilon=self.bn_eps, momentum=0.99,
                             dtype=self.dtype, name="bn")(x)
        return nn.relu(x) if self.activation else x


def _same_max_pool(x, kernel, strides):
    pads = _same_pad(kernel, strides, x.shape[1:4])
    return nn.max_pool(x, kernel, strides=strides, padding=pads)


class InceptionModule(nn.Module):
    channels: Tuple[int, int, int, int, int, int]  # b0, b1a, b1b, b2a, b2b, b3
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = self.channels
        u = dict(bn_eps=self.bn_eps, dtype=self.dtype)
        b0 = Unit3D(c[0], name="b0", **u)(x, train)
        b1 = Unit3D(c[1], name="b1a", **u)(x, train)
        b1 = Unit3D(c[2], (3, 3, 3), name="b1b", **u)(b1, train)
        b2 = Unit3D(c[3], name="b2a", **u)(x, train)
        b2 = Unit3D(c[4], (3, 3, 3), name="b2b", **u)(b2, train)
        b3 = _same_max_pool(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(c[5], name="b3b", **u)(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3D(nn.Module):
    num_classes: int = 400
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray, train: bool = False):
        """video (b, f, h, w, 3) in [-1, 1] -> (b, 400) logits features."""
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7",
                   bn_eps=self.bn_eps, dtype=self.dtype)(video, train)
        x = _same_max_pool(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, name="Conv3d_2b_1x1", bn_eps=self.bn_eps, dtype=self.dtype)(x, train)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3",
                   bn_eps=self.bn_eps, dtype=self.dtype)(x, train)
        x = _same_max_pool(x, (1, 3, 3), (1, 2, 2))
        x = InceptionModule((64, 96, 128, 16, 32, 32), name="Mixed_3b",
                            bn_eps=self.bn_eps, dtype=self.dtype)(x, train)
        x = InceptionModule((128, 128, 192, 32, 96, 64), name="Mixed_3c",
                            bn_eps=self.bn_eps, dtype=self.dtype)(x, train)
        x = _same_max_pool(x, (3, 3, 3), (2, 2, 2))
        x = InceptionModule((192, 96, 208, 16, 48, 64), name="Mixed_4b",
                            bn_eps=self.bn_eps, dtype=self.dtype)(x, train)
        x = InceptionModule((160, 112, 224, 24, 64, 64), name="Mixed_4c",
                            bn_eps=self.bn_eps, dtype=self.dtype)(x, train)
        x = InceptionModule((128, 128, 256, 24, 64, 64), name="Mixed_4d",
                            bn_eps=self.bn_eps, dtype=self.dtype)(x, train)
        x = InceptionModule((112, 144, 288, 32, 64, 64), name="Mixed_4e",
                            bn_eps=self.bn_eps, dtype=self.dtype)(x, train)
        x = InceptionModule((256, 160, 320, 32, 128, 128), name="Mixed_4f",
                            bn_eps=self.bn_eps, dtype=self.dtype)(x, train)
        x = _same_max_pool(x, (2, 2, 2), (2, 2, 2))
        x = InceptionModule((256, 160, 320, 32, 128, 128), name="Mixed_5b",
                            bn_eps=self.bn_eps, dtype=self.dtype)(x, train)
        x = InceptionModule((384, 192, 384, 48, 128, 128), name="Mixed_5c",
                            bn_eps=self.bn_eps, dtype=self.dtype)(x, train)
        # reference head: AvgPool3d([2,7,7], stride 1) — sliding over the
        # temporal axis (t' - 1 windows) and, at protocol 224^2 input where
        # the head is exactly 7x7, a full spatial reduce — then the 1x1x1
        # logits conv and a mean over the remaining window axes
        # (pytorch_i3d.py:280-318: spatial squeeze + logits.mean(dim=2))
        t, h, w = x.shape[1:4]
        win = (min(2, t), min(7, h), min(7, w))
        x = nn.avg_pool(x, win, strides=(1, 1, 1), padding="VALID")
        x = Unit3D(self.num_classes, use_bn=False, activation=False,
                   use_bias=True, name="logits", bn_eps=self.bn_eps,
                   dtype=self.dtype)(x, train)
        return jnp.mean(x, axis=(1, 2, 3))  # (b, 400)
