"""InceptionV3 with the FID-specific block variants, in flax.

Mirrors the network the reference uses for FID features
(avgen/evaluations/models/inception_v3.py — the pt_inception-2015-12-05
"FID weights" graph): BasicConv2d = conv(no bias) + BN(eps 1e-3) + relu;
InceptionA/C use avg-pool with count_include_pad=False; the final
InceptionE variant uses max-pool in its pool branch.  Output: 2048-d pool3
features.  Inputs follow the reference preprocessing: bicubic 229x229 in
[-1, 1] (avgen/evaluations/fid/compute_fid.py:5-17).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class BasicConv2d(nn.Module):
    out: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: tuple = ((0, 0), (0, 0))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.9, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _avg_pool_nocount(x, window=3):
    """3x3 stride-1 avg pool, count_include_pad=False (torch semantics)."""
    p = window // 2
    ones = jnp.ones(x.shape[:1] + x.shape[1:3] + (1,), x.dtype)
    summed = nn.avg_pool(x, (window, window), strides=(1, 1),
                         padding=((p, p), (p, p))) * (window * window)
    count = nn.avg_pool(ones, (window, window), strides=(1, 1),
                        padding=((p, p), (p, p))) * (window * window)
    return summed / count


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1",
                         dtype=self.dtype)(x, train)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1",
                         dtype=self.dtype)(x, train)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)),
                         name="branch5x5_2", dtype=self.dtype)(b5, train)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1",
                         dtype=self.dtype)(x, train)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2", dtype=self.dtype)(b3, train)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_3", dtype=self.dtype)(b3, train)
        bp = _avg_pool_nocount(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool",
                         dtype=self.dtype)(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3",
                         dtype=self.dtype)(x, train)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1",
                         dtype=self.dtype)(x, train)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2", dtype=self.dtype)(bd, train)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3",
                         dtype=self.dtype)(bd, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.channels_7x7
        p30 = ((3, 3), (0, 0))
        p03 = ((0, 0), (3, 3))
        b1 = BasicConv2d(192, (1, 1), name="branch1x1",
                         dtype=self.dtype)(x, train)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1",
                         dtype=self.dtype)(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=p03, name="branch7x7_2",
                         dtype=self.dtype)(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=p30, name="branch7x7_3",
                         dtype=self.dtype)(b7, train)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1",
                         dtype=self.dtype)(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=p30, name="branch7x7dbl_2",
                         dtype=self.dtype)(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=p03, name="branch7x7dbl_3",
                         dtype=self.dtype)(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=p30, name="branch7x7dbl_4",
                         dtype=self.dtype)(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=p03, name="branch7x7dbl_5",
                         dtype=self.dtype)(bd, train)
        bp = _avg_pool_nocount(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool",
                         dtype=self.dtype)(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1",
                         dtype=self.dtype)(x, train)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2",
                         dtype=self.dtype)(b3, train)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1",
                         dtype=self.dtype)(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7x3_2", dtype=self.dtype)(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7x3_3", dtype=self.dtype)(b7, train)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4",
                         dtype=self.dtype)(b7, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # final FID block uses max pool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        p10 = ((1, 1), (0, 0))
        p01 = ((0, 0), (1, 1))
        b1 = BasicConv2d(320, (1, 1), name="branch1x1",
                         dtype=self.dtype)(x, train)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1",
                         dtype=self.dtype)(x, train)
        b3a = BasicConv2d(384, (1, 3), padding=p01, name="branch3x3_2a",
                          dtype=self.dtype)(b3, train)
        b3b = BasicConv2d(384, (3, 1), padding=p10, name="branch3x3_2b",
                          dtype=self.dtype)(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1",
                         dtype=self.dtype)(x, train)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2", dtype=self.dtype)(bd, train)
        bda = BasicConv2d(384, (1, 3), padding=p01, name="branch3x3dbl_3a",
                          dtype=self.dtype)(bd, train)
        bdb = BasicConv2d(384, (3, 1), padding=p10, name="branch3x3dbl_3b",
                          dtype=self.dtype)(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.use_max_pool:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_nocount(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool",
                         dtype=self.dtype)(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        """images (b, h, w, 3) in [-1, 1] -> (b, 2048) pool3 features."""
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3",
                        dtype=self.dtype)(images, train)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3",
                        dtype=self.dtype)(x, train)
        x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)),
                        name="Conv2d_2b_3x3", dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1",
                        dtype=self.dtype)(x, train)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3",
                        dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b", dtype=self.dtype)(x, train)
        x = InceptionA(64, name="Mixed_5c", dtype=self.dtype)(x, train)
        x = InceptionA(64, name="Mixed_5d", dtype=self.dtype)(x, train)
        x = InceptionB(name="Mixed_6a", dtype=self.dtype)(x, train)
        x = InceptionC(128, name="Mixed_6b", dtype=self.dtype)(x, train)
        x = InceptionC(160, name="Mixed_6c", dtype=self.dtype)(x, train)
        x = InceptionC(160, name="Mixed_6d", dtype=self.dtype)(x, train)
        x = InceptionC(192, name="Mixed_6e", dtype=self.dtype)(x, train)
        x = InceptionD(name="Mixed_7a", dtype=self.dtype)(x, train)
        x = InceptionE(False, name="Mixed_7b", dtype=self.dtype)(x, train)
        x = InceptionE(True, name="Mixed_7c", dtype=self.dtype)(x, train)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (b, 2048)
