"""AVSync classifier: audio CNN + R(2+1)D video CNN + MLP head.

Architecture contract (reference avsync/models/{audio,video,head,
avsync_classifier}.py, AVID-CMA-initialized):

  AudioConvNet: mel (b, 128, 204, 1) -> 5-stage 2D CNN
    (1->64 k7 s2) -> [64,64 s2] -> [64,128 s2] -> [128,256 s2] -> [256,512 s1]
    each stage: (conv3x3 no-bias, BN, ReLU) x2; global mean pool -> 512.
  VideoR2Plus1DNet: video (b, f, h, w, 3) -> Conv3d(3,7,7)/(1,2,2) stem +
    maxpool(1,3,3)/(1,2,2), then 4 stages of 2 factored blocks
    (spatial (1,3,3) conv -> BN -> ReLU -> temporal (3,1,1) conv) x2 with
    residual; channels 64->64->128->256->512; global mean pool -> 512.
  SyncHead: concat(audio, video) 1024 -> 512 -> 256 -> 1 logit.

BatchNorm uses flax batch_stats (training mode updates running stats with
momentum 0.9 / eps 1e-5 like torch defaults; eval uses running averages).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


def _bn(dtype, name):
    # torch BatchNorm defaults: momentum 0.1 (i.e. 0.9 decay), eps 1e-5
    return nn.BatchNorm(use_running_average=None, momentum=0.9, epsilon=1e-5,
                        dtype=dtype, name=name)


class Basic2DBlock(nn.Module):
    out_planes: int
    stride: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_planes, (3, 3), strides=self.stride,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = _bn(self.dtype, "bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.Conv(self.out_planes, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = _bn(self.dtype, "bn2")(x, use_running_average=not train)
        return nn.relu(x)


class AudioConvNet(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem_conv")(mel)
        x = _bn(self.dtype, "stem_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = Basic2DBlock(64, (2, 2), self.dtype, name="block1")(x, train)
        x = Basic2DBlock(128, (2, 2), self.dtype, name="block2")(x, train)
        x = Basic2DBlock(256, (2, 2), self.dtype, name="block3")(x, train)
        x = Basic2DBlock(512, (1, 1), self.dtype, name="block4")(x, train)
        return jnp.mean(x, axis=(1, 2))  # (b, 512)


class BasicR2P1DBlock(nn.Module):
    out_planes: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        st, sh, sw = self.stride
        in_planes = x.shape[-1]
        p = self.out_planes
        y = nn.Conv(p, (1, 3, 3), strides=(1, sh, sw),
                    padding=((0, 0), (1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="spt_conv1")(x)
        y = _bn(self.dtype, "spt_bn1")(y, use_running_average=not train)
        y = nn.Conv(p, (3, 1, 1), strides=(st, 1, 1),
                    padding=((1, 1), (0, 0), (0, 0)), use_bias=False,
                    dtype=self.dtype, name="tmp_conv1")(nn.relu(y))
        y = _bn(self.dtype, "tmp_bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(p, (1, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="spt_conv2")(y)
        y = _bn(self.dtype, "spt_bn2")(y, use_running_average=not train)
        y = nn.Conv(p, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    use_bias=False, dtype=self.dtype,
                    name="tmp_conv2")(nn.relu(y))
        if in_planes != p or any(s != 1 for s in self.stride):
            x = nn.Conv(p, (1, 1, 1), strides=self.stride, use_bias=False,
                        dtype=self.dtype, name="res_conv")(x)
        out = _bn(self.dtype, "out_bn")(y + x,
                                        use_running_average=not train)
        return nn.relu(out)


class VideoR2Plus1DNet(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """video: (b, f, h, w, 3) normalized frames."""
        x = nn.Conv(64, (3, 7, 7), strides=(1, 2, 2),
                    padding=((1, 1), (3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="stem_conv")(video)
        x = _bn(self.dtype, "stem_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        for i, (ch, stride) in enumerate([(64, 1), (128, 2), (256, 2),
                                          (512, 2)]):
            s = (stride, stride, stride)
            x = BasicR2P1DBlock(ch, s, self.dtype,
                                name=f"stage{i + 2}_block0")(x, train)
            x = BasicR2P1DBlock(ch, (1, 1, 1), self.dtype,
                                name=f"stage{i + 2}_block1")(x, train)
        return jnp.mean(x, axis=(1, 2, 3))  # (b, 512)


class SyncHead(nn.Module):
    dim: int = 512
    out_dim: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, audio_emb: jnp.ndarray,
                 video_emb: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([audio_emb, video_emb], axis=-1)
        x = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.dim // 2, dtype=self.dtype, name="fc2")(x))
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc3")(x)


class AVSyncClassifier(nn.Module):
    """(mel, video) -> scalar sync score per pair."""
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.audio_encoder = AudioConvNet(self.dtype)
        self.video_encoder = VideoR2Plus1DNet(self.dtype)
        self.head = SyncHead(dtype=self.dtype)

    def __call__(self, mels: jnp.ndarray, videos: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        a = self.audio_encoder(mels, train)
        v = self.video_encoder(videos, train)
        return self.head(a, v)[:, 0]

    def encode(self, mels, videos, train: bool = False):
        return (self.audio_encoder(mels, train),
                self.video_encoder(videos, train))

    def score_pairs(self, audio_emb, video_emb):
        return self.head(audio_emb, video_emb)[:, 0]
