"""Image/video preprocessing transforms (channels-last, jit-able).

Behavioral contracts:
  * sd_video_transform == the reference's SD-style transform
    (avgen/data/utils.py:114-189): aspect-preserving center trim, bilinear
    antialias resize to target, center crop, optional horizontal flip,
    optional [-1, 1] normalize.
  * clip_frame_transform == bicubic antialias 224 + CLIP mean/std
    (avgen/evaluations/clip/compute_clip.py:17-31).
  * fid_frame_transform == bicubic antialias 229, [-1, 1]
    (avgen/evaluations/fid/compute_fid.py:5-17).
  * fvd_frame_transform == bicubic antialias 224, [-1, 1]
    (avgen/evaluations/fvd/compute_fvd.py:9-33).
"""
from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_image

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _center_trim_to_aspect(images: jnp.ndarray, target_h: int,
                           target_w: int) -> jnp.ndarray:
    """Trim (..., h, w, c) to the target aspect ratio about the center."""
    h, w = images.shape[-3], images.shape[-2]
    target_ar = target_h / target_w
    if target_ar >= h / w:  # trim width
        trimmed_w = int(h / target_ar)
        x0 = (w - trimmed_w) // 2
        return images[..., :, x0:x0 + trimmed_w, :]
    trimmed_h = int(w * target_ar)
    y0 = (h - trimmed_h) // 2
    return images[..., y0:y0 + trimmed_h, :, :]


def sd_video_transform(frames,
                       size: Union[int, Tuple[int, int]] = 256,
                       flip: bool = False,
                       normalize: bool = True):
    """frames (..., h, w, 3) in [0,1] -> (..., th, tw, 3).

    Polymorphic like resize_image: numpy in -> numpy out (host loader
    threads stay off the device), jax in -> jax out (jit-able).
    """
    th, tw = (size, size) if isinstance(size, int) else size
    x = _center_trim_to_aspect(frames, th, tw)
    # torchvision Resize((th, tw)) with a tuple resizes EXACTLY to the target
    # (the center trim above already fixed the aspect ratio, so the reference
    # chain Resize(size) + CenterCrop(size) reduces to this exact resize)
    x = resize_image(x, th, tw, "bilinear", antialias=True)
    if flip:
        x = x[..., ::-1, :]
    if normalize:
        x = x * 2.0 - 1.0
    return x


def clip_frame_transform(frames: jnp.ndarray) -> jnp.ndarray:
    """(..., h, w, 3) in [0,1] -> bicubic 224 + CLIP normalize."""
    x = resize_image(frames, 224, 224, "bicubic", antialias=True)
    return (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


def fid_frame_transform(frames: jnp.ndarray) -> jnp.ndarray:
    x = resize_image(frames, 229, 229, "bicubic", antialias=True)
    return x * 2.0 - 1.0


def fvd_frame_transform(frames: jnp.ndarray) -> jnp.ndarray:
    x = resize_image(frames, 224, 224, "bicubic", antialias=True)
    return x * 2.0 - 1.0
