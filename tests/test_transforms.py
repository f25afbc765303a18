"""Resize / transform parity vs torch.nn.functional.interpolate."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from asva_tpu.data.transforms import clip_frame_transform, sd_video_transform
from asva_tpu.ops.resize import resize_image

TOL = dict(atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("kind,mode", [("bilinear", "bilinear"),
                                       ("bicubic", "bicubic")])
@pytest.mark.parametrize("in_hw,out_hw", [((64, 48), (32, 32)),
                                          ((31, 57), (224, 224)),
                                          ((256, 256), (229, 229))])
def test_resize_matches_torch_antialias(rng, kind, mode, in_hw, out_hw):
    h, w = in_hw
    x = rng.random((2, h, w, 3)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        size=out_hw, mode=mode, antialias=True,
                        align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    out = resize_image(jnp.asarray(x), out_hw[0], out_hw[1], kind,
                       antialias=True)
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_resize_no_antialias_upsample_matches_torch(rng):
    x = rng.random((1, 16, 16, 3)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        size=(33, 47), mode="bilinear", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    out = resize_image(jnp.asarray(x), 33, 47, "bilinear", antialias=False)
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


@pytest.mark.parametrize("kind", ["bilinear", "bicubic"])
@pytest.mark.parametrize("in_hw,out_hw,antialias",
                         [((64, 48), (32, 32), True),
                          ((31, 57), (224, 224), True),
                          ((270, 360), (224, 298), True),
                          ((16, 16), (33, 47), False)])
def test_numpy_path_matches_jax_path(rng, kind, in_hw, out_hw, antialias):
    """Host loaders use the pure-numpy sparse-tap path; it must produce
    the same values as the jnp dense-matrix path (which is itself
    torch-parity-tested above)."""
    x = rng.random((2, *in_hw, 3)).astype(np.float32)
    out_np = resize_image(x, out_hw[0], out_hw[1], kind, antialias)
    out_jx = resize_image(jnp.asarray(x), out_hw[0], out_hw[1], kind,
                          antialias)
    assert isinstance(out_np, np.ndarray)
    np.testing.assert_allclose(out_np, np.asarray(out_jx), atol=2e-5,
                               rtol=2e-4)


def test_sd_video_transform_shapes_and_range(rng):
    frames = jnp.asarray(rng.random((12, 360, 640, 3)), dtype=jnp.float32)
    out = sd_video_transform(frames, 256, normalize=True)
    assert out.shape == (12, 256, 256, 3)
    v = np.asarray(out)
    assert v.min() >= -1.0001 and v.max() <= 1.0001
    # non-square target (TheGreatestHits uses 128x256)
    out2 = sd_video_transform(frames, (128, 256), normalize=False)
    assert out2.shape == (12, 128, 256, 3)
    assert np.asarray(out2).min() >= -1e-4


def test_flip_flips_width(rng):
    frames = jnp.asarray(rng.random((1, 64, 64, 3)), dtype=jnp.float32)
    a = sd_video_transform(frames, 32, flip=False, normalize=False)
    b = sd_video_transform(frames, 32, flip=True, normalize=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b)[:, :, ::-1],
                               atol=1e-6)


def test_clip_transform_stats(rng):
    frames = jnp.asarray(np.full((1, 256, 256, 3), 0.5, np.float32))
    out = np.asarray(clip_frame_transform(frames))
    expected = (0.5 - np.array([0.48145466, 0.4578275, 0.40821073])) / \
        np.array([0.26862954, 0.26130258, 0.27577711])
    np.testing.assert_allclose(out[0, 100, 100], expected, atol=1e-4)
