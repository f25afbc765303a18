"""Shape/finite smoke tests for the metric networks (full-size nets are
exercised with tiny spatial inputs where the architecture allows)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_inception_v3_fid_features(rng):
    from asva_tpu.models.evalnets import InceptionV3FID
    net = InceptionV3FID()
    x = jnp.asarray(rng.standard_normal((1, 229, 229, 3)), dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(variables, x)
    assert feats.shape == (1, 2048)
    assert np.isfinite(np.asarray(feats)).all()
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    # torchvision inception_v3 trunk (no aux, no fc) is ~21.8M params
    assert 20e6 < n_params < 24e6, n_params


def test_i3d_features(rng):
    from asva_tpu.models.evalnets import InceptionI3D
    net = InceptionI3D()
    x = jnp.asarray(rng.standard_normal((1, 12, 64, 64, 3)),
                    dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(variables, x)
    assert feats.shape == (1, 400)
    assert np.isfinite(np.asarray(feats)).all()
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    # standard I3D (Kinetics-400) is ~12.3M params
    assert 11e6 < n_params < 14e6, n_params


def test_imagebind_vision_text_tiny(rng):
    from asva_tpu.models.imagebind_extra import (ImageBindTextConfig,
                                                 ImageBindTextEncoder,
                                                 ImageBindVisionConfig,
                                                 ImageBindVisionEncoder)
    vis = ImageBindVisionEncoder(ImageBindVisionConfig.tiny())
    img = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), dtype=jnp.float32)
    vars_v = vis.init(jax.random.PRNGKey(0), img)
    emb = vis.apply(vars_v, img)
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(emb, axis=-1)),
                               1.0, rtol=1e-5)

    txt = ImageBindTextEncoder(ImageBindTextConfig.tiny())
    ids = jnp.asarray(rng.integers(0, 60, (2, 12)), dtype=jnp.int32)
    vars_t = txt.init(jax.random.PRNGKey(0), ids)
    temb = txt.apply(vars_t, ids)
    assert temb.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(temb, axis=-1)),
                               1.0, rtol=1e-5)
