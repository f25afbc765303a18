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


def test_i3d_classifier_variant(tmp_path, rng):
    """build_i3d_classifier == the reference's load_i3d_pretrained_classifier
    semantics (download.py:58-70): raw i3d_pretrained_400.pt state loads
    0-fresh/0-unused at 400 classes; at num_classes != 400 the logits head
    is dropped and stays fresh (reference pops logits.conv3d.*)."""
    import torch

    from asva_tpu.runtime import build_i3d_classifier
    from tools.torch_eval_nets import make_reference_i3d

    path = str(tmp_path / "i3d_pretrained_400.pt")
    torch.save(make_reference_i3d(seed=3).state_dict(), path)

    def real_unused(report):  # BN bookkeeping buffers have no flax home
        return [k for k in report["unused"]
                if "num_batches_tracked" not in k]

    _, _, report = build_i3d_classifier(400, path)
    assert not report["fresh"], report["fresh"][:5]
    assert not real_unused(report), real_unused(report)[:5]

    _, _, report = build_i3d_classifier(10, path)
    assert all("logits" in k for k in report["fresh"]), report["fresh"][:5]
    assert len(report["fresh"]) == 2
    assert not real_unused(report)
