"""Parity for the text-only transformer (reference
ff_spatio_temp_transformer_3d.py).

Note: the full FFSpatioTempCrossAttn* block family is dead code in the
reference — AudioUNet3DConditionModel.forward always passes audio kwargs,
which those blocks reject — so parity is checked at the transformer-module
level (the unit that IS reachable via custom configs).
"""
import os
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference tree not mounted")


def test_text_only_transformer_parity(rng):
    sys.path.insert(0, os.path.join(REPO, "tests", "stubs"))
    sys.path.insert(0, REFERENCE)
    import importlib
    mod = importlib.import_module(
        "avgen.models.unets.transformers.ff_spatio_temp_transformer_3d")

    torch.manual_seed(3)
    c, heads = 32, 2
    tmodel = mod.FFSpatioTempTransformer3DModel(
        heads, c // heads, in_channels=c, num_layers=1,
        cross_attention_dim=768, norm_num_groups=8)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.normal_(0.0, 0.08)
    tmodel.eval()

    b, f, hw, n_txt = 1, 3, 8, 7
    x = rng.standard_normal((b, c, f, hw, hw)).astype(np.float32)
    text = rng.standard_normal((b, n_txt, 768)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(x),
            encoder_hidden_states=torch.from_numpy(text)[:, None].repeat(
                1, f, 1, 1)).sample.numpy()

    from asva_tpu.convert import convert_state_dict, unet_key_map
    from asva_tpu.models.unet3d.transformer import SpatioAudioTempTransformer3D
    model = SpatioAudioTempTransformer3D(heads, c // heads,
                                         norm_num_groups=8, use_audio=False)
    fresh = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((b, f, hw, hw, c)),
                       jnp.zeros((b, n_txt, 768)))

    # block-level key space: same mapping minus the leading block prefix
    def key_fn(segs):
        return unet_key_map(segs)

    state = {k: v.float().numpy() for k, v in tmodel.state_dict().items()}
    params, report = convert_state_dict(fresh, state, key_fn)
    assert not report["fresh"], report["fresh"][:8]
    assert not report["unused"], report["unused"][:8]

    out = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                      jnp.asarray(text))
    out = np.asarray(out).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)
