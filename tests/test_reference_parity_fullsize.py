"""Full-size (SD1.5-width) UNet forward parity vs the exec'd reference
source — VERDICT r3 "Next round #3".

The tiny-config parity tests (test_reference_parity.py) cover the wiring;
this one exercises every width-dependent production path the kernels gate
on: block_out_channels (320, 640, 1280, 1280) with 8 heads x head_dim
40/80/160/160, f=12 frames at 32x32 latents, 229 audio tokens with the
segment-mask -> static-gather fast path, the d<=64 temporal-attention
pair-loop at level 0 vs the einsum path at deeper levels, and the 1280-ch
cross-attention shapes.  Single timestep, fp32-highest, batch 1, CPU
(slow: several minutes of single-core compute; the suite runs it last by
filename order).  Reference: audio_cond_unet_3d_condition.py:598-798.
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


@pytest.fixture(scope="module")
def reference_unet_module():
    sys.path.insert(0, os.path.join(REPO, "tests", "stubs"))
    sys.path.insert(0, REFERENCE)
    import importlib
    return importlib.import_module(
        "avgen.models.unets.audio_cond_unet_3d_condition")


def test_fullsize_unet_forward_parity(reference_unet_module, rng):
    from asva_tpu.convert import convert_state_dict, unet_key_map
    from asva_tpu.models.imagebind_audio import (segment_masks,
                                                 segment_token_indices)
    from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig

    torch.manual_seed(0)
    # reference defaults == the production SD1.5-inflated config EXCEPT
    # cross_attention_dim: the class default is diffusers' 1280 and SD1.5's
    # config.json overrides it to 768 (what from_pretrained_2d loads)
    tmodel = reference_unet_module.AudioUNet3DConditionModel(
        cross_attention_dim=768)
    # keep the (stable) default kaiming init; randomize only the zero-init
    # branches (conv_temp mixers, temporal-attention to_out, out conv, zero
    # biases) so every branch contributes to the output being compared
    with torch.no_grad():
        for p in tmodel.parameters():
            if float(p.abs().max()) == 0.0:
                p.normal_(0.0, 0.05)
    tmodel.eval()

    b, f, hw, n_txt, n_aud = 1, 12, 32, 7, 229
    sample = rng.standard_normal((b, 4, f, hw, hw)).astype(np.float32)
    text = (rng.standard_normal((b, n_txt, 768)) * 0.3).astype(np.float32)
    audio = (rng.standard_normal((b, n_aud, 768)) * 0.3).astype(np.float32)
    masks = segment_masks(f, (12, 19))          # the production mask layout
    mask_b = np.repeat(masks[None], b, axis=0)
    t = 417

    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(sample), t,
            encoder_hidden_states=torch.from_numpy(text)[:, None].repeat(
                1, f, 1, 1),
            audio_encoder_hidden_states=torch.from_numpy(audio)[:, None]
            .repeat(1, f, 1, 1),
            audio_attention_mask=torch.from_numpy(mask_b),
        ).sample.numpy()
    assert np.isfinite(ref).all()

    model = AudioUNet3D(UNet3DConfig())        # same production defaults
    fresh = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((b, f, hw, hw, 4)), jnp.zeros((b,), jnp.int32),
            jnp.zeros((b, n_txt, 768)), jnp.zeros((b, n_aud, 768)),
            jnp.ones((b, f, n_aud), bool)))
    state = {k: v.float().numpy() for k, v in tmodel.state_dict().items()}
    params, report = convert_state_dict(fresh, state, unet_key_map)
    assert not report["fresh"], f"unconverted: {report['fresh'][:8]}"
    assert not report["unused"], f"unused torch keys: {report['unused'][:8]}"
    del state, tmodel

    idx = jnp.asarray(segment_token_indices(f, (12, 19)))
    out = model.apply(
        params,
        jnp.asarray(sample.transpose(0, 2, 3, 4, 1)),   # (b, f, h, w, c)
        jnp.asarray([t] * b, jnp.int32),
        jnp.asarray(text), jnp.asarray(audio), None, idx)
    out = np.asarray(out).transpose(0, 4, 1, 2, 3)      # (b, c, f, h, w)

    scale = float(np.abs(ref).mean())
    err = np.abs(out - ref).max()
    assert err <= max(2e-3, 2e-3 * scale), (err, scale)
