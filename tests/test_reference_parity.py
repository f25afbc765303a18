"""THE parity test: run the actual reference UNet source (torch CPU, via the
local diffusers stub) against our flax AudioUNet3D with converted weights.

This exercises the reference's real block wiring, reshape order, mask
semantics, time-embedding numerics and upsample path — any silent
convention divergence fails here.
"""
import os
import sys

import numpy as np
import pytest
import torch
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
    mod = importlib.import_module(
        "avgen.models.unets.audio_cond_unet_3d_condition")
    return mod


def _tiny_torch_unet(mod, seed=0):
    torch.manual_seed(seed)
    model = mod.AudioUNet3DConditionModel(
        in_channels=4, out_channels=4,
        down_block_types=("FFSpatioAudioTempCrossAttnDownBlock3D",
                          "FFSpatioTempResDownBlock3D"),
        up_block_types=("FFSpatioTempResUpBlock3D",
                        "FFSpatioAudioTempCrossAttnUpBlock3D"),
        mid_block_type="FFSpatioAudioTempCrossAttnUNetMidBlock3D",
        block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=8,
        cross_attention_dim=768, attention_head_dim=2,
        audio_cross_attention_dim=768)
    # randomize everything (incl. the zero-init temporal paths) so the
    # comparison exercises every branch
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0.0, 0.08)
    return model.eval()


def test_reference_unet_forward_parity(reference_unet_module, rng):
    from asva_tpu.convert import convert_state_dict, unet_key_map
    from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig

    tmodel = _tiny_torch_unet(reference_unet_module)

    b, f, hw, n_txt, n_aud = 1, 3, 16, 7, 9
    sample = rng.standard_normal((b, 4, f, hw, hw)).astype(np.float32)
    text = rng.standard_normal((b, n_txt, 768)).astype(np.float32)
    audio = rng.standard_normal((b, n_aud, 768)).astype(np.float32)
    mask = rng.random((b, f, n_aud)) > 0.4
    mask[:, :, 0] = True  # keep at least one visible token per frame
    t = 417

    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(sample), t,
            encoder_hidden_states=torch.from_numpy(text)[:, None].repeat(
                1, f, 1, 1),
            audio_encoder_hidden_states=torch.from_numpy(audio)[:, None]
            .repeat(1, f, 1, 1),
            audio_attention_mask=torch.from_numpy(mask),
        ).sample.numpy()

    cfg = UNet3DConfig(
        down_block_types=("FFSpatioAudioTempCrossAttnDownBlock3D",
                          "FFSpatioTempResDownBlock3D"),
        up_block_types=("FFSpatioTempResUpBlock3D",
                        "FFSpatioAudioTempCrossAttnUpBlock3D"),
        block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=8,
        attention_head_dim=2)
    model = AudioUNet3D(cfg)
    import jax
    fresh = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((b, f, hw, hw, 4)), jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, n_txt, 768)), jnp.zeros((b, n_aud, 768)),
        jnp.ones((b, f, n_aud), bool))
    state = {k: v.float().numpy() for k, v in tmodel.state_dict().items()}
    params, report = convert_state_dict(fresh, state, unet_key_map)
    assert not report["fresh"], f"unconverted: {report['fresh'][:8]}"
    assert not report["unused"], f"unused torch keys: {report['unused'][:8]}"

    out = model.apply(
        params,
        jnp.asarray(sample.transpose(0, 2, 3, 4, 1)),  # -> (b, f, h, w, c)
        jnp.asarray([t] * b, jnp.int32),
        jnp.asarray(text), jnp.asarray(audio), jnp.asarray(mask))
    out = np.asarray(out).transpose(0, 4, 1, 2, 3)     # -> (b, c, f, h, w)

    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)


def test_reference_unet_parity_with_gathered_audio(reference_unet_module,
                                                   rng):
    """The TPU fast path (static token gather) must equal the reference's
    boolean-masked audio attention for segment-structured masks."""
    from asva_tpu.convert import convert_state_dict, unet_key_map
    from asva_tpu.models.imagebind_audio import (segment_masks,
                                                 segment_token_indices)
    from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig
    import jax

    tmodel = _tiny_torch_unet(reference_unet_module, seed=1)
    b, f, hw = 1, 4, 16
    n_aud = 229
    sample = rng.standard_normal((b, 4, f, hw, hw)).astype(np.float32)
    text = rng.standard_normal((b, 7, 768)).astype(np.float32)
    audio = rng.standard_normal((b, n_aud, 768)).astype(np.float32)
    masks = segment_masks(f, (12, 19))
    mask_b = np.repeat(masks[None], b, axis=0)
    t = 901

    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(sample), t,
            encoder_hidden_states=torch.from_numpy(text)[:, None].repeat(
                1, f, 1, 1),
            audio_encoder_hidden_states=torch.from_numpy(audio)[:, None]
            .repeat(1, f, 1, 1),
            audio_attention_mask=torch.from_numpy(mask_b),
        ).sample.numpy()

    cfg = UNet3DConfig(
        down_block_types=("FFSpatioAudioTempCrossAttnDownBlock3D",
                          "FFSpatioTempResDownBlock3D"),
        up_block_types=("FFSpatioTempResUpBlock3D",
                        "FFSpatioAudioTempCrossAttnUpBlock3D"),
        block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=8,
        attention_head_dim=2)
    model = AudioUNet3D(cfg)
    fresh = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((b, f, hw, hw, 4)), jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, 7, 768)), jnp.zeros((b, n_aud, 768)),
        jnp.ones((b, f, n_aud), bool))
    state = {k: v.float().numpy() for k, v in tmodel.state_dict().items()}
    params, _ = convert_state_dict(fresh, state, unet_key_map)

    idx = jnp.asarray(segment_token_indices(f, (12, 19)))
    out = model.apply(params, jnp.asarray(sample.transpose(0, 2, 3, 4, 1)),
                      jnp.asarray([t] * b, jnp.int32), jnp.asarray(text),
                      jnp.asarray(audio), None, idx)
    out = np.asarray(out).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)
