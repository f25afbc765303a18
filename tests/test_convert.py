"""Weight-converter tests: key mapping, layout transforms, 2D-graft
semantics — via synthetic torch-style state dicts built by inverting the
mapping (no diffusers needed)."""
import numpy as np
import jax
import jax.numpy as jnp

from asva_tpu.convert import (avsync_key_map, clip_text_key_map,
                              convert_state_dict, unet_key_map, vae_key_map)
from asva_tpu.models.avsync import AVSyncClassifier
from asva_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig
from asva_tpu.models.vae import AutoencoderKL, VAEConfig


def _paths(params):
    return {".".join(str(getattr(k, "key", k)) for k in p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}


def _inverse_layout(flax_shape, rng):
    """Create a torch-layout array whose _adapt() lands on flax_shape."""
    s = tuple(flax_shape)
    if len(s) == 4:   # conv2d: flax (kh,kw,I,O) -> torch (O,I,kh,kw)
        return rng.standard_normal((s[3], s[2], s[0], s[1])).astype(np.float32)
    if len(s) == 5:   # conv3d
        return rng.standard_normal((s[4], s[3], s[0], s[1], s[2])).astype(np.float32)
    if len(s) == 2:   # linear
        return rng.standard_normal((s[1], s[0])).astype(np.float32)
    return rng.standard_normal(s).astype(np.float32)


def test_unet_key_map_expected_names():
    expected = {
        "params.conv_in.conv.kernel": "conv_in.weight",
        "params.conv_in.temp_kernel": "conv_in.conv_temp.weight",
        "params.time_embedding.linear_1.kernel":
            "time_embedding.linear_1.weight",
        "params.down_blocks_0.resnets_1.norm1.scale":
            "down_blocks.0.resnets.1.norm1.weight",
        "params.down_blocks_0.attentions_0.proj_in.kernel":
            "down_blocks.0.attentions.0.proj_in.weight",
        "params.down_blocks_0.attentions_0.blocks_0.attn1.proj.to_q.kernel":
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        "params.down_blocks_0.attentions_0.blocks_0.attn1.proj.to_out.bias":
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_out.0.bias",
        "params.down_blocks_0.attentions_0.blocks_0.attn_temp.proj_to_q.kernel":
            "down_blocks.0.attentions.0.transformer_blocks.0.attn_temp.to_q.weight",
        "params.down_blocks_0.attentions_0.blocks_0.ff.proj_in.kernel":
            "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
        "params.down_blocks_0.attentions_0.blocks_0.ff.proj_out.bias":
            "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.bias",
        "params.down_blocks_0.downsample.conv.conv.kernel":
            "down_blocks.0.downsamplers.0.conv.weight",
        "params.down_blocks_0.downsample.conv.temp_bias":
            "down_blocks.0.downsamplers.0.conv.conv_temp.bias",
        "params.up_blocks_1.upsample.conv.conv.bias":
            "up_blocks.1.upsamplers.0.conv.bias",
        "params.mid_block.resnets_0.time_emb_proj.kernel":
            "mid_block.resnets.0.time_emb_proj.weight",
        "params.conv_norm_out.scale": "conv_norm_out.weight",
        "params.conv_out.conv.bias": "conv_out.bias",
    }
    for flax_path, torch_key in expected.items():
        assert unet_key_map(tuple(flax_path.split("."))) == torch_key, flax_path


def test_unet_conversion_and_2d_graft(rng):
    cfg = UNet3DConfig.tiny()
    model = AudioUNet3D(cfg)
    f = 3
    fresh = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, f, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
                       jnp.zeros((1, 5, 768)), jnp.zeros((1, 9, 768)),
                       jnp.ones((1, f, 9), bool))
    paths = _paths(fresh)
    # every path maps, all torch keys distinct
    keys = {p: unet_key_map(tuple(p.split("."))) for p in paths}
    assert len(set(keys.values())) == len(keys)

    # full 3D checkpoint: everything converts
    full_state = {keys[p]: _inverse_layout(paths[p], rng) for p in paths}
    conv, report = convert_state_dict(fresh, full_state, unet_key_map)
    assert not report["fresh"], report["fresh"][:5]
    assert not report["unused"]
    # spot-check layout: a conv kernel
    p = "params.conv_in.conv.kernel"
    got = jax.tree_util.tree_flatten_with_path(conv)[0]
    got_map = {".".join(str(getattr(k, "key", k)) for k in kp): v
               for kp, v in got}
    np.testing.assert_allclose(
        np.asarray(got_map[p]),
        full_state["conv_in.weight"].transpose(2, 3, 1, 0))

    # 2D graft: drop every key a 2D SD checkpoint would not have
    def is_3d_only(torch_key):
        return any(t in torch_key for t in
                   ("conv_temp", "_temp", "_audio", "norm_audio"))
    state_2d = {k: v for k, v in full_state.items() if not is_3d_only(k)}
    grafted, report2 = convert_state_dict(fresh, state_2d, unet_key_map)
    assert not report2["unused"]
    for path in report2["fresh"]:
        assert ("temp" in path or "audio" in path), path
    # zero-init temporal mixers stay zero after graft
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_flatten_with_path(grafted)[0][0][1])
        if False else
        np.asarray(got_map["params.conv_in.temp_kernel"] * 0),
        np.zeros_like(np.asarray(got_map["params.conv_in.temp_kernel"])))


def test_vae_conversion_complete(rng):
    vae = AutoencoderKL(VAEConfig.tiny())
    fresh = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                     jax.random.PRNGKey(1))
    paths = _paths(fresh)
    keys = {p: vae_key_map(tuple(p.split("."))) for p in paths}
    assert len(set(keys.values())) == len(keys)
    expected_samples = [
        "encoder.conv_in.weight", "encoder.mid_block.attentions.0.to_q.weight",
        "encoder.down_blocks.0.downsamplers.0.conv.weight",
        "decoder.up_blocks.0.upsamplers.0.conv.bias",
        "quant_conv.weight", "post_quant_conv.bias",
    ]
    for k in expected_samples:
        assert k in set(keys.values()), k
    state = {keys[p]: _inverse_layout(paths[p], rng) for p in paths}
    # quant convs are 1x1 convs in torch: simulate 4-D tensors for them
    for k in ("quant_conv.weight", "post_quant_conv.weight"):
        w = state[k]
        state[k] = w.T[:, :, None, None].copy()
    _, report = convert_state_dict(fresh, state, vae_key_map)
    assert not report["fresh"], report["fresh"][:5]


def test_clip_text_conversion_complete(rng):
    model = CLIPTextModel(CLIPTextConfig.tiny())
    fresh = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32))
    paths = _paths(fresh)
    keys = {p: clip_text_key_map(tuple(p.split("."))) for p in paths}
    assert len(set(keys.values())) == len(keys)
    for k in ["text_model.embeddings.token_embedding.weight",
              "text_model.encoder.layers.0.self_attn.q_proj.weight",
              "text_model.encoder.layers.1.mlp.fc2.bias",
              "text_model.final_layer_norm.weight",
              "text_model.embeddings.position_embedding.weight"]:
        assert k in set(keys.values()), k
    state = {keys[p]: _inverse_layout(paths[p], rng) for p in paths}
    _, report = convert_state_dict(fresh, state, clip_text_key_map)
    assert not report["fresh"], report["fresh"][:5]


def test_avsync_conversion_complete(rng):
    clf = AVSyncClassifier()
    fresh = clf.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 204, 1)),
                     jnp.zeros((1, 4, 32, 32, 3)))
    paths = _paths(fresh)
    keys = {p: avsync_key_map(tuple(p.split("."))) for p in paths}
    assert len(set(keys.values())) == len(keys), "collisions"
    for k in ["audio_encoder.conv1.0.weight", "audio_encoder.block1.bn1.weight",
              "audio_encoder.block1.bn1.running_mean",
              "video_encoder.conv1.0.weight",
              "video_encoder.conv3x.0.spt_conv1.weight",
              "video_encoder.conv2x.1.out_bn.running_var",
              "head.fc.0.weight", "head.fc.6.bias"]:
        assert k in set(keys.values()), k
    state = {keys[p]: _inverse_layout(paths[p], rng) for p in paths}
    _, report = convert_state_dict(fresh, state, avsync_key_map)
    assert not report["fresh"], report["fresh"][:5]
