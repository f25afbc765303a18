"""Converter validation against the *published* checkpoint layouts.

The sandbox ships no pretrained weights, so these tests build synthetic
state dicts with the EXACT key names and tensor layouts of the real
artifacts and verify (a) every one of our parameters converts (0 fresh),
and (b) forward parity against a functional-torch implementation that uses
torch's own kernels (F.multi_head_attention_forward for the ImageBind
trunk, F.conv2d/3d, F.layer_norm) — so bias_k/bias_v handling, token
ordering and norm placement are checked against torch semantics, not
against our own code.

Covered layouts:
  * imagebind_huge.pth audio tower (modality_preprocessors.audio.rgbt_stem.
    proj.0 conv stem, MultiheadAttention in_proj/bias_k/bias_v, mlp.fc1/2,
    heads) — consumed by ImageBindSegmaskAudioEncoder (reference
    avgen/models/audio_encoders/segmask_imagebind.py:55-61) and the eval
    CLIPModel (avgen/evaluations/models/clip.py:27).
  * imagebind_huge.pth vision + text towers (eval ia_sim / it_sim).
  * AVID-CMA checkpoint tar: {"model": {module.audio_model.* /
    module.video_model.*}} (reference avsync/models/audio.py:63-71,
    video.py:84-91).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from asva_tpu.convert import convert_state_dict
from asva_tpu.convert.torch_to_jax import (imagebind_audio_key_map,
                                           imagebind_text_key_map,
                                           imagebind_vision_key_map)
from asva_tpu.models.imagebind_audio import (ImageBindAudioConfig,
                                             ImageBindAudioEncoder,
                                             SegmaskAudioEncoder)
from asva_tpu.models.imagebind_extra import (ImageBindTextConfig,
                                             ImageBindTextEncoder,
                                             ImageBindVisionConfig,
                                             ImageBindVisionEncoder)

T = lambda a: torch.from_numpy(np.asarray(a, dtype=np.float32))


# ---------------------------------------------------------------------------
# synthetic imagebind_huge state dicts (exact key names / tensor layouts)
# ---------------------------------------------------------------------------

def _trunk_block_keys(base, e, rng, bias_kv):
    sd = {
        f"{base}.attn.in_proj_weight": rng.standard_normal((3 * e, e)) * 0.04,
        f"{base}.attn.in_proj_bias": rng.standard_normal((3 * e,)) * 0.02,
        f"{base}.attn.out_proj.weight": rng.standard_normal((e, e)) * 0.04,
        f"{base}.attn.out_proj.bias": rng.standard_normal((e,)) * 0.02,
        f"{base}.norm_1.weight": 1 + rng.standard_normal((e,)) * 0.02,
        f"{base}.norm_1.bias": rng.standard_normal((e,)) * 0.02,
        f"{base}.norm_2.weight": 1 + rng.standard_normal((e,)) * 0.02,
        f"{base}.norm_2.bias": rng.standard_normal((e,)) * 0.02,
        f"{base}.mlp.fc1.weight": rng.standard_normal((4 * e, e)) * 0.04,
        f"{base}.mlp.fc1.bias": rng.standard_normal((4 * e,)) * 0.02,
        f"{base}.mlp.fc2.weight": rng.standard_normal((e, 4 * e)) * 0.04,
        f"{base}.mlp.fc2.bias": rng.standard_normal((e,)) * 0.02,
    }
    if bias_kv:
        sd[f"{base}.attn.bias_k"] = rng.standard_normal((1, 1, e)) * 0.02
        sd[f"{base}.attn.bias_v"] = rng.standard_normal((1, 1, e)) * 0.02
    return sd


def make_imagebind_audio_state(cfg: ImageBindAudioConfig, rng):
    e, k = cfg.embed_dim, cfg.kernel_size
    sd = {
        "modality_preprocessors.audio.cls_token":
            rng.standard_normal((1, 1, e)) * 0.02,
        "modality_preprocessors.audio.rgbt_stem.proj.0.weight":
            rng.standard_normal((e, 1, k, k)) * 0.04,
        "modality_preprocessors.audio.rgbt_stem.norm_layer.weight":
            1 + rng.standard_normal((e,)) * 0.02,
        "modality_preprocessors.audio.rgbt_stem.norm_layer.bias":
            rng.standard_normal((e,)) * 0.02,
        "modality_preprocessors.audio.pos_embedding_helper.pos_embed":
            rng.standard_normal((1, cfg.num_tokens, e)) * 0.02,
        "modality_heads.audio.0.weight": 1 + rng.standard_normal((e,)) * 0.02,
        "modality_heads.audio.0.bias": rng.standard_normal((e,)) * 0.02,
        "modality_heads.audio.2.weight":
            rng.standard_normal((cfg.out_embed_dim, e)) * 0.04,
        "modality_postprocessors.audio.1.log_logit_scale":
            np.asarray(np.log(20.0)),
    }
    for i in range(cfg.num_blocks):
        sd.update(_trunk_block_keys(f"modality_trunks.audio.blocks.{i}", e,
                                    rng, bias_kv=True))
    return {kk: np.asarray(v, dtype=np.float32) for kk, v in sd.items()}


def torch_block(x, sd, base, heads, bias_kv=True, attn_mask=None):
    """BlockWithMasking forward via torch's own MHA kernel.  x: (b, L, e)."""
    e = x.shape[-1]
    y = F.layer_norm(x, (e,), T(sd[f"{base}.norm_1.weight"]),
                     T(sd[f"{base}.norm_1.bias"]), eps=1e-6)
    yt = y.transpose(0, 1)  # (L, b, e) — torch MHA default layout
    attn, _ = F.multi_head_attention_forward(
        yt, yt, yt, e, heads,
        T(sd[f"{base}.attn.in_proj_weight"]),
        T(sd[f"{base}.attn.in_proj_bias"]),
        T(sd[f"{base}.attn.bias_k"]) if bias_kv else None,
        T(sd[f"{base}.attn.bias_v"]) if bias_kv else None,
        False, 0.0,
        T(sd[f"{base}.attn.out_proj.weight"]),
        T(sd[f"{base}.attn.out_proj.bias"]),
        training=False, need_weights=False, attn_mask=attn_mask)
    x = x + attn.transpose(0, 1)
    y = F.layer_norm(x, (e,), T(sd[f"{base}.norm_2.weight"]),
                     T(sd[f"{base}.norm_2.bias"]), eps=1e-6)
    y = F.linear(y, T(sd[f"{base}.mlp.fc1.weight"]),
                 T(sd[f"{base}.mlp.fc1.bias"]))
    y = F.gelu(y)
    y = F.linear(y, T(sd[f"{base}.mlp.fc2.weight"]),
                 T(sd[f"{base}.mlp.fc2.bias"]))
    return x + y


def torch_audio_tower(sd, mel_bhwc, cfg: ImageBindAudioConfig):
    """imagebind_huge audio branch, functional torch.  mel: (b, 128, 204, 1)
    channels-last; returns (cls_embeds, tokens) like our encoder."""
    e = cfg.embed_dim
    x = torch.from_numpy(mel_bhwc).permute(0, 3, 1, 2).float()
    x = F.conv2d(
        x, T(sd["modality_preprocessors.audio.rgbt_stem.proj.0.weight"]),
        stride=cfg.stride)
    b = x.shape[0]
    x = x.flatten(2).transpose(1, 2)  # (b, 228, e) row-major (freq, time)
    x = F.layer_norm(
        x, (e,),
        T(sd["modality_preprocessors.audio.rgbt_stem.norm_layer.weight"]),
        T(sd["modality_preprocessors.audio.rgbt_stem.norm_layer.bias"]))
    cls = T(sd["modality_preprocessors.audio.cls_token"]).expand(b, -1, -1)
    x = torch.cat([cls, x], dim=1)
    x = x + T(sd["modality_preprocessors.audio.pos_embedding_helper."
                 "pos_embed"])
    for i in range(cfg.num_blocks):
        x = torch_block(x, sd, f"modality_trunks.audio.blocks.{i}",
                        cfg.num_heads, bias_kv=True)
    tokens = x
    y = F.layer_norm(tokens[:, 0], (e,),
                     T(sd["modality_heads.audio.0.weight"]),
                     T(sd["modality_heads.audio.0.bias"]), eps=1e-6)
    cls_embeds = F.linear(y, T(sd["modality_heads.audio.2.weight"]))
    return cls_embeds.numpy(), tokens.numpy()


# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def audio_cfg():
    # full patch grid (12x19 -> 229 tokens) but a thin trunk for speed;
    # key NAMES are identical to imagebind_huge's
    return ImageBindAudioConfig(embed_dim=64, out_embed_dim=32, num_blocks=3,
                                num_heads=4)


def test_imagebind_audio_conversion_complete_and_parity(audio_cfg, rng):
    sd = make_imagebind_audio_state(audio_cfg, rng)
    enc = ImageBindAudioEncoder(audio_cfg)
    fresh = enc.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 128, 204, 1)))
    params, report = convert_state_dict(fresh, sd, imagebind_audio_key_map)
    assert not report["fresh"], report["fresh"][:8]
    unused = set(report["unused"])
    assert unused == {"modality_postprocessors.audio.1.log_logit_scale"}, \
        sorted(unused)[:8]

    mel = rng.standard_normal((2, 128, 204, 1)).astype(np.float32)
    cls_ours, tok_ours = enc.apply(params, jnp.asarray(mel))
    cls_ref, tok_ref = torch_audio_tower(sd, mel, audio_cfg)
    np.testing.assert_allclose(np.asarray(tok_ours), tok_ref,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cls_ours), cls_ref,
                               rtol=2e-4, atol=2e-4)


def test_segmask_encoder_conversion_from_huge(audio_cfg, rng):
    """SegmaskAudioEncoder init from raw imagebind_huge: everything except
    the ASVA-fresh final_layer_norm converts (the reference initializes that
    layer fresh too, segmask_imagebind.py:61)."""
    sd = make_imagebind_audio_state(audio_cfg, rng)
    model = SegmaskAudioEncoder(audio_cfg, n_segment=12)
    fresh = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 204, 1)))
    params, report = convert_state_dict(fresh, sd, imagebind_audio_key_map)
    assert all("final_layer_norm" in p for p in report["fresh"]), \
        report["fresh"][:8]
    assert len(report["fresh"]) == 2

    # and from the reference's audio_encoder *export* key space
    # (preprocessor./trunk./head./final_layer_norm. prefixes)
    export = {}
    ren = {"modality_preprocessors.audio.": "preprocessor.",
           "modality_trunks.audio.": "trunk.",
           "modality_heads.audio.": "head.",
           "modality_postprocessors.audio.": "postprocessor."}
    for k, v in sd.items():
        for old, new in ren.items():
            if k.startswith(old):
                export[new + k[len(old):]] = v
    export["final_layer_norm.weight"] = np.ones(
        (audio_cfg.embed_dim,), np.float32)
    export["final_layer_norm.bias"] = np.zeros(
        (audio_cfg.embed_dim,), np.float32)
    params2, report2 = convert_state_dict(fresh, export,
                                          imagebind_audio_key_map)
    assert not report2["fresh"], report2["fresh"][:8]
    assert set(report2["unused"]) == {"postprocessor.1.log_logit_scale"}


# ---------------------------------------------------------------------------
# vision
# ---------------------------------------------------------------------------

def make_imagebind_vision_state(cfg: ImageBindVisionConfig, rng):
    e, p = cfg.embed_dim, cfg.patch_size
    n = (cfg.image_size // p) ** 2
    sd = {
        "modality_preprocessors.vision.cls_token":
            rng.standard_normal((1, 1, e)) * 0.02,
        # PadIm2Video at proj.0, Conv3d at proj.1 (kernel (2, p, p))
        "modality_preprocessors.vision.rgbt_stem.proj.1.weight":
            rng.standard_normal((e, 3, 2, p, p)) * 0.04,
        "modality_preprocessors.vision.pos_embedding_helper.pos_embed":
            rng.standard_normal((1, n + 1, e)) * 0.02,
        "modality_trunks.vision.pre_transformer_layer.0.weight":
            1 + rng.standard_normal((e,)) * 0.02,
        "modality_trunks.vision.pre_transformer_layer.0.bias":
            rng.standard_normal((e,)) * 0.02,
        "modality_heads.vision.0.weight": 1 + rng.standard_normal((e,)) * 0.02,
        "modality_heads.vision.0.bias": rng.standard_normal((e,)) * 0.02,
        "modality_heads.vision.2.weight":
            rng.standard_normal((cfg.out_embed_dim, e)) * 0.04,
    }
    for i in range(cfg.num_blocks):
        sd.update(_trunk_block_keys(f"modality_trunks.vision.blocks.{i}", e,
                                    rng, bias_kv=False))
    return {kk: np.asarray(v, dtype=np.float32) for kk, v in sd.items()}


def torch_vision_tower(sd, images_bhwc, cfg: ImageBindVisionConfig):
    e = cfg.embed_dim
    x = torch.from_numpy(images_bhwc).permute(0, 3, 1, 2).float()
    x = x.unsqueeze(2).repeat(1, 1, 2, 1, 1)  # PadIm2Video "repeat" 2 frames
    w = T(sd["modality_preprocessors.vision.rgbt_stem.proj.1.weight"])
    x = F.conv3d(x, w, stride=(2, cfg.patch_size, cfg.patch_size))
    b = x.shape[0]
    x = x.flatten(2).transpose(1, 2)
    cls = T(sd["modality_preprocessors.vision.cls_token"]).expand(b, -1, -1)
    x = torch.cat([cls, x], dim=1)
    x = x + T(sd["modality_preprocessors.vision.pos_embedding_helper."
                 "pos_embed"])
    x = F.layer_norm(
        x, (e,), T(sd["modality_trunks.vision.pre_transformer_layer.0."
                      "weight"]),
        T(sd["modality_trunks.vision.pre_transformer_layer.0.bias"]),
        eps=1e-6)
    for i in range(cfg.num_blocks):
        x = torch_block(x, sd, f"modality_trunks.vision.blocks.{i}",
                        cfg.num_heads, bias_kv=False)
    y = F.layer_norm(x[:, 0], (e,), T(sd["modality_heads.vision.0.weight"]),
                     T(sd["modality_heads.vision.0.bias"]), eps=1e-6)
    emb = F.linear(y, T(sd["modality_heads.vision.2.weight"]))
    emb = emb / emb.norm(dim=-1, keepdim=True)
    return emb.numpy()


def test_imagebind_vision_conversion_complete_and_parity(rng):
    cfg = ImageBindVisionConfig(embed_dim=64, out_embed_dim=32, num_blocks=2,
                                num_heads=4, image_size=28, patch_size=14)
    sd = make_imagebind_vision_state(cfg, rng)
    enc = ImageBindVisionEncoder(cfg)
    fresh = enc.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
    params, report = convert_state_dict(fresh, sd, imagebind_vision_key_map)
    assert not report["fresh"], report["fresh"][:8]
    assert not report["unused"], report["unused"][:8]

    imgs = rng.standard_normal(
        (2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    ours = enc.apply(params, jnp.asarray(imgs))
    ref = torch_vision_tower(sd, imgs, cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------

def make_imagebind_text_state(cfg: ImageBindTextConfig, rng):
    e = cfg.embed_dim
    sd = {
        "modality_preprocessors.text.token_embedding.weight":
            rng.standard_normal((cfg.vocab_size, e)) * 0.02,
        "modality_preprocessors.text.pos_embed":
            rng.standard_normal((1, cfg.context_length, e)) * 0.02,
        "modality_heads.text.proj.0.weight":
            1 + rng.standard_normal((e,)) * 0.02,
        "modality_heads.text.proj.0.bias": rng.standard_normal((e,)) * 0.02,
        "modality_heads.text.proj.1.weight":
            rng.standard_normal((cfg.out_embed_dim, e)) * 0.04,
        "modality_postprocessors.text.1.log_logit_scale":
            np.asarray(np.log(14.0)),
    }
    for i in range(cfg.num_blocks):
        sd.update(_trunk_block_keys(f"modality_trunks.text.blocks.{i}", e,
                                    rng, bias_kv=False))
    return {kk: np.asarray(v, dtype=np.float32) for kk, v in sd.items()}


def torch_text_tower(sd, ids, cfg: ImageBindTextConfig):
    e = cfg.embed_dim
    ids_t = torch.from_numpy(ids).long()
    x = F.embedding(ids_t,
                    T(sd["modality_preprocessors.text.token_embedding."
                         "weight"]))
    x = x + T(sd["modality_preprocessors.text.pos_embed"])
    n = ids.shape[1]
    causal = torch.full((n, n), float("-inf")).triu(1)
    for i in range(cfg.num_blocks):
        x = torch_block(x, sd, f"modality_trunks.text.blocks.{i}",
                        cfg.num_heads, bias_kv=False, attn_mask=causal)
    eos = ids_t.argmax(dim=-1)
    pooled = x[torch.arange(x.shape[0]), eos]
    pooled = F.layer_norm(pooled, (e,),
                          T(sd["modality_heads.text.proj.0.weight"]),
                          T(sd["modality_heads.text.proj.0.bias"]), eps=1e-6)
    emb = F.linear(pooled, T(sd["modality_heads.text.proj.1.weight"]))
    emb = emb / emb.norm(dim=-1, keepdim=True)
    return emb.numpy()


def test_imagebind_text_conversion_complete_and_parity(rng):
    cfg = ImageBindTextConfig(vocab_size=64, embed_dim=32, out_embed_dim=16,
                              num_blocks=2, num_heads=2, context_length=12)
    sd = make_imagebind_text_state(cfg, rng)
    enc = ImageBindTextEncoder(cfg)
    fresh = enc.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, cfg.context_length), jnp.int32))
    params, report = convert_state_dict(fresh, sd, imagebind_text_key_map)
    assert not report["fresh"], report["fresh"][:8]
    assert set(report["unused"]) == {
        "modality_postprocessors.text.1.log_logit_scale"}, report["unused"]

    ids = np.zeros((2, cfg.context_length), np.int64)
    ids[0, :5] = [1, 9, 17, 3, 63]   # 63 = highest id -> EOS pool position 4
    ids[1, :3] = [1, 20, 63]
    ours = enc.apply(params, jnp.asarray(ids.astype(np.int32)))
    ref = torch_text_tower(sd, ids, cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# AVID-CMA raw checkpoint (classifier pretrained init)
# ---------------------------------------------------------------------------

def test_avid_cma_checkpoint_init(tmp_path, rng):
    """Simulate AVID-CMA_Audioset_...checkpoint.pth.tar: {"model":
    {module.audio_model.* , module.video_model.*}} and verify the
    avsync_train-style init converts every encoder parameter."""
    from asva_tpu.convert import avsync_key_map
    from asva_tpu.models.avsync import AVSyncClassifier
    from asva_tpu.runtime import init_avsync_from_avid_cma

    clf = AVSyncClassifier()
    fresh = clf.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 204, 1)),
                     jnp.zeros((1, 4, 32, 32, 3)))
    paths = {".".join(str(getattr(k, "key", k)) for k in p): v.shape
             for p, v in jax.tree_util.tree_flatten_with_path(fresh)[0]}

    def inverse(s):
        s = tuple(s)
        if len(s) == 4:
            return rng.standard_normal((s[3], s[2], s[0], s[1]))
        if len(s) == 5:
            return rng.standard_normal((s[4], s[3], s[0], s[1], s[2]))
        if len(s) == 2:
            return rng.standard_normal((s[1], s[0]))
        return rng.standard_normal(s)

    raw = {}
    for p, shape in paths.items():
        key = avsync_key_map(tuple(p.split(".")))
        if key.startswith("audio_encoder."):
            raw["module.audio_model." + key[len("audio_encoder."):]] = \
                torch.from_numpy(inverse(shape).astype(np.float32))
        elif key.startswith("video_encoder."):
            raw["module.video_model." + key[len("video_encoder."):]] = \
                torch.from_numpy(inverse(shape).astype(np.float32))
        # head params have no AVID-CMA source — they stay fresh
    path = tmp_path / "AVID-CMA_checkpoint.pth.tar"
    torch.save({"model": raw}, path)

    variables, report = init_avsync_from_avid_cma(fresh, str(path))
    for p in report["fresh"]:
        assert ".head." in p or p.startswith("head."), p
    assert not report["unused"], report["unused"][:8]
