"""PyTorch checkpoint -> flax parameter conversion.

Handles every published artifact the reference consumes:
  * SD1.5 UNet 2D weights grafted into the 3D AudioUNet3D — the
    `from_pretrained_2d` semantics (reference
    avgen/models/unets/audio_cond_unet_3d_condition.py:800-838): any of our
    parameters with no matching torch key (the `_temp`/`_audio` additions)
    or a mismatched shape keeps its fresh initialization;
  * trained AVSyncD 3D UNet checkpoints (same key space plus _temp/_audio);
  * SD1.5 VAE, CLIP text encoder;
  * ImageBind audio tower (and the reference's saved audio_encoder exports);
  * AVSync classifier modules (and raw AVID-CMA init checkpoints).

Weight-layout transforms are inferred from ranks:
  conv (O,I,kh[,kw,kt]) -> (kh,kw[,kt],I,O);  linear (O,I) -> (I,O);
  1x1 conv -> Dense;  fused qkv stays [q;k;v] rows -> columns.
"""
from __future__ import annotations

import re
from typing import Callable, Dict, Optional

import jax
import numpy as np


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a .bin/.pt/.safetensors state dict into numpy (host)."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open
        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch
    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    if isinstance(state, dict) and "model" in state and all(
            hasattr(v, "numpy") for v in state["model"].values()):
        state = state["model"]
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}


def _adapt(value: np.ndarray, target_shape,
           leaf: str = "") -> Optional[np.ndarray]:
    """Re-layout a torch tensor to the flax parameter shape, or None.

    `leaf` is the flax parameter name: weight-like leaves ('kernel',
    'temp_kernel') are ALWAYS re-laid-out (square Linear kernels would
    otherwise pass the shape check untransposed); everything else
    (embeddings, norms, cls/pos tables) passes through by shape.
    """
    v = value
    ts = tuple(target_shape)
    weight_like = leaf in ("kernel", "temp_kernel")
    if not weight_like and v.shape == ts:
        return v
    if v.ndim == 4 and len(ts) == 4:          # conv2d
        v2 = v.transpose(2, 3, 1, 0)
        return v2 if v2.shape == ts else None
    if v.ndim == 5 and len(ts) == 5:          # conv3d
        v2 = v.transpose(2, 3, 4, 1, 0)
        return v2 if v2.shape == ts else None
    if v.ndim == 2 and len(ts) == 2:          # linear
        v2 = v.T
        return v2 if v2.shape == ts else None
    if v.ndim == 4 and len(ts) == 2:          # 1x1 conv -> Dense
        v2 = v[:, :, 0, 0].T
        return v2 if v2.shape == ts else None
    if v.ndim == 3 and len(ts) == 3:          # cls_token / pos_embed
        return v if v.shape == ts else None
    if v.ndim == 2 and len(ts) == 1 and v.shape[0] == 1:
        return v[0] if v[0].shape == ts else None
    if weight_like and v.shape == ts:
        return v
    return None


def convert_state_dict(fresh_params, torch_state: Dict[str, np.ndarray],
                       key_fn: Callable[[tuple], Optional[str]],
                       strict: bool = False):
    """Walk the flax tree; for each leaf pull key_fn(path) from torch_state.

    Returns (params, report) where report lists converted / kept-fresh /
    unused-torch keys.
    """
    used, fresh_kept, converted = set(), [], []

    def visit(path, leaf):
        segs = tuple(getattr(k, "key", str(k)) for k in path)
        keys = key_fn(segs)
        if isinstance(keys, str) or keys is None:
            keys = [keys] if keys else []
        for key in keys:  # first matching candidate wins
            if key in torch_state:
                adapted = _adapt(torch_state[key], leaf.shape,
                                 leaf=str(segs[-1]))
                if adapted is not None:
                    used.add(key)
                    converted.append(".".join(segs))
                    return jax.numpy.asarray(adapted, dtype=leaf.dtype)
        fresh_kept.append(".".join(segs))
        return leaf

    new_params = jax.tree_util.tree_map_with_path(visit, fresh_params)
    unused = [k for k in torch_state if k not in used]
    report = {"converted": converted, "fresh": fresh_kept, "unused": unused}
    if strict and fresh_kept:
        raise ValueError(f"missing torch keys for: {fresh_kept[:20]} ...")
    return new_params, report


# ---------------------------------------------------------------------------
# key maps
# ---------------------------------------------------------------------------

_IDX = re.compile(r"^(down_blocks|up_blocks|attentions|resnets|blocks)_(\d+)$")


def unet_key_map(segs: tuple) -> Optional[str]:
    """Our AudioUNet3D flax path -> diffusers UNet torch key."""
    out = []
    i = 0
    segs = [s for s in segs if s not in ("params", "batch_stats")]
    while i < len(segs):
        s = segs[i]
        m = _IDX.match(s)
        if m:
            name = "transformer_blocks" if m.group(1) == "blocks" else m.group(1)
            out.append(f"{name}.{m.group(2)}")
        elif s == "downsample":
            out.append("downsamplers.0")
        elif s == "upsample":
            out.append("upsamplers.0")
        elif s == "proj":        # MultiHeadProjections wrapper — transparent
            pass
        elif s == "proj_to_out":          # temporal attention out (ModuleList)
            out.append("to_out.0")
        elif s.startswith("proj_to_"):   # temporal attention projections
            out.append(s.replace("proj_", ""))
        elif s == "to_out":
            out.append("to_out.0")
        elif s == "ff":
            nxt = segs[i + 1]
            out.append("ff.net.0.proj" if nxt == "proj_in" else "ff.net.2")
            i += 2
            continue
        elif s == "conv" and i + 1 < len(segs) and segs[i + 1] in (
                "kernel", "bias"):
            pass                          # FFInflatedConv inner conv
        elif s == "temp_kernel":
            out.append("conv_temp.weight")
        elif s == "temp_bias":
            out.append("conv_temp.bias")
        elif s == "kernel" or s == "scale":
            out.append("weight")
        elif s == "bias":
            out.append("bias")
        else:
            out.append(s)
        i += 1
    return ".".join(out)


def vae_key_map(segs: tuple) -> Optional[str]:
    """Our AutoencoderKL flax path -> diffusers VAE torch key."""
    out = []
    for s in segs:
        if s in ("params", "batch_stats"):
            continue
        m = re.match(r"^(down|up)_(\d+)_resnet_(\d+)$", s)
        if m:
            out.append(f"{m.group(1)}_blocks.{m.group(2)}.resnets.{m.group(3)}")
            continue
        m = re.match(r"^down_(\d+)_downsample$", s)
        if m:
            out.append(f"down_blocks.{m.group(1)}.downsamplers.0.conv")
            continue
        m = re.match(r"^up_(\d+)_upsample$", s)
        if m:
            out.append(f"up_blocks.{m.group(1)}.upsamplers.0.conv")
            continue
        m = re.match(r"^mid_resnet_(\d+)$", s)
        if m:
            out.append(f"mid_block.resnets.{m.group(1)}")
            continue
        if s == "mid_attn":
            out.append("mid_block.attentions.0")
        elif s == "to_out":
            out.append("to_out.0")
        elif s in ("kernel", "scale"):
            out.append("weight")
        else:
            out.append(s)
    return ".".join(out)


def clip_text_key_map(segs: tuple) -> Optional[str]:
    """Our CLIPTextModel path -> HF CLIPTextModel torch key."""
    out = ["text_model"]
    for s in segs:
        if s in ("params", "batch_stats"):
            continue
        m = re.match(r"^blocks_(\d+)$", s)
        if m:
            out.append(f"encoder.layers.{m.group(1)}")
        elif s == "token_embedding":
            out.append("embeddings.token_embedding")
        elif s == "position_embedding":
            return "text_model.embeddings.position_embedding.weight"
        elif s in ("q_proj", "k_proj", "v_proj", "out_proj"):
            out.append(f"self_attn.{s}")
        elif s == "ln1":
            out.append("layer_norm1")
        elif s == "ln2":
            out.append("layer_norm2")
        elif s in ("fc1", "fc2"):
            out.append(f"mlp.{s}")
        elif s == "final_ln":
            out.append("final_layer_norm")
        elif s == "embedding":   # flax nn.Embed leaf
            out.append("weight")
        elif s in ("kernel", "scale"):
            out.append("weight")
        else:
            out.append(s)
    return ".".join(out)


def imagebind_audio_key_map(segs: tuple):
    """Our SegmaskAudioEncoder path -> torch key candidates.

    Two source key spaces are covered (first match wins):
      * the reference's audio_encoder export — ImageBindSegmaskAudioEncoder
        save_pretrained, whose submodules are named preprocessor / trunk /
        head / postprocessor / final_layer_norm
        (avgen/models/audio_encoders/segmask_imagebind.py:57-61);
      * the raw imagebind_huge.pth full-model state dict
        (modality_preprocessors.audio. / modality_trunks.audio. / ...).

    ImageBind internals: the audio stem lives under `rgbt_stem` (the
    AudioPreprocessor passes audio_stem as RGBDTPreprocessor's rgbt_stem);
    trunk blocks are BlockWithMasking with torch MultiheadAttention
    (in_proj_*, bias_k/bias_v, out_proj) and Mlp(fc1, fc2); the audio trunk
    has NO pre_transformer LayerNorm (pre_transformer_ln=False)."""
    segs = [s for s in segs if s not in ("params", "batch_stats")]
    if segs[0] == "imagebind":
        segs = segs[1:]
    leaf = {"kernel": "weight", "scale": "weight"}.get(segs[-1], segs[-1])
    body = segs[:-1]

    def both(suffix):
        """Expand an export-space key to [export, imagebind_huge] forms."""
        for pre, full in (("preprocessor.", "modality_preprocessors.audio."),
                          ("trunk.", "modality_trunks.audio."),
                          ("head.", "modality_heads.audio.")):
            if suffix.startswith(pre):
                return [suffix, full + suffix[len(pre):]]
        return [suffix]

    if segs == ["cls_token"]:
        return both("preprocessor.cls_token")
    if segs == ["pos_embed"]:
        return both("preprocessor.pos_embedding_helper.pos_embed")
    if not body:
        return None
    head0 = body[0]
    if head0 == "stem_proj":
        return (both(f"preprocessor.rgbt_stem.proj.0.{leaf}")
                + both(f"preprocessor.audio_stem.proj.0.{leaf}"))
    if head0 == "stem_norm":
        return (both(f"preprocessor.rgbt_stem.norm_layer.{leaf}")
                + both(f"preprocessor.audio_stem.norm_layer.{leaf}"))
    m = re.match(r"^blocks_(\d+)$", head0)
    if m:
        i = m.group(1)
        sub = segs[1]
        if sub == "qkv":
            return both(f"trunk.blocks.{i}.attn.in_proj_{leaf}")
        if sub in ("bias_k", "bias_v"):
            return both(f"trunk.blocks.{i}.attn.{sub}")
        table = {"norm1": "norm_1", "norm2": "norm_2",
                 "out_proj": "attn.out_proj", "fc1": "mlp.fc1",
                 "fc2": "mlp.fc2"}
        if sub in table:
            return both(f"trunk.blocks.{i}.{table[sub]}.{leaf}")
    if head0 == "head_norm":
        return both(f"head.0.{leaf}")
    if head0 == "head_proj":
        return both(f"head.2.{leaf}")
    if head0 == "final_layer_norm":
        return f"final_layer_norm.{leaf}"
    return None


def i3d_key_map(segs: tuple):
    """Our InceptionI3D path -> candidate keys of the public pytorch-i3d /
    stylegan-v torchscript state dicts (branch names b0/b1a/b1b/b2a/b2b/b3b,
    Unit3D children conv3d + bn)."""
    segs = [s for s in segs if s not in ("params", "batch_stats")]
    leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var"}
    leaf = leaf_map.get(segs[-1], segs[-1])
    body = ".".join(segs[:-1])
    return [f"{body}.{leaf}",
            f"{body.replace('.bn', '.batch3d')}.{leaf}",
            f"{body.replace('.b3b', '.b3.1').replace('.b1a', '.b1.0').replace('.b1b', '.b1.1').replace('.b2a', '.b2.0').replace('.b2b', '.b2.1')}.{leaf}"]


def inception_v3_key_map(segs: tuple) -> Optional[str]:
    """Our InceptionV3FID path -> pytorch-fid / torchvision inception keys
    (BasicConv2d children conv + bn)."""
    segs = [s for s in segs if s not in ("params", "batch_stats")]
    leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var"}
    leaf = leaf_map.get(segs[-1], segs[-1])
    return ".".join(segs[:-1] + [leaf])


def _imagebind_trunk_keys(modality: str, body, leaf):
    m = re.match(r"^blocks_(\d+)$", body[0])
    if not m:
        return None
    i = m.group(1)
    sub = body[1]
    base = f"modality_trunks.{modality}.blocks.{i}"
    if sub == "qkv":
        return [f"{base}.attn.in_proj_{leaf}"]
    table = {"norm1": "norm_1", "norm2": "norm_2",
             "out_proj": "attn.out_proj", "fc1": "mlp.fc1",
             "fc2": "mlp.fc2"}
    if sub in table:
        return [f"{base}.{table[sub]}.{leaf}"]
    return None


def imagebind_vision_key_map(segs: tuple):
    """Our ImageBindVisionEncoder path -> imagebind_huge.pth key candidates."""
    segs = [s for s in segs if s not in ("params", "batch_stats")]
    leaf = {"kernel": "weight", "scale": "weight"}.get(segs[-1], segs[-1])
    body = segs[:-1]
    pre = "modality_preprocessors.vision"
    if segs == ["cls_token"]:
        return [f"{pre}.cls_token"]
    if segs == ["pos_embed"]:
        return [f"{pre}.pos_embedding_helper.pos_embed"]
    if body and body[0] == "stem_proj":
        return [f"{pre}.rgbt_stem.proj.1.{leaf}",
                f"{pre}.rgbt_stem.proj.0.{leaf}"]
    if body and body[0] == "pre_norm":
        return [f"modality_trunks.vision.pre_transformer_layer.0.{leaf}"]
    if body and body[0] == "head_norm":
        return [f"modality_heads.vision.0.{leaf}"]
    if body and body[0] == "head_proj":
        return [f"modality_heads.vision.2.{leaf}"]
    if body:
        return _imagebind_trunk_keys("vision", body, leaf)
    return None


def imagebind_text_key_map(segs: tuple):
    """Our ImageBindTextEncoder path -> imagebind_huge.pth key candidates."""
    segs = [s for s in segs if s not in ("params", "batch_stats")]
    leaf = {"kernel": "weight", "scale": "weight",
            "embedding": "weight"}.get(segs[-1], segs[-1])
    body = segs[:-1]
    pre = "modality_preprocessors.text"
    if body and body[0] == "token_embedding":
        return [f"{pre}.token_embedding.{leaf}"]
    if segs == ["pos_embed"]:
        return [f"{pre}.pos_embed"]
    if body and body[0] == "final_ln":
        return [f"modality_heads.text.proj.0.{leaf}",
                f"modality_trunks.text.post_transformer_layer.0.{leaf}"]
    if body and body[0] == "text_proj":
        return [f"modality_heads.text.proj.1.{leaf}"]
    if body:
        return _imagebind_trunk_keys("text", body, leaf)
    return None


def avsync_key_map(segs: tuple) -> Optional[str]:
    """Our AVSyncClassifier path -> reference avsync module keys.

    Works for both the reference's per-module exports (audio_encoder/,
    video_encoder/, head/) and raw AVID-CMA checkpoints once their
    module.{audio,video}_model. prefixes are stripped by the caller.
    """
    segs = [s for s in segs if s not in ("params", "batch_stats")]
    leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var"}
    leaf = leaf_map.get(segs[-1], segs[-1])
    body, out = segs[:-1], []
    for s in body:
        if s == "audio_encoder":
            out.append("audio_encoder")
        elif s == "video_encoder":
            out.append("video_encoder")
        elif s == "head":
            out.append("head")
        elif s == "stem_conv":
            out.append("conv1.0")
        elif s == "stem_bn":
            out.append("conv1.1")
        elif re.match(r"^block\d$", s):
            out.append(s)
        elif re.match(r"^stage(\d)_block(\d)$", s):
            m = re.match(r"^stage(\d)_block(\d)$", s)
            out.append(f"conv{m.group(1)}x.{m.group(2)}")
        elif s in ("fc1", "fc2", "fc3"):
            out.append({"fc1": "fc.0", "fc2": "fc.3", "fc3": "fc.6"}[s])
        else:
            out.append(s)
    return ".".join(out + [leaf])
