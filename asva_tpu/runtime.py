"""Model construction + checkpoint loading glue for the CLI scripts.

Builders create the full-size flax models and, when torch artifacts are
available (SD1.5 exports, trained AVSyncD checkpoints, AVID-CMA / classifier
modules), convert them via asva_tpu.convert; otherwise parameters stay
freshly initialized and a warning is logged (this sandbox ships no
pretrained weights, but the load paths mirror the reference layout:
  pretrained/stable-diffusion-v1-5/{vae,unet,text_encoder}/
  <exp>/ckpts/checkpoint-<step>/modules/{unet,audio_encoder}/
  checkpoints/avsync/.../modules/{audio_encoder,video_encoder,head}/ ).
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .convert import (avsync_key_map, clip_text_key_map, convert_state_dict,
                      imagebind_audio_key_map, load_torch_state, unet_key_map,
                      vae_key_map)
from .diffusion.schedules import DiffusionSchedule
from .models.clip_text import CLIPTextConfig, CLIPTextModel
from .models.imagebind_audio import ImageBindAudioConfig, SegmaskAudioEncoder
from .models.avsync import AVSyncClassifier
from .models.unet3d import AudioUNet3D, UNet3DConfig
from .models.vae import AutoencoderKL, VAEConfig
from .pipelines.animation import AnimationPipeline

log = logging.getLogger("asva_tpu")


def _find_weights(dirpath: str):
    for name in ("diffusion_pytorch_model.safetensors",
                 "diffusion_pytorch_model.bin", "pytorch_model.safetensors",
                 "pytorch_model.bin", "model.safetensors"):
        p = os.path.join(dirpath, name)
        if os.path.isfile(p):
            return p
    return None


def _init_params(model, *example_args, seed: int = 0):
    # jit the whole init: one compiled program instead of thousands of
    # individually dispatched init ops (critical on remote-tunnel devices)
    return jax.jit(lambda: model.init(jax.random.PRNGKey(seed),
                                      *example_args))()


def _is_orbax_dir(d: str) -> bool:
    if not os.path.isdir(d):
        return False
    names = set(os.listdir(d))
    return bool(names & {"_METADATA", "manifest.ocdbt", "_CHECKPOINT_METADATA",
                         "d", "ocdbt.process_0"})


def _maybe_convert(params, weights_dir: Optional[str], key_map, label: str):
    """Load parameters from either a torch export (converted) or one of our
    own orbax module exports (checkpoint-N/modules/<name>)."""
    if not weights_dir:
        return params
    if _is_orbax_dir(weights_dir):
        import orbax.checkpoint as ocp
        params = ocp.StandardCheckpointer().restore(weights_dir,
                                                    target=params)
        log.info("%s: restored orbax module from %s", label, weights_dir)
        return params
    path = _find_weights(weights_dir) if os.path.isdir(weights_dir) \
        else (weights_dir if os.path.isfile(weights_dir) else None)
    if path is None:
        log.warning("%s: no torch weights under %s — using fresh init",
                    label, weights_dir)
        return params
    state = load_torch_state(path)
    params, report = convert_state_dict(params, state, key_map)
    log.info("%s: converted %d tensors (%d fresh, %d unused) from %s",
             label, len(report["converted"]), len(report["fresh"]),
             len(report["unused"]), path)
    return params


def build_unet(config: UNet3DConfig = UNet3DConfig(),
               dtype=jnp.bfloat16, weights_dir: Optional[str] = None,
               video_length: int = 12, seed: int = 0):
    """weights_dir may hold a trained 3D checkpoint OR 2D SD1.5 weights —
    `from_pretrained_2d` graft semantics fall out of the converter (missing
    _temp/_audio keys keep their fresh/zero init)."""
    model = AudioUNet3D(config, dtype=dtype)
    f = video_length
    params = _init_params(
        model, jnp.zeros((1, f, 8, 8, config.in_channels)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768)),
        jnp.zeros((1, 229, config.audio_cross_attention_dim)),
        jnp.ones((1, f, 229), bool), seed=seed)
    return model, _maybe_convert(params, weights_dir, unet_key_map, "unet")


def build_vae(dtype=jnp.bfloat16, weights_dir: Optional[str] = None):
    model = AutoencoderKL(VAEConfig(), dtype=dtype)
    params = _init_params(model, jnp.zeros((1, 32, 32, 3)),
                          jax.random.PRNGKey(0))
    return model, _maybe_convert(params, weights_dir, vae_key_map, "vae")


def build_audio_encoder(n_segment: int = 12, dtype=jnp.bfloat16,
                        weights_dir: Optional[str] = None,
                        config: Optional[ImageBindAudioConfig] = None):
    model = SegmaskAudioEncoder(config or ImageBindAudioConfig(),
                                n_segment=n_segment, dtype=dtype)
    params = _init_params(model, jnp.zeros((1, 128, 204, 1)))
    return model, _maybe_convert(params, weights_dir, imagebind_audio_key_map,
                                 "audio_encoder")


def build_text_encoder(dtype=jnp.bfloat16, weights_dir: Optional[str] = None):
    model = CLIPTextModel(CLIPTextConfig(), dtype=dtype)
    params = _init_params(model, jnp.zeros((1, 77), jnp.int32))
    return model, _maybe_convert(params, weights_dir, clip_text_key_map,
                                 "text_encoder")


def build_avsync_classifier(weights_dirs: Optional[dict] = None,
                            dtype=jnp.float32):
    """weights_dirs: {'audio_encoder': dir, 'video_encoder': dir,
    'head': dir} (the reference's per-module exports)."""
    model = AVSyncClassifier(dtype=dtype)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 204, 1)),
        jnp.zeros((1, 12, 224, 224, 3))))()
    if isinstance(weights_dirs, str):
        # our own orbax classifier export (checkpoint-N/modules/classifier)
        if _is_orbax_dir(weights_dirs):
            import orbax.checkpoint as ocp
            variables = ocp.StandardCheckpointer().restore(
                weights_dirs, target=dict(variables))
            log.info("avsync: restored orbax classifier from %s",
                     weights_dirs)
            return model, variables
        weights_dirs = {m: os.path.join(weights_dirs, m)
                        for m in ("audio_encoder", "video_encoder", "head")}
    if weights_dirs:
        merged = {}
        for mod, d in weights_dirs.items():
            path = _find_weights(d) if os.path.isdir(d) else d
            if path and os.path.isfile(path):
                for k, v in load_torch_state(path).items():
                    merged[f"{mod}.{k}"] = v
            else:
                log.warning(
                    "avsync: no weights found for module %r under %s — "
                    "that module keeps RANDOM init (scores meaningless "
                    "for metrics)", mod, d)
        if merged:
            variables, report = convert_state_dict(variables, merged,
                                                   avsync_key_map)
            log.info("avsync: converted %d tensors (%d fresh)",
                     len(report["converted"]), len(report["fresh"]))
        else:
            log.warning("avsync: NO weights loaded from %s — classifier "
                        "runs with fully random init", weights_dirs)
    return model, variables


def init_avsync_from_avid_cma(variables, path: str,
                              modules=("audio", "video")):
    """Initialize the classifier's encoders from a raw AVID-CMA checkpoint.

    The reference loads the tar's ["model"] dict and strips the DDP
    module.{audio,video}_model. prefixes before load_state_dict
    (avsync/models/audio.py:63-71, video.py:84-91).  `modules` selects
    which encoders to initialize (the YAML has a per-encoder pretrained
    flag).  Head params have no AVID-CMA source and stay fresh.
    Returns (variables, report)."""
    state = load_torch_state(path)
    renamed = {}
    for k, v in state.items():
        if "audio" in modules and k.startswith("module.audio_model."):
            renamed["audio_encoder." + k[len("module.audio_model."):]] = v
        elif "video" in modules and k.startswith("module.video_model."):
            renamed["video_encoder." + k[len("module.video_model."):]] = v
    variables, report = convert_state_dict(variables, renamed, avsync_key_map)
    log.info("avsync: AVID-CMA init converted %d tensors (%d fresh, "
             "%d unused) from %s", len(report["converted"]),
             len(report["fresh"]), len(report["unused"]), path)
    return variables, report


def build_i3d_classifier(num_classes: int = 400,
                         weights_path: Optional[str] = None,
                         bn_eps: float = 1e-5):
    """The classifier-head I3D variant (reference
    avgen/evaluations/models/download.py:58-70 load_i3d_pretrained_classifier
    + pytorch_i3d.py:351 InceptionI3d_Classifier): same Inception-v1 I3D
    trunk as the FVD feature net, loaded from a raw `i3d_pretrained_400.pt`
    state dict; when num_classes != 400 the 400-way logits head is dropped
    and stays freshly initialized (the reference pops logits.conv3d.* and
    loads non-strict).  Returns (model, variables, report|None)."""
    from .convert import i3d_key_map
    from .models.evalnets import InceptionI3D

    model = InceptionI3D(num_classes=num_classes, bn_eps=bn_eps)
    variables = _init_params(model, jnp.zeros((1, 12, 224, 224, 3)))
    report = None
    if weights_path and os.path.isfile(weights_path):
        state = load_torch_state(weights_path)
        if num_classes != 400:
            state.pop("logits.conv3d.weight", None)
            state.pop("logits.conv3d.bias", None)
        variables, report = convert_state_dict(dict(variables), state,
                                               i3d_key_map)
        log.info("i3d_classifier: converted %d tensors (%d fresh, "
                 "%d unused) from %s", len(report["converted"]),
                 len(report["fresh"]), len(report["unused"]), weights_path)
    elif weights_path:
        log.warning("i3d_classifier: %s missing — random init", weights_path)
    return model, variables, report


def load_null_text_encoding(path: Optional[str]):
    if path and not os.path.isfile(path):
        # tools/make_null_text_encoding.py writes .npy while the reference
        # artifact is .pt — accept either spelling of the same path
        for alt in (path[:-3] + ".npy" if path.endswith(".pt") else None,
                    path[:-4] + ".pt" if path.endswith(".npy") else None):
            if alt and os.path.isfile(alt):
                path = alt
                break
    if path and os.path.isfile(path):
        if path.endswith(".npy"):
            return jnp.asarray(np.load(path)).reshape(1, 77, 768)
        import torch
        enc = torch.load(path, map_location="cpu", weights_only=True)
        return jnp.asarray(enc.float().numpy()).reshape(1, 77, 768)
    return None


def _config_from_dict(cls, d: dict):
    """Rebuild a config dataclass from a modules_config.json dict:
    unknown keys are dropped (forward compat), lists become tuples."""
    import dataclasses
    fields = {f.name for f in dataclasses.fields(cls)}
    kw = {k: tuple(v) if isinstance(v, list) else v
          for k, v in d.items() if k in fields}
    return cls(**kw)


def load_module_configs(checkpoint_modules_dir: Optional[str]):
    """Read checkpoint-N/modules_config.json (written by CheckpointManager
    next to the module exports — the analogue of the reference's HF
    save_pretrained config.json) if present; returns dict or None."""
    if not checkpoint_modules_dir:
        return None
    path = os.path.join(os.path.dirname(
        os.path.abspath(checkpoint_modules_dir)), "modules_config.json")
    if not os.path.isfile(path):
        return None
    import json
    with open(path) as f:
        return json.load(f)


def load_animation_pipeline(
    checkpoint_modules_dir: Optional[str] = None,   # .../checkpoint-N/modules
    sd_root: Optional[str] = "pretrained/stable-diffusion-v1-5",
    null_text_encoding_path: Optional[str] =
        "pretrained/openai-clip-l_null_text_encoding.pt",
    n_segment: int = 12,
    dtype=jnp.bfloat16,
    param_dtype=jnp.bfloat16,   # inference weights; None keeps fp32
    unet_config: Optional[UNet3DConfig] = None,
) -> AnimationPipeline:
    """unet_config=None: use the architecture recorded in the checkpoint's
    modules_config.json when present (self-describing exports, mirroring
    the reference's from_pretrained config.json semantics), else the
    full-size default."""
    unet_dir = (os.path.join(checkpoint_modules_dir, "unet")
                if checkpoint_modules_dir else
                (os.path.join(sd_root, "unet") if sd_root else None))
    audio_dir = (os.path.join(checkpoint_modules_dir, "audio_encoder")
                 if checkpoint_modules_dir else None)
    vae_dir = os.path.join(sd_root, "vae") if sd_root else None

    mod_cfgs = load_module_configs(checkpoint_modules_dir) or {}
    audio_config = None
    if unet_config is None and "unet" in mod_cfgs:
        unet_config = _config_from_dict(UNet3DConfig, mod_cfgs["unet"])
        log.info("unet: architecture from modules_config.json")
    if "audio_encoder" in mod_cfgs:
        audio_config = _config_from_dict(ImageBindAudioConfig,
                                         mod_cfgs["audio_encoder"])
        log.info("audio_encoder: architecture from modules_config.json")
    if unet_config is None:
        unet_config = UNet3DConfig()

    unet, unet_params = build_unet(unet_config, dtype, unet_dir,
                                   video_length=n_segment)
    vae, vae_params = build_vae(dtype, vae_dir)
    audio_enc, audio_params = build_audio_encoder(n_segment, dtype, audio_dir,
                                                  config=audio_config)
    if param_dtype is not None:
        from .utils import cast_floating
        unet_params, vae_params, audio_params = (
            cast_floating(t, param_dtype)
            for t in (unet_params, vae_params, audio_params))
    return AnimationPipeline(
        unet=unet, vae=vae, audio_encoder=audio_enc,
        unet_params=unet_params, vae_params=vae_params,
        audio_encoder_params=audio_params,
        schedule=DiffusionSchedule(),
        null_text_encoding=load_null_text_encoding(null_text_encoding_path))
