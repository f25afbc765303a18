"""Clip generation helpers (reference generate_videos /
generate_videos_for_dataset, pipeline_audio_cond_animation.py:378-551).

Loads conditioning media through the C++ layer, runs the jitted pipeline per
clip with a per-clip re-seeded RNG (reference :432-433), and writes
mp4+AAC outputs.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.media import MediaReader, write_video
from ..data.transforms import sd_video_transform
from ..ops.mel import waveform_to_mel
from ..ops.resample import resample


def load_image(path: str, image_size=(256, 256)) -> np.ndarray:
    """(h, w, 3) float32 in [0,1], SD-transformed."""
    from PIL import Image
    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return np.asarray(sd_video_transform(img[None], image_size,
                                         normalize=False))[0]


def load_audio_clips_uniformly(path: str, clip_duration: float,
                               num_clips: int) -> list:
    """List of (c, T) float32 16 kHz waveforms from a wav/mp4.

    Channels are kept: the mel frontend mean-centres over ALL channels
    before taking channel 0 (waveform2melspec semantics, ops/mel.py) —
    pre-slicing stereo here would change the mel."""
    if path.endswith(".wav"):
        from scipy.io import wavfile
        sr, data = wavfile.read(path)
        if data.dtype.kind == "i":
            data = data.astype(np.float32) / np.iinfo(data.dtype).max
        elif data.dtype.kind == "u":
            data = (data.astype(np.float32) - 128.0) / 128.0
        wav = data.T if data.ndim == 2 else data[None]
        duration = wav.shape[-1] / sr
    else:
        with MediaReader(path) as r:
            sr = r.audio_sample_rate
            duration = r.audio_duration
            wav = r.read_audio(0.0, duration)
    wav16 = resample(np.asarray(wav, np.float32), sr, 16000)
    if num_clips == 1:
        starts = np.array([(duration - clip_duration) / 2.0])
    else:
        starts = np.linspace(0.0, duration - clip_duration, num_clips)
    out = []
    n = int(clip_duration * 16000)
    for s in starts:
        i0 = max(int(s * 16000), 0)
        seg = wav16[:, i0:i0 + n]
        if seg.shape[-1] < n:
            seg = np.pad(seg, ((0, 0), (0, n - seg.shape[-1])))
        out.append(seg)
    return out


def load_av_clips_uniformly(path: str, video_fps: int, video_num_frame: int,
                            image_size, num_clips: int):
    """videos (k, f, h, w, 3) in [0,1] + waveforms list (k,) of (c, T)."""
    clip_duration = video_num_frame / video_fps
    with MediaReader(path) as r:
        av_duration = min(r.video_duration, r.audio_duration)
        if num_clips == 1:
            starts = np.array([(av_duration - clip_duration) / 2.0])
        else:
            starts = np.linspace(0.0, av_duration - clip_duration, num_clips)
        videos, waves = [], []
        sr = r.audio_sample_rate
        n = int(clip_duration * 16000)
        for s in starts:
            frames = r.read_video_clip(max(s, 0.0), clip_duration, video_fps,
                                       video_num_frame)
            videos.append(np.asarray(sd_video_transform(
                frames.astype(np.float32) / 255.0, image_size,
                normalize=False)))
            w = resample(r.read_audio(max(s, 0.0), clip_duration), sr,
                         16000)
            if w.shape[-1] < n:
                w = np.pad(w, ((0, 0), (0, n - w.shape[-1])))
            waves.append(w[:, :n])
    return np.stack(videos), waves


def generate_videos(
    pipeline,
    image_path: str = "",
    audio_path: str = "",
    video_path: str = "",
    category_text_encoding: Optional[np.ndarray] = None,
    image_size: Tuple[int, int] = (256, 256),
    video_fps: int = 6,
    video_num_frame: int = 12,
    num_clips_per_video: int = 3,
    audio_guidance_scale: float = 4.0,
    text_guidance_scale: float = 1.0,
    num_inference_steps: int = 50,
    seed: int = 0,
    save_template: str = "",
    sampler: str = "plms",
    batch_clips: bool = True,
):
    """batch_clips=True generates all clips of a video in ONE pipeline call
    (broadcast_rng makes this bit-identical to the reference's per-clip
    re-seeded loop) — the TPU-efficient default for dataset sweeps."""
    assert not (image_path and audio_path and video_path), \
        "specify at most two of image/audio/video paths"
    clip_duration = video_num_frame / video_fps

    images = audios = None
    if image_path:
        images = [load_image(image_path, image_size)] * num_clips_per_video
    if audio_path:
        audios = load_audio_clips_uniformly(audio_path, clip_duration,
                                            num_clips_per_video)
    if video_path:
        vids, waves = load_av_clips_uniformly(video_path, video_fps,
                                              video_num_frame, image_size,
                                              num_clips_per_video)
        if images is None:
            images = [v[0] for v in vids]
        if audios is None:
            audios = waves

    if category_text_encoding is None:
        # the reference encodes the category (or empty) string with its
        # CLIP text encoder here; a zeros context silently changes the
        # conditioning, so shout — callers with a text encoder should
        # encode and pass category_text_encoding explicitly
        import logging
        logging.getLogger(__name__).warning(
            "generate_videos: no category_text_encoding given — using a "
            "ZEROS text context (reference would CLIP-encode the category "
            "string; outputs will differ from reference numerics)")
        text_enc = jnp.zeros((1, 77, 768))
    else:
        text_enc = jnp.asarray(category_text_encoding,
                               jnp.float32).reshape(1, 77, 768)

    def emit(k, video, audio):
        frames = np.asarray(
            jnp.clip(video * 255.0, 0, 255).astype(jnp.uint8))
        if save_template:
            path = f"{save_template}_clip-{k:02d}.mp4"
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            a = np.asarray(audio)
            write_video(path, frames, video_fps,
                        a if a.ndim == 2 else a[None], 16000)
            return None
        return (frames, audio)

    results = []
    if batch_clips:
        mels = jnp.stack([waveform_to_mel(jnp.asarray(a)) for a in audios])
        videos = pipeline(
            jnp.stack([jnp.asarray(im) for im in images]), mels,
            jnp.broadcast_to(text_enc, (len(images),) + text_enc.shape[1:]),
            video_length=video_num_frame,
            num_inference_steps=num_inference_steps,
            audio_guidance_scale=audio_guidance_scale,
            text_guidance_scale=text_guidance_scale,
            sampler=sampler, rng=jax.random.PRNGKey(seed),
            broadcast_rng=True)
        for k, audio in enumerate(audios):
            results.append(emit(k, videos[k], audio))
    else:
        for k, (image, audio) in enumerate(zip(images, audios)):
            mel = waveform_to_mel(jnp.asarray(audio))[None]
            video = pipeline(
                jnp.asarray(image)[None], mel, text_enc,
                video_length=video_num_frame,
                num_inference_steps=num_inference_steps,
                audio_guidance_scale=audio_guidance_scale,
                text_guidance_scale=text_guidance_scale,
                sampler=sampler,
                rng=jax.random.PRNGKey(seed))[0]  # (f, h, w, 3) [0,1]
            results.append(emit(k, video, audio))
    results = [r for r in results if r is not None]
    return results or None
