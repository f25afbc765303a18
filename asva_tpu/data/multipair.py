"""Multi-clip aligned AV dataset for sync-classifier training/eval.

Mirrors the reference AudioVideoAlignedMultiPairDataset (avsync/data.py:
78-257): per video, k clip start times separated by shift_time via one of
four samplers (uniform / random-compact / center-compact / random); the
spanned frame range is decoded ONCE and frames are assigned to clips by
nearest-pts; each clip is independently randomly flipped; k waveform clips
come from one audio pass.  Decode failures skip to the next index.

Differences: C++ libav decode, channels-last, CLIP-normalized frames
computed here (the classifier consumes them directly), and raw 16 kHz
waveforms returned for on-device mel.
"""
from __future__ import annotations

import os.path as osp
import random
from typing import Optional

import numpy as np

from ..ops.resample import resample
from .media import MediaReader
from .transforms import CLIP_MEAN, CLIP_STD
from ..ops.resize import resize_image

CLIP_SAMPLE_RATE = 16000


def uniform_sample(start, end, num):
    return np.linspace(start, end, num, endpoint=True)


def random_compact_sample(rng, start, end, num, gap):
    assert (num - 1) * gap <= end - start
    first = rng.uniform(start, end - (num - 1) * gap)
    return np.arange(num) * gap + first


def center_compact_sample(start, end, num, gap):
    assert (num - 1) * gap <= end - start
    first = start + (end - start - (num - 1) * gap) / 2.0
    return np.arange(num) * gap + first


def random_sample(rng, start, end, num, gap):
    assert (num - 1) * gap <= end - start
    out = []
    while num:
        v = rng.uniform(start, end - (num - 1) * gap)
        out.append(v)
        start = v + gap
        num -= 1
    return np.array(out)


class MultiPairAVDataset:
    def __init__(
        self,
        example_list_path: str,
        data_root: str,
        mode: str = "test",
        image_size: int = 224,
        video_fps: int = 6,
        video_num_frames: int = 12,
        randflip: bool = True,
        shift_time: float = 0.2,
        num_clips: int = 21,
        sampling_type: str = "random-compact",
        seed: Optional[int] = None,
    ):
        assert sampling_type in ("random-compact", "center-compact",
                                 "random", "uniform")
        with open(example_list_path) as f:
            self.examples = [line.strip() for line in f if line.strip()]
        self.data_root = data_root
        self.mode = mode
        self.image_size = image_size
        self.video_fps = video_fps
        self.video_num_frames = video_num_frames
        self.clip_duration = video_num_frames / video_fps
        self.randflip = randflip
        self.shift_time = shift_time
        self.num_clips = num_clips
        self.sampling_type = sampling_type
        # deterministic pipeline: clip starts/flips derive from
        # (seed, epoch, index), independent of worker-thread interleaving
        self.seed = 0 if seed is None else seed
        self.epoch = 0

    def __len__(self):
        return len(self.examples)

    def set_epoch(self, epoch: int) -> None:
        """Advance the per-epoch RNG stream (called by DataLoader)."""
        self.epoch = epoch

    def _item_rng(self, index: int) -> random.Random:
        return random.Random(
            (self.seed * 1_000_003 + self.epoch) * 1_000_003 + index)

    def _clip_preprocess(self, frames: np.ndarray) -> np.ndarray:
        """uint8 (n, h, w, 3) -> CLIP-normalized square (n, s, s, 3)."""
        x = frames.astype(np.float32) / 255.0
        h, w = x.shape[1:3]
        s = self.image_size
        # torchvision Resize(int) + CenterCrop(int): short side -> s
        if h <= w:
            rh, rw = s, max(s, int(round(w * s / h)))
        else:
            rh, rw = max(s, int(round(h * s / w))), s
        x = np.asarray(resize_image(x, rh, rw, "bicubic", antialias=True))
        y0, x0 = (rh - s) // 2, (rw - s) // 2
        x = np.ascontiguousarray(x[:, y0:y0 + s, x0:x0 + s])
        x -= CLIP_MEAN
        x /= CLIP_STD
        return x

    def __getitem__(self, index) -> dict:
        for attempt in range(len(self.examples)):
            try:
                return self._load(index)
            except Exception:
                index = (index + 1) % len(self.examples)
        raise RuntimeError("no decodable example found")

    def _load(self, index) -> dict:
        path = osp.join(self.data_root, self.examples[index])
        rng = self._item_rng(index)
        k, f = self.num_clips, self.video_num_frames
        with MediaReader(path) as r:
            av_duration = min(r.video_duration, r.audio_duration)
            shift_total = (k - 1) * self.shift_time
            assert av_duration >= self.clip_duration + shift_total, path

            lo, hi = 0.0, av_duration - self.clip_duration
            if self.sampling_type == "random-compact":
                starts = random_compact_sample(rng, lo, hi, k,
                                               self.shift_time)
            elif self.sampling_type == "center-compact":
                starts = center_compact_sample(lo, hi, k, self.shift_time)
            elif self.sampling_type == "random":
                starts = random_sample(rng, lo, hi, k, self.shift_time)
            else:
                starts = uniform_sample(lo, hi, k)

            # frame target times per clip (k, f)
            frame_secs = starts[:, None] + np.arange(f)[None, :] / self.video_fps

            # decode the whole spanned range once at source fps
            span_start = float(frame_secs[0, 0])
            span_end = float(frame_secs[-1, -1])
            src_fps = max(r.video_fps, 1.0)
            n_src = int(np.ceil((span_end - span_start) * src_fps)) + 2
            all_frames = r.read_video_clip(span_start, span_end - span_start,
                                           src_fps, n_src)
            src_secs = span_start + np.arange(n_src) / src_fps

            # assign nearest decoded frame to each clip frame
            idx = np.abs(frame_secs[:, :, None]
                         - src_secs[None, None, :]).argmin(axis=2)
            # shifted clips share most source frames (adjacent clips
            # overlap by ~f-shift*fps frames): preprocess each unique
            # decoded frame ONCE, then gather into the (k, f) layout
            uniq, inv = np.unique(idx.reshape(-1), return_inverse=True)
            videos = self._clip_preprocess(all_frames[uniq])[inv].reshape(
                (k, f, self.image_size, self.image_size, 3))
            if self.randflip:
                for i in range(k):
                    if rng.randint(0, 1):
                        videos[i] = videos[i, :, :, ::-1]

            # audio: one pass, slice per clip
            sr = r.audio_sample_rate
            wav = r.read_audio(span_start,
                               span_end - span_start + 1.0 / self.video_fps)
        # channel 0 mono (fixed batch shapes; mel-equivalent to the
        # reference's all-channel mean-centre — fbank removes per-frame DC)
        wav16 = resample(wav, sr, CLIP_SAMPLE_RATE)[0]
        target = int(self.clip_duration * CLIP_SAMPLE_RATE)
        clips = np.zeros((k, target), np.float32)
        for i in range(k):
            off = int(round((starts[i] - span_start) * CLIP_SAMPLE_RATE))
            seg = wav16[max(off, 0):off + target]
            clips[i, :len(seg)] = seg

        return {"index": index,
                "videos": videos.astype(np.float32, copy=False),
                "waveforms": clips}
