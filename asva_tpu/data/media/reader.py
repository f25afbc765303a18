"""ctypes binding for the C++ media layer (libasva_media.so).

Replaces torchvision's `video_reader` backend + torchaudio load/resample +
torchvision.io.write_video in the reference data path.  The shared library
is built with `make -C asva_tpu/data/media`; `media_available()` gates
callers so pure-compute tests run without it.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libasva_media.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src_dir = os.path.dirname(__file__)
        try:
            subprocess.run(["make", "-C", src_dir], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.mr_open.restype = ctypes.c_void_p
    lib.mr_open.argtypes = [ctypes.c_char_p]
    lib.mr_close.argtypes = [ctypes.c_void_p]
    for name in ("mr_width", "mr_height", "mr_audio_sample_rate",
                 "mr_audio_channels"):
        getattr(lib, name).restype = ctypes.c_int
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    for name in ("mr_video_fps", "mr_video_duration", "mr_audio_duration"):
        getattr(lib, name).restype = ctypes.c_double
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.mr_read_video_clip.restype = ctypes.c_int
    lib.mr_read_video_clip.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte)]
    lib.mr_read_audio.restype = ctypes.c_long
    lib.mr_read_audio.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    lib.mw_write_video.restype = ctypes.c_int
    lib.mw_write_video.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
        ctypes.c_int]
    _lib = lib
    return lib


def media_available() -> bool:
    return _load() is not None


class MediaReader:
    """Video/audio clip reader with the reference's pts-sampling semantics."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("libasva_media.so unavailable; "
                               "run make -C asva_tpu/data/media")
        self._lib = lib
        self._h = lib.mr_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open {path}")
        self.path = path

    def close(self):
        if self._h:
            self._lib.mr_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    # -- metadata --
    @property
    def video_duration(self) -> float:
        return self._lib.mr_video_duration(self._h)

    @property
    def video_fps(self) -> float:
        return self._lib.mr_video_fps(self._h)

    @property
    def size(self) -> Tuple[int, int]:
        return (self._lib.mr_height(self._h), self._lib.mr_width(self._h))

    @property
    def audio_duration(self) -> float:
        return self._lib.mr_audio_duration(self._h)

    @property
    def audio_sample_rate(self) -> int:
        return self._lib.mr_audio_sample_rate(self._h)

    @property
    def audio_channels(self) -> int:
        return self._lib.mr_audio_channels(self._h)

    # -- decode --
    def read_video_clip(self, start: float, duration: float, fps: float,
                        num_frames: int) -> np.ndarray:
        """(num_frames, H, W, 3) uint8; short reads padded with last frame
        (reference avgen/data/utils.py:219-222)."""
        h, w = self.size
        out = np.empty((num_frames, h, w, 3), np.uint8)
        got = self._lib.mr_read_video_clip(
            self._h, float(start), float(duration), float(fps),
            int(num_frames),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        if got <= 0:
            raise IOError(f"video decode failed for {self.path} @ {start}s")
        if got < num_frames:
            out[got:] = out[got - 1:got]
        return out

    def read_audio(self, start: float, duration: float) -> np.ndarray:
        """(channels, T) float32 at native sample rate."""
        sr = self.audio_sample_rate
        ch = self.audio_channels
        if sr <= 0 or ch <= 0:
            raise IOError(f"no audio stream in {self.path}")
        max_samples = int((duration + 1.0) * sr)
        buf = np.empty((max_samples, ch), np.float32)
        got = self._lib.mr_read_audio(
            self._h, float(start), float(duration),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_samples)
        if got <= 0:
            raise IOError(f"audio decode failed for {self.path} @ {start}s")
        return np.ascontiguousarray(buf[:got].T)


def write_video(path: str, frames: np.ndarray, fps: float,
                audio: Optional[np.ndarray] = None,
                audio_sr: int = 16000) -> None:
    """frames (n, h, w, 3) uint8 RGB; audio (c, T) float32 -> mp4 (+AAC)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libasva_media.so unavailable")
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, _ = frames.shape
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if audio is not None:
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None]
        inter = np.ascontiguousarray(audio.T)  # (T, c) interleaved
        aptr = inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        asamp, ach = inter.shape[0], inter.shape[1]
    else:
        aptr, asamp, ach = None, 0, 0
    rc = lib.mw_write_video(
        path.encode(), frames.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n, h, w, float(fps), aptr, asamp, ach, int(audio_sr))
    if rc != 0:
        raise IOError(f"write_video({path}) failed with code {rc}")
