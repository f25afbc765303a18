"""Polyphase windowed-sinc audio resampling (torchaudio-compatible).

Replaces torchaudio.functional.resample (reference avgen/data/utils.py:
259-263, 404): gcd-reduced rates, lowpass_filter_width=6, rolloff=0.99,
Hann-windowed sinc kernel, output length ceil(new * T / orig).  The kernel
bank is a host numpy constant; the convolution is a strided gather matmul
(static shapes, runs fine on CPU inside the input pipeline or on device).
"""
from __future__ import annotations

import functools
import math

import numpy as np


@functools.lru_cache(maxsize=32)
def _kernel_bank(orig_freq: int, new_freq: int,
                 lowpass_filter_width: int = 6,
                 rolloff: float = 0.99) -> tuple:
    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)
    # one kernel per output phase
    idx = np.arange(-width, width + orig, dtype=np.float64)[None] / orig
    t = (-np.arange(new, dtype=np.float64)[:, None] / new + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    tpi = t * np.pi
    kernel = np.where(t == 0, 1.0, np.sin(tpi) / np.where(tpi == 0, 1, tpi))
    kernel = kernel * window * (base_freq / orig)
    return kernel.astype(np.float32), orig, new, width


def resample(waveform: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """waveform (..., T) -> (..., ceil(T * new / orig)), float32."""
    if orig_freq == new_freq:
        return np.asarray(waveform, np.float32)
    kernels, orig, new, width = _kernel_bank(orig_freq, new_freq)
    x = np.asarray(waveform, np.float32)
    shape = x.shape
    t = shape[-1]
    x2 = x.reshape(-1, t)
    target_len = int(math.ceil(new * t / orig))

    num_wins = int(math.ceil(t / orig))
    klen = kernels.shape[1]
    pad_right = max(0, (num_wins - 1) * orig + klen - width - t)
    xp = np.pad(x2, ((0, 0), (width, pad_right)))
    # frames: (batch, num_wins, klen) strided view
    stride = xp.strides[-1]
    frames = np.lib.stride_tricks.as_strided(
        xp, shape=(x2.shape[0], num_wins, klen),
        strides=(xp.strides[0], orig * stride, stride), writeable=False)
    # (b, num_wins, klen) @ (klen, new) -> (b, num_wins, new)
    out = np.einsum("bwk,pk->bwp", frames, kernels)
    out = out.reshape(x2.shape[0], num_wins * new)[:, :target_len]
    return out.reshape(shape[:-1] + (target_len,))
