"""Kaldi-style log-mel filterbank ("fbank") in pure JAX.

Replaces the torchaudio.compliance.kaldi.fbank call consumed through
ImageBind's waveform2melspec (reference avgen/data/utils.py:26-55):
  * 16 kHz, 25 ms window (400 samples), 10 ms shift (160), snip_edges,
  * remove_dc_offset, preemphasis 0.97 (with edge replication),
  * periodic=False hann window, zero-pad to 512-point FFT,
  * power spectrum -> 128 Kaldi-mel (1127*ln(1+f/700)) triangular bins,
    low 20 Hz, high nyquist, log with float32-eps clamp,
  * 2 s clip -> 198 frames, zero-padded on the right to target_length 204,
  * waveform is mean-centred first; output normalized (mean -4.268,
    std 9.138) by the caller.

Everything here is jit-able and runs on device; filterbank matrices are
host-side numpy constants.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

MEL_EPS = 1.1920928955078125e-07  # float32 machine eps (Kaldi log clamp)


def _mel(f):
    return 1127.0 * np.log(1.0 + f / 700.0)


@functools.lru_cache(maxsize=8)
def kaldi_mel_banks(num_bins: int, padded_window_size: int,
                    sample_freq: float, low_freq: float = 20.0,
                    high_freq: float = 0.0) -> np.ndarray:
    """(num_bins, padded_window_size//2 + 1) triangular weights, Kaldi mel."""
    if high_freq <= 0.0:
        high_freq = sample_freq / 2 + high_freq
    num_fft_bins = padded_window_size // 2
    fft_bin_width = sample_freq / padded_window_size
    mel_low, mel_high = _mel(low_freq), _mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.arange(num_bins, dtype=np.float64)[:, None]
    left = mel_low + bins * mel_delta
    center = mel_low + (bins + 1) * mel_delta
    right = mel_low + (bins + 2) * mel_delta
    freqs = _mel(fft_bin_width * np.arange(num_fft_bins, dtype=np.float64))[None, :]
    up = (freqs - left) / (center - left)
    down = (right - freqs) / (right - center)
    weights = np.maximum(0.0, np.minimum(up, down))
    # final column (nyquist bin) is zero, mirroring torchaudio's pad
    weights = np.concatenate(
        [weights, np.zeros((num_bins, 1))], axis=1)
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _hann_window(n: int) -> np.ndarray:
    # torch.hann_window(periodic=False)
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))).astype(
        np.float32)


def fbank(waveform: jnp.ndarray, sample_rate: int = 16000,
          num_mel_bins: int = 128, frame_length_ms: float = 25.0,
          frame_shift_ms: float = 10.0,
          preemphasis: float = 0.97) -> jnp.ndarray:
    """waveform (..., T) -> log-mel (..., num_frames, num_mel_bins)."""
    window_size = int(sample_rate * frame_length_ms / 1000)
    window_shift = int(sample_rate * frame_shift_ms / 1000)
    padded = 1 << (window_size - 1).bit_length()  # next power of two
    t = waveform.shape[-1]
    m = 1 + (t - window_size) // window_shift  # snip_edges frame count

    idx = (np.arange(m)[:, None] * window_shift
           + np.arange(window_size)[None, :])
    frames = waveform[..., idx]  # (..., m, window)
    frames = frames.astype(jnp.float32)
    # remove per-frame DC offset
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # preemphasis with first-sample replication
    first = frames[..., :1]
    prev = jnp.concatenate([first, frames[..., :-1]], axis=-1)
    frames = frames - preemphasis * prev
    frames = frames * jnp.asarray(_hann_window(window_size))
    frames = jnp.pad(frames,
                     [(0, 0)] * (frames.ndim - 1) + [(0, padded - window_size)])
    spectrum = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2  # (..., m, 257)
    banks = jnp.asarray(kaldi_mel_banks(num_mel_bins, padded,
                                        float(sample_rate)))
    mel = spectrum @ banks.T
    return jnp.log(jnp.maximum(mel, MEL_EPS))


def waveform_to_mel(
    waveform: jnp.ndarray,
    sample_rate: int = 16000,
    num_mel_bins: int = 128,
    target_length: int = 204,
    clip_duration: float = 2.0,
    mean: float = -4.268,
    std: float = 9.138,
) -> jnp.ndarray:
    """Full AVSyncD mel frontend: (c, T) or (T,) waveform -> (num_mel_bins,
    target_length, 1) normalized mel image (channels-last).

    Multi-channel input uses channel 0 only after mean-centring — the
    reference feeds stereo through waveform2melspec which operates on
    channel 0 of the (c, t) tensor via kaldi fbank's waveform[0] convention.
    Clip is centre-cropped to clip_duration seconds when longer.
    """
    if waveform.ndim == 1:
        waveform = waveform[None]
    target_t = int(clip_duration * sample_rate)
    t = waveform.shape[-1]
    if t > target_t:
        start = (t - target_t) // 2
        waveform = waveform[..., start:start + target_t]
    elif t < target_t:
        waveform = jnp.pad(waveform,
                           [(0, 0)] * (waveform.ndim - 1) + [(0, target_t - t)])
    waveform = waveform - jnp.mean(waveform)  # waveform2melspec mean-centre
    mel = fbank(waveform[0], sample_rate, num_mel_bins)  # (m, n_mels)
    mel = mel.T  # (n_mels, m)
    n_frames = mel.shape[-1]
    if n_frames < target_length:
        mel = jnp.pad(mel, ((0, 0), (0, target_length - n_frames)))
    else:
        mel = mel[:, :target_length]
    mel = (mel - mean) / std
    return mel[..., None]  # (n_mels, T, 1)


# ---------------------------------------------------------------------------
# Provenance: our fbank is spec-implemented from the Kaldi/torchaudio
# parameters above, but torchaudio itself is absent from the build sandbox,
# so bit-parity is proven only where the recorded goldens fixture exists
# (tools/make_mel_goldens.py).  Downstream metric JSONs carry this label so
# FID/IA/etc numbers state the provenance of the mel they consumed.

def golden_waveforms():
    """Deterministic golden test signals (shared by the goldens tool, the
    goldens test, and the runtime provenance check)."""
    rng = np.random.default_rng(1234)
    sr, n = 16000, 32000
    t = np.arange(n) / sr
    return sr, {
        "noise": (rng.standard_normal(n) * 0.1).astype(np.float32),
        "tones": (0.5 * np.sin(2 * np.pi * 440 * t)
                  + 0.2 * np.sin(2 * np.pi * 3210 * t)).astype(np.float32),
        "chirp": np.sin(2 * np.pi * (200 * t + 1900 * t * t)).astype(
            np.float32),
        "walk": np.clip(rng.standard_normal(n).cumsum() * 1e-3,
                        -1, 1).astype(np.float32),
    }


def goldens_fixture_path() -> str:
    import os
    env = os.environ.get("ASVA_MEL_GOLDENS")
    if env:
        return env
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.normpath(os.path.join(here, "..", "..", "tests",
                                         "fixtures", "mel_goldens.npz"))


@functools.lru_cache(maxsize=1)
def goldens_status() -> str:
    """'verified' iff fbank matches the recorded torchaudio goldens here,
    'MISMATCH ...' if the fixture disagrees, else 'unverified (...)'."""
    import os
    path = goldens_fixture_path()
    if not os.path.isfile(path):
        return ("unverified (torchaudio goldens fixture absent; run "
                "tools/make_mel_goldens.py where torchaudio exists)")
    goldens = np.load(path)
    sr, waves = golden_waveforms()
    worst = 0.0
    for name, wave in waves.items():
        if name not in goldens:
            return f"MISMATCH (fixture missing key {name})"
        got = np.asarray(fbank(wave, sample_rate=sr))
        if got.shape != goldens[name].shape:
            return f"MISMATCH (shape {got.shape} vs {goldens[name].shape})"
        worst = max(worst, float(np.abs(got - goldens[name]).max()))
    return ("verified vs torchaudio goldens" if worst < 1e-4
            else f"MISMATCH vs torchaudio goldens (max abs diff {worst:g})")
