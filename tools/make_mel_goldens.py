"""Generate bit-true mel-fbank golden vectors with torchaudio.

torchaudio is not installed in the build sandbox, so run this wherever it
exists (any torch+torchaudio env):

  python tools/make_mel_goldens.py --out tests/fixtures/mel_goldens.npz

It records torchaudio.compliance.kaldi.fbank outputs with ImageBind's
waveform2melspec parameters (reference avgen/data/utils.py:26-55: 16 kHz,
128 bins, hanning, dither 0, frame 25/10 ms, htk_compat=True) for fixed
deterministic waveforms; tests/test_audio_frontend.py picks the file up
automatically and asserts max-abs-diff < 1e-4 against ops/mel.fbank.
"""
import argparse
import numpy as np


try:  # single source of truth for the signals (also used by the runtime
    # provenance label asva_tpu.ops.mel.goldens_status)
    from asva_tpu.ops.mel import golden_waveforms  # noqa: F401
except ImportError:  # run from a foreign torchaudio env without the package
    def golden_waveforms():
        rng = np.random.default_rng(1234)
        sr, n = 16000, 32000
        t = np.arange(n) / sr
        return sr, {
            "noise": (rng.standard_normal(n) * 0.1).astype(np.float32),
            "tones": (0.5 * np.sin(2 * np.pi * 440 * t)
                      + 0.2 * np.sin(2 * np.pi * 3210 * t)).astype(
                          np.float32),
            "chirp": np.sin(2 * np.pi * (200 * t + 1900 * t * t)).astype(
                np.float32),
            "walk": np.clip(rng.standard_normal(n).cumsum() * 1e-3,
                            -1, 1).astype(np.float32),
        }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="tests/fixtures/mel_goldens.npz")
    args = p.parse_args()

    import torch
    import torchaudio.compliance.kaldi as kaldi

    sr, waves = golden_waveforms()
    out = {}
    for name, wave in waves.items():
        fb = kaldi.fbank(
            torch.from_numpy(wave)[None], htk_compat=True,
            sample_frequency=sr, use_energy=False, window_type="hanning",
            num_mel_bins=128, dither=0.0, frame_length=25.0,
            frame_shift=10.0)
        out[name] = fb.numpy().astype(np.float32)
    import os
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **out)
    print(f"wrote {len(out)} goldens to {args.out}: "
          f"{ {k: v.shape for k, v in out.items()} }")


if __name__ == "__main__":
    main()
