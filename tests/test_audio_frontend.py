"""Mel frontend and ImageBind audio encoder tests."""
import numpy as np
import jax
import jax.numpy as jnp

from asva_tpu.models.imagebind_audio import (ImageBindAudioConfig,
                                             SegmaskAudioEncoder,
                                             segment_masks)
from asva_tpu.ops.mel import fbank, kaldi_mel_banks, waveform_to_mel


def test_mel_shape_and_padding():
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(32000),
                      dtype=jnp.float32)
    mel = waveform_to_mel(wav)
    assert mel.shape == (128, 204, 1)
    # 2 s @ 16 kHz, 400/160 snip_edges -> 198 frames; last 6 zero-padded then
    # normalized: padded frames equal (0 - mean)/std exactly
    pad_val = (0.0 - (-4.268)) / 9.138
    np.testing.assert_allclose(np.asarray(mel[:, 198:, 0]), pad_val, atol=1e-6)
    assert not np.allclose(np.asarray(mel[:, 197, 0]), pad_val)


def test_mel_center_crop_longer_clip():
    rng = np.random.default_rng(1)
    base = rng.standard_normal(48000).astype(np.float32)
    mel_long = waveform_to_mel(jnp.asarray(base))
    center = base[8000:40000]
    # mean-centring differs (mean over the full clip vs crop), so compare
    # against explicitly identical crops
    mel_crop = waveform_to_mel(jnp.asarray(center))
    # same crop -> same frames except for the tiny mean difference
    assert mel_long.shape == mel_crop.shape == (128, 204, 1)


def test_mel_pure_tone_peaks_at_expected_bin():
    sr, f0 = 16000, 1000.0
    t = np.arange(32000) / sr
    wav = jnp.asarray(np.sin(2 * np.pi * f0 * t), dtype=jnp.float32)
    out = fbank(wav)  # (frames, 128)
    peak_bin = int(np.asarray(out).mean(axis=0).argmax())
    # find which Kaldi-mel bin has its center nearest 1 kHz
    banks = kaldi_mel_banks(128, 512, 16000.0)
    centers = banks.argmax(axis=1) * (16000.0 / 512)
    expected = int(np.abs(centers - f0).argmin())
    assert abs(peak_bin - expected) <= 1


def test_mel_filterbank_properties():
    banks = kaldi_mel_banks(128, 512, 16000.0)
    assert banks.shape == (128, 257)
    assert (banks >= 0).all()
    assert banks[:, -1].sum() == 0  # nyquist column zero
    # triangles overlap: every interior fft bin between the first and last
    # filter peaks is covered by at least one filter
    first_peak, last_peak = banks[0].argmax(), banks[-1].argmax()
    covered = banks.sum(axis=0)[first_peak:last_peak]
    assert (covered > 0).all()


def test_segment_masks_match_reference_algorithm():
    m = segment_masks(12, (12, 19))
    assert m.shape == (12, 229)
    assert m[:, 0].all()  # CLS always visible
    # chunk size ceil(19/12)=2, starts = round(linspace(0, 17, 12))
    starts = np.round(np.linspace(0, 17, 12)).astype(int)
    for i, s in enumerate(starts):
        expected_cols = np.zeros(19, bool)
        expected_cols[s:s + 2] = True
        grid = m[i, 1:].reshape(12, 19)
        assert (grid == expected_cols[None, :]).all()
    # every row attends to exactly 12*2 + 1 tokens
    assert (m.sum(axis=1) == 25).all()


def test_segmask_encoder_shapes(rng):
    cfg = ImageBindAudioConfig.tiny()
    enc = SegmaskAudioEncoder(cfg, n_segment=4)
    mel = jnp.asarray(rng.standard_normal((2, 128, 204, 1)),
                      dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), mel)
    cls_embeds, encodings, masks = enc.apply(params, mel)
    assert cls_embeds.shape == (2, cfg.out_embed_dim)
    assert encodings.shape == (2, 229, cfg.embed_dim)
    assert masks.shape == (2, 4, 229)
    assert masks.dtype == jnp.bool_
    cls_n, _, _ = enc.apply(params, mel, normalize=True)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(cls_n, axis=-1)),
                               20.0, rtol=1e-4)
