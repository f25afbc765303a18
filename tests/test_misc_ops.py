"""Coverage for resampler, CLIP text encoder, and multihost no-op."""
import numpy as np
import jax
import jax.numpy as jnp

from asva_tpu.ops.resample import resample


def test_resample_3_to_1_tone():
    sr0, sr1, f0 = 48000, 16000, 440.0
    t = np.arange(sr0 * 2) / sr0
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = resample(x, sr0, sr1)
    assert len(y) == int(np.ceil(len(x) * sr1 / sr0))
    seg = y[1000:1000 + 16000]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak_hz = spec.argmax() * sr1 / len(seg)
    assert abs(peak_hz - f0) < 2.0
    # amplitude preserved
    assert abs(y[2000:-2000].std() / x.std() - 1.0) < 0.01


def test_resample_441_to_16k_length_and_identity():
    x = np.random.default_rng(0).standard_normal((2, 44100)).astype(np.float32)
    y = resample(x, 44100, 16000)
    assert y.shape == (2, 16000)
    np.testing.assert_array_equal(resample(x, 16000, 16000), x)


def test_clip_text_model_shapes_and_causality(rng):
    from asva_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (2, 16, cfg.hidden_size)
    # causality: changing a LATER token must not affect earlier positions
    ids2 = np.array(ids)
    ids2[:, 10] = (ids2[:, 10] + 1) % cfg.vocab_size
    out2 = model.apply(params, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(out[:, :10]),
                               np.asarray(out2[:, :10]), atol=1e-5)
    assert not np.allclose(np.asarray(out[:, 10:]), np.asarray(out2[:, 10:]))


def test_multihost_noop_on_single_host():
    from asva_tpu.parallel.multihost import maybe_initialize_distributed
    assert maybe_initialize_distributed() in (False, True)  # must not raise


def test_detect_torchscript_bn_eps_roundtrip(tmp_path):
    """BN epsilon is read back out of saved jit blobs (both the attribute
    and the traced-constant path) — feeds animation_eval's --i3d_bn_eps
    auto-detection."""
    import torch
    from asva_tpu.convert.torchscript import (detect_bn_eps,
                                              extract_state_and_eps)

    class Net(torch.nn.Module):
        def __init__(self, eps):
            super().__init__()
            self.bn = torch.nn.BatchNorm3d(4, eps=eps)
            self.conv = torch.nn.Conv3d(4, 4, 1)

        def forward(self, x):
            return self.conv(self.bn(x))

    for eps in (1e-5, 1e-3):
        traced = torch.jit.trace(Net(eps).eval(), torch.randn(1, 4, 3, 8, 8))
        assert detect_bn_eps(traced) == eps
        p = str(tmp_path / f"net_{eps}.pt")
        torch.jit.save(traced, p)
        state, got = extract_state_and_eps(p)
        assert got == eps and len(state) == 7


def test_mel_goldens_status_states(tmp_path, monkeypatch):
    """goldens_status: absent fixture -> 'unverified'; a fixture recorded
    from our own fbank -> 'verified'; a corrupted one -> 'MISMATCH'."""
    import numpy as np
    from asva_tpu.ops import mel

    monkeypatch.setenv("ASVA_MEL_GOLDENS", str(tmp_path / "none.npz"))
    mel.goldens_status.cache_clear()
    assert mel.goldens_status().startswith("unverified")

    sr, waves = mel.golden_waveforms()
    rec = {name: np.asarray(mel.fbank(w, sample_rate=sr))
           for name, w in waves.items()}
    np.savez(tmp_path / "ok.npz", **rec)
    monkeypatch.setenv("ASVA_MEL_GOLDENS", str(tmp_path / "ok.npz"))
    mel.goldens_status.cache_clear()
    assert mel.goldens_status() == "verified vs torchaudio goldens"

    rec["noise"] = rec["noise"] + 0.1
    np.savez(tmp_path / "bad.npz", **rec)
    monkeypatch.setenv("ASVA_MEL_GOLDENS", str(tmp_path / "bad.npz"))
    mel.goldens_status.cache_clear()
    assert mel.goldens_status().startswith("MISMATCH")
    mel.goldens_status.cache_clear()
