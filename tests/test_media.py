"""C++ media layer round-trip tests (synthetic mp4 with AAC audio)."""
import os

import numpy as np
import pytest

from asva_tpu.data.media import MediaReader, media_available, write_video

pytestmark = pytest.mark.skipif(not media_available(),
                                reason="libasva_media.so not built")


@pytest.fixture(scope="module")
def sample_video(tmp_path_factory):
    """4 s, 12 fps, 64x96, frame index encoded in a solid gray level;
    440 Hz tone audio at 16 kHz."""
    path = str(tmp_path_factory.mktemp("media") / "test.mp4")
    n, h, w, fps = 48, 64, 96, 12.0
    frames = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        frames[i] = 20 + i * 4  # distinguishable gray per frame
    t = np.arange(int(4.0 * 16000)) / 16000
    audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    write_video(path, frames, fps, audio, 16000)
    assert os.path.exists(path) and os.path.getsize(path) > 1000
    return path, frames, audio


def test_metadata(sample_video):
    path, frames, audio = sample_video
    with MediaReader(path) as r:
        assert r.size == (64, 96)
        assert abs(r.video_fps - 12.0) < 0.01
        assert abs(r.video_duration - 4.0) < 0.2
        assert r.audio_sample_rate == 16000
        assert abs(r.audio_duration - 4.0) < 0.3


def test_video_clip_sampling_at_half_rate(sample_video):
    """Requesting 6 fps from a 12 fps source must select every other frame
    starting at the clip start."""
    path, frames, _ = sample_video
    with MediaReader(path) as r:
        clip = r.read_video_clip(start=1.0, duration=2.0, fps=6.0,
                                 num_frames=12)
    assert clip.shape == (12, 64, 96, 3)
    got_levels = clip[:, 32, 48, 1].astype(int)
    # source frame at t=1.0 is index 12, then every 2nd frame: 12,14,...,34
    expected = 20 + (12 + 2 * np.arange(12)) * 4
    # lossy codec: allow small level error
    assert np.abs(got_levels - expected).max() <= 8, (got_levels, expected)


def test_video_clip_pads_past_end(sample_video):
    path, _, _ = sample_video
    with MediaReader(path) as r:
        clip = r.read_video_clip(start=3.5, duration=2.0, fps=6.0,
                                 num_frames=12)
    assert clip.shape[0] == 12
    # tail frames are repeats of the last decodable frame
    assert (clip[-1] == clip[-2]).all()


def test_audio_roundtrip_tone(sample_video):
    path, _, audio = sample_video
    with MediaReader(path) as r:
        wav = r.read_audio(start=1.0, duration=2.0)
    assert wav.shape[0] == 1
    assert abs(wav.shape[1] - 32000) < 4096  # AAC frame granularity
    # dominant frequency should still be ~440 Hz
    seg = wav[0, :16000]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak_hz = spec.argmax() * 16000 / len(seg)
    assert abs(peak_hz - 440.0) < 5.0


def test_opencv_agrees_on_frames(sample_video):
    """Cross-check our decoder against OpenCV's independent ffmpeg build."""
    cv2 = pytest.importorskip("cv2")
    path, _, _ = sample_video
    cap = cv2.VideoCapture(path)
    ok, first_cv = cap.read()
    cap.release()
    assert ok
    with MediaReader(path) as r:
        clip = r.read_video_clip(start=0.0, duration=1.0, fps=12.0,
                                 num_frames=1)
    diff = np.abs(clip[0].astype(int)
                  - first_cv[:, :, ::-1].astype(int)).mean()
    assert diff < 2.0, diff
