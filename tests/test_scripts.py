"""Integration smoke tests for the CLI scripts on synthetic data (tiny
models, few steps, CPU)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from asva_tpu.data.media import media_available, write_video

pytestmark = pytest.mark.skipif(not media_available(),
                                reason="libasva_media.so not built")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=8",
           PYTHONPATH=REPO)


def _make_videos(root, n=3, frames=40, fps=12.0, hw=(64, 64), cls="dog"):
    os.makedirs(os.path.join(root, cls), exist_ok=True)
    rng = np.random.default_rng(0)
    names = []
    t = np.arange(int(frames / fps * 16000)) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)[None]
    for i in range(n):
        fr = (rng.random((frames, hw[0], hw[1], 3)) * 255).astype(np.uint8)
        name = f"{cls}/v{i}.mp4"
        write_video(os.path.join(root, name), fr, fps, audio, 16000)
        names.append(name)
    return names


@pytest.fixture(scope="module")
def train_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    names = _make_videos(str(root), n=8)
    (root / "train.txt").write_text("\n".join(names))
    rng = np.random.default_rng(1)
    np.savez(root / "enc.npz",
             **{"a dog": rng.standard_normal((77, 768)).astype(np.float32)})
    (root / "class_mapping.json").write_text(json.dumps({"dog": "a dog"}))
    return root


def test_animation_train_smoke(train_fixture, tmp_path):
    root = train_fixture
    cfg = f"""
exp:
  output_dir: "{tmp_path}/run"
  seed: 1
model:
  scheduler: {{beta_start: 0.00085, beta_end: 0.012, prediction_type: epsilon}}
  audio_encoder: {{n_segment: 4}}
  unet:
    down_block_types: [FFSpatioAudioTempCrossAttnDownBlock3D, FFSpatioTempResDownBlock3D]
    up_block_types: [FFSpatioTempResUpBlock3D, FFSpatioAudioTempCrossAttnUpBlock3D]
    mid_block_type: FFSpatioAudioTempCrossAttnUNetMidBlock3D
    block_out_channels: [32, 64]
    layers_per_block: 1
    norm_num_groups: 8
    attention_head_dim: 2
  audio_cond_drop_prob: 0.2
train:
  batch_size: 1
  log_steps: 1
  dataset:
    data_root: "{root}"
    example_list_path: "{root}/train.txt"
    img_size: [32, 32]
    video_fps: 6
    video_num_frame: 4
    class_mapping_json: "{root}/class_mapping.json"
    class_text_encoding_mapping_pt: "{root}/enc.npz"
optim:
  learning_rate: 1e-4
  gradient_accumulation_steps: 2
  checkpointing_steps: 2
  checkpointing_milestones: 2
"""
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(cfg)
    # NOTE: the full-size ImageBind audio tower is built by the script; on
    # CPU with tiny batch this still completes in reasonable time for 3 steps
    # 2 virtual devices, not 8: on a loaded 1-core box the XLA:CPU
    # all-gather rendezvous (40 s termination timeout) flakes with 8
    # collective threads; 8-device mesh coverage lives in
    # test_pipeline_sharded.py and __graft_entry__.dryrun_multichip
    env = dict(ENV, XLA_FLAGS="--xla_force_host_platform_device_count=2")
    out = subprocess.run(
        [sys.executable, f"{REPO}/scripts/animation_train.py",
         "--config_file", str(cfg_path), "--max_steps_override", "3"],
        env=env, capture_output=True, text=True, timeout=1500)
    assert out.returncode == 0, out.stderr[-3000:]
    ckpts = os.listdir(f"{tmp_path}/run/ckpts")
    assert any(c.startswith("checkpoint-") for c in ckpts), ckpts


def test_avsync_train_smoke(train_fixture, tmp_path):
    root = train_fixture
    cfg = f"""
exp:
  output_dir: "{tmp_path}/sync"
  seed: 1
model:
  tau: 0.1
train:
  batch_size: 1
  log_steps: 1
  dataset:
    data_root: "{root}"
    example_list_path: "{root}/train.txt"
    image_size: 32
    video_fps: 6
    video_num_frames: 4
    shift_time: 0.2
    num_clips: 3
    sampling_type: "random-compact"
test:
  batch_size: 1
  test_steps: 0
  dataset:
    data_root: "{root}"
    example_list_path: "{root}/train.txt"
    image_size: 32
    video_fps: 6
    video_num_frames: 4
    shift_time: 0.2
    num_clips: 3
    sampling_type: "uniform"
optim:
  learning_rate: 1e-4
  checkpointing_steps: 2
"""
    cfg_path = tmp_path / "sync.yaml"
    cfg_path.write_text(cfg)
    out = subprocess.run(
        [sys.executable, f"{REPO}/scripts/avsync_train.py",
         "--config_file", str(cfg_path), "--max_steps_override", "2"],
        env=ENV, capture_output=True, text=True, timeout=1500)
    assert out.returncode == 0, out.stderr[-3000:]
    assert os.path.isdir(f"{tmp_path}/sync/ckpts/checkpoint-2")


def test_animation_serve_smoke(tmp_path):
    """Serving daemon: builds the stack once (tiny unet via --config_file),
    answers /healthz, serves one /generate request, exits after
    --max_requests."""
    import http.client
    import json as _json
    import time as _time

    from PIL import Image
    from scipy.io import wavfile

    cfg = """
model:
  scheduler: {beta_start: 0.00085, beta_end: 0.012}
  audio_encoder: {n_segment: 4}
  unet:
    down_block_types: [FFSpatioAudioTempCrossAttnDownBlock3D, FFSpatioTempResDownBlock3D]
    up_block_types: [FFSpatioTempResUpBlock3D, FFSpatioAudioTempCrossAttnUpBlock3D]
    mid_block_type: FFSpatioAudioTempCrossAttnUNetMidBlock3D
    block_out_channels: [32, 64]
    layers_per_block: 1
    norm_num_groups: 8
    attention_head_dim: 2
"""
    cfg_path = tmp_path / "serve.yaml"
    cfg_path.write_text(cfg)
    rng = np.random.default_rng(0)
    img_path = str(tmp_path / "cond.png")
    Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(
        img_path)
    wav_path = str(tmp_path / "cond.wav")
    t = np.arange(int(3.0 * 16000)) / 16000
    wavfile.write(wav_path, 16000,
                  (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))

    port = 18951
    proc = subprocess.Popen(
        [sys.executable, f"{REPO}/scripts/animation_serve.py",
         "--port", str(port), "--config_file", str(cfg_path),
         "--sd_root", "", "--null_text_encoding_path", "",
         "--image_size", "32", "32", "--max_requests", "1"],
        env=ENV, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        deadline = _time.time() + 600
        up = False
        while _time.time() < deadline:
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=5)
                conn.request("GET", "/healthz")
                r = conn.getresponse()
                assert r.status == 200
                up = True
                break
            except (ConnectionError, OSError):
                if proc.poll() is not None:
                    out = proc.stdout.read()
                    raise AssertionError(f"server died:\n{out[-3000:]}")
                _time.sleep(2.0)
        assert up, "server never came up"

        body = _json.dumps({
            "image_path": img_path, "audio_path": wav_path,
            "num_clips": 1, "num_inference_steps": 2, "sampler": "ddim",
            "save_template": str(tmp_path / "srv")})
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=900)
        conn.request("POST", "/generate", body,
                     {"Content-Type": "application/json"})
        resp = _json.loads(conn.getresponse().read())
        assert resp["ok"], resp
        assert resp["outputs"], resp
        assert os.path.exists(resp["outputs"][0])
        proc.wait(timeout=120)   # --max_requests 1 => clean exit
    finally:
        if proc.poll() is None:
            proc.terminate()
            proc.wait(timeout=30)
