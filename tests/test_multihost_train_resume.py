"""Two-process end-to-end train + kill + resume exactness (VERDICT r3 #5).

Drives the REAL scripts/animation_train.py CLI on 2 jax.distributed CPU
processes x 2 virtual devices each (global dp mesh of 4), on synthetic
media.  Baseline run C trains 6 steps uninterrupted; the interrupted run
trains 3 steps, exits (checkpoint at the boundary), and a FRESH process
pair resumes in place and finishes 4-6.  The per-step loss trajectories
must be IDENTICAL: that requires the orbax multi-process state restore,
the loader-cursor sidecar replay, and the fold_in(step) RNG stream to all
be exact under DDP (reference resume semantics:
scripts/animation_train.py:268-290 via accelerator.load_state).  The
isolated multi-process save/restore/retention protocol is covered by
test_two_process_checkpoint_cycle.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from asva_tpu.data.media import media_available, write_video

pytestmark = pytest.mark.skipif(not media_available(),
                                reason="libasva_media.so not built")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


CFG = """
exp:
  output_dir: "{out}"
  seed: 3
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
  gradient_accumulation_steps: 1
  checkpointing_steps: 3
  checkpointing_milestones: 3
  resume_from_checkpoint: latest
"""


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds2p")
    rng = np.random.default_rng(0)
    os.makedirs(root / "dog", exist_ok=True)
    t = np.arange(int(40 / 12.0 * 16000)) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)[None]
    names = []
    for i in range(10):
        fr = (rng.random((40, 64, 64, 3)) * 255).astype(np.uint8)
        name = f"dog/v{i}.mp4"
        write_video(str(root / name), fr, 12.0, audio, 16000)
        names.append(name)
    (root / "train.txt").write_text("\n".join(names))
    np.savez(root / "enc.npz",
             **{"a dog": rng.standard_normal((77, 768)).astype(np.float32)})
    (root / "class_mapping.json").write_text(json.dumps({"dog": "a dog"}))
    return str(root)


def _run_pair(cfg_path, max_steps, timeout=2400):
    """Launch the train CLI as 2 jax.distributed CPU procs; wait for both."""
    addr = f"localhost:{_free_port()}"
    procs = []
    for pid in range(2):
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
                   XLA_FLAGS="--xla_force_host_platform_device_count=2",
                   JAX_COORDINATOR_ADDRESS=addr, JAX_NUM_PROCESSES="2",
                   JAX_PROCESS_ID=str(pid), COORDINATOR_ADDRESS=addr)
        procs.append(subprocess.Popen(
            [sys.executable, f"{REPO}/scripts/animation_train.py",
             "--config_file", str(cfg_path),
             "--max_steps_override", str(max_steps)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True))
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-proc train run timed out")
        errs.append(err)
    for p, err in zip(procs, errs):
        assert p.returncode == 0, err[-4000:]


def _losses(out_dir):
    """step -> loss from metrics.jsonl (both procs append identical values;
    keep the first record per step)."""
    by_step = {}
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            by_step.setdefault(rec["step"], rec["loss"])
    return by_step


CKPT_WORKER = r"""
import os, sys, json
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from asva_tpu.parallel.multihost import (globalize_host_local,
                                         make_global_batch)
from asva_tpu.training.checkpoint import CheckpointManager

out_dir = sys.argv[3]
mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
shard = NamedSharding(mesh, P("data"))
n = len(jax.local_devices())

def state_at(step):
    w = make_global_batch(
        {"w": (np.arange(float(n * 4)).reshape(n, 4)
               + 100.0 * jax.process_index() + step)}, shard)["w"]
    # step is deliberately a host-local eager scalar (like TrainState.step
    # and optax counts in the real scripts); globalize must make it a
    # replicated global array or orbax refuses to serialize it
    return globalize_host_local(
        {"step": jnp.asarray(step), "params": {"w": w}}, mesh)

mgr = CheckpointManager(out_dir, checkpointing_steps=1, milestone_steps=0)
mgr.save(1, state_at(1), extra={"loader": {"epoch": 0, "cursor": 1}})
mgr.save(2, state_at(2), extra={"loader": {"epoch": 0, "cursor": 2}})
mgr.close()

mgr2 = CheckpointManager(out_dir, checkpointing_steps=1)
# template must itself be a GLOBAL-array tree (np.zeros_like on a
# multi-host array cannot fetch its value) — the scripts pass `state`
step, restored = mgr2.restore_latest(state_at(0))
extra = mgr2.restore_extra(step)
ok = (step == 2 and extra == {"loader": {"epoch": 0, "cursor": 2}}
      and int(restored["step"]) == 2)
# every process checks ITS OWN addressable shards of the global array
want = state_at(2)["params"]["w"]
for s_got, s_want in zip(restored["params"]["w"].addressable_shards,
                         want.addressable_shards):
    ok = ok and np.array_equal(np.asarray(s_got.data),
                               np.asarray(s_want.data))
mgr2.close()
print("RESULT", json.dumps({"pid": jax.process_index(), "ok": bool(ok),
                            "steps": mgr2.existing_steps()}))
"""


def test_two_process_checkpoint_cycle(tmp_path):
    """Multi-process orbax save/restore/retention in isolation (no model
    compile): both ranks participate in the collective save; retention +
    extra.json are primary-only; restore round-trips the sharded state."""
    port = _free_port()
    script = tmp_path / "ckpt_worker.py"
    script.write_text(CKPT_WORKER)
    out_dir = tmp_path / "ckpts"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    procs = [subprocess.Popen(
        [sys.executable, str(script), f"localhost:{port}", str(i),
         str(out_dir)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("checkpoint worker timed out")
        assert p.returncode == 0, err[-3000:]
        outs.append(out)
    for out in outs:
        line = next(l for l in out.splitlines() if l.startswith("RESULT"))
        res = json.loads(line[len("RESULT "):])
        assert res["ok"], res
        assert res["steps"] == [2], res   # retention removed checkpoint-1


def test_two_process_train_checkpoint_resume_exact(dataset_root, tmp_path):
    # baseline: 6 uninterrupted steps (no mid-run save: on this 1-core box
    # an async multiprocess orbax save overlapping compile-heavy steps
    # starves its cross-process barriers — a host-sizing artifact, not the
    # resume semantics under test; the save machinery itself is covered by
    # test_two_process_checkpoint_cycle)
    run_c = str(tmp_path / "runC")
    cfg_c = tmp_path / "cfgC.yaml"
    cfg_c.write_text(CFG.format(out=run_c, root=dataset_root)
                     .replace("checkpointing_steps: 3",
                              "checkpointing_steps: 999"))
    _run_pair(cfg_c, max_steps=6)
    losses_c = _losses(run_c)
    assert set(losses_c) >= {1, 2, 3, 4, 5, 6}

    # interrupted run: 3 steps then exit (force-save at the boundary) ...
    run_a = str(tmp_path / "runA")
    cfg_a = tmp_path / "cfgA.yaml"
    cfg_a.write_text(CFG.format(out=run_a, root=dataset_root))
    _run_pair(cfg_a, max_steps=3)
    losses_a = _losses(run_a)
    assert set(losses_a) >= {1, 2, 3}
    assert os.path.isdir(os.path.join(run_a, "ckpts", "checkpoint-3")), \
        os.listdir(os.path.join(run_a, "ckpts"))

    # ... then a fresh process pair resumes IN PLACE and finishes 4-6
    _run_pair(cfg_a, max_steps=6)
    losses_b = _losses(run_a)
    assert set(losses_b) >= {1, 2, 3, 4, 5, 6}

    for step in (1, 2, 3):
        # pre-interruption steps must match the baseline (same data + RNG)
        assert losses_a[step] == pytest.approx(losses_c[step],
                                               rel=1e-6, abs=1e-7), \
            (step, losses_a, losses_c)
    for step in (4, 5, 6):
        # post-resume steps must replay the baseline exactly: orbax state
        # restore + loader-cursor sidecar + fold_in(step) RNG stream
        assert losses_b[step] == pytest.approx(losses_c[step],
                                               rel=1e-6, abs=1e-7), \
            (step, losses_b, losses_c)
