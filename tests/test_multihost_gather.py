"""Multi-process metric gather: two real jax.distributed CPU processes
all-gather ragged per-example records and dedup overlapping indices
(the reference's accelerator.gather + unique-index dedup,
scripts/avsync_eval.py:150-167)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


WORKER = r"""
import os, sys, json
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
from asva_tpu.parallel.multihost import gather_metric_records
pid = jax.process_index()
if pid == 0:
    # indices 0..4, ragged (5 records); index 4 overlaps with process 1
    idx = np.array([0, 1, 2, 3, 4])
    val = np.stack([np.arange(5.0), np.arange(5.0) * 10], axis=1)
else:
    idx = np.array([4, 5, 6])
    val = np.stack([np.array([4.0, 5, 6]), np.array([40.0, 50, 60])], axis=1)
uniq, merged = gather_metric_records(idx, val)
if pid == 0:
    print("RESULT", json.dumps({"uniq": uniq.tolist(),
                                "vals": merged[:, 0].tolist()}))
"""


def test_two_process_gather_with_dedup(tmp_path):
    port = _free_port()
    addr = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, str(script), addr, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, err[-2000:]
        outs.append(out)
    line = next(l for l in outs[0].splitlines() if l.startswith("RESULT"))
    import json
    res = json.loads(line[len("RESULT "):])
    assert res["uniq"] == [0, 1, 2, 3, 4, 5, 6]
    assert res["vals"] == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0]


LOSS_WORKER = r"""
import os, sys, json
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from asva_tpu.parallel.multihost import make_global_batch

pid = jax.process_index()
mesh = Mesh(np.array(jax.devices()), ("data",))
bshard = NamedSharding(mesh, P("data"))
# each process contributes DIFFERENT local rows (one per local device)
n = len(jax.local_devices())
local = {"x": (np.arange(float(n)) + 100.0 * pid).reshape(n, 1)}
batch = make_global_batch(local, bshard)
loss = jax.jit(lambda b: jnp.mean(b["x"]))(batch)
# the scalar is replicated: float() must equal the cross-rank global mean
print("RESULT", json.dumps({"pid": pid, "loss": float(loss), "n": n}))
"""


def test_two_process_global_batch_loss_is_cross_rank_mean(tmp_path):
    """The train scripts log float(loss) from a jit over the global sharded
    batch; with make_global_batch this already IS the cross-rank mean
    (the reference's accelerator.gather(loss).mean(),
    scripts/animation_train.py:318)."""
    port = _free_port()
    addr = f"localhost:{port}"
    script = tmp_path / "loss_worker.py"
    script.write_text(LOSS_WORKER)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, str(script), addr, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    import json
    losses = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, err[-2000:]
        line = next(l for l in out.splitlines() if l.startswith("RESULT"))
        rec = json.loads(line[len("RESULT "):])
        losses.append(rec["loss"])
        n = rec["n"]
    # global rows: [0..n) and [100..100+n) -> both ranks log the same mean
    expected = np.mean([np.arange(float(n)), np.arange(float(n)) + 100.0])
    assert losses[0] == losses[1] == pytest.approx(float(expected))


SHUTDOWN_WORKER = r"""
import os, sys, json
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
from asva_tpu.observability import GracefulShutdown
pid = jax.process_index()
sd = GracefulShutdown()
sd.agreement_timeout_s = 120.0   # bounded: a wedged peer raises, not hangs
# two all-clear sync points first (exercises the KV round counter and the
# round-(n-2) key GC path), then the signal lands on ONE rank only
assert sd.poll(sync_point=True) is False
assert sd.poll(sync_point=True) is False
if pid == 1:
    sd.requested = True  # the signal landed on ONE rank only
# off the sync point, poll never enters a collective: every rank (even
# the signaled one) keeps stepping until the agreed cadence point
assert sd.poll(sync_point=False) is False
# at the agreed sync point, BOTH ranks must see the shutdown
agreed = sd.poll(sync_point=True)
print("RESULT", json.dumps({"pid": pid, "agreed": bool(agreed)}))
"""


def _run_shutdown_agreement(tmp_path):
    port = _free_port()
    addr = f"localhost:{port}"
    script = tmp_path / "shutdown_worker.py"
    script.write_text(SHUTDOWN_WORKER)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, str(script), addr, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    import json
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, err[-2000:]
        line = next(l for l in out.splitlines() if l.startswith("RESULT"))
        assert json.loads(line[len("RESULT "):])["agreed"] is True


def test_two_process_shutdown_agreement(tmp_path):
    """A preemption signal lands on one rank; GracefulShutdown.poll at a
    sync point must make EVERY rank agree to checkpoint (the forced orbax
    save is collective — disagreement deadlocks the fleet).

    No retry needed anymore: the agreement rides the coordination-service
    KV store with a bounded per-read timeout, not the XLA:CPU
    cross-process rendezvous that rarely wedged under scheduler pressure
    on this 1-core box (r4 carried a retry for that)."""
    _run_shutdown_agreement(tmp_path)
