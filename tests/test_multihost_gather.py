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
