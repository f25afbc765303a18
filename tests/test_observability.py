"""Metrics logger / graceful shutdown / utils tests."""
import json
import os
import signal

from asva_tpu.observability import GracefulShutdown, MetricsLogger
from asva_tpu.utils import AverageMeter, StepTimer, get_model_size


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    m = MetricsLogger(path)
    m.log(1, loss=0.5, acc=0.9)
    m.log(2, loss=0.25)
    m.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[1]["step"] == 2 and "time" in lines[1]


def test_graceful_shutdown_flag():
    g = GracefulShutdown()
    assert not g.requested
    os.kill(os.getpid(), signal.SIGTERM)
    assert g.requested
    g.restore()


def test_average_meter_window():
    m = AverageMeter(window=2)
    for v in (1.0, 2.0, 3.0):
        m.update(v)
    assert m.avg == 2.5  # only the last two
    m2 = AverageMeter()
    m2.update(1.0, n=3)
    m2.update(5.0, n=1)
    assert m2.avg == 2.0


def test_model_size():
    import jax.numpy as jnp
    params = {"a": jnp.zeros((1000, 1000)), "b": jnp.zeros((24,))}
    assert abs(get_model_size(params, "M") - 1.000024) < 1e-6
