"""Observability & resilience subsystems the reference lacks (SURVEY §5):

  * MetricsLogger — append-only JSONL metrics stream (wandb substitute in a
    zero-egress environment; the reference logs through accelerate/wandb).
  * profile_steps — jax.profiler trace capture around N train steps
    (view with TensorBoard / xprof).
  * GracefulShutdown — SIGTERM/SIGINT handler so TPU preemption triggers a
    final checkpoint instead of losing progress (the reference has no
    preemption handling).
"""
from __future__ import annotations

import contextlib
import json
import os
import signal
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a", buffering=1)

    def log(self, step: int, **metrics):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()


@contextlib.contextmanager
def profile_steps(logdir: Optional[str]):
    """Capture a jax.profiler trace for the enclosed steps (no-op if logdir
    is falsy)."""
    if not logdir:
        yield
        return
    import jax
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class GracefulShutdown:
    """Set .requested when SIGTERM/SIGINT arrives; the train loop checks it
    each step and checkpoints before exiting."""

    def __init__(self):
        self.requested = False
        self._prev = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except ValueError:  # not main thread
                pass

    def _handler(self, signum, frame):
        self.requested = True

    def restore(self):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
