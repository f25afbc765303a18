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
    """JSONL metrics sink, with optional wandb mirroring (the reference
    logs through accelerate's wandb tracker, scripts/animation_train.py:60;
    here log_with="wandb" mirrors every record when wandb is importable
    and degrades to JSONL-only with a warning otherwise)."""

    def __init__(self, path: str, log_with: Optional[str] = None,
                 run_name: Optional[str] = None, config: Optional[dict] = None):
        # main-process-only sink: on multi-host runs the logged loss is the
        # cross-rank mean already, and N ranks appending the same record to
        # a shared metrics.jsonl would duplicate (and on NFS interleave)
        self._f = None
        try:
            import jax
            main = jax.process_index() == 0
        except Exception:
            main = True
        if main:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a", buffering=1)
        self._wandb = None
        if log_with == "wandb":
            try:
                import jax
                if jax.process_index() != 0:   # main-process-only, like the
                    raise RuntimeError("non-main process")  # reference tracker
                import wandb
                self._wandb = wandb.init(project="asva_tpu", name=run_name,
                                         config=config or {})
            except Exception as e:  # wandb absent / offline: JSONL still on
                import logging
                logging.getLogger("asva_tpu").warning(
                    "wandb logging disabled (%s); JSONL only", e)

    def log(self, step: int, **metrics):
        if self._f is None:
            return
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in rec.items()
                             if k not in ("step", "time")}, step=int(step))

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


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
    each step and checkpoints before exiting.

    The FIRST signal flips the flag and restores the previous handlers, so
    a second Ctrl-C force-quits instead of being swallowed while the final
    (possibly slow) checkpoint write runs.

    Multi-host: a signal lands on one rank; the forced checkpoint is a
    COLLECTIVE orbax save, so ranks must agree on whether/when to do it —
    check `requested_global()` (an allgather-OR) instead of `.requested`
    in multi-process loops, or some ranks keep training while others save
    and the fleet deadlocks in the collective."""

    def __init__(self):
        self.requested = False
        self._round = 0      # KV-store agreement round (requested_global)
        self._prev = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except ValueError:  # not main thread
                pass

    def _handler(self, signum, frame):
        self.requested = True
        self.restore()  # second signal terminates normally

    def poll(self, sync_point: bool = True) -> bool:
        """Checkpoint-worthy shutdown check for train loops.

        Single-process: the local flag, checked every call.  Multi-process:
        the collective agreement runs only when `sync_point` is True — pass
        a condition that evaluates IDENTICALLY on every rank (e.g.
        step % log_steps == 0), because all ranks must enter the allgather
        together.  Polling at log cadence bounds lost work to log_steps
        steps while keeping the per-step dispatch pipeline collective-free."""
        import jax
        if jax.process_count() == 1:
            return self.requested
        if not sync_point:
            return False
        return self.requested_global()

    #: bound on how long a rank waits for its peers' shutdown flags before
    #: raising (instead of hanging forever in a wedged collective)
    agreement_timeout_s: float = 600.0

    def requested_global(self) -> bool:
        """Cross-rank agreement: True iff ANY process got the signal.
        Single-process this is just .requested (no collective).

        Multi-process, the agreement rides the jax.distributed
        coordination-service KV store — NOT an XLA collective — so it
        (a) never enters the XLA:CPU cross-process rendezvous (which can
        wedge under scheduler pressure on oversubscribed hosts) and
        (b) is BOUNDED: each peer flag read times out after
        `agreement_timeout_s`, raising TimeoutError rather than hanging
        the fleet.  Falls back to an allgather only if no coordination
        client exists (never the case after jax.distributed.initialize).
        """
        import jax
        if jax.process_count() == 1:
            return self.requested
        client = None
        try:
            from jax._src import distributed
            client = distributed.global_state.client
        except Exception:
            pass
        if client is None:     # no coordination service: allgather fallback
            import numpy as np

            from .parallel.multihost import process_allgather
            flags = process_allgather(
                np.array([1.0 if self.requested else 0.0]))
            got = bool(np.asarray(flags).sum() > 0)
            if got:
                self.requested = True
            return got
        n, rank = self._round, jax.process_index()
        self._round += 1
        prefix = f"asva/graceful_shutdown/{n}"
        client.key_value_set(f"{prefix}/{rank}",
                             "1" if self.requested else "0")
        got = False
        timeout_ms = max(1, int(self.agreement_timeout_s * 1000))
        for r in range(jax.process_count()):
            try:
                v = client.blocking_key_value_get(f"{prefix}/{r}",
                                                  timeout_ms)
            except Exception as e:
                raise TimeoutError(
                    f"shutdown agreement round {n}: rank {r} did not "
                    f"publish its flag within {self.agreement_timeout_s}s "
                    "— peer dead or wedged; aborting instead of hanging"
                ) from e
            got = got or v == "1"
        # GC this rank's key from two rounds back: any rank entering round
        # n has read ALL round n-1 keys, which required every rank to have
        # SET its round n-1 key, which happens only after that rank
        # finished reading round n-2 — so round n-2 keys are dead.
        if n >= 2:
            try:
                client.key_value_delete(
                    f"asva/graceful_shutdown/{n - 2}/{rank}")
            except Exception:
                pass
        if got:
            self.requested = True
        return got

    def restore(self):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
