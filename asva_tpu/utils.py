"""Shared utilities (reference avgen/utils.py equivalents + logging)."""
from __future__ import annotations

import logging
import os
import time
from collections import deque
from typing import Optional

import jax
import numpy as np


def get_model_size(params, unit: str = "M") -> float:
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    return n / {"K": 1e3, "M": 1e6, "B": 1e9}[unit]


class AverageMeter:
    """Windowed running average (reference avgen/utils.py:35-52)."""

    def __init__(self, window: Optional[int] = None):
        self.window = window
        self.reset()

    def reset(self):
        self._values = deque(maxlen=self.window)
        self.sum = 0.0
        self.count = 0

    def update(self, value, n: int = 1):
        value = float(value)
        self._values.append((value, n))
        self.sum += value * n
        self.count += n

    @property
    def avg(self) -> float:
        if self.window is None:
            return self.sum / max(self.count, 1)
        tot = sum(v * n for v, n in self._values)
        cnt = sum(n for _, n in self._values)
        return tot / max(cnt, 1)


class StepTimer:
    """Rolling steps/sec + ETA."""

    def __init__(self, window: int = 50):
        self.times = deque(maxlen=window)
        self.last = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self.last
        self.last = now
        self.times.append(dt)
        return dt

    @property
    def steps_per_sec(self) -> float:
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)


def setup_logging(log_file: Optional[str] = None,
                  name: str = "asva_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    if not any(type(h) is logging.StreamHandler for h in logger.handlers):
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if log_file:
        # attach the file sink even when a previous setup_logging call
        # already configured the stream handler (a second job in the same
        # process would otherwise silently log to the FIRST job's file)
        path = os.path.abspath(log_file)
        have = any(isinstance(h, logging.FileHandler)
                   and getattr(h, "baseFilename", None) == path
                   for h in logger.handlers)
        if not have:
            os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


def cast_floating(tree, dtype):
    """Cast every floating-point leaf to `dtype` (e.g. bf16 inference
    weights — halves HBM weight traffic on the bandwidth-bound UNet eval;
    the reference runs the whole model fp16 at inference,
    pipeline_audio_cond_animation.py:484).  Integer/bool leaves pass
    through."""
    import jax
    import jax.numpy as jnp

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)
