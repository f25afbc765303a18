"""Per-component timing of AVSyncD UNet ops at real shapes (run on TPU).

Identifies where the denoise-step time goes, to target Pallas work:
each attention flavor and the FF conv at every UNet resolution, plus the
full UNet forward for reference.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from asva_tpu.models.unet3d.primitives import (CrossAttention,
                                               FFInflatedConv,
                                               FFSpatialAttention,
                                               TemporalAttention)

B, F = 2, 12  # CFG pair
DTYPE = jnp.bfloat16


def bench(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}")

    # (channels, spatial, heads, per-step invocations down+up+mid)
    levels = [(320, 32, 8, 2 + 3), (640, 16, 8, 2 + 3),
              (1280, 8, 8, 2 + 3 + 1)]
    total = {"spatial": 0.0, "audio": 0.0, "temporal": 0.0, "conv": 0.0}
    for c, s, h, count in levels:
        n = s * s
        x = jnp.asarray(rng.standard_normal((B, F, n, c)), DTYPE)
        xs = jnp.asarray(rng.standard_normal((B, F, s, s, c)), DTYPE)
        audio = jnp.asarray(rng.standard_normal((B, 229, 768)), DTYPE)
        mask = jnp.asarray(rng.random((B, F, 229)) > 0.3)

        sp = FFSpatialAttention(h, c // h, dtype=DTYPE)
        p1 = sp.init(key, x)
        t_sp = bench(jax.jit(lambda p, v: sp.apply(p, v)), p1, x)

        ca = CrossAttention(h, c // h, dtype=DTYPE)
        p2 = ca.init(key, x, audio, mask)
        t_au = bench(jax.jit(lambda p, v: ca.apply(p, v, audio, mask)), p2, x)

        ta = TemporalAttention(h, c // h, dtype=DTYPE)
        p3 = ta.init(key, x)
        t_tp = bench(jax.jit(lambda p, v: ta.apply(p, v)), p3, x)

        cv = FFInflatedConv(c, 3, 1, 1, dtype=DTYPE)
        p4 = cv.init(key, xs)
        t_cv = bench(jax.jit(lambda p, v: cv.apply(p, v)), p4, xs)

        print(f"c={c:4d} n={n:4d}: spatial {t_sp:6.2f}ms  audio {t_au:6.2f}ms"
              f"  temporal {t_tp:6.2f}ms  ffconv {t_cv:6.2f}ms  x{count}")
        total["spatial"] += t_sp * count
        total["audio"] += t_au * count
        total["temporal"] += t_tp * count
        total["conv"] += t_cv * count * 2  # ~2 convs per resnet

    print("per-UNet-eval attention/conv estimate (ms):",
          {k: round(v, 1) for k, v in total.items()})


if __name__ == "__main__":
    main()
