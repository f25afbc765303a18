"""Probe the TemporalAttention pair-loop gate frontier on real hardware.

The per-(f,g) pair loop replaced the bnhfg einsum at level 0 (d=40) in r2;
the shipped gate is d <= primitives.TEMPORAL_PAIRLOOP_MAX_D (64), which
keeps level 1 (d=80) and level 2 (d=160) on the einsum.  This times the
WHOLE SpatioAudioTempTransformer3D module (standalone sub-layer timings
are junk — see tools/kernel_bench.py caveat) at level-1/2 eval shapes
with the gate at 64 (einsum) vs raised (pair loop), chained inside one
jit.  A calibration row is printed per shape; compare variants, where the
carry cost cancels.

Run: python tools/temporal_gate_bench.py [--n 50]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N = 50
DT = jnp.bfloat16


def timeit(name, fn, *args):
    loop = jax.jit(lambda a0, rest: jax.lax.fori_loop(
        0, N, lambda i, x: fn(x, *rest), a0))
    rest = args[1:]
    out = loop(args[0], rest)
    s = float(jnp.sum(out.astype(jnp.float32)))
    assert np.isfinite(s), s
    t0 = time.perf_counter()
    out = loop(args[0], rest)
    s = float(jnp.sum(out.astype(jnp.float32)))
    assert np.isfinite(s), s
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:52s} {dt:7.3f} ms/iter", flush=True)
    return dt


def main():
    global N
    if "--n" in sys.argv:
        N = int(sys.argv[sys.argv.index("--n") + 1])
    from asva_tpu.models.imagebind_audio import segment_token_indices
    from asva_tpu.models.unet3d import primitives
    from asva_tpu.models.unet3d.transformer import (
        SpatioAudioTempTransformer3D)
    from __graft_entry__ import _materialize

    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, DT)
    print(f"device: {jax.devices()[0]}  (N={N} chained iters/jit)",
          flush=True)

    B, F = 2, 12
    token_idx = jnp.asarray(segment_token_indices(F, (12, 19)))
    text = r(B, 77, 768)
    audio = r(B, 229, 768)
    for c, s, heads in [(640, 16, 8), (1280, 8, 8)]:
        x = r(B, F, s, s, c)
        timeit(f"CAL x*1.0001 c{c} {s}x{s}", lambda x_: x_ * 1.0001, x)
        tr = SpatioAudioTempTransformer3D(heads, c // heads, num_layers=1,
                                          norm_num_groups=32, dtype=DT)
        p = _materialize(jax.eval_shape(lambda tr=tr, x=x: tr.init(
            jax.random.PRNGKey(0), x, text, audio, None, token_idx)))
        for max_d in (64, 80, 160):
            if max_d != 64 and c // heads > max_d:
                continue
            primitives.TEMPORAL_PAIRLOOP_MAX_D = max_d
            form = "pair-loop" if c // heads <= max_d else "einsum"
            timeit(f"transformer3d c{c} {s}x{s} gate{max_d} ({form})",
                   lambda x_, p_, tr=tr: tr.apply(p_, x_, text, audio,
                                                  None, token_idx),
                   x, p)
    primitives.TEMPORAL_PAIRLOOP_MAX_D = 64


if __name__ == "__main__":
    main()
