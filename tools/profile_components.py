"""Per-component cost profile of AVSyncD UNet ops at real shapes.

Reports, for each module at each UNet resolution, the XLA-compiled
cost_analysis (flops / HBM bytes accessed) plus wall time.  On a
remote-tunnel device the WALL COLUMN IS JUNK: each execute RPC costs
~2-40 ms scaling with the argument-tree leaf count (param-heavy
transformers read ~440 ms/iter, param-light resnets ~4 ms), so only
(a) fori_loop-chained iterations inside ONE jit (tools/kernel_bench.py)
and (b) full-program runs (bench.py) measure device time.  The bytes
column remains the per-module traffic signal, with one caveat: Pallas
kernels' "bytes accessed" counts block refetches the hardware pipeline
skips for constant index maps, so fused modules are over-counted.

Run: python tools/profile_components.py [--full]  (--full adds the whole
UNet forward; ~10 min first compile through the axon tunnel).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, F = 2, 12  # CFG pair
DTYPE = jnp.bfloat16


def _materialize(tree_shapes, seed=0):
    from __graft_entry__ import _materialize as m
    return m(tree_shapes, seed=seed)


def analyze(name, mod, *args, n=10):
    params = _materialize(jax.eval_shape(
        lambda: mod.init(jax.random.PRNGKey(0), *args)))
    comp = jax.jit(lambda p, *a: mod.apply(p, *a)).lower(
        params, *args).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    jax.block_until_ready(comp(params, *args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = comp(params, *args)
    # materialize a scalar, not just block_until_ready: an errored buffer
    # chain (silent OOM) "completes" instantly and the walls turn absurd
    # (CLAUDE.md) — the error only surfaces at transfer
    s = float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / n * 1e3
    assert np.isfinite(s), s
    flops = ca.get("flops", 0.0)
    byts = ca.get("bytes accessed", 0.0)
    print(f"{name:34s} flops {flops/1e9:8.1f}G  bytes {byts/1e9:7.3f}GB  "
          f"bw-bound {byts/819e9*1e3:6.2f}ms  wall {dt:7.2f}ms")
    return byts


def main():
    from asva_tpu.models.imagebind_audio import segment_token_indices
    from asva_tpu.models.unet3d.resnet import FFResnetBlock
    from asva_tpu.models.unet3d.transformer import SpatioAudioTempTransformer3D

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}")
    token_idx = jnp.asarray(segment_token_indices(F, (12, 19)))
    text = jnp.asarray(rng.standard_normal((B, 77, 768)), DTYPE)
    audio = jnp.asarray(rng.standard_normal((B, 229, 768)), DTYPE)

    # (channels, spatial, heads, transformer+resnet instances down/up/mid)
    levels = [(320, 32, 8, 5), (640, 16, 8, 5), (1280, 8, 8, 6)]
    total = 0.0
    for c, s, h, count in levels:
        x = jnp.asarray(rng.standard_normal((B, F, s, s, c)), DTYPE)
        tr = SpatioAudioTempTransformer3D(h, c // h, num_layers=1,
                                          norm_num_groups=32, dtype=DTYPE)
        total += count * analyze(
            f"transformer c{c} {s}x{s} (x{count})", tr, x, text, audio,
            None, token_idx)
        rn = FFResnetBlock(c, dtype=DTYPE)
        temb = jnp.asarray(rng.standard_normal((B, F, 1280)), DTYPE)
        total += count * analyze(f"resnet      c{c} {s}x{s} (x{count})",
                                 rn, x, temb)
    print(f"approx whole-eval bytes from parts: {total/1e9:.1f}GB "
          f"(r2 full-UNet cost_analysis: 52.1GB)")

    if "--full" in sys.argv:
        from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig
        unet = AudioUNet3D(UNet3DConfig(), dtype=DTYPE)
        sample = jnp.asarray(rng.standard_normal((B, F, 32, 32, 4)), DTYPE)
        t = jnp.zeros((B,), jnp.int32)
        analyze("FULL UNet eval (batch 2)", unet, sample, t, text, audio,
                None, token_idx, n=5)


if __name__ == "__main__":
    main()
