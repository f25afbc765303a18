"""Honest on-chip micro-bench for the fused Pallas kernels vs their XLA
composites.

Each variant runs N chained iterations inside ONE jit (fori_loop with a
data dependency), so per-op tunnel dispatch (~2 ms) and queueing effects
drop out; a scalar is materialized after the loop so silently-errored
buffer chains surface instead of reporting absurd times (CLAUDE.md).

CAVEAT: the loop itself carries a fixed per-iteration cost (~0.65 ms/iter
for a 15.7 MB bf16 carry on axon) — a trivial `x*1.0001` calibration row
is printed first; subtract it mentally (or compare variants, where it
cancels).  Whole-module rows are the reliable per-level eval budget;
STANDALONE sub-layer rows can diverge wildly from their in-module cost
(XLA picks different layouts/fusions for the loop carry — the temporal
einsum read 1600 ms standalone vs ~2 ms in-module).

Run: python tools/kernel_bench.py [--n 50] [--modules] [--resnet]
     [--conv9] [--only-extra]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from asva_tpu.ops import pallas_fused as pf

N = 50
DT = jnp.bfloat16


def timeit(name, fn, *args, bytes_floor=None):
    loop = jax.jit(lambda a0, rest: jax.lax.fori_loop(
        0, N, lambda i, x: fn(x, *rest), a0))
    rest = args[1:]
    out = loop(args[0], rest)
    s = float(jnp.sum(out.astype(jnp.float32)))  # force + surface errors
    assert np.isfinite(s), s
    t0 = time.perf_counter()
    out = loop(args[0], rest)
    s = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / N * 1e3
    floor = f"  floor {bytes_floor/819e9*1e3:5.3f}ms" if bytes_floor else ""
    print(f"{name:44s} {dt:7.3f} ms/iter{floor}")
    return dt


def main():
    global N
    if "--n" in sys.argv:
        N = int(sys.argv[sys.argv.index("--n") + 1])
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, DT)
    print(f"device: {jax.devices()[0]}  (N={N} chained iters/jit)")
    xcal = r(2, 12, 32, 32, 320)
    timeit("CALIBRATION x*1.0001 (15.7MB carry)",
           lambda v: v * 1.0001, xcal)
    if "--only-extra" in sys.argv:     # just the --modules/--resnet/--conv9
        if "--modules" in sys.argv:
            module_bench(rng)
        if "--resnet" in sys.argv:
            resnet_bench(rng)
        if "--conv9" in sys.argv:
            conv9_bench(rng)
        return

    # ---- level-0 FF: (24576, 320) tokens, inner 1280 ----
    m, c = 24576, 320
    inner = 4 * c
    x = r(m, c)
    ls, lb = r(1, c) + 1.0, r(1, c)
    wi, bi = r(c, 2 * inner), r(1, 2 * inner)
    wo, bo = r(inner, c), r(1, c)
    stream = (m * c * 2 * 2)  # x in + out, bf16
    ok, bm = pf.supports_ff(m, c, DT)
    assert ok
    timeit("ff fused  c320 (kernel)",
           lambda x_, *a: pf.fused_ln_geglu(x_, *a, 1e-5, bm),
           x, ls, lb, wi, bi, wo, bo, bytes_floor=stream)
    timeit("ff xla    c320 (composite)",
           lambda x_, *a: pf._ln_geglu_reference(*(x_,) + a, 1e-5),
           x, ls, lb, wi, bi, wo, bo)

    # ---- level-0 attn1: groups=2, m=12288, sk=1024 ----
    g, m, sk, heads = 2, 12288, 1024, 8
    x = r(g, m, c)
    wq = pf.pad_heads(r(c, c), heads, 1)
    wo_a = pf.pad_heads(r(c, c), heads, 0)
    k = pf.pad_heads_tokens(r(g, sk, c), heads)
    v = pf.pad_heads_tokens(r(g, sk, c), heads)
    ok, bm = pf.supports_attn(m, sk, c, heads, DT,
                              hdp=wq.shape[1])
    assert ok, (m, sk)
    timeit("attn1 fused  c320 sk1024 (kernel)",
           lambda x_, *a: pf.fused_ln_attn(x_, *a, 1e-5, heads, None, bm),
           x, ls, lb, wq, wo_a, bo, k, v,
           bytes_floor=(g * m * c * 2 * 2))
    timeit("attn1 xla    c320 sk1024 (composite)",
           lambda x_, *a: pf._ln_attn_reference(*(x_,) + a, 1e-5, heads,
                                                None),
           x, ls, lb, wq, wo_a, bo, k, v)
    # EXPERIMENT: unpadded head slots (d=40 lane slices) — trades the 3.2x
    # MXU padding flops for Mosaic's unaligned-slice relayouts
    wq_n, wo_n = r(c, c), r(c, c)
    k_n, v_n = r(g, sk, c), r(g, sk, c)
    timeit("attn1 fused  c320 sk1024 (narrow d=40)",
           lambda x_, *a: pf.fused_ln_attn(x_, *a, 1e-5, heads, None, bm),
           x, ls, lb, wq_n, wo_n, bo, k_n, v_n,
           bytes_floor=(g * m * c * 2 * 2))

    # ---- level-0 audio cross: groups=24, m=1024, sk=128 (25 real) ----
    g2, m2, sk2 = 24, 1024, 128
    x2 = r(g2, m2, c)
    k2 = pf.pad_heads_tokens(r(g2, sk2, c), heads)
    v2 = pf.pad_heads_tokens(r(g2, sk2, c), heads)
    ok, bm2 = pf.supports_attn(m2, sk2, c, heads, DT,
                               hdp=wq.shape[1])
    assert ok
    timeit("audio-x fused  c320 sk128 (kernel)",
           lambda x_, *a: pf.fused_ln_attn(x_, *a, 1e-5, heads, 25, bm2),
           x2, ls, lb, wq, wo_a, bo, k2, v2,
           bytes_floor=(g2 * m2 * c * 2 * 2))
    timeit("audio-x xla    c320 sk128 (composite)",
           lambda x_, *a: pf._ln_attn_reference(*(x_,) + a, 1e-5, heads, 25),
           x2, ls, lb, wq, wo_a, bo, k2, v2)

    # ---- level-0 text cross: groups=2, m=12288, sk=128 (77 real) ----
    k3 = pf.pad_heads_tokens(r(g, sk2, c), heads)
    v3 = pf.pad_heads_tokens(r(g, sk2, c), heads)
    ok, bm3 = pf.supports_attn(m, sk2, c, heads, DT,
                               hdp=wq.shape[1])
    assert ok
    timeit("text-x fused  c320 sk128 (kernel)",
           lambda x_, *a: pf.fused_ln_attn(x_, *a, 1e-5, heads, 77, bm3),
           x, ls, lb, wq, wo_a, bo, k3, v3,
           bytes_floor=(g * m * c * 2 * 2))
    timeit("text-x xla    c320 sk128 (composite)",
           lambda x_, *a: pf._ln_attn_reference(*(x_,) + a, 1e-5, heads, 77),
           x, ls, lb, wq, wo_a, bo, k3, v3)

    # ---- level-1 FF: (6144, 640) tokens ----
    m4, c4 = 6144, 640
    inner4 = 4 * c4
    x4 = r(m4, c4)
    a4 = (r(1, c4) + 1.0, r(1, c4), r(c4, 2 * inner4), r(1, 2 * inner4),
          r(inner4, c4), r(1, c4))
    ok, bm4 = pf.supports_ff(m4, c4, DT)
    assert ok
    timeit("ff fused  c640 (kernel)",
           lambda x_, *a: pf.fused_ln_geglu(x_, *a, 1e-5, bm4),
           x4, *a4, bytes_floor=(m4 * c4 * 2 * 2))
    timeit("ff xla    c640 (composite)",
           lambda x_, *a: pf._ln_geglu_reference(*(x_,) + a, 1e-5),
           x4, *a4)

    if "--modules" in sys.argv:
        module_bench(rng)
    if "--resnet" in sys.argv:
        resnet_bench(rng)
    if "--conv9" in sys.argv:
        conv9_bench(rng)


def conv9_bench(rng):
    """Experiment: 3x3 SAME conv as 9 shifted matmuls vs XLA's conv op.
    XLA's conv measures ~40 TFLOPS at (24,32,32,320)->320; plain matmuls
    at these M/K/N shapes run ~2-3x faster."""
    BF, H, W, C = 24, 32, 32, 320
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, DT)
    x = r(BF, H, W, C)
    w = r(3, 3, C, C)
    b = r(C)

    def conv9(x_, w_, b_):
        xp = jnp.pad(x_, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for dy in range(3):
            for dx in range(3):
                part = jax.lax.dot_general(
                    xp[:, dy:dy + H, dx:dx + W, :], w_[dy, dx],
                    (((3,), (0,)), ((), ())))
                out = part if out is None else out + part
        return out + b_

    def convxla(x_, w_, b_):
        y = jax.lax.conv_general_dilated(
            x_, w_, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b_

    o1 = conv9(x, w, b)
    o2 = convxla(x, w, b)
    diff = jnp.abs((o1 - o2).astype(jnp.float32)).max()
    print(f"conv9 vs conv max diff: {float(diff):.4f}")
    timeit("conv9  3x3 c320 (9 shifted matmuls)", conv9, x, w, b)
    timeit("convop 3x3 c320 (lax.conv)", convxla, x, w, b)


def resnet_bench(rng):
    """Dissect the FFResnetBlock cost at level-0 eval shapes."""
    from flax import linen as nn

    from asva_tpu.models.unet3d.primitives import FFInflatedConv, InflatedConv
    from asva_tpu.ops.norms import VideoGroupNorm

    def materialize(tree_shapes):
        from __graft_entry__ import _materialize as mz
        return mz(tree_shapes)

    B, F, S, C = 2, 12, 32, 320
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, DT)
    x = r(B, F, S, S, C)

    gn = VideoGroupNorm(32, 1e-5)
    pg = materialize(jax.eval_shape(
        lambda: gn.init(jax.random.PRNGKey(0), x)))
    timeit("groupnorm+silu c320", lambda x_, p_: nn.silu(gn.apply(p_, x_)),
           x, pg)

    pc = InflatedConv(C, 3, 1, 1, dtype=DT)
    pp = materialize(jax.eval_shape(
        lambda: pc.init(jax.random.PRNGKey(0), x)))
    timeit("plain 3x3 conv c320 (per-frame)",
           lambda x_, p_: pc.apply(p_, x_), x, pp)

    fc = FFInflatedConv(C, 3, 1, 1, dtype=DT)
    pf_ = materialize(jax.eval_shape(
        lambda: fc.init(jax.random.PRNGKey(0), x)))
    timeit("ffconv 3x3 c320 (conv + 3-tap mix)",
           lambda x_, p_: fc.apply(p_, x_), x, pf_)


def module_bench(rng):
    """Chained whole-module timings at eval shapes (the honest per-level
    breakdown; per-module dispatch walls through the tunnel are junk)."""
    from asva_tpu.models.imagebind_audio import segment_token_indices
    from asva_tpu.models.unet3d.resnet import FFResnetBlock
    from asva_tpu.models.unet3d.transformer import (
        SpatioAudioTempTransformer3D)

    def materialize(tree_shapes):
        from __graft_entry__ import _materialize as mz
        return mz(tree_shapes)

    B, F = 2, 12
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, DT)
    token_idx = jnp.asarray(segment_token_indices(F, (12, 19)))
    text = r(B, 77, 768)
    audio = r(B, 229, 768)
    for c, s, heads, count in [(320, 32, 8, 5), (640, 16, 8, 5),
                               (1280, 8, 8, 6)]:
        x = r(B, F, s, s, c)
        tr = SpatioAudioTempTransformer3D(heads, c // heads, num_layers=1,
                                          norm_num_groups=32, dtype=DT)
        p = materialize(jax.eval_shape(lambda tr=tr, x=x: tr.init(
            jax.random.PRNGKey(0), x, text, audio, None, token_idx)))
        timeit(f"transformer3d c{c} {s}x{s} (x{count})",
               lambda x_, p_: tr.apply(p_, x_, text, audio, None, token_idx),
               x, p)
        rn = FFResnetBlock(c, dtype=DT)
        temb = r(B, F, 1280)
        pr = materialize(jax.eval_shape(lambda rn=rn, x=x: rn.init(
            jax.random.PRNGKey(0), x, temb)))
        timeit(f"resnet        c{c} {s}x{s} (x{count})",
               lambda x_, p_: rn.apply(p_, x_, temb), x, pr)


if __name__ == "__main__":
    main()
