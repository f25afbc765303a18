"""Winograd F(2x2,3x3) conv experiment vs XLA's direct conv.

Motivation: the round-5 eval profile says generation is conv-compute-bound
(conv fusions 51.8 ms of 93.3 ms/eval at ~2.2x their byte floor, 84-139
TFLOPS).  The only way to cut that wall further within parity scope is
FEWER MACs.  Winograd F(2x2,3x3) computes a stride-1 3x3 conv with 2.25x
fewer multiplies: 16 transform-domain GEMMs of (tiles, Cin) @ (Cin, Cout)
replace the 9-tap implicit GEMM (Lavin & Gray, arXiv:1509.09308).

The open question on TPU is whether the byte inflation kills it: the
transform-domain activations V are 16/4 = 4x the input bytes, and M is
4x the output bytes — if XLA materializes them in HBM, a conv running at
2.2x its byte floor gains nothing from a 2.25x MAC cut.  This tool
measures chained (fori_loop-in-one-jit) timings at the UNet's dominant
eval shapes plus a bf16 numerics check vs lax.conv.

Run: python tools/winograd_bench.py [--n 30] [--fp32] [--resnet]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N = 30
DT = jnp.bfloat16
_F32 = jnp.float32

# F(2x2, 3x3) transform matrices (exact in bf16/fp32: entries 0, ±1, ±1/2)
BT = np.array([[1, 0, -1, 0],
               [0, 1, 1, 0],
               [0, -1, 1, 0],
               [0, 1, 0, -1]], np.float32)
G = np.array([[1, 0, 0],
              [0.5, 0.5, 0.5],
              [0.5, -0.5, 0.5],
              [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0],
               [0, 1, -1, -1]], np.float32)


def transform_kernel(w):
    """w (3,3,Cin,Cout) -> U (4,4,Cin,Cout) = G w G^T (fp32 transform)."""
    u = jnp.einsum("ur,rsck->usck", G, w.astype(_F32))
    return jnp.einsum("usck,vs->uvck", u, G)


def winograd_conv(x, u, b=None, out_dtype=None):
    """3x3 SAME stride-1 conv of x (N,H,W,Cin) with the PRE-TRANSFORMED
    kernel u (4,4,Cin,Cout).  H and W must be even."""
    n, h, w_, c = x.shape
    k = u.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # (N, H/2, W/2, 4, 4, C) input tiles via 16 strided slices
    d = jnp.stack(
        [jnp.stack([xp[:, r:r + h:2, s:s + w_:2, :] for s in range(4)],
                   axis=3) for r in range(4)], axis=3)
    # V = B^T d B, computed in the input dtype (entries are ±sums of pairs)
    bt = BT.astype(x.dtype)
    v = jnp.einsum("ur,nijrsc->nijusc", bt, d)
    v = jnp.einsum("nijusc,vs->nijuvc", v, bt)
    # 16 transform-domain GEMMs, fp32 accumulation
    m = jnp.einsum("nijuvc,uvck->nijuvk", v, u.astype(x.dtype),
                   preferred_element_type=_F32)
    # Y = A^T M A (fp32), then reassemble the 2x2 output tiles
    y = jnp.einsum("pu,nijuvk->nijpvk", AT, m)
    y = jnp.einsum("nijpvk,qv->nijpqk", y, AT)
    if b is not None:
        y = y + b.astype(_F32)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w_, k)
    return y.astype(out_dtype or x.dtype)


def direct_conv(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = (y.astype(_F32) + b.astype(_F32)).astype(x.dtype)
    return y


def timeit(name, fn, *args, flops=None):
    def body(i, carry):
        x, acc = carry
        y = fn(x, *args[1:])
        if y.shape == x.shape:
            return y.astype(x.dtype), acc
        # cin != cout: keep the carry shape; thread a REAL data dependency
        # through the accumulator so the conv can't be DCE'd
        return x, acc + jnp.mean(y.astype(jnp.float32))

    loop = jax.jit(lambda a0: jax.lax.fori_loop(0, N, body, (a0, 0.0)))
    out, acc = loop(args[0])
    s = float(jnp.sum(out.astype(jnp.float32))) + float(acc)
    assert np.isfinite(s), s
    t0 = time.perf_counter()
    out, acc = loop(args[0])
    s = float(jnp.sum(out.astype(jnp.float32))) + float(acc)
    assert np.isfinite(s), s
    dt = (time.perf_counter() - t0) / N * 1e3
    tf = f"  {flops / dt * 1e-9:6.1f} TFLOPS(direct-equiv)" if flops else ""
    print(f"{name:52s} {dt:7.3f} ms/iter{tf}")
    return dt


def main():
    global N, DT
    if "--n" in sys.argv:
        N = int(sys.argv[sys.argv.index("--n") + 1])
    if "--fp32" in sys.argv:
        DT = jnp.float32
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, DT)
    print(f"device: {jax.devices()[0]}  dtype={DT.__name__}  N={N}")

    # numerics check at a small shape (fp32 and bf16)
    for dt in (jnp.float32, DT):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)) * 0.5, dt)
        w = jnp.asarray(rng.standard_normal((3, 3, 16, 24)) * 0.2, dt)
        ref = direct_conv(x.astype(_F32), w.astype(_F32))
        got = winograd_conv(x, transform_kernel(w), out_dtype=_F32)
        scale = float(jnp.abs(ref).max())
        err = float(jnp.abs(got - ref).max()) / scale
        print(f"numerics {dt.__name__}: rel max err vs fp32 direct "
              f"= {err:.2e}")

    xcal = r(2, 12, 32, 32, 320)
    timeit("CALIBRATION x*1.0001 (15.7MB carry)", lambda v: v * 1.0001, xcal)

    # dominant UNet eval conv shapes (gen bench b2 => 2 CFG pairs x 12
    # frames = 48 images) + a VAE-decode shape
    shapes = [
        (48, 32, 32, 320, 320),    # level-0 resnet conv
        (48, 32, 32, 640, 320),    # level-0 up-path skip part
        (48, 16, 16, 640, 640),    # level-1 resnet conv
        (48, 16, 16, 1280, 640),   # level-1 up-path skip part
        (48, 8, 8, 1280, 1280),    # level-2 resnet conv
        (12, 128, 128, 256, 256),  # VAE decoder mid-resolution
    ]
    for n, h, w_, cin, cout in shapes:
        x = r(n, h, w_, cin)
        w = r(3, 3, cin, cout)
        b = r(cout)
        u = transform_kernel(w)
        flops = n * h * w_ * 9 * cin * cout * 2 * N / N  # direct-conv MACs
        tag = f"{n}x{h}x{w_} {cin}->{cout}"
        d1 = timeit(f"direct conv {tag}", direct_conv, x, w, b, flops=flops)
        d2 = timeit(f"winograd    {tag}",
                    lambda x_, u_, b_: winograd_conv(x_, u_, b_),
                    x, u, b, flops=flops)
        print(f"  -> winograd/direct = {d2 / d1:.3f}x")

    if "--resnet" in sys.argv:
        resnet_probe(rng)


def resnet_probe(rng):
    """In-module probe: a level-0 FFResnetBlock with its two convs swapped
    for Winograd (monkeypatched), vs stock — fusion behavior differs from
    standalone convs, so this is the honest in-context read."""
    from asva_tpu.models.unet3d.resnet import FFResnetBlock

    from __graft_entry__ import _materialize as mz

    B, F, S, C = 2, 12, 32, 320
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, DT)
    x = r(B, F, S, S, C)
    temb = r(B, F, 1280)
    rn = FFResnetBlock(C, dtype=DT)
    p = mz(jax.eval_shape(lambda: rn.init(jax.random.PRNGKey(0), x, temb)))
    timeit("resnet c320 32x32 stock", lambda x_, p_: rn.apply(p_, x_, temb),
           x, p)


if __name__ == "__main__":
    main()
