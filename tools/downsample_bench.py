"""Stride-2 downsample-conv experiment at the VAE-encoder shapes.

Motivation: the round-5 train trace (tools/trace_eval.py --train) shows the
VAE encoder's three stride-2 downsample convs running at ~30-33 TFLOPS at
256^2/128^2 spatial (7.6 + 6.9 ms/step for 232 GFLOP each) while every
stride-1 conv around them runs at 183-191 TFLOPS — and the SAME stride-2
conv at 64^2 (down_2) runs at 183.  That is ~12-14 ms/step of pure
lowering waste in the protocol-mandated per-step VAE encode of 48 frames
(reference: diffusers VAE Downsample2D, asymmetric (0,1)x(0,1) pad,
matched at asva_tpu/models/vae.py:106-108).

A stride-2 3x3 conv is exactly the sum of four stride-1 convs on the four
input polyphase grids (the transpose of the upsample fold shipped in r4,
models/unet3d/primitives.py Upsample2xConv2D): tap (di,dj) of the 3x3
kernel hits phase (di%2, dj%2) at offset (di//2, dj//2), so the phases see
2x2 / 2x1 / 1x2 / 1x1 kernels — same 9*C^2 MACs, all stride-1.

Variants measured (chained fori_loop in ONE jit, input data-dependent on
the carry so nothing hoists; calibration row subtracts the harness):
  direct   stride-2 conv, pad ((0,1),(0,1))            [shipped today]
  phase4   4 stride-1 convs on strided-sliced phases
  packed   space-to-depth (N,H/2,W/2,4C) + one 2x2 stride-1 conv
           (zero-padded kernel, 16/9 FLOP inflation)
  dilated  4 stride-2 rhs_dilation=2 convs on x directly (no phase
           materialization)
  sympad   stride-2 with symmetric (1,1) pad — NOT the same math; isolates
           whether the asymmetric pad is what XLA lowers badly

Run: python tools/downsample_bench.py [--n 30] [--fp32]
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
DN = ("NHWC", "HWIO", "NHWC")


def direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2), ((0, 1), (0, 1)),
        dimension_numbers=DN)


def sympad(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2), ((1, 0), (1, 0)),
        dimension_numbers=DN)


def phase4(x, w):
    """Four stride-1 convs on the polyphase grids.  Phase (a,b) = x[a::2,
    b::2]; tap (di,dj) -> phase (di%2,dj%2) offset (di//2,dj//2).  The +1
    offsets read the (0,1)-pad row/col, i.e. zeros: pad each phase
    bottom/right where its kernel extends."""
    w = w.astype(x.dtype)
    ee = x[:, 0::2, 0::2]
    eo = x[:, 0::2, 1::2]
    oe = x[:, 1::2, 0::2]
    oo = x[:, 1::2, 1::2]
    c = jax.lax.conv_general_dilated
    y = c(ee, w[0::2, 0::2], (1, 1), ((0, 1), (0, 1)), dimension_numbers=DN)
    y += c(eo, w[0::2, 1::2], (1, 1), ((0, 1), (0, 0)), dimension_numbers=DN)
    y += c(oe, w[1::2, 0::2], (1, 1), ((0, 0), (0, 1)), dimension_numbers=DN)
    y += c(oo, w[1::2, 1::2], (1, 1), ((0, 0), (0, 0)), dimension_numbers=DN)
    return y


def packed(x, w):
    """Space-to-depth (N,H/2,W/2,4C), one 2x2 stride-1 conv whose kernel
    scatters the 9 taps over the 4 phase channel blocks (7 of 16 slots
    zero)."""
    n, h, ww, cin = x.shape
    w = w.astype(x.dtype)
    cout = w.shape[-1]
    xs = x.reshape(n, h // 2, 2, ww // 2, 2, cin).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, h // 2, ww // 2, 4 * cin)
    k = jnp.zeros((2, 2, 4, cin, cout), x.dtype)
    # phase order along channels: (a,b) = (0,0),(0,1),(1,0),(1,1)
    for di in range(3):
        for dj in range(3):
            p = (di % 2) * 2 + (dj % 2)
            k = k.at[di // 2, dj // 2, p].set(w[di, dj])
    k = k.reshape(2, 2, 4 * cin, cout)
    return jax.lax.conv_general_dilated(
        xs, k, (1, 1), ((0, 1), (0, 1)), dimension_numbers=DN)


def dilated(x, w):
    """Four stride-2 convs with rhs_dilation=2 reading x in place (no
    phase buffers).  Phase (a,b)'s kernel spans {a, a+2} x {b, b+2}; the
    base offset a/b is expressed as negative low padding."""
    w = w.astype(x.dtype)
    c = jax.lax.conv_general_dilated

    def pc(a, b):
        kern = w[a::2, b::2]
        pad_h = (-a, 1) if kern.shape[0] == 2 else (-a, a)
        pad_w = (-b, 1) if kern.shape[1] == 2 else (-b, b)
        return c(x, kern, (2, 2), (pad_h, pad_w), rhs_dilation=(2, 2),
                 dimension_numbers=DN)

    return pc(0, 0) + pc(0, 1) + pc(1, 0) + pc(1, 1)


def timeit(name, fn, x, w, flops=None):
    """Chained loop: the WEIGHT (tiny) carries the loop dependency so the
    conv re-executes every iteration without an extra full-input copy
    pass; per-iter harness overhead is just mean(y) + the weight nudge."""

    def body(i, carry):
        wv, acc = carry
        y = fn(x, wv)
        return wv + (1e-30 * acc).astype(wv.dtype), acc + jnp.mean(
            y.astype(_F32))

    loop = jax.jit(lambda w0: jax.lax.fori_loop(0, N, body, (w0, 0.0)))
    for rep in range(2):
        t0 = time.perf_counter()
        out, acc = loop(w)
        s = float(acc)
        dt = (time.perf_counter() - t0) / N * 1e3
    assert np.isfinite(s), s
    tf = f"  {flops / dt * 1e-9:6.1f} TFLOPS(direct-equiv)" if flops else ""
    print(f"{name:44s} {dt:7.3f} ms/iter{tf}")
    return dt


def main():
    global N, DT
    if "--n" in sys.argv:
        N = int(sys.argv[sys.argv.index("--n") + 1])
    if "--fp32" in sys.argv:
        DT = jnp.float32
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}  dtype={DT.__name__}  N={N}")

    # numerics: every equivalent variant must match direct exactly-ish
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), _F32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.2, _F32)
    ref = np.asarray(direct(x, w))
    for nm, fn in (("phase4", phase4), ("packed", packed),
                   ("dilated", dilated)):
        got = np.asarray(fn(x, w))
        err = np.abs(got - ref).max() / np.abs(ref).max()
        print(f"numerics {nm}: rel max err = {err:.2e}")
        assert err < 1e-5, (nm, err)

    # big operands minted ON DEVICE (an 800 MB host->device push through
    # the axon tunnel dwarfs the measurement)
    mk = jax.jit(lambda k, s: (jax.random.normal(k, s, jnp.float32) * 0.05
                               ).astype(DT), static_argnums=1)
    shapes = [
        (48, 256, 256, 128),   # VAE down_0 (7.6 ms/step in-program today)
        (48, 128, 128, 256),   # VAE down_1 (6.9)
        (48, 64, 64, 512),     # VAE down_2 (1.27 — already fast)
    ]
    variants = [("phase4", phase4), ("packed", packed),
                ("dilated", dilated), ("sympad", sympad)]
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    if only:
        variants = [(nm, fn) for nm, fn in variants if nm in only[0]]
    for n, h, ww, c in shapes:
        x = mk(jax.random.PRNGKey(h), (n, h, ww, c))
        w = mk(jax.random.PRNGKey(c), (3, 3, c, c))
        flops = n * (h // 2) * (ww // 2) * 9 * c * c * 2
        tag = f"{n}x{h}x{ww} {c}->{c}"
        d = timeit(f"direct  {tag}", direct, x, w, flops=flops)
        sys.stdout.flush()
        for nm, fn in variants:
            v = timeit(f"{nm:7s} {tag}", fn, x, w, flops=flops)
            print(f"    -> {nm}/direct = {v / d:.3f}x")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
