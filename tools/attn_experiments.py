"""attn1 kernel experiments: hunting the level-0 spatial-attention waste.

CLAUDE.md kernel truth: level-0 attn1 (narrow d=40 head slices) runs
~0.85-0.94 ms chained vs a ~0.33 ms useful-flop ceiling.  The padding
waste in the per-head (TM,40)@(40,Sk) / (TM,Sk)@(Sk,40) matmuls is
algebraically irreducible on the 128-wide MXU (packing heads along the
contraction just reintroduces the zeros), so the candidates are:

  v0  current per-head loop (baseline, == pallas_fused._attn_kernel)
  v1  PHASED: all 8 heads' logits first, then all softmax+PV — maximizes
      scheduling distance between each head's MXU matmul and its VPU
      softmax so Mosaic can overlap units (the r2 padded-layout attempt
      OOMed VMEM; the narrow layout fits at block_m<=256)
  v2  POST-NORM: o = (exp(s-mx) @ v) * (1/l) — moves the (TM,Sk) fp32
      divide (1M elems/head) to a (TM,40) scale after the PV matmul
  v3  v1 + v2
  v4  matmul floor: softmax replaced by a cast (NOT numerically valid —
      isolates the MXU share; VPU share = v0 - v4)
  v5  v3 + bf16 exp (accuracy probe only)

Run (real chip): python tools/attn_experiments.py [--n 50] [--bm 256]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from asva_tpu.ops import pallas_fused as pf

_F32 = jnp.float32
N = 50
DT = jnp.bfloat16


def _prefix(x_ref, ls_ref, lb_ref, wq_ref, eps):
    x = x_ref[0]
    xn = pf._ln_rows(x.astype(_F32), ls_ref[...].astype(_F32),
                     lb_ref[...].astype(_F32), eps).astype(x.dtype)
    q = jax.lax.dot_general(xn, wq_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=_F32).astype(x.dtype)
    return x, q


def _epilogue(x, o, wo_ref, bo_ref, o_ref):
    y = jax.lax.dot_general(o, wo_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=_F32) \
        + bo_ref[...].astype(_F32)
    o_ref[0] = (x.astype(_F32) + y).astype(o_ref.dtype)


def _k_v0(x_ref, ls_ref, lb_ref, wq_ref, wo_ref, bo_ref, k_ref, v_ref,
          o_ref, *, eps, H, scale):
    x, q = _prefix(x_ref, ls_ref, lb_ref, wq_ref, eps)
    k, v = k_ref[0], v_ref[0]
    dp = q.shape[1] // H
    ctx = []
    for h in range(H):
        sl = slice(h * dp, (h + 1) * dp)
        s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=_F32) * scale
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        ctx.append(jax.lax.dot_general(p, v[:, sl], (((1,), (0,)), ((), ())),
                                       preferred_element_type=_F32
                                       ).astype(x.dtype))
    _epilogue(x, jnp.concatenate(ctx, -1), wo_ref, bo_ref, o_ref)


def _k_v1(x_ref, ls_ref, lb_ref, wq_ref, wo_ref, bo_ref, k_ref, v_ref,
          o_ref, *, eps, H, scale):
    x, q = _prefix(x_ref, ls_ref, lb_ref, wq_ref, eps)
    k, v = k_ref[0], v_ref[0]
    dp = q.shape[1] // H
    ss = []
    for h in range(H):
        sl = slice(h * dp, (h + 1) * dp)
        ss.append(jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=_F32) * scale)
    ctx = []
    for h, s in enumerate(ss):
        sl = slice(h * dp, (h + 1) * dp)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        ctx.append(jax.lax.dot_general(p, v[:, sl], (((1,), (0,)), ((), ())),
                                       preferred_element_type=_F32
                                       ).astype(x.dtype))
    _epilogue(x, jnp.concatenate(ctx, -1), wo_ref, bo_ref, o_ref)


def _k_v2(x_ref, ls_ref, lb_ref, wq_ref, wo_ref, bo_ref, k_ref, v_ref,
          o_ref, *, eps, H, scale):
    x, q = _prefix(x_ref, ls_ref, lb_ref, wq_ref, eps)
    k, v = k_ref[0], v_ref[0]
    dp = q.shape[1] // H
    ctx = []
    for h in range(H):
        sl = slice(h * dp, (h + 1) * dp)
        s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=_F32) * scale
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o_h = jax.lax.dot_general(p.astype(v.dtype), v[:, sl],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=_F32)
        ctx.append((o_h / l).astype(x.dtype))
    _epilogue(x, jnp.concatenate(ctx, -1), wo_ref, bo_ref, o_ref)


def _k_v3(x_ref, ls_ref, lb_ref, wq_ref, wo_ref, bo_ref, k_ref, v_ref,
          o_ref, *, eps, H, scale):
    x, q = _prefix(x_ref, ls_ref, lb_ref, wq_ref, eps)
    k, v = k_ref[0], v_ref[0]
    dp = q.shape[1] // H
    ss = []
    for h in range(H):
        sl = slice(h * dp, (h + 1) * dp)
        ss.append(jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=_F32) * scale)
    ctx = []
    for h, s in enumerate(ss):
        sl = slice(h * dp, (h + 1) * dp)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o_h = jax.lax.dot_general(p.astype(v.dtype), v[:, sl],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=_F32)
        ctx.append((o_h / l).astype(x.dtype))
    _epilogue(x, jnp.concatenate(ctx, -1), wo_ref, bo_ref, o_ref)


def _k_v4(x_ref, ls_ref, lb_ref, wq_ref, wo_ref, bo_ref, k_ref, v_ref,
          o_ref, *, eps, H, scale):
    # MATMUL FLOOR — wrong math (no softmax), scheduling probe only
    x, q = _prefix(x_ref, ls_ref, lb_ref, wq_ref, eps)
    k, v = k_ref[0], v_ref[0]
    dp = q.shape[1] // H
    ctx = []
    for h in range(H):
        sl = slice(h * dp, (h + 1) * dp)
        s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=_F32) * scale
        ctx.append(jax.lax.dot_general(
            s.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=_F32).astype(x.dtype))
    _epilogue(x, jnp.concatenate(ctx, -1), wo_ref, bo_ref, o_ref)


def _k_v5(x_ref, ls_ref, lb_ref, wq_ref, wo_ref, bo_ref, k_ref, v_ref,
          o_ref, *, eps, H, scale):
    x, q = _prefix(x_ref, ls_ref, lb_ref, wq_ref, eps)
    k, v = k_ref[0], v_ref[0]
    dp = q.shape[1] // H
    ss = []
    for h in range(H):
        sl = slice(h * dp, (h + 1) * dp)
        ss.append(jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=_F32) * scale)
    ctx = []
    for h, s in enumerate(ss):
        sl = slice(h * dp, (h + 1) * dp)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp((s - mx).astype(jnp.bfloat16))       # bf16 exp
        l = jnp.sum(p.astype(_F32), axis=-1, keepdims=True)
        o_h = jax.lax.dot_general(p, v[:, sl], (((1,), (0,)), ((), ())),
                                  preferred_element_type=_F32)
        ctx.append((o_h / l).astype(x.dtype))
    _epilogue(x, jnp.concatenate(ctx, -1), wo_ref, bo_ref, o_ref)


def _k_v6(x_ref, ls_ref, lb_ref, wq_ref, wo_ref, bo_ref, k_ref, v_ref,
          o_ref, *, eps, H, scale):
    # v1 + ONE stacked softmax over all heads: concat the 8 (TM,Sk) logit
    # tiles along sublanes -> a single (8*TM,Sk) max/exp/sum/div chain
    x, q = _prefix(x_ref, ls_ref, lb_ref, wq_ref, eps)
    k, v = k_ref[0], v_ref[0]
    dp = q.shape[1] // H
    ss = []
    for h in range(H):
        sl = slice(h * dp, (h + 1) * dp)
        ss.append(jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=_F32) * scale)
    s_all = jnp.concatenate(ss, axis=0)              # (H*TM, Sk)
    mx = jnp.max(s_all, axis=-1, keepdims=True)
    p_all = jnp.exp(s_all - mx)
    p_all = (p_all / jnp.sum(p_all, axis=-1, keepdims=True)).astype(v.dtype)
    tm = q.shape[0]
    ctx = []
    for h in range(H):
        sl = slice(h * dp, (h + 1) * dp)
        ctx.append(jax.lax.dot_general(
            p_all[h * tm:(h + 1) * tm], v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=_F32).astype(x.dtype))
    _epilogue(x, jnp.concatenate(ctx, -1), wo_ref, bo_ref, o_ref)


def _k_v7(x_ref, ls_ref, lb_ref, wq_ref, wo_ref, bo_ref, k_ref, v_ref,
          o_ref, *, eps, H, scale):
    # v1 with log2(e) folded into the logit scale + exp2 (saves one
    # (TM,Sk) fp32 multiply per head inside the transcendental)
    x, q = _prefix(x_ref, ls_ref, lb_ref, wq_ref, eps)
    k, v = k_ref[0], v_ref[0]
    dp = q.shape[1] // H
    s2 = scale * 1.4426950408889634
    ss = []
    for h in range(H):
        sl = slice(h * dp, (h + 1) * dp)
        ss.append(jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=_F32) * s2)
    ctx = []
    for h, s in enumerate(ss):
        sl = slice(h * dp, (h + 1) * dp)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - mx)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        ctx.append(jax.lax.dot_general(p, v[:, sl], (((1,), (0,)), ((), ())),
                                       preferred_element_type=_F32
                                       ).astype(x.dtype))
    _epilogue(x, jnp.concatenate(ctx, -1), wo_ref, bo_ref, o_ref)


def _k_v8(x_ref, ls_ref, lb_ref, wq_ref, wo_ref, bo_ref, k_ref, v_ref,
          o_ref, *, eps, H, scale):
    # explicit 1-stage software pipeline: logits[h+1] issued before
    # softmax+PV[h] retires (finer-grained MXU/VPU interleave than v1's
    # all-logits-then-all-softmax)
    x, q = _prefix(x_ref, ls_ref, lb_ref, wq_ref, eps)
    k, v = k_ref[0], v_ref[0]
    dp = q.shape[1] // H

    def logits(h):
        sl = slice(h * dp, (h + 1) * dp)
        return jax.lax.dot_general(q[:, sl], k[:, sl],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=_F32) * scale

    def sm_pv(h, s):
        sl = slice(h * dp, (h + 1) * dp)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        return jax.lax.dot_general(p, v[:, sl], (((1,), (0,)), ((), ())),
                                   preferred_element_type=_F32
                                   ).astype(x.dtype)

    ctx = []
    s_prev = logits(0)
    for h in range(1, H):
        s_next = logits(h)
        ctx.append(sm_pv(h - 1, s_prev))
        s_prev = s_next
    ctx.append(sm_pv(H - 1, s_prev))
    _epilogue(x, jnp.concatenate(ctx, -1), wo_ref, bo_ref, o_ref)


def _k_v9(x_ref, ls_ref, lb_ref, wq_ref, wo_ref, bo_ref, k_ref, v_ref,
          o_ref, *, eps, H, scale):
    # v1 + row-sum as an MXU matmul (p @ ones) + post-PV divide: the VPU
    # keeps only max+exp; sum and divide ride the (idle-during-softmax) MXU
    x, q = _prefix(x_ref, ls_ref, lb_ref, wq_ref, eps)
    k, v = k_ref[0], v_ref[0]
    dp = q.shape[1] // H
    ss = []
    for h in range(H):
        sl = slice(h * dp, (h + 1) * dp)
        ss.append(jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=_F32) * scale)
    ones = jnp.ones((k.shape[0], 8), v.dtype)
    ctx = []
    for h, s in enumerate(ss):
        sl = slice(h * dp, (h + 1) * dp)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx).astype(v.dtype)
        vv = jnp.concatenate([ones, v[:, sl]], axis=1)   # (Sk, 8+dp)
        ol = jax.lax.dot_general(p, vv, (((1,), (0,)), ((), ())),
                                 preferred_element_type=_F32)
        ctx.append((ol[:, 8:] / ol[:, :1]).astype(x.dtype))
    _epilogue(x, jnp.concatenate(ctx, -1), wo_ref, bo_ref, o_ref)


KERNELS = {"v0": _k_v0, "v1_phased": _k_v1, "v2_postnorm": _k_v2,
           "v3_both": _k_v3, "v4_mmfloor": _k_v4, "v5_bf16exp": _k_v5,
           "v6_stacksm": _k_v6, "v7_exp2": _k_v7, "v8_pipe": _k_v8,
           "v9_mxusum": _k_v9}


@functools.partial(jax.jit, static_argnames=("name", "eps", "H", "block_m"))
def run_variant(name, x, ls, lb, wq, wo, bo, k, v, eps, H, block_m):
    g_, m, c = x.shape
    sk = k.shape[1]
    hdp = wq.shape[1]
    d = c // H
    grid = (g_, m // block_m)
    return pl.pallas_call(
        functools.partial(KERNELS[name], eps=eps, H=H, scale=1.0 / d ** 0.5),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_m, c), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, c), lambda g, i: (0, 0)),
            pl.BlockSpec((1, c), lambda g, i: (0, 0)),
            pl.BlockSpec((c, hdp), lambda g, i: (0, 0)),
            pl.BlockSpec((hdp, c), lambda g, i: (0, 0)),
            pl.BlockSpec((1, c), lambda g, i: (0, 0)),
            pl.BlockSpec((1, sk, hdp), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, sk, hdp), lambda g, i: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_m, c), lambda g, i: (g, i, 0)),
    )(x, ls, lb, wq, wo, bo, k, v)


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
    print(f"{name:40s} {dt:7.3f} ms/iter", flush=True)
    return dt


def main():
    global N
    if "--n" in sys.argv:
        N = int(sys.argv[sys.argv.index("--n") + 1])
    bms = [256, 512]
    if "--bm" in sys.argv:
        bms = [int(sys.argv[sys.argv.index("--bm") + 1])]
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, DT)
    print(f"device: {jax.devices()[0]}  (N={N})", flush=True)

    g, m, sk, c, H = 2, 12288, 1024, 320, 8
    x = r(g, m, c)
    ls, lb = r(1, c) + 1.0, r(1, c)
    wq, wo, bo = r(c, c), r(c, c), r(1, c)
    k, v = r(g, sk, c), r(g, sk, c)

    timeit("CAL x*1.0001 (15.7MB carry)", lambda t: t * 1.0001, x)

    # correctness vs the production kernel before timing
    ref = pf._ln_attn_flat(x, ls, lb, wq, wo, bo, k, v, 1e-5, H, None, 256)
    for name in KERNELS:
        if name in ("v4_mmfloor",):
            continue
        got = run_variant(name, x, ls, lb, wq, wo, bo, k, v, 1e-5, H, 256)
        err = float(jnp.max(jnp.abs(got.astype(_F32) - ref.astype(_F32))))
        tol = (0.05 if name == "v5_bf16exp" else
               5e-3 if name in ("v2_postnorm", "v3_both", "v7_exp2",
                                "v9_mxusum") else 1e-6)
        print(f"  {name}: max|d|={err:.2e} {'OK' if err <= tol else 'FAIL'}",
              flush=True)

    for bm in bms:
        print(f"--- block_m={bm} ---", flush=True)
        for name in KERNELS:
            try:
                timeit(f"attn1 {name} bm{bm}",
                       lambda x_, *a, _n=name, _bm=bm: run_variant(
                           _n, x_, *a, 1e-5, H, _bm),
                       x, ls, lb, wq, wo, bo, k, v)
            except Exception as e:
                print(f"attn1 {name} bm{bm}: FAILED "
                      f"({str(e).splitlines()[0][:90]})", flush=True)


if __name__ == "__main__":
    main()
