"""Phased-ordering probe for the TRAINING flash attention kernels.

The r5 generation win (attn_experiments.py v1: all heads' QK^T issued
before any softmax+PV, Mosaic overlaps MXU and VPU; level-0 attn1
0.894 -> 0.760 ms) was applied to the _ln_attn_flat / attn3 kernels —
the GENERATION path.  Training's attention runs through the flash pair
(pallas_fused._mha_fwd_kernel / _mha_bwd_kernel), which still loop heads
sequentially.  This tool measures phased variants at the real training
shapes (batch 4, f=12):

  fwd  f0 sequential (== production)    f1 full phase-split (bit-exact)
  bwd  b0 sequential (== production)
       b1 within-head reorder: s and dpv (both MXU) issued back-to-back
          before the VPU exp — zero extra VMEM
       b2 pair-phased: heads in groups of 2, both s issued then the rest
       b4 quad-phased: groups of 4
       b3 full phase-split of s (8 extra fp32 logit buffers — VMEM-gated)

Chained fori_loop in one jit (carry: fwd = o feeds x-slot... fwd carries
q; bwd carries do <- dq).  Run: python tools/mha_phase_bench.py [--n 30]
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
N = 30
DT = jnp.bfloat16


# ---------------------------------------------------------------- forward
def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, num_heads, kv_len,
                scale, group):
    """group=1 == production sequential; group=num_heads == full phased."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    sk = k.shape[0]
    dp = q.shape[1] // num_heads

    def logits(h):
        sl = slice(h * dp, (h + 1) * dp)
        s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=_F32) * scale
        if kv_len is not None and kv_len < sk:
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(cols < kv_len, s, -1e9)
        return s

    outs, lses = [], []
    for h0 in range(0, num_heads, group):
        hs = range(h0, min(h0 + group, num_heads))
        ss = [logits(h) for h in hs]
        for h, s in zip(hs, ss):
            sl = slice(h * dp, (h + 1) * dp)
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            l = jnp.sum(p, axis=-1, keepdims=True)
            outs.append(jax.lax.dot_general(
                (p / l).astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=_F32).astype(q.dtype))
            lses.append(mx + jnp.log(l))
    o_ref[0] = jnp.concatenate(outs, axis=-1)
    lse_ref[0] = jnp.concatenate(lses, axis=-1)


@functools.partial(jax.jit, static_argnames=("num_heads", "kv_len", "scale",
                                             "block_m", "group"))
def fwd_flat(q, k, v, num_heads, kv_len, scale, block_m, group):
    g_, m, hdp = q.shape
    sk = k.shape[1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads, kv_len=kv_len,
                          scale=scale, group=group),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct((g_, m, num_heads), _F32)),
        grid=(g_, m // block_m),
        in_specs=[
            pl.BlockSpec((1, block_m, hdp), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, sk, hdp), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, sk, hdp), lambda g, i: (g, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_m, hdp), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, block_m, num_heads), lambda g, i: (g, i, 0)),
        ),
    )(q, k, v)


# ---------------------------------------------------------------- backward
def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                dq_ref, dk_ref, dv_ref, *, num_heads, kv_len, scale,
                variant):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    dd = dd_ref[0]
    sk = k.shape[0]
    dp = q.shape[1] // num_heads

    def s_of(h):
        sl = slice(h * dp, (h + 1) * dp)
        s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=_F32) * scale
        if kv_len is not None and kv_len < sk:
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(cols < kv_len, s, -1e9)
        return s

    def dpv_of(h):
        sl = slice(h * dp, (h + 1) * dp)
        return jax.lax.dot_general(do[:, sl], v[:, sl],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=_F32)

    def rest(h, s, dpv):
        sl = slice(h * dp, (h + 1) * dp)
        qh, kh, doh = q[:, sl], k[:, sl], do[:, sl]
        p = jnp.exp(s - lse[:, h:h + 1])
        ds = (p * (dpv - dd[:, h:h + 1]) * scale).astype(q.dtype)
        pb = p.astype(v.dtype)
        dq_h = jax.lax.dot_general(ds, kh, (((1,), (0,)), ((), ())),
                                   preferred_element_type=_F32
                                   ).astype(dq_ref.dtype)
        dk_ref[0, :, sl] += jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=_F32)
        dv_ref[0, :, sl] += jax.lax.dot_general(
            pb, doh, (((0,), (0,)), ((), ())), preferred_element_type=_F32)
        return dq_h

    dq_parts = [None] * num_heads
    if variant == "b0":               # production order: s, exp, dpv, rest
        for h in range(num_heads):
            sl = slice(h * dp, (h + 1) * dp)
            s = s_of(h)
            p = jnp.exp(s - lse[:, h:h + 1])
            dpv = dpv_of(h)
            ds = (p * (dpv - dd[:, h:h + 1]) * scale).astype(q.dtype)
            pb = p.astype(v.dtype)
            dq_parts[h] = jax.lax.dot_general(
                ds, k[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=_F32).astype(dq_ref.dtype)
            dk_ref[0, :, sl] += jax.lax.dot_general(
                ds, q[:, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=_F32)
            dv_ref[0, :, sl] += jax.lax.dot_general(
                pb, do[:, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=_F32)
    else:
        group = {"b1": 1, "b2": 2, "b4": 4, "b3": num_heads}[variant]
        for h0 in range(0, num_heads, group):
            hs = list(range(h0, min(h0 + group, num_heads)))
            ss = [s_of(h) for h in hs]          # MXU, issued back-to-back
            dpvs = [dpv_of(h) for h in hs]      # MXU
            for h, s, dpv in zip(hs, ss, dpvs):
                dq_parts[h] = rest(h, s, dpv)
    dq_ref[0] = jnp.concatenate(dq_parts, axis=-1)


@functools.partial(jax.jit, static_argnames=("num_heads", "kv_len", "scale",
                                             "block_m", "variant"))
def bwd_flat(q, k, v, do, lse, dd, num_heads, kv_len, scale, block_m,
             variant):
    g_, m, hdp = q.shape
    sk = k.shape[1]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads, kv_len=kv_len,
                          scale=scale, variant=variant),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, _F32),
                   jax.ShapeDtypeStruct(v.shape, _F32)),
        grid=(g_, m // block_m),
        in_specs=[
            pl.BlockSpec((1, block_m, hdp), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, sk, hdp), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, sk, hdp), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, block_m, hdp), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, block_m, num_heads), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, block_m, num_heads), lambda g, i: (g, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_m, hdp), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, sk, hdp), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, sk, hdp), lambda g, i: (g, 0, 0)),
        ),
    )(q, k, v, do, lse, dd)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def timeit(name, fn, carry0, *rest):
    """fn(carry, *rest) -> next carry; statics must be closed over in fn,
    only arrays go through rest."""
    loop = jax.jit(lambda a0, r: jax.lax.fori_loop(
        0, N, lambda i, x: fn(x, *r), a0))
    out = loop(carry0, rest)
    s = float(jnp.sum(out.astype(jnp.float32)))
    assert np.isfinite(s), (name, s)
    t0 = time.perf_counter()
    out = loop(carry0, rest)
    s = float(jnp.sum(out.astype(jnp.float32)))
    assert np.isfinite(s), (name, s)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:44s} {dt:7.3f} ms/iter", flush=True)
    return dt


def bench_shape(tag, g, m, sk, hdp, H, kv_len, bms):
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, DT)
    q, k, v, do = r(g, m, hdp), r(g, sk, hdp), r(g, sk, hdp), r(g, m, hdp)
    scale = 1.0 / ((hdp // H) ** 0.5)
    # real lse/dd from the production fwd so exp(s - lse) stays bounded
    o, lse = pf._mha_fwd_flat(q, k, v, H, kv_len, scale, bms[0])
    dp = hdp // H
    dd = jnp.sum(do.astype(_F32).reshape(g, m, H, dp)
                 * o.astype(_F32).reshape(g, m, H, dp), axis=-1)
    print(f"=== {tag}: G={g} M={m} Sk={sk} HDp={hdp} H={H} "
          f"kv_len={kv_len} ===", flush=True)

    # correctness: every variant that compiles must match production
    # bit-exactly (pure instruction reorders); VMEM-OOM variants are
    # dropped from the timing matrix
    ok_fwd, ok_bwd = set(), set()
    for grp in (1, 2, 4, H):
        try:
            of, _ = fwd_flat(q, k, v, H, kv_len, scale, bms[0], grp)
            err = float(jnp.max(jnp.abs(of.astype(_F32) - o.astype(_F32))))
            assert err == 0.0, (grp, err)
            ok_fwd.add(grp)
        except AssertionError:
            raise
        except Exception as e:
            print(f"  fwd g{grp} bm{bms[0]}: compile FAILED "
                  f"({str(e).splitlines()[0][:80]})", flush=True)
    ref = pf._mha_bwd_flat(q, k, v, do, lse, dd, H, kv_len, scale, bms[0])
    for var in ("b0", "b1", "b2", "b4", "b3"):
        try:
            got = bwd_flat(q, k, v, do, lse, dd, H, kv_len, scale,
                           bms[0], var)
            errs = [float(jnp.max(jnp.abs(a.astype(_F32) - b.astype(_F32))))
                    for a, b in zip(got, ref)]
            assert max(errs) == 0.0, (var, errs)
            ok_bwd.add(var)
        except AssertionError:
            raise
        except Exception as e:
            print(f"  bwd {var} bm{bms[0]}: compile FAILED "
                  f"({str(e).splitlines()[0][:80]})", flush=True)
    print(f"  parity: fwd {sorted(ok_fwd)} bwd {sorted(ok_bwd)} "
          "bit-exact vs production", flush=True)

    for bm in bms:
        if m % bm:
            continue
        for grp in (1, 2, 4, H):
            if bm == bms[0] and grp != 1 and grp not in ok_fwd:
                continue
            label = "seq(prod)" if grp == 1 else f"phased g{grp}"
            try:
                timeit(f"{tag} fwd {label} bm{bm}",
                       lambda q_, k_, v_, _bm=bm, _g=grp: fwd_flat(
                           q_, k_, v_, H, kv_len, scale, _bm, _g)[0],
                       q, k, v)
            except Exception as e:
                print(f"{tag} fwd {label} bm{bm}: FAILED "
                      f"({str(e).splitlines()[0][:80]})", flush=True)
        for var in ("b0", "b1", "b2", "b4", "b3"):
            if bm == bms[0] and var != "b0" and var not in ok_bwd:
                continue
            try:
                timeit(f"{tag} bwd {var} bm{bm}",
                       lambda do_, *arr, _bm=bm, _v=var: bwd_flat(
                           arr[0], arr[1], arr[2], do_, arr[3], arr[4],
                           H, kv_len, scale, _bm, _v)[0],
                       do, q, k, v, lse, dd)
            except Exception as e:
                print(f"{tag} bwd {var} bm{bm}: FAILED "
                      f"({str(e).splitlines()[0][:80]})", flush=True)


def main():
    global N
    if "--n" in sys.argv:
        N = int(sys.argv[sys.argv.index("--n") + 1])
    print(f"device: {jax.devices()[0]}  (N={N})", flush=True)
    # training shapes at per-chip batch 4, f=12 (see primitives.py call
    # sites): attn1 flattens to (b, f*n, c); cross-attn audio to (b*f, n, c)
    bench_shape("L0.attn1", 4, 12288, 1024, 320, 8, None, [256, 128])
    bench_shape("L0.audio", 48, 1024, 128, 320, 8, 25, [512])
    bench_shape("L0.text", 4, 12288, 128, 320, 8, 77, [512])
    bench_shape("L1.attn1", 4, 3072, 256, 640, 8, None, [512])
    bench_shape("L2.attn1", 4, 768, 128, 1280, 8, 64, [256])


if __name__ == "__main__":
    main()
