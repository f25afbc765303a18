"""A/B the fused 3-sublayer block-prefix kernel (fused_ln_attn3) against
the production chain of three fused_ln_attn calls, at level-0 eval shapes
(b=2 clips -> 12288 tokens, c=320, 8 heads; audio KV 25/128 gathered,
text KV 77/128), chained inside one jit fori_loop (the only honest axon
timing — see CLAUDE.md).

Run (real chip): python tools/attn3_bench.py [--n 50]
"""
import functools
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
EPS3 = (1e-5, 1e-5, 1e-5)


def timeit(name, fn, x, *rest):
    loop = jax.jit(lambda a0, r: jax.lax.fori_loop(
        0, N, lambda i, t: fn(t, *r), a0))
    try:
        out = loop(x, rest)
        s = float(jnp.sum(out.astype(jnp.float32)))
        assert np.isfinite(s), s
        t0 = time.perf_counter()
        out = loop(x, rest)
        s = float(jnp.sum(out.astype(jnp.float32)))
        assert np.isfinite(s), s
        dt = (time.perf_counter() - t0) / N * 1e3
        print(f"{name:44s} {dt:7.3f} ms/iter", flush=True)
        return dt
    except Exception as e:
        print(f"{name:44s} FAILED ({str(e).splitlines()[0][:80]})",
              flush=True)
        return None


def main():
    global N
    if "--n" in sys.argv:
        N = int(sys.argv[sys.argv.index("--n") + 1])
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, DT)
    print(f"device: {jax.devices()[0]}  (N={N})", flush=True)

    b, f, n, c, H = 2, 12, 1024, 320, 8      # level-0 eval shapes
    if "--level1" in sys.argv:
        n, c = 256, 640
    ma, mt = 25, 77
    ska, skt = 128, 128
    x = r(b, f, n, c)

    def sub():
        return (r(1, c) + 1.0, r(1, c), r(c, c), r(c, c), r(1, c))

    s1, sa, st = sub(), sub(), sub()
    k1, v1 = r(b, n, c), r(b, n, c)
    ka, va = r(b, f, ska, c), r(b, f, ska, c)
    kt, vt = r(b, skt, c), r(b, skt, c)

    timeit("CAL x*1.0001 (15.7MB carry)", lambda t: t * 1.0001, x)

    # production chain: three separate fused_ln_attn programs
    @jax.jit
    def chain3(x_, s1_, k1_, v1_, sa_, ka_, va_, st_, kt_, vt_):
        h = pf.fused_ln_attn(x_.reshape(b, f * n, c), *s1_, k1_, v1_,
                             1e-5, H, None, 256)
        h = pf.fused_ln_attn(h.reshape(b * f, n, c), *sa_,
                             ka_.reshape(b * f, ska, c),
                             va_.reshape(b * f, ska, c), 1e-5, H, ma, 256)
        h = pf.fused_ln_attn(h.reshape(b, f * n, c), *st_, kt_, vt_,
                             1e-5, H, mt, 256)
        return h.reshape(b, f, n, c)

    timeit("chain of 3 fused_ln_attn (production)", chain3,
           x, s1, k1, v1, sa, ka, va, st, kt, vt)

    # correctness of fused3 vs the chain before timing
    ref = chain3(x, s1, k1, v1, sa, ka, va, st, kt, vt)
    got = pf.fused_ln_attn3(x, *s1, k1, v1, *sa, ka, va, *st, kt, vt,
                            EPS3, H, (None, ma, mt), 256, (False, True, True))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"  fused3 vs chain: max|d|={err:.2e} "
          f"{'OK' if err < 5e-2 else 'FAIL'}", flush=True)

    for bm, ph1 in ((256, False), (128, True), (256, True), (512, False),
                    (128, False)):
        if bm > n:     # grid n//bm == 0 -> zero programs, bogus timing
            print(f"fused_ln_attn3 bm{bm} ph1={int(ph1)}: skipped (bm > n)",
                  flush=True)
            continue
        timeit(f"fused_ln_attn3 bm{bm} ph1={int(ph1)}",
               lambda x_, *a, _bm=bm, _p=ph1: pf.fused_ln_attn3(
                   x_, *a, EPS3, H, (None, ma, mt), _bm, (_p, True, True)),
               x, *s1, k1, v1, *sa, ka, va, *st, kt, vt)


if __name__ == "__main__":
    main()
