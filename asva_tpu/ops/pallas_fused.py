"""Fused residual-sublayer Pallas TPU kernels for the UNet transformer block.

Motivation (measured, see CLAUDE.md): UNet eval runs at ~96% of its own HBM
byte roofline — 52 GB accessed per batch-2 eval vs 4.8 TF of compute — and
the level-0 transformer blocks dominate the traffic (~3.1 GB each).  XLA
materializes every sub-layer intermediate in HBM: the LayerNorm output, the
q projection, the (TM x Sk) fp32 logits, the GEGLU (tokens x 8C)
intermediate, and each residual add.  These kernels compute one whole
residual sub-layer per pallas_call —

    y = x + W_out( op( W_.. ( LN(x) ) ) )

— reading the residual stream ONCE and writing it ONCE; every intermediate
lives in VMEM.  The weights of a sub-layer (<= ~10 MB at C<=640) stay
VMEM-resident across grid steps (constant index maps).

Kernels:
  * fused_ln_geglu — LayerNorm -> Dense(C, 8C) -> value*gelu(gate)
      -> Dense(4C, C) -> +residual.  Kills the ~250 MB/level-0-block GEGLU
      intermediate round-trip.
  * fused_ln_attn — LayerNorm -> q proj -> multi-head attention against
      PRE-PROJECTED K/V -> out proj -> +residual.  Serves the frame-0-KV
      spatial attention (K/V projected once from frame 0 outside the kernel
      — 1.3 MB vs the 15.7 MB q/o round trips it saves) and the audio/text
      cross-attentions (25/77 context tokens zero-padded to one lane tile
      and length-masked).  Heads are sliced at their NATIVE head_dim (40)
      lane offsets: Mosaic's unaligned-slice relayouts measure cheaper
      than padding every head to a 128-lane slot (narrow 0.85 vs padded
      1.01 ms real for level-0 attn1 — the padded layout pays 3.2x MXU
      flops).  pad_heads/pad_heads_tokens are kept for callers that want
      the padded layout; the kernel is layout-agnostic (it slices
      whatever per-head slot width the weights define).

Backward: fused_ln_geglu falls back to jax.vjp of the numerically-
equivalent XLA composite (same pattern as ops/pallas_attn.py).
fused_ln_attn, when differentiated, runs its FORWARD as the composite
(cheap XLA LN / q-proj / out-proj around the `_mha_fwd_flat` flash kernel,
which also emits the per-head log-sum-exp) and saves o + lse as residuals
named "attn_res"; its backward is hand-written — prefix (LN+q-proj) vjp,
projection matmul grads, and the `_mha_bwd_flat` flash kernel (tiled over
query blocks, K/V + fp32 dK/dV accumulators VMEM-resident, probabilities
rebuilt per tile from the saved log-sum-exp).  So the attention forward
runs exactly once per train step under the "saveconv" remat policy (which
saves "attn_res"), and the (G, H, M, Sk) fp32 probabilities XLA would
otherwise materialize in HBM — 1.6 GB per level-0 spatial attention at
train shapes, measured 89 ms / 71 GB of a ~465 ms train step — never
exist in either direction.

Reference semantics being fused (not copied):
  avgen/models/unets/transformers/ff_spatio_audio_temp_transformer_3d.py
  :278-372 (sub-layer order), avgen/models/unets/utils.py:105-162 (frame-0
  K/V attention).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


_F32 = jnp.float32
HEAD_PAD = 128  # lane-aligned per-head slot width

# test hook: force the fused paths on a non-TPU backend (pair with
# pltpu.force_tpu_interpret_mode)
FORCE = False


def enabled() -> bool:
    return FORCE or jax.default_backend() == "tpu"


def _gelu_exact(x32):
    """Exact (erf) gelu on fp32, Mosaic-lowerable.

    Mosaic has no erf/erfc primitive, so erf comes from the
    Abramowitz-Stegun 7.1.26 rational approximation (max abs error
    1.5e-7 — far below the bf16 activations and the 2e-5 fp32 test
    tolerance).  NOT the tanh "approximate" gelu: the reference uses
    torch's exact erf gelu.
    """
    z = x32 * 0.7071067811865476
    za = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * za)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-za * za)
    erf = jnp.where(z >= 0, erf_abs, -erf_abs)
    return 0.5 * x32 * (1.0 + erf)


def _ln_rows(x32, scale32, bias32, eps):
    """LayerNorm over the last axis of an fp32 tile."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale32 + bias32


# --------------------------------------------------------------------------
# fused LayerNorm + GEGLU feed-forward + residual
# --------------------------------------------------------------------------

def _ff_kernel(x_ref, ls_ref, lb_ref, wi_ref, bi_ref, wo_ref, bo_ref, o_ref,
               *, eps):
    x = x_ref[...]                                   # (TM, C)
    xn = _ln_rows(x.astype(_F32), ls_ref[...].astype(_F32),
                  lb_ref[...].astype(_F32), eps).astype(x.dtype)
    s = jax.lax.dot_general(
        xn, wi_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=_F32) + bi_ref[...].astype(_F32)
    inner = wo_ref.shape[0]
    value, gate = s[:, :inner], s[:, inner:]
    h = (value * _gelu_exact(gate)).astype(x.dtype)
    y = jax.lax.dot_general(
        h, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=_F32) + bo_ref[...].astype(_F32)
    o_ref[...] = (x.astype(_F32) + y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_m"))
def _ln_geglu_flat(x, ls, lb, wi, bi, wo, bo, eps: float, block_m: int):
    m, c = x.shape
    two_inner = wi.shape[1]
    inner = wo.shape[0]
    grid = (m // block_m,)
    return pl.pallas_call(
        functools.partial(_ff_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, two_inner), lambda i: (0, 0)),
            pl.BlockSpec((1, two_inner), lambda i: (0, 0)),
            pl.BlockSpec((inner, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0)),
    )(x, ls, lb, wi, bi, wo, bo)


def _ln_geglu_reference(x, ls, lb, wi, bi, wo, bo, eps):
    """XLA composite with the same numerics contract (LN stats in fp32,
    matmuls in x.dtype with fp32 accumulation)."""
    xn = _ln_rows(x.astype(_F32), ls.astype(_F32).reshape(1, -1),
                  lb.astype(_F32).reshape(1, -1), eps).astype(x.dtype)
    s = jax.lax.dot_general(xn, wi.astype(x.dtype), (((1,), (0,)), ((), ())),
                            preferred_element_type=_F32)
    s = s + bi.astype(_F32).reshape(1, -1)
    inner = wo.shape[0]
    value, gate = s[:, :inner], s[:, inner:]
    h = (value * jax.nn.gelu(gate, approximate=False)).astype(x.dtype)
    y = jax.lax.dot_general(h, wo.astype(x.dtype), (((1,), (0,)), ((), ())),
                            preferred_element_type=_F32)
    return x + (y + bo.astype(_F32).reshape(1, -1)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_ln_geglu(x, ls, lb, wi, bi, wo, bo, eps: float, block_m: int):
    """x (M, C) tokens -> x + FF(LN(x)); every intermediate VMEM-resident.

    ls/lb: LayerNorm scale/bias (1, C); wi (C, 2*inner), bi (1, 2*inner)
    with [value | gate] column layout; wo (inner, C), bo (1, C).
    """
    return _ln_geglu_flat(x, ls, lb, wi, bi, wo, bo, eps, block_m)


def _ff_fwd(x, ls, lb, wi, bi, wo, bo, eps, block_m):
    out = _ln_geglu_flat(x, ls, lb, wi, bi, wo, bo, eps, block_m)
    return out, (x, ls, lb, wi, bi, wo, bo)


def _ff_bwd(eps, block_m, res, g):
    x, ls, lb, wi, bi, wo, bo = res
    _, vjp = jax.vjp(
        lambda *a: _ln_geglu_reference(*a, eps), x, ls, lb, wi, bi, wo, bo)
    return vjp(g)


fused_ln_geglu.defvjp(_ff_fwd, _ff_bwd)


def supports_ff(m: int, c: int, dtype) -> tuple:
    """Viability gate; returns (ok, block_m).  Weights + one token tile of
    fp32 intermediates must fit VMEM (~16 MB)."""
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False, 0
    if c > 640 or c % 8 != 0:
        # C=1280 puts >26 MB of FF weights in VMEM; levels 2/3 move few
        # bytes anyway — XLA keeps them
        return False, 0
    inner = 4 * c
    itm = 2 if dtype == jnp.bfloat16 else 4
    for block_m in (512, 256, 128):
        if m % block_m != 0 or m < 2 * block_m:
            continue
        # weights + fp32 (TM, 2*inner) intermediate + io tiles (x2 buffered)
        vmem = 3 * c * inner * itm + block_m * 2 * inner * 4 \
            + block_m * inner * itm + 4 * block_m * c * itm
        if vmem < 14.5 * 1024 * 1024:
            return True, block_m
    return False, 0


# --------------------------------------------------------------------------
# fused LayerNorm + q proj + MHA over pre-projected K/V + out proj
# + residual (head-padded lane layout)
# --------------------------------------------------------------------------

def pad_heads(w, num_heads: int, axis: int):
    """Pad a (C, H*D) projection (axis=1) or (H*D, C) out-projection
    (axis=0) so each head occupies a HEAD_PAD-lane slot."""
    hd = w.shape[axis]
    d = hd // num_heads
    dp = -(-d // HEAD_PAD) * HEAD_PAD
    if d == dp:
        return w
    if axis == 1:
        w3 = w.reshape(w.shape[0], num_heads, d)
        w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, dp - d)))
        return w3.reshape(w.shape[0], num_heads * dp)
    w3 = w.reshape(num_heads, d, w.shape[1])
    w3 = jnp.pad(w3, ((0, 0), (0, dp - d), (0, 0)))
    return w3.reshape(num_heads * dp, w.shape[1])


def pad_heads_tokens(k, num_heads: int):
    """Zero-pad pre-projected K/V tokens (..., H*D) -> (..., H*Dp)."""
    hd = k.shape[-1]
    d = hd // num_heads
    dp = -(-d // HEAD_PAD) * HEAD_PAD
    if d == dp:
        return k
    k3 = k.reshape(k.shape[:-1] + (num_heads, d))
    k3 = jnp.pad(k3, [(0, 0)] * (k3.ndim - 1) + [(0, dp - d)])
    return k3.reshape(k.shape[:-1] + (num_heads * dp,))


def _sublayer_attn(x, ls_ref, lb_ref, wq_ref, wo_ref, bo_ref, k, v, *,
                   eps, num_heads, kv_len, scale, phased):
    """One residual attention sub-layer on a VMEM tile:
    x + Wo(MHA(Wq(LN(x)), k, v)) + bo, with x (TM, C), k/v (Sk, H*Dp).

    phased=True runs PHASE-SPLIT: every head's QK^T logits are issued
    first (back-to-back MXU work), then every head's softmax+PV.  The long
    scheduling distance between a head's matmul and its (VPU-bound) softmax
    lets Mosaic overlap the units — measured 0.894 -> 0.760 ms on the
    chained level-0 attn1 (v5e, tools/attn_experiments.py; matmul-only
    floor 0.649), BIT-EXACT vs the sequential order.  Costs H extra fp32
    (TM, Sk) logit buffers of VMEM, so callers gate it."""
    xn = _ln_rows(x.astype(_F32), ls_ref[...].astype(_F32),
                  lb_ref[...].astype(_F32), eps).astype(x.dtype)
    q = jax.lax.dot_general(
        xn, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=_F32).astype(x.dtype)  # (TM, H*Dp)
    sk = k.shape[0]
    dp = q.shape[1] // num_heads

    def logits(h):
        sl = slice(h * dp, (h + 1) * dp)             # lane-aligned
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=_F32) * scale     # (TM, Sk) fp32
        if kv_len is not None and kv_len < sk:
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(cols < kv_len, s, -1e9)
        return s

    def sm_pv(h, s):
        sl = slice(h * dp, (h + 1) * dp)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        return jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=_F32).astype(x.dtype)

    if phased:
        ss = [logits(h) for h in range(num_heads)]
        ctx = [sm_pv(h, s) for h, s in enumerate(ss)]
    else:
        ctx = [sm_pv(h, logits(h)) for h in range(num_heads)]
    o = jnp.concatenate(ctx, axis=-1)                # (TM, H*Dp)
    y = jax.lax.dot_general(
        o, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=_F32) + bo_ref[...].astype(_F32)
    return (x.astype(_F32) + y).astype(x.dtype)


def _attn_kernel(x_ref, ls_ref, lb_ref, wq_ref, wo_ref, bo_ref,
                 k_ref, v_ref, o_ref, *, eps, num_heads, kv_len, scale,
                 phased=False):
    o_ref[0] = _sublayer_attn(
        x_ref[0], ls_ref, lb_ref, wq_ref, wo_ref, bo_ref, k_ref[0], v_ref[0],
        eps=eps, num_heads=num_heads, kv_len=kv_len, scale=scale,
        phased=phased).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "num_heads", "kv_len", "block_m"))
def _ln_attn_flat(x, ls, lb, wq, wo, bo, k, v, eps, num_heads, kv_len,
                  block_m):
    """x (G, M, C) token groups; k/v (G, Sk, H*Dp) pre-projected,
    head-padded.  Group g's queries attend group g's K/V."""
    g_, m, c = x.shape
    sk = k.shape[1]
    hdp = wq.shape[1]
    d = c // num_heads                               # true head dim
    scale = 1.0 / (d ** 0.5)
    grid = (g_, m // block_m)
    itm = 2 if x.dtype == jnp.bfloat16 else 4
    base_vmem = (2 * c * hdp + 2 * sk * hdp + 3 * block_m * c
                 + 2 * block_m * hdp) * itm
    phased = (base_vmem + num_heads * block_m * sk * 4
              < 13 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_attn_kernel, eps=eps, num_heads=num_heads,
                          kv_len=kv_len, scale=scale, phased=phased),
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


def _ln_attn_reference(x, ls, lb, wq, wo, bo, k, v, eps, num_heads, kv_len):
    g_, m, c = x.shape
    d = c // num_heads  # softmax scale uses the LOGICAL head dim, not dp
    xn = _ln_rows(x.astype(_F32), ls.astype(_F32).reshape(1, 1, -1),
                  lb.astype(_F32).reshape(1, 1, -1), eps).astype(x.dtype)
    q = xn @ wq.astype(x.dtype)
    # one attention-math implementation: _mha_einsum also backs the
    # mha_kvshared kernel tests — keeping a second copy here invited
    # silent numeric divergence between the two fallback paths
    o = _mha_einsum(q, k, v, num_heads, kv_len, 1.0 / (d ** 0.5))
    y = jax.lax.dot_general(o, wo.astype(x.dtype), (((2,), (0,)), ((), ())),
                            preferred_element_type=_F32)
    return x + (y + bo.astype(_F32).reshape(1, 1, -1)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_ln_attn(x, ls, lb, wq, wo, bo, k, v, eps: float, num_heads: int,
                  kv_len, block_m: int):
    """x (G, M, C) -> x + Wo(MHA(Wq(LN(x)), k, v)).

    wq (C, H*Dp) and wo (H*Dp, C) are head-padded (see pad_heads); k/v
    (G, Sk, H*Dp) are pre-projected with the padded layout.  kv_len
    (static) masks zero-padded KV rows beyond the true context length.
    """
    return _ln_attn_flat(x, ls, lb, wq, wo, bo, k, v, eps, num_heads,
                         kv_len, block_m)


def _attn_fwd(x, ls, lb, wq, wo, bo, k, v, eps, num_heads, kv_len, block_m):
    ok_b, bwd_bm = supports_mha_bwd(x.shape[1], k.shape[1], wq.shape[1],
                                    num_heads, x.dtype)
    if enabled() and ok_b:
        # DIFFERENTIATED forward: run the composite (cheap XLA LN/q-proj/
        # out-proj around the flash kernel) and keep o + lse as NAMED
        # residuals.  The backward then never re-runs the attention forward
        # — it re-derives q from x via the cheap LN+matmul prefix and feeds
        # the flash backward kernel directly.  Under the `saveconv` remat
        # policy the "attn_res" name keeps o/lse across the remat boundary,
        # so the fwd attention kernel runs exactly ONCE per train step
        # (previously: fwd + remat recompute + vjp recompute).
        from jax.ad_checkpoint import checkpoint_name
        d = x.shape[2] // num_heads
        xn = _ln_rows(x.astype(_F32), ls.astype(_F32).reshape(1, 1, -1),
                      lb.astype(_F32).reshape(1, 1, -1), eps).astype(x.dtype)
        q = jax.lax.dot_general(xn, wq.astype(x.dtype),
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=_F32).astype(x.dtype)
        o, lse = _mha_fwd_flat(q, k, v, num_heads, kv_len, 1.0 / (d ** 0.5),
                               bwd_bm)
        y = jax.lax.dot_general(o, wo.astype(x.dtype),
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=_F32)
        out = x + (y + bo.astype(_F32).reshape(1, 1, -1)).astype(x.dtype)
        o = checkpoint_name(o, "attn_res")
        lse = checkpoint_name(lse, "attn_res")
        return out, (x, ls, lb, wq, wo, bo, k, v, o, lse)
    out = _ln_attn_flat(x, ls, lb, wq, wo, bo, k, v, eps, num_heads,
                        kv_len, block_m)
    return out, (x, ls, lb, wq, wo, bo, k, v)


def _attn_bwd(eps, num_heads, kv_len, block_m, res, g):
    if len(res) == 10:
        # manual backward around the saved (o, lse): the attention forward
        # kernel NEVER re-runs.  Only the LN + q-projection prefix is
        # recomputed (two cheap ops) to obtain q and its vjp.
        x, ls, lb, wq, wo, bo, k, v, o, lse = res
        _, bwd_bm = supports_mha_bwd(x.shape[1], k.shape[1], wq.shape[1],
                                     num_heads, x.dtype)
        d = x.shape[2] // num_heads
        dp = wq.shape[1] // num_heads

        def prefix(x_, ls_, lb_, wq_):
            xn = _ln_rows(x_.astype(_F32),
                          ls_.astype(_F32).reshape(1, 1, -1),
                          lb_.astype(_F32).reshape(1, 1, -1),
                          eps).astype(x.dtype)
            return jax.lax.dot_general(
                xn, wq_.astype(x.dtype), (((2,), (0,)), ((), ())),
                preferred_element_type=_F32).astype(x.dtype)

        q, prefix_vjp = jax.vjp(prefix, x, ls, lb, wq)
        g32 = g.astype(_F32)
        # out = x + cast(o @ wo_cast + bo32)
        do = jax.lax.dot_general(
            g32, wo.astype(x.dtype).astype(_F32),
            (((2,), (1,)), ((), ())),
            preferred_element_type=_F32).astype(x.dtype)       # (G, M, HDp)
        dwo = jax.lax.dot_general(
            o.astype(_F32), g32, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=_F32).astype(wo.dtype)      # (HDp, C)
        dbo = jnp.sum(g32, axis=(0, 1)).reshape(bo.shape).astype(bo.dtype)
        # flash identity: rowsum(dP * P) == per-head rowsum(dO * O)
        gm = x.shape[0], x.shape[1]
        dd = jnp.sum(do.astype(_F32).reshape(gm + (num_heads, dp))
                     * o.astype(_F32).reshape(gm + (num_heads, dp)),
                     axis=-1)                                  # (G, M, H)
        dq, dk, dv = _mha_bwd_flat(q, k, v, do, lse, dd, num_heads,
                                   kv_len, 1.0 / (d ** 0.5), bwd_bm)
        dx_p, dls, dlb, dwq = prefix_vjp(dq)
        return (g + dx_p, dls, dlb, dwq, dwo, dbo, dk, dv)
    x, ls, lb, wq, wo, bo, k, v = res
    fn = lambda *a: _ln_attn_reference(*a, eps, num_heads, kv_len)
    _, vjp = jax.vjp(fn, x, ls, lb, wq, wo, bo, k, v)
    return vjp(g)


fused_ln_attn.defvjp(_attn_fwd, _attn_bwd)


# --------------------------------------------------------------------------
# fused 3-sublayer transformer-block prefix:
#   x = x + Attn1(LN(x))        frame-0-KV spatial self-attention
#   x = x + AudioX(LN(x))       audio cross-attention (gathered per-frame KV)
#   x = x + TextX(LN(x))        text cross-attention
# one pallas_call per block — the residual stream stays in VMEM across all
# three sub-layers instead of round-tripping HBM between kernels (the
# sub-layer order is the reference's
# ff_spatio_audio_temp_transformer_3d.py:278-372; temporal attention and
# the GEGLU FF follow outside).  All K/V are pre-projected outside exactly
# as for fused_ln_attn.  GENERATION path only: when differentiated it
# falls back to jax.vjp over the XLA reference composite (training keeps
# the per-sub-layer kernels whose custom_vjp saves o/lse flash residuals).
# --------------------------------------------------------------------------

def _attn3_kernel(x_ref,
                  ls1_ref, lb1_ref, wq1_ref, wo1_ref, bo1_ref, k1_ref, v1_ref,
                  lsa_ref, lba_ref, wqa_ref, woa_ref, boa_ref, ka_ref, va_ref,
                  lst_ref, lbt_ref, wqt_ref, wot_ref, bot_ref, kt_ref, vt_ref,
                  o_ref, *, eps3, num_heads, kv_lens, scale, phased3):
    x = x_ref[0, 0]                                   # (TM, C)
    x = _sublayer_attn(x, ls1_ref, lb1_ref, wq1_ref, wo1_ref, bo1_ref,
                       k1_ref[0], v1_ref[0], eps=eps3[0],
                       num_heads=num_heads, kv_len=kv_lens[0], scale=scale,
                       phased=phased3[0])
    x = _sublayer_attn(x, lsa_ref, lba_ref, wqa_ref, woa_ref, boa_ref,
                       ka_ref[0, 0], va_ref[0, 0], eps=eps3[1],
                       num_heads=num_heads, kv_len=kv_lens[1], scale=scale,
                       phased=phased3[1])
    x = _sublayer_attn(x, lst_ref, lbt_ref, wqt_ref, wot_ref, bot_ref,
                       kt_ref[0], vt_ref[0], eps=eps3[2],
                       num_heads=num_heads, kv_len=kv_lens[2], scale=scale,
                       phased=phased3[2])
    o_ref[0, 0] = x.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps3", "num_heads", "kv_lens",
                                    "block_m", "phased3"))
def _ln_attn3_flat(x, ls1, lb1, wq1, wo1, bo1, k1, v1,
                   lsa, lba, wqa, woa, boa, ka, va,
                   lst, lbt, wqt, wot, bot, kt, vt,
                   eps3, num_heads, kv_lens, block_m, phased3):
    """x (B, F, N, C); k1/v1 (B, Sk1, HDp) frame-0 KV per batch item;
    ka/va (B, F, Ska, HDp) gathered audio KV per (batch, frame);
    kt/vt (B, Skt, HDp) text KV per batch item."""
    b, f, n, c = x.shape
    sk1, ska, skt = k1.shape[1], ka.shape[2], kt.shape[1]
    d = c // num_heads
    scale = 1.0 / (d ** 0.5)
    grid = (b, f, n // block_m)

    def vec():
        return pl.BlockSpec((1, c), lambda b_, f_, i: (0, 0))

    def mat(w):
        return pl.BlockSpec(w.shape, lambda b_, f_, i: (0, 0))

    def per_b(w):
        return pl.BlockSpec((1,) + w.shape[1:], lambda b_, f_, i: (b_, 0, 0))

    def per_bf(w):
        return pl.BlockSpec((1, 1) + w.shape[2:],
                            lambda b_, f_, i: (b_, f_, 0, 0))

    tile = pl.BlockSpec((1, 1, block_m, c), lambda b_, f_, i: (b_, f_, i, 0))
    return pl.pallas_call(
        functools.partial(_attn3_kernel, eps3=eps3, num_heads=num_heads,
                          kv_lens=kv_lens, scale=scale, phased3=phased3),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            tile,
            vec(), vec(), mat(wq1), mat(wo1), vec(), per_b(k1), per_b(v1),
            vec(), vec(), mat(wqa), mat(woa), vec(), per_bf(ka), per_bf(va),
            vec(), vec(), mat(wqt), mat(wot), vec(), per_b(kt), per_b(vt),
        ],
        out_specs=tile,
    )(x, ls1, lb1, wq1, wo1, bo1, k1, v1,
      lsa, lba, wqa, woa, boa, ka, va,
      lst, lbt, wqt, wot, bot, kt, vt)


def _ln_attn3_reference(x, ls1, lb1, wq1, wo1, bo1, k1, v1,
                        lsa, lba, wqa, woa, boa, ka, va,
                        lst, lbt, wqt, wot, bot, kt, vt,
                        eps3, num_heads, kv_lens):
    b, f, n, c = x.shape
    h = _ln_attn_reference(x.reshape(b, f * n, c), ls1, lb1, wq1, wo1, bo1,
                           k1, v1, eps3[0], num_heads, kv_lens[0])
    h = _ln_attn_reference(h.reshape(b * f, n, c), lsa, lba, wqa, woa, boa,
                           ka.reshape((b * f,) + ka.shape[2:]),
                           va.reshape((b * f,) + va.shape[2:]),
                           eps3[1], num_heads, kv_lens[1])
    h = _ln_attn_reference(h.reshape(b, f * n, c), lst, lbt, wqt, wot, bot,
                           kt, vt, eps3[2], num_heads, kv_lens[2])
    return h.reshape(b, f, n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(22, 23, 24, 25, 26))
def fused_ln_attn3(x, ls1, lb1, wq1, wo1, bo1, k1, v1,
                   lsa, lba, wqa, woa, boa, ka, va,
                   lst, lbt, wqt, wot, bot, kt, vt,
                   eps3, num_heads: int, kv_lens, block_m: int, phased3):
    return _ln_attn3_flat(x, ls1, lb1, wq1, wo1, bo1, k1, v1,
                          lsa, lba, wqa, woa, boa, ka, va,
                          lst, lbt, wqt, wot, bot, kt, vt,
                          eps3, num_heads, kv_lens, block_m, phased3)


def _attn3_fwd(x, *args_and_statics):
    args = args_and_statics[:21]
    eps3, num_heads, kv_lens, block_m, phased3 = args_and_statics[21:]
    out = _ln_attn3_flat(x, *args, eps3, num_heads, kv_lens, block_m,
                         phased3)
    return out, (x,) + args


def _attn3_bwd(eps3, num_heads, kv_lens, block_m, phased3, res, g):
    _, vjp = jax.vjp(
        lambda *a: _ln_attn3_reference(*a, eps3, num_heads, kv_lens), *res)
    return vjp(g)


fused_ln_attn3.defvjp(_attn3_fwd, _attn3_bwd)


def supports_attn3(n: int, sk1: int, ska: int, skt: int, c: int,
                   num_heads: int, dtype) -> tuple:
    """(ok, block_m, phased3) gate for fused_ln_attn3 (native narrow-head
    layout, hdp == c).  Candidates are ordered by measured preference on
    v5e (tools/attn3_bench.py); the VMEM model mirrors supports_attn plus
    the two extra sub-layers' weights/KV/logits."""
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False, 0, ()
    if c % num_heads != 0 or any(s % 128 != 0 for s in (sk1, ska, skt)):
        return False, 0, ()
    itm = 2 if dtype == jnp.bfloat16 else 4
    base = 6 * c * c * itm + 2 * (sk1 + ska + skt) * c * itm
    # measured on v5e (tools/attn3_bench.py, chained, net of carry):
    # level-0 (c=320, n=1024): (512,seq) 1.347 ~= (256,phased) 1.360 <
    #   chain-of-3 1.436 < (256,seq) 1.615 < (128,phased) 1.647
    # level-1 (c=640, n=256):  (256,phased) 0.323 < chain 0.345 <
    #   (256,seq) 0.365 < (128,phased) 0.428
    # prefer (512,seq) then (256,phased); the 14.5 MB budget admits
    # level-1's (256,phased) estimate (12.7 MB; compiles at ~13 real
    # vs the 16 MB scoped limit) while still rejecting the level-0
    # (512,phased) config that genuinely OOMs (~21 MB)
    for block_m, ph1 in ((512, False), (256, True), (512, True),
                         (256, False), (128, True), (128, False)):
        if block_m > n or n % block_m != 0:
            continue
        tiles = 7 * block_m * c * itm
        logits = ((num_heads if ph1 else 1) * sk1
                  + num_heads * (ska + skt)) * block_m * 4
        if base + tiles + logits < 14.5 * 1024 * 1024:
            return True, block_m, (ph1, True, True)
    return False, 0, ()


# --------------------------------------------------------------------------
# flash-backward multi-head attention over shared (pre-projected) K/V.
#
# Used inside fused_ln_attn's backward composite: the forward kernel also
# emits the per-head log-sum-exp, and the backward kernel rebuilds each
# query tile's probabilities from it — so the (M x Sk) fp32 logits never
# exist outside VMEM in EITHER direction.  dK/dV are accumulated in fp32
# output blocks that stay VMEM-resident across the (sequential) query-tile
# grid steps, matching XLA's single-contraction fp32 accumulation.
# --------------------------------------------------------------------------

def _mha_groups(m: int, sk: int, hdp: int, num_heads: int, block_m: int,
                dtype) -> tuple:
    """(fwd_group, bwd_group) phased-ordering group sizes for the flash
    kernels: heads are processed in groups whose MXU matmuls (QK^T; plus
    dO V^T in the backward) are all issued before any of the group's VPU
    softmax/exp work — the long scheduling distance lets Mosaic overlap
    the units, bit-exactly (pure instruction reorder).

    Measured matrix (tools/mha_phase_bench.py, v5e, chained fori_loop,
    training shapes at per-chip batch 4): fwd g2 wins ~8-17% at every
    hdp<=640 shape (L0.attn1 2.559->2.362 ms, L0.text 1.588->1.344,
    L1.attn1 1.273->1.061); few-row-tile small-KV grids prefer the full
    split (L0.audio g8 1.488->1.251); hdp=1280 (L2) LOSES with any
    phasing (0.905 seq best) — the wide weight tiles leave no VMEM slack
    and the per-head matmuls are already wide enough to fill the MXU.
    Backward: only the small-KV shapes respond (L0.audio b4
    1.804->1.569, L0.text b2 1.807->1.700); sk>=256 is noise-level, so
    bwd keeps the production order there."""
    if hdp >= 1280:
        return 1, 1
    itm = 2 if dtype == jnp.bfloat16 else 4
    few_tiles = m // block_m <= 2
    fg = 8 if (sk <= 256 and few_tiles) else 2
    while fg > 1 and (2 * sk * hdp * itm + 2 * block_m * hdp * itm
                      + fg * block_m * sk * 4) > 12 * 1024 * 1024:
        fg //= 2
    bg = (4 if few_tiles else 2) if sk <= 128 else 1
    return max(fg, 1), max(bg, 1)


def _mha_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, num_heads,
                    kv_len, scale, group=1):
    q = q_ref[0]                                     # (TM, H*Dp)
    k = k_ref[0]                                     # (Sk, H*Dp)
    v = v_ref[0]
    sk = k.shape[0]
    dp = q.shape[1] // num_heads

    def logits(h):
        sl = slice(h * dp, (h + 1) * dp)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=_F32) * scale     # (TM, Sk) fp32
        if kv_len is not None and kv_len < sk:
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(cols < kv_len, s, -1e9)
        return s

    outs = [None] * num_heads
    lses = [None] * num_heads
    for h0 in range(0, num_heads, group):
        hs = range(h0, min(h0 + group, num_heads))
        ss = [logits(h) for h in hs]                 # MXU, back-to-back
        for h, s in zip(hs, ss):
            sl = slice(h * dp, (h + 1) * dp)
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            l = jnp.sum(p, axis=-1, keepdims=True)
            outs[h] = jax.lax.dot_general(
                (p / l).astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=_F32).astype(q.dtype)
            lses[h] = mx + jnp.log(l)                # (TM, 1) fp32
    o_ref[0] = jnp.concatenate(outs, axis=-1)
    lse_ref[0] = jnp.concatenate(lses, axis=-1)      # (TM, H)


def _mha_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                    dq_ref, dk_ref, dv_ref, *, num_heads, kv_len, scale,
                    group=1):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    q = q_ref[0]                                     # (TM, H*Dp)
    k = k_ref[0]                                     # (Sk, H*Dp)
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]                                 # (TM, H) fp32
    dd = dd_ref[0]                                   # (TM, H) fp32
    sk = k.shape[0]
    dp = q.shape[1] // num_heads

    def s_of(h):
        sl = slice(h * dp, (h + 1) * dp)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=_F32) * scale     # (TM, Sk) fp32
        if kv_len is not None and kv_len < sk:
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(cols < kv_len, s, -1e9)
        return s

    def dpv_of(h):
        sl = slice(h * dp, (h + 1) * dp)
        return jax.lax.dot_general(
            do[:, sl], v[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=_F32)             # (TM, Sk) fp32

    def tail(h, p, dpv):
        sl = slice(h * dp, (h + 1) * dp)
        ds = (p * (dpv - dd[:, h:h + 1]) * scale).astype(q.dtype)
        pb = p.astype(v.dtype)
        dq_h = jax.lax.dot_general(
            ds, k[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=_F32).astype(dq_ref.dtype)
        # (Sk, Dp) contractions over the tile's TM rows; fp32 accumulation
        # across grid steps in the VMEM-resident output blocks
        dk_ref[0, :, sl] += jax.lax.dot_general(
            ds, q[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=_F32)
        dv_ref[0, :, sl] += jax.lax.dot_general(
            pb, do[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=_F32)
        return dq_h

    dq_parts = [None] * num_heads
    if group <= 1:                                   # production ordering
        for h in range(num_heads):
            s = s_of(h)
            p = jnp.exp(s - lse[:, h:h + 1])         # == softmax rows
            dpv = dpv_of(h)
            dq_parts[h] = tail(h, p, dpv)
    else:
        # phased: the whole group's QK^T and dO V^T matmuls are issued
        # before any of its VPU exp/ds work (see _mha_groups)
        for h0 in range(0, num_heads, group):
            hs = list(range(h0, min(h0 + group, num_heads)))
            ss = [s_of(h) for h in hs]
            dpvs = [dpv_of(h) for h in hs]
            for h, s, dpv in zip(hs, ss, dpvs):
                dq_parts[h] = tail(h, jnp.exp(s - lse[:, h:h + 1]), dpv)
    dq_ref[0] = jnp.concatenate(dq_parts, axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "kv_len", "scale",
                                    "block_m"))
def _mha_fwd_flat(q, k, v, num_heads, kv_len, scale, block_m):
    g_, m, hdp = q.shape
    sk = k.shape[1]
    grid = (g_, m // block_m)
    fwd_group, _ = _mha_groups(m, sk, hdp, num_heads, block_m, q.dtype)
    return pl.pallas_call(
        functools.partial(_mha_fwd_kernel, num_heads=num_heads,
                          kv_len=kv_len, scale=scale, group=fwd_group),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct((g_, m, num_heads), _F32)),
        grid=grid,
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


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "kv_len", "scale",
                                    "block_m"))
def _mha_bwd_flat(q, k, v, do, lse, dd, num_heads, kv_len, scale, block_m):
    g_, m, hdp = q.shape
    sk = k.shape[1]
    grid = (g_, m // block_m)
    _, bwd_group = _mha_groups(m, sk, hdp, num_heads, block_m, q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_mha_bwd_kernel, num_heads=num_heads,
                          kv_len=kv_len, scale=scale, group=bwd_group),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, _F32),
                   jax.ShapeDtypeStruct(v.shape, _F32)),
        grid=grid,
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


def _mha_einsum(q, k, v, num_heads, kv_len, scale):
    """XLA einsum attention on the flat (G, M, H*Dp) layout — the exact
    attention math inside _ln_attn_reference."""
    g_, m, hdp = q.shape
    sk = k.shape[1]
    dp = hdp // num_heads
    qh = q.reshape(g_, m, num_heads, dp)
    kh = k.reshape(g_, sk, num_heads, dp)
    vh = v.reshape(g_, sk, num_heads, dp)
    s = jnp.einsum("gmhd,gkhd->ghmk", qh, kh,
                   preferred_element_type=_F32) * scale
    if kv_len is not None and kv_len < sk:
        cols = jnp.arange(sk)
        s = jnp.where(cols[None, None, None, :] < kv_len, s, -1e9)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("ghmk,gkhd->gmhd", p, vh,
                   preferred_element_type=_F32).astype(q.dtype)
    return o.reshape(g_, m, hdp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def mha_kvshared(q, k, v, num_heads: int, kv_len, scale: float,
                 block_m: int):
    """Multi-head attention, flat per-head-slot layout: q (G, M, H*Dp),
    k/v (G, Sk, H*Dp) pre-projected -> o (G, M, H*Dp).  Forward AND
    backward are Pallas kernels; logits/probabilities never leave VMEM.
    (fused_ln_attn's fwd/bwd rules call the flat kernels directly; this
    wrapper is the standalone differentiable API.)"""
    o, _ = _mha_fwd_flat(q, k, v, num_heads, kv_len, scale, block_m)
    return o


def _mha_fwd_rule(q, k, v, num_heads, kv_len, scale, block_m):
    o, lse = _mha_fwd_flat(q, k, v, num_heads, kv_len, scale, block_m)
    return o, (q, k, v, o, lse)


def _mha_bwd_rule(num_heads, kv_len, scale, block_m, res, g):
    q, k, v, o, lse = res
    g_, m, hdp = q.shape
    dp = hdp // num_heads
    # flash identity: rowsum(dP * P) == per-head rowsum(dO * O)
    dd = jnp.sum(g.astype(_F32).reshape(g_, m, num_heads, dp)
                 * o.astype(_F32).reshape(g_, m, num_heads, dp), axis=-1)
    return _mha_bwd_flat(q, k, v, g.astype(q.dtype), lse, dd, num_heads,
                         kv_len, scale, block_m)


mha_kvshared.defvjp(_mha_fwd_rule, _mha_bwd_rule)


def supports_mha_bwd(m: int, sk: int, hdp: int, num_heads: int,
                     dtype) -> tuple:
    """(ok, block_m) gate for the flash-backward path: K/V + fp32 dK/dV
    accumulators + one tile's fp32 logits/probability temporaries must fit
    VMEM."""
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False, 0
    if sk % 128 != 0 or hdp % num_heads != 0:
        return False, 0
    itm = 2 if dtype == jnp.bfloat16 else 4
    for block_m in (512, 256, 128):
        if block_m > m or m % block_m != 0:
            continue
        vmem = (2 * sk * hdp * itm            # K, V
                + 2 * sk * hdp * 4            # dK, dV fp32 accumulators
                + 3 * block_m * hdp * itm     # q, do, dq tiles
                + 4 * block_m * sk * 4        # s/p/dpv/ds fp32 temporaries
                + 4 * block_m * num_heads * 4)
        # measured on v5e: the (bm=512, sk=1024, hdp=320) level-0 config
        # estimates 13.4 MB here but allocates 16.00 MB scoped (io double
        # buffering etc.) — 4 KB over the 16 MB limit; 11.5 MB estimated
        # keeps ~2.6 MB of real headroom and drops that config to bm=256
        if vmem < 11.5 * 1024 * 1024:
            return True, block_m
    return False, 0


# --------------------------------------------------------------------------
# fused FFInflatedConv 3-tap temporal mix:
#   out = y + y0 @ k_head + y_{f-1} @ k_prev + y_f @ k_curr + bias
# (prev of frame 0 is frame 0 itself — the concat-shift semantics of the
# reference, avgen/models/unets/utils.py:43-52).  One pallas_call replaces
# 3 XLA matmul launches + a shifted-copy concat + chained adds; the frame
# tiles are read via three index maps (current / clamped-prev / frame 0).
#
# STATUS: tested but UNWIRED — measured on v5e, XLA runs the in-module mix
# nearly free (ffconv 1.01 ms vs plain conv 0.99 ms chained), so the
# kernel buys nothing today.  Kept as the ready fallback if a future
# frame-count/layout change makes the mix expensive again.
# --------------------------------------------------------------------------

def _mix_kernel(yc_ref, yp_ref, y0_ref, kh_ref, kp_ref, kc_ref, b_ref,
                o_ref):
    yc = yc_ref[0, 0]                                # (TN, C)
    yp = yp_ref[0, 0]
    y0 = y0_ref[0, 0]
    dn = (((1,), (0,)), ((), ()))
    mix = jax.lax.dot_general(y0, kh_ref[...], dn,
                              preferred_element_type=_F32)
    mix += jax.lax.dot_general(yp, kp_ref[...], dn,
                               preferred_element_type=_F32)
    mix += jax.lax.dot_general(yc, kc_ref[...], dn,
                               preferred_element_type=_F32)
    o_ref[0, 0] = (yc.astype(_F32) + mix
                   + b_ref[...].astype(_F32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n",))
def _ff_mix_flat(y, kh, kp, kc, bias, block_n: int):
    b, f, n, c = y.shape
    grid = (b, f, n // block_n)
    blk = (1, 1, block_n, c)
    return pl.pallas_call(
        _mix_kernel,
        out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(blk, lambda b_, f_, i: (b_, f_, i, 0)),
            pl.BlockSpec(blk,
                         lambda b_, f_, i: (b_, jnp.maximum(f_ - 1, 0), i, 0)),
            pl.BlockSpec(blk, lambda b_, f_, i: (b_, 0, i, 0)),
            pl.BlockSpec((c, c), lambda b_, f_, i: (0, 0)),
            pl.BlockSpec((c, c), lambda b_, f_, i: (0, 0)),
            pl.BlockSpec((c, c), lambda b_, f_, i: (0, 0)),
            pl.BlockSpec((1, c), lambda b_, f_, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(blk, lambda b_, f_, i: (b_, f_, i, 0)),
    )(y, y, y, kh, kp, kc, bias)


def _ff_mix_reference(y, kh, kp, kc, bias):
    """XLA composite: identical math to the FFInflatedConv mix path."""
    head = y[:, 0:1] @ kh.astype(y.dtype)
    zp = y @ kp.astype(y.dtype)
    prev = jnp.concatenate([zp[:, 0:1], zp[:, :-1]], axis=1)
    return y + head + prev + (y @ kc.astype(y.dtype)) \
        + bias.astype(y.dtype).reshape(1, 1, 1, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_ff_mix(y, kh, kp, kc, bias, block_n: int):
    """y (B, F, N, C) -> y + first/prev/current 3-tap temporal linear mix."""
    return _ff_mix_flat(y, kh, kp, kc, bias, block_n)


def _mix_fwd(y, kh, kp, kc, bias, block_n):
    return _ff_mix_flat(y, kh, kp, kc, bias, block_n), (y, kh, kp, kc, bias)


def _mix_bwd(block_n, res, g):
    y, kh, kp, kc, bias = res
    _, vjp = jax.vjp(
        lambda *a: _ff_mix_reference(*a).astype(y.dtype), y, kh, kp, kc,
        bias)
    return vjp(g.astype(y.dtype))


fused_ff_mix.defvjp(_mix_fwd, _mix_bwd)


def supports_mix(f: int, n: int, c: int, dtype) -> tuple:
    """(ok, block_n) for fused_ff_mix."""
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False, 0
    itm = 2 if dtype == jnp.bfloat16 else 4
    for block_n in (1024, 512, 256, 128, 64):
        if block_n > n or n % block_n != 0:
            continue
        vmem = 3 * c * c * itm + 5 * block_n * c * max(itm, 4)
        if vmem < 13 * 1024 * 1024:
            return True, block_n
    return False, 0


def supports_attn(m: int, sk: int, c: int, num_heads: int, dtype,
                  hdp: int = 0) -> tuple:
    """(ok, block_m) gate for fused_ln_attn.  VMEM: projection weights
    (C, hdp)/(hdp, C) + K/V (Sk, hdp) + x/q/out tiles + fp32 logits.

    `hdp` is the projection width wq.shape[1]: equal to C for the native
    narrow-head layout the UNet uses, but H*128 for head-PADDED callers
    (pad_heads/pad_heads_tokens, e.g. tools/kernel_bench.py) — which can be
    >3x C, so sizing those terms with C would admit configs that OOM scoped
    VMEM.  Defaults to C when not given."""
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False, 0
    if sk % 128 != 0 or c % num_heads != 0:
        return False, 0
    hdp = hdp or c
    itm = 2 if dtype == jnp.bfloat16 else 4
    for block_m in (512, 256, 128):
        if block_m > m or m % block_m != 0:
            continue
        vmem = (2 * c * hdp + 2 * sk * hdp + 3 * block_m * c
                + 2 * block_m * hdp) * itm + block_m * sk * 4
        if vmem < 13 * 1024 * 1024:
            return True, block_m
    return False, 0
