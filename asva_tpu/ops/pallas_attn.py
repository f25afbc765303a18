"""Pallas TPU kernel: cross/self attention with the whole K/V resident in
VMEM — the AVSyncD spatial-attention shapes (q: 12 frames x 1024 tokens,
kv: <= 1024 tokens, head_dim 40..160).

Why not stock flash attention: measured 2x SLOWER here (head_dim 40 pads to
a 128 lane tile and the online-softmax machinery is overhead when S_k fits
in VMEM).  Why not plain XLA: it materializes the (S_q x S_k) fp32 logits in
HBM (~800 MB per level-0 attention), making the op bandwidth-bound —
measured ~3.7 ms where this kernel only streams q/k/v/o (~8 MB).

Kernel: grid (batch*heads, S_q/TQ); each program loads one q block and the
full K/V for its (batch, head), computes fp32 logits in VMEM, row softmax,
and the PV product.  Backward falls back to the XLA einsum path via
custom_vjp (training remats anyway; inference is the hot path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len):
    q = q_ref[0]                      # (TQ, D)
    k = k_ref[0]                      # (S_k, D)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (TQ, S_k) fp32
    if kv_len is not None and kv_len < k.shape[0]:
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols < kv_len, s, -1e9)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "kv_len"))
def _attention_flat(q, k, v, block_q: int = 512, kv_len=None):
    """q (BH, Sq, D), k/v (BH, Sk, D) -> (BH, Sq, D).  kv_len masks padded
    KV rows beyond that length (static)."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    if sq % block_q != 0:  # remainder rows would never be written
        raise ValueError(f"sq={sq} not a multiple of block_q={block_q}")
    scale = 1.0 / (d ** 0.5)
    grid = (bh, sq // block_q)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_len=kv_len),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
    )(q, k, v)


def _einsum_attention(q, k, v):
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@jax.custom_vjp
def vmem_attention(q, k, v):
    """Attention with VMEM-resident K/V.  q (BH, Sq, D); k/v (BH, Sk, D)."""
    return _attention_flat(q, k, v)


def _fwd(q, k, v):
    return _attention_flat(q, k, v), (q, k, v)


def _bwd(res, g):
    # XLA einsum backward (numerically identical softmax-attention grad)
    q, k, v = res
    _, vjp = jax.vjp(_einsum_attention, q, k, v)
    return vjp(g)


vmem_attention.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def vmem_cross_attention(q, k, v, kv_len: int):
    """Like vmem_attention, but K/V are zero-padded to a 128-multiple and
    logits beyond kv_len are masked (for short contexts like 77 text
    tokens)."""
    return _attention_flat(q, k, v, kv_len=kv_len)


def _cfwd(q, k, v, kv_len):
    return _attention_flat(q, k, v, kv_len=kv_len), (q, k, v)


def _cbwd(kv_len, res, g):
    q, k, v = res

    def ref(q, k, v):
        d = q.shape[-1]
        scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
        s = jnp.einsum("bqd,bkd->bqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        cols = jnp.arange(s.shape[-1])
        s = jnp.where(cols[None, None, :] < kv_len, s, -1e9)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


vmem_cross_attention.defvjp(_cfwd, _cbwd)


def supports(sq: int, sk: int, d: int, dtype) -> bool:
    """Kernel profitability/viability gate: KV + one logits block must fit
    VMEM, and the shapes should be big enough that logits traffic matters."""
    if sk % 128 != 0 or sq % 128 != 0:
        return False
    # _attention_flat's grid is sq // block_q with block_q = min(512, sq):
    # a non-multiple would leave the remainder query rows UNWRITTEN
    # (uninitialized VMEM in the output)
    if sq % min(512, sq) != 0:
        return False
    if sq < 1024 or sk < 256:
        # XLA handles small/short-KV shapes fine (measured: the padded-KV
        # kernel on 77 text tokens was ~2% slower end-to-end)
        return False
    itm = 2 if dtype == jnp.bfloat16 else 4
    vmem = sk * d * itm * 2 + 512 * sk * 4 + 512 * d * 4
    return vmem < 12 * 1024 * 1024
