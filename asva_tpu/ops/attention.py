"""Attention primitives.

All UNet attention flavours (first-frame spatial, audio cross, text cross,
temporal) reduce to one batched multi-head SDPA with optional boolean mask
and optional broadcast of K/V over a leading axis.  Sequence lengths here are
tiny (<= 4096 spatial tokens, 229 audio, 77 text, 12 frames), so the right
TPU strategy is a single fused einsum chain that XLA maps onto the MXU —
flash-style tiling buys nothing below ~8k tokens.  A Pallas kernel is kept
behind the same signature for the masked-audio case (see ops/pallas_attn.py).

Reference semantics: diffusers Attention + F.scaled_dot_product_attention as
used in avgen/models/unets/utils.py:105-162 (softmax in fp32, scale
1/sqrt(head_dim), boolean mask = True means attend).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Batched multi-head attention.

    q: (..., Lq, H, D)
    k, v: (..., Lk, H, D) — leading axes must broadcast against q's.
    mask: optional boolean, broadcastable to (..., H, Lq, Lk); True = attend.

    Returns (..., Lq, H, D), in q.dtype; softmax runs in float32.
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=jnp.float32))
    logits = jnp.einsum("...qhd,...khd->...hqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.asarray(-1e9, logits.dtype))
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("...hqk,...khd->...qhd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
