"""Pallas VMEM-attention kernel: interpret-mode parity + vjp fallback."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from asva_tpu.ops.pallas_attn import (_attention_flat, _einsum_attention,
                                      supports, vmem_attention)


def test_kernel_matches_einsum_interpret(rng):
    q = jnp.asarray(rng.standard_normal((4, 1024, 40)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((4, 256, 40)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((4, 256, 40)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        o1 = _attention_flat(q, k, v, block_q=256)
    o2 = _einsum_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5,
                               rtol=1e-5)


def test_kernel_bf16_interpret(rng):
    q = jnp.asarray(rng.standard_normal((2, 512, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 512, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 512, 64)), jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        o1 = _attention_flat(q, k, v, block_q=256)
    o2 = _einsum_attention(q, k, v)
    diff = jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)).max()
    assert float(diff) < 3e-2


def test_vjp_falls_back_to_einsum(rng):
    """Gradients flow through the custom_vjp (einsum backward)."""
    q = jnp.asarray(rng.standard_normal((1, 256, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 128, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 128, 32)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(_einsum_attention(q, k, v) ** 2)

    def loss_kernel(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(vmem_attention(q, k, v) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)


def test_supports_gate():
    assert supports(12 * 1024, 1024, 40, jnp.bfloat16)      # level 0
    assert not supports(12 * 1024, 128, 40, jnp.bfloat16)   # short KV: XLA
    assert not supports(12 * 64, 64, 160, jnp.bfloat16)     # tiny: use XLA
    assert not supports(100, 100, 40, jnp.bfloat16)         # misaligned


def test_cross_kernel_kv_mask_interpret(rng):
    from asva_tpu.ops.pallas_attn import vmem_cross_attention
    q = jnp.asarray(rng.standard_normal((2, 1024, 40)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 77, 40)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 77, 40)), jnp.float32)
    kp = jnp.pad(k, ((0, 0), (0, 51), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 51), (0, 0)))
    with pltpu.force_tpu_interpret_mode():
        o1 = vmem_cross_attention(q, kp, vp, 77)
    o2 = _einsum_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5,
                               rtol=1e-5)
