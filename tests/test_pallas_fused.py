"""Fused residual-sublayer kernels: interpret-mode parity + vjp fallback."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from asva_tpu.ops.pallas_fused import (
    _ln_attn_reference, _ln_geglu_reference, fused_ln_attn, fused_ln_geglu,
    pad_heads, supports_attn, supports_ff)


def _ff_args(rng, m=512, c=320, dtype=jnp.float32):
    inner = 4 * c
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, dtype)
    return (r(m, c), r(1, c) + 1.0, r(1, c), r(c, 2 * inner),
            r(1, 2 * inner), r(inner, c), r(1, c))


def test_ff_kernel_matches_reference(rng):
    args = _ff_args(rng)
    with pltpu.force_tpu_interpret_mode():
        o1 = fused_ln_geglu(*args, 1e-5, 256)
    o2 = _ln_geglu_reference(*args, 1e-5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=2e-5, rtol=2e-5)


def test_ff_kernel_bf16(rng):
    args = _ff_args(rng, m=256, c=320, dtype=jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        o1 = fused_ln_geglu(*args, 1e-5, 128)
    o2 = _ln_geglu_reference(*args, 1e-5)
    diff = jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)).max()
    assert float(diff) < 3e-2


def test_ff_kernel_matches_flax_module_math(rng):
    """The reference composite == the unfused module path (LN fp32 stats,
    Dense in dtype): compare against flax layers directly."""
    from flax import linen as nn

    from asva_tpu.ops.norms import AdaptiveOrLayerNorm

    c, inner = 64, 256
    x = jnp.asarray(rng.standard_normal((128, c)), jnp.float32)

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = AdaptiveOrLayerNorm(name="norm")(x)
            h = nn.Dense(2 * inner, name="proj_in")(h)
            value, gate = jnp.split(h, 2, axis=-1)
            h = value * nn.gelu(gate, approximate=False)
            return x + nn.Dense(c, name="proj_out")(h)

    params = Ref().init(jax.random.PRNGKey(0), x)
    want = Ref().apply(params, x)
    p = params["params"]
    got = _ln_geglu_reference(
        x, p["norm"]["scale"].reshape(1, -1), p["norm"]["bias"].reshape(1, -1),
        p["proj_in"]["kernel"], p["proj_in"]["bias"].reshape(1, -1),
        p["proj_out"]["kernel"], p["proj_out"]["bias"].reshape(1, -1), 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_ff_vjp_falls_back(rng):
    args = _ff_args(rng, m=256, c=64)

    def loss_k(*a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_ln_geglu(*a, 1e-5, 128) ** 2)

    def loss_r(*a):
        return jnp.sum(_ln_geglu_reference(*a, 1e-5) ** 2)

    g1 = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    g2 = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def _attn_args(rng, g=2, m=512, sk=256, c=320, heads=8, dtype=jnp.float32):
    d = c // heads
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, dtype)
    wq = pad_heads(r(c, c), heads, axis=1)
    wo = pad_heads(r(c, c), heads, axis=0)
    kv_pad = pad_heads(jnp.eye(c, dtype=dtype), heads, axis=1)
    k = r(g, sk, c) @ kv_pad      # pre-projected K/V in padded layout
    v = r(g, sk, c) @ kv_pad
    return (r(g, m, c), r(1, c) + 1.0, r(1, c), wq, wo, r(1, c), k, v)


def test_attn_kernel_matches_reference(rng):
    args = _attn_args(rng)
    with pltpu.force_tpu_interpret_mode():
        o1 = fused_ln_attn(*args, 1e-5, 8, None, 256)
    o2 = _ln_attn_reference(*args, 1e-5, 8, None)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=2e-5, rtol=2e-5)


def test_attn_kernel_kv_mask(rng):
    """Zero-padded KV rows beyond kv_len must not affect the output."""
    args = list(_attn_args(rng, sk=128))
    k, v = args[6], args[7]
    keep = 77
    mask = (jnp.arange(128) < keep)[None, :, None]
    args[6] = jnp.where(mask, k, 0.0)
    args[7] = jnp.where(mask, v, 0.0)
    with pltpu.force_tpu_interpret_mode():
        o1 = fused_ln_attn(*args, 1e-5, 8, keep, 256)
    # reference on the TRUE 77 tokens only
    ref_args = list(args)
    ref_args[6] = args[6][:, :keep]
    ref_args[7] = args[7][:, :keep]
    o2 = _ln_attn_reference(*ref_args, 1e-5, 8, None)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=2e-5, rtol=2e-5)


def test_attn_vjp_falls_back(rng):
    args = _attn_args(rng, g=1, m=256, sk=128, c=64, heads=2)

    def loss_k(*a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_ln_attn(*a, 1e-5, 2, None, 128) ** 2)

    def loss_r(*a):
        return jnp.sum(_ln_attn_reference(*a, 1e-5, 2, None) ** 2)

    g1 = jax.grad(loss_k, argnums=tuple(range(8)))(*args)
    g2 = jax.grad(loss_r, argnums=tuple(range(8)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_mha_flash_fwd_matches_einsum(rng):
    from asva_tpu.ops.pallas_fused import _mha_einsum, mha_kvshared
    g, m, sk, hd, heads = 2, 512, 256, 320, 8
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    q, k, v = r(g, m, hd), r(g, sk, hd), r(g, sk, hd)
    scale = 1.0 / (40 ** 0.5)
    with pltpu.force_tpu_interpret_mode():
        o1 = mha_kvshared(q, k, v, heads, None, scale, 256)
    o2 = _mha_einsum(q, k, v, heads, None, scale)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=2e-5, rtol=2e-5)


def test_mha_flash_bwd_matches_einsum_grads(rng):
    """The Pallas flash backward (LSE-rebuilt probabilities, fp32 dK/dV
    tile accumulation) == XLA softmax-attention gradients."""
    from asva_tpu.ops.pallas_fused import _mha_einsum, mha_kvshared
    g, m, sk, hd, heads = 1, 256, 128, 80, 2
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    q, k, v = r(g, m, hd), r(g, sk, hd), r(g, sk, hd)
    co = r(g, m, hd)  # cotangent mixer so grads aren't symmetric
    scale = 1.0 / (40 ** 0.5)

    def loss_k(q, k, v):
        return jnp.sum(mha_kvshared(q, k, v, heads, None, scale, 128) * co)

    def loss_r(q, k, v):
        return jnp.sum(_mha_einsum(q, k, v, heads, None, scale) * co)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_mha_flash_bwd_kv_mask(rng):
    """Masked (padded) KV rows get zero gradient and don't affect dq."""
    from asva_tpu.ops.pallas_fused import _mha_einsum, mha_kvshared
    g, m, sk, hd, heads, keep = 1, 128, 128, 64, 2, 77
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    q, k, v = r(g, m, hd), r(g, sk, hd), r(g, sk, hd)
    scale = 1.0 / (32 ** 0.5)

    def loss_k(q, k, v):
        return jnp.sum(mha_kvshared(q, k, v, heads, keep, scale, 128) ** 2)

    def loss_r(q, k, v):
        return jnp.sum(_mha_einsum(q, k, v, heads, keep, scale) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
    assert float(jnp.abs(g1[1][:, keep:]).max()) == 0.0
    assert float(jnp.abs(g1[2][:, keep:]).max()) == 0.0


def test_fused_attn_flash_bwd_engages_and_matches(rng, monkeypatch):
    """fused_ln_attn grads with the flash backward (FORCE on, gate passes)
    == the XLA reference composite grads."""
    import asva_tpu.ops.pallas_fused as pf
    args = _attn_args(rng, g=1, m=512, sk=128, c=320, heads=8)
    ok, bm = pf.supports_mha_bwd(512, 128, args[3].shape[1], 8, jnp.float32)
    assert ok

    def loss_k(*a):
        return jnp.sum(fused_ln_attn(*a, 1e-5, 8, None, 256) ** 2)

    def loss_r(*a):
        return jnp.sum(_ln_attn_reference(*a, 1e-5, 8, None) ** 2)

    monkeypatch.setattr(pf, "FORCE", True)
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_k, argnums=tuple(range(8)))(*args)
    g2 = jax.grad(loss_r, argnums=tuple(range(8)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_supports_mha_bwd_gate():
    from asva_tpu.ops.pallas_fused import supports_mha_bwd
    ok, bm = supports_mha_bwd(12 * 1024, 1024, 320, 8, jnp.bfloat16)
    assert ok and 12 * 1024 % bm == 0
    ok, _ = supports_mha_bwd(3072, 256, 640, 8, jnp.bfloat16)
    assert ok
    assert not supports_mha_bwd(1000, 128, 320, 8, jnp.bfloat16)[0]
    assert not supports_mha_bwd(512, 100, 320, 8, jnp.bfloat16)[0]


def test_pad_heads_roundtrip(rng):
    """Padded projections compute the same attention as unpadded."""
    c, heads = 320, 8
    w = jnp.asarray(rng.standard_normal((c, c)), jnp.float32)
    wp = pad_heads(w, heads, axis=1)
    assert wp.shape == (c, heads * 128)
    x = jnp.asarray(rng.standard_normal((4, c)), jnp.float32)
    got = (x @ wp).reshape(4, heads, 128)[:, :, :40]
    want = (x @ w).reshape(4, heads, 40)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_supports_gates():
    ok, bm = supports_ff(24 * 1024, 320, jnp.bfloat16)
    assert ok and bm in (128, 256, 512) and 24 * 1024 % bm == 0
    assert not supports_ff(24 * 1024, 1280, jnp.bfloat16)[0]
    assert not supports_ff(100, 320, jnp.bfloat16)[0]
    ok, bm = supports_attn(12 * 1024, 1024, 320, 8, jnp.bfloat16)
    assert ok and bm in (128, 256, 512) and 12 * 1024 % bm == 0
    ok, _ = supports_attn(1024, 128, 320, 8, jnp.bfloat16)
    assert ok
    assert not supports_attn(1000, 128, 320, 8, jnp.bfloat16)[0]


def test_transformer_block_fused_matches_unfused(rng, monkeypatch):
    """The whole SpatioAudioTempTransformerBlock: fused Pallas sub-layers
    (forced, interpret mode) == the plain XLA path."""
    import asva_tpu.ops.pallas_fused as pf
    from asva_tpu.models.imagebind_audio import segment_token_indices
    from asva_tpu.models.unet3d.transformer import (
        SpatioAudioTempTransformerBlock)

    b, f, n, c, heads = 1, 4, 512, 320, 8
    blk = SpatioAudioTempTransformerBlock(c, heads, c // heads)
    x = jnp.asarray(rng.standard_normal((b, f, n, c)) * 0.1, jnp.float32)
    text = jnp.asarray(rng.standard_normal((b, 77, 768)) * 0.1, jnp.float32)
    audio = jnp.asarray(rng.standard_normal((b, 229, 768)) * 0.1, jnp.float32)
    idx = jnp.asarray(segment_token_indices(f, (12, 19)))
    params = blk.init(jax.random.PRNGKey(0), x, text, audio, None, idx)

    want = blk.apply(params, x, text, audio, None, idx)
    monkeypatch.setattr(pf, "FORCE", True)
    with pltpu.force_tpu_interpret_mode():
        got = blk.apply(params, x, text, audio, None, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-5)


def test_ff_mix_kernel_matches_reference(rng):
    from asva_tpu.ops.pallas_fused import (_ff_mix_reference, fused_ff_mix,
                                           supports_mix)
    b, f, n, c = 2, 4, 256, 64
    y = jnp.asarray(rng.standard_normal((b, f, n, c)) * 0.1, jnp.float32)
    kh = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.float32)
    kp = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.float32)
    kc = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((1, c)) * 0.05, jnp.float32)
    ok, bn = supports_mix(f, n, c, jnp.float32)
    assert ok
    with pltpu.force_tpu_interpret_mode():
        o1 = fused_ff_mix(y, kh, kp, kc, bias, bn)
    o2 = _ff_mix_reference(y, kh, kp, kc, bias)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=2e-5, rtol=2e-5)


def test_ff_mix_vjp_falls_back(rng):
    from asva_tpu.ops.pallas_fused import (_ff_mix_reference, fused_ff_mix)
    b, f, n, c = 1, 3, 128, 32
    y = jnp.asarray(rng.standard_normal((b, f, n, c)) * 0.1, jnp.float32)
    ws = [jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.float32)
          for _ in range(3)]
    bias = jnp.zeros((1, c), jnp.float32)

    def loss_k(*a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_ff_mix(*a, 128) ** 2)

    def loss_r(*a):
        return jnp.sum(_ff_mix_reference(*a) ** 2)

    g1 = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(y, *ws, bias)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(y, *ws, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_transformer_block_fused_grads_match(rng, monkeypatch):
    """Gradients through the fused block (custom_vjp -> XLA composite
    backward) match the unfused path — the training contract."""
    import asva_tpu.ops.pallas_fused as pf
    from asva_tpu.models.imagebind_audio import segment_token_indices
    from asva_tpu.models.unet3d.transformer import (
        SpatioAudioTempTransformerBlock)

    b, f, n, c, heads = 1, 4, 256, 320, 8
    blk = SpatioAudioTempTransformerBlock(c, heads, c // heads)
    x = jnp.asarray(rng.standard_normal((b, f, n, c)) * 0.1, jnp.float32)
    text = jnp.asarray(rng.standard_normal((b, 77, 768)) * 0.1, jnp.float32)
    audio = jnp.asarray(rng.standard_normal((b, 229, 768)) * 0.1,
                        jnp.float32)
    idx = jnp.asarray(segment_token_indices(f, (12, 19)))
    params = blk.init(jax.random.PRNGKey(0), x, text, audio, None, idx)

    def loss(p, x_):
        return jnp.sum(blk.apply(p, x_, text, audio, None, idx) ** 2)

    gp_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(params, x)
    monkeypatch.setattr(pf, "FORCE", True)
    with pltpu.force_tpu_interpret_mode():
        gp_fused, gx_fused = jax.grad(loss, argnums=(0, 1))(params, x)
    def close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5,
                                   rtol=2e-5)

    close(gx_fused, gx_ref)
    for a, b_ in zip(jax.tree.leaves(gp_fused), jax.tree.leaves(gp_ref)):
        close(a, b_)


# ---------------------------------------------------------------------------
# fused 3-sublayer block prefix (attn1 + audio-x + text-x in one program)
# ---------------------------------------------------------------------------

def _attn3_args(rng, b=2, f=3, n=256, c=64, ma=128, mt=128,
                dtype=jnp.float32):
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, dtype)

    def sub():
        return (r(1, c) + 1.0, r(1, c), r(c, c), r(c, c), r(1, c))

    x = r(b, f, n, c)
    k1, v1 = r(b, n, c), r(b, n, c)          # sk1 == n (lane multiple)
    ka, va = r(b, f, ma, c), r(b, f, ma, c)  # gathered per-frame audio KV
    kt, vt = r(b, mt, c), r(b, mt, c)        # shared text KV
    return (x, *sub(), k1, v1, *sub(), ka, va, *sub(), kt, vt)


def test_attn3_kernel_matches_reference(rng):
    from asva_tpu.ops.pallas_fused import _ln_attn3_reference, fused_ln_attn3
    args = _attn3_args(rng)
    eps3, kv_lens = (1e-5, 1e-5, 1e-5), (None, 25, 77)
    with pltpu.force_tpu_interpret_mode():
        o1 = fused_ln_attn3(*args, eps3, 4, kv_lens, 128,
                            (True, True, True))
    o2 = _ln_attn3_reference(*args, eps3, 4, kv_lens)
    assert o1.shape == args[0].shape
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=2e-5, rtol=2e-5)


def test_attn3_phase_flags_equivalent(rng):
    """Sequential vs phased per-head ordering is bit-identical."""
    from asva_tpu.ops.pallas_fused import fused_ln_attn3
    args = _attn3_args(rng, b=1, f=2)
    eps3, kv_lens = (1e-5, 1e-5, 1e-5), (None, 25, 77)
    with pltpu.force_tpu_interpret_mode():
        o1 = fused_ln_attn3(*args, eps3, 4, kv_lens, 128,
                            (True, True, True))
        o2 = fused_ln_attn3(*args, eps3, 4, kv_lens, 128,
                            (False, False, False))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_attn3_vjp_falls_back(rng):
    from asva_tpu.ops.pallas_fused import _ln_attn3_reference, fused_ln_attn3
    args = _attn3_args(rng, b=1, f=2, n=128)
    eps3, kv_lens = (1e-5, 1e-5, 1e-5), (None, 25, 77)

    def loss_k(*a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_ln_attn3(*a, eps3, 4, kv_lens, 128,
                                          (True, True, True)) ** 2)

    def loss_r(*a):
        return jnp.sum(_ln_attn3_reference(*a, eps3, 4, kv_lens) ** 2)

    g1 = jax.grad(loss_k, argnums=(0, 6, 7))(*args)
    g2 = jax.grad(loss_r, argnums=(0, 6, 7))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_block_fused3_matches_sequential(rng, monkeypatch):
    """fuse_blocks=True (one attn3 program) == the sequential sub-layer
    path, same params; and the param trees are identical."""
    import asva_tpu.ops.pallas_fused as pf
    from asva_tpu.models.imagebind_audio import segment_token_indices
    from asva_tpu.models.unet3d.transformer import (
        SpatioAudioTempTransformerBlock)

    b, f, n, c, heads = 1, 4, 256, 320, 8
    blk_seq = SpatioAudioTempTransformerBlock(c, heads, c // heads)
    blk_fused = SpatioAudioTempTransformerBlock(c, heads, c // heads,
                                                fuse_blocks=True)
    x = jnp.asarray(rng.standard_normal((b, f, n, c)) * 0.1, jnp.float32)
    text = jnp.asarray(rng.standard_normal((b, 77, 768)) * 0.1, jnp.float32)
    audio = jnp.asarray(rng.standard_normal((b, 229, 768)) * 0.1,
                        jnp.float32)
    idx = jnp.asarray(segment_token_indices(f, (12, 19)))
    params = blk_seq.init(jax.random.PRNGKey(0), x, text, audio, None, idx)

    monkeypatch.setattr(pf, "FORCE", True)
    with pltpu.force_tpu_interpret_mode():
        params_fused = blk_fused.init(jax.random.PRNGKey(0), x, text, audio,
                                      None, idx)
        o_seq = blk_seq.apply(params, x, text, audio, None, idx)
        o_fused = blk_fused.apply(params, x, text, audio, None, idx)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_fused))
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_seq),
                               atol=2e-5, rtol=2e-5)
