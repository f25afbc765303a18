"""Parity tests of the UNet primitives against torch reference math.

torch (CPU) provides the ground-truth operators the reference relied on
(GroupNorm statistics, conv padding conventions, SDPA, GELU flavor); each
test transfers identical weights into the flax module and compares outputs.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from asva_tpu.models.embeddings import sinusoidal_timestep_embedding
from asva_tpu.models.unet3d.primitives import (FFInflatedConv,
                                               FFSpatialAttention,
                                               InflatedConv)
from asva_tpu.ops.attention import dot_product_attention
from asva_tpu.ops.norms import SpatialGroupNorm, VideoGroupNorm

TOL = dict(atol=2e-5, rtol=2e-5)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def conv_w(t):  # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))


def dense_w(t):  # torch (O, I) -> flax (I, O)
    return jnp.asarray(t.detach().numpy().T)


def test_video_groupnorm_matches_torch_5d(rng):
    b, f, h, w, c = 2, 3, 4, 5, 8
    x = rng.standard_normal((b, f, h, w, c)).astype(np.float32)
    gn = torch.nn.GroupNorm(num_groups=4, num_channels=c, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.randn(c))
        gn.bias.copy_(torch.randn(c))
    # torch sees (b, c, f, h, w): stats span all frames
    ref = gn(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    ref = ref.permute(0, 2, 3, 4, 1).detach().numpy()

    mod = VideoGroupNorm(num_groups=4, epsilon=1e-5)
    params = {"params": {"scale": t2j(gn.weight), "bias": t2j(gn.bias)}}
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_spatial_groupnorm_matches_torch_per_frame(rng):
    b, f, h, w, c = 2, 3, 4, 5, 8
    x = rng.standard_normal((b, f, h, w, c)).astype(np.float32)
    gn = torch.nn.GroupNorm(num_groups=4, num_channels=c, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.randn(c))
        gn.bias.copy_(torch.randn(c))
    # torch sees the frame-folded tensor ((b f), c, h, w): per-frame stats
    xt = torch.from_numpy(x).reshape(b * f, h, w, c).permute(0, 3, 1, 2)
    ref = gn(xt).permute(0, 2, 3, 1).reshape(b, f, h, w, c).detach().numpy()

    mod = SpatialGroupNorm(num_groups=4, epsilon=1e-6)
    params = {"params": {"scale": t2j(gn.weight), "bias": t2j(gn.bias)}}
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


@pytest.mark.parametrize("stride,pad,k", [(1, 1, 3), (2, 1, 3), (1, 0, 1)])
def test_inflated_conv_matches_torch(rng, stride, pad, k):
    b, f, h, w, ci, co = 2, 3, 8, 8, 4, 6
    x = rng.standard_normal((b, f, h, w, ci)).astype(np.float32)
    conv = torch.nn.Conv2d(ci, co, k, stride=stride, padding=pad)
    xt = torch.from_numpy(x).reshape(b * f, h, w, ci).permute(0, 3, 1, 2)
    ref = conv(xt).permute(0, 2, 3, 1).detach().numpy()
    ref = ref.reshape((b, f) + ref.shape[1:])

    mod = InflatedConv(co, k, stride, pad)
    params = {"params": {"conv": {"kernel": conv_w(conv.weight),
                                  "bias": t2j(conv.bias)}}}
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_ff_inflated_conv_matches_torch(rng):
    """Per-frame conv + residual Linear(3C->C) over [head, prev, curr]."""
    b, f, h, w, ci, co = 2, 4, 6, 6, 4, 5
    x = rng.standard_normal((b, f, h, w, ci)).astype(np.float32)
    conv = torch.nn.Conv2d(ci, co, 3, padding=1)
    lin = torch.nn.Linear(3 * co, co)

    xt = torch.from_numpy(x).reshape(b * f, h, w, ci).permute(0, 3, 1, 2)
    y = conv(xt).permute(0, 2, 3, 1).reshape(b, f, h, w, co)
    head = y[:, [0] * f]
    prev_idx = np.clip(np.arange(f) - 1, 0, None)
    prev = y[:, prev_idx]
    mix_in = torch.cat([head, prev, y], dim=-1)
    ref = (y + lin(mix_in)).detach().numpy()

    mod = FFInflatedConv(co, 3, 1, 1)
    params = {"params": {
        "conv": {"kernel": conv_w(conv.weight), "bias": t2j(conv.bias)},
        "temp_kernel": dense_w(lin.weight),
        "temp_bias": t2j(lin.bias),
    }}
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_ff_inflated_conv_zero_init_is_identity_to_conv(rng):
    b, f, h, w, ci, co = 1, 3, 4, 4, 2, 4
    x = jnp.asarray(rng.standard_normal((b, f, h, w, ci)).astype(np.float32))
    mod = FFInflatedConv(co, 3, 1, 1)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    ref = InflatedConv(co, 3, 1, 1).apply(
        {"params": {"conv": params["params"]["conv"]}}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_dot_product_attention_matches_torch_sdpa(rng):
    b, hds, lq, lk, d = 2, 3, 5, 7, 4
    q = rng.standard_normal((b, lq, hds, d)).astype(np.float32)
    k = rng.standard_normal((b, lk, hds, d)).astype(np.float32)
    v = rng.standard_normal((b, lk, hds, d)).astype(np.float32)
    mask = rng.random((b, 1, lq, lk)) > 0.3

    ref = F.scaled_dot_product_attention(
        torch.from_numpy(q).permute(0, 2, 1, 3),
        torch.from_numpy(k).permute(0, 2, 1, 3),
        torch.from_numpy(v).permute(0, 2, 1, 3),
        attn_mask=torch.from_numpy(mask))
    ref = ref.permute(0, 2, 1, 3).numpy()

    out = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_ff_spatial_attention_kv_from_frame0(rng):
    """Queries from every frame, K/V from frame 0 only (diffusers Attention
    conventions: no-bias q/k/v, bias on out)."""
    b, f, n, c, heads = 2, 3, 6, 8, 2
    x = rng.standard_normal((b, f, n, c)).astype(np.float32)

    wq = torch.nn.Linear(c, c, bias=False)
    wk = torch.nn.Linear(c, c, bias=False)
    wv = torch.nn.Linear(c, c, bias=False)
    wo = torch.nn.Linear(c, c, bias=True)

    xt = torch.from_numpy(x)
    q = wq(xt)                          # (b, f, n, c)
    k = wk(xt[:, [0] * f])              # frame-0 K/V repeated
    v = wv(xt[:, [0] * f])
    d = c // heads

    def split(t):  # (b, f, n, c) -> (b*f, heads, n, d)
        return (t.reshape(b * f, n, heads, d).permute(0, 2, 1, 3))

    o = F.scaled_dot_product_attention(split(q), split(k), split(v))
    o = o.permute(0, 2, 1, 3).reshape(b, f, n, c)
    ref = wo(o).detach().numpy()

    mod = FFSpatialAttention(num_heads=heads, head_dim=d)
    params = {"params": {"proj": {
        "to_q": {"kernel": dense_w(wq.weight)},
        "to_k": {"kernel": dense_w(wk.weight)},
        "to_v": {"kernel": dense_w(wv.weight)},
        "to_out": {"kernel": dense_w(wo.weight), "bias": t2j(wo.bias)},
    }}}
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_sinusoidal_embedding_matches_diffusers_formula():
    """diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0)."""
    dim, ts = 32, np.array([0.0, 1.0, 17.0, 999.0], dtype=np.float32)
    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half, dtype=np.float32) / half
    emb = np.exp(exponent)[None] * ts[:, None]
    ref = np.concatenate([np.cos(emb), np.sin(emb)], axis=-1)
    out = sinusoidal_timestep_embedding(jnp.asarray(ts), dim)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_upsample_conv_decomposition_equivalence(rng):
    """FFUpsample(decomposed=True) == nearest_up2 + FFInflatedConv with the
    SAME params (exact kernel-folding algebra, incl. zero-pad edges and the
    temporal mix); both directions of the shared param tree."""
    import jax
    from asva_tpu.models.unet3d.resnet import FFUpsample

    b, f, h, w, c = 2, 3, 4, 6, 8
    x = jnp.asarray(rng.standard_normal((b, f, h, w, c)), jnp.float32)
    fast = FFUpsample(c, decomposed=True)
    naive = FFUpsample(c, decomposed=False)
    variables = naive.init(jax.random.PRNGKey(0), x)
    # exercise the temporal mix too (zero-init by default)
    variables = jax.tree.map(
        lambda p: p + 0.05 * np.arange(p.size, dtype=np.float32
                                       ).reshape(p.shape) % 0.3, variables)
    ref = naive.apply(variables, x)
    out = fast.apply(variables, x)     # identical param tree
    assert out.shape == ref.shape == (b, f, 2 * h, 2 * w, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)

    # and the fast path's own init must be naive-consumable (same tree)
    v2 = fast.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(naive.apply(v2, x)), np.asarray(fast.apply(v2, x)),
        atol=2e-6, rtol=2e-6)


def test_temporal_pairloop_matches_einsum(rng):
    """The unrolled per-(f,g) pair-loop form == the bnhfg einsum form with
    the SAME params, at every UNet level's head dim (40/80/160 — the
    pairloop_max_d gate decides which levels ship the pair loop per path;
    both forms must stay interchangeable at any d)."""
    from asva_tpu.models.unet3d.primitives import TemporalAttention

    for heads, d in ((8, 40), (8, 80), (8, 160)):
        x = jnp.asarray(rng.standard_normal((2, 5, 16, heads * d)) * 0.1,
                        jnp.float32)
        mod_pair = TemporalAttention(heads, d, pairloop_max_d=d)
        mod_ein = TemporalAttention(heads, d, pairloop_max_d=0)
        variables = mod_ein.init(jax.random.PRNGKey(0), x)
        variables = jax.tree.map(
            lambda p: p + 0.02 * np.arange(p.size, dtype=np.float32
                                           ).reshape(p.shape) % 0.1,
            variables)
        pair = mod_pair.apply(variables, x)   # identical param tree
        ein = mod_ein.apply(variables, x)
        np.testing.assert_allclose(np.asarray(pair), np.asarray(ein),
                                   atol=2e-5, rtol=2e-5)


def test_temporal_hybrid_grads_match_einsum_autodiff(rng):
    """Head dims above TEMPORAL_HYBRID_MIN_D route through the custom_vjp
    (pair-loop forward, einsum backward).  Its gradients must equal plain
    autodiff of the einsum form — the backward IS jax.vjp of that form, so
    this guards the custom_vjp plumbing (residuals, arg order, scale)."""
    from asva_tpu.models.unet3d.primitives import (
        TEMPORAL_HYBRID_MIN_D, TemporalAttention)

    heads, d = 8, 80
    assert d > TEMPORAL_HYBRID_MIN_D
    x = jnp.asarray(rng.standard_normal((2, 5, 16, heads * d)) * 0.1,
                    jnp.float32)
    mod_hyb = TemporalAttention(heads, d, pairloop_max_d=d)   # hybrid path
    mod_ein = TemporalAttention(heads, d, pairloop_max_d=0)   # einsum path
    variables = mod_ein.init(jax.random.PRNGKey(0), x)
    variables = jax.tree.map(
        lambda p: p + 0.02 * np.arange(p.size, dtype=np.float32
                                       ).reshape(p.shape) % 0.1, variables)
    cot = jnp.asarray(rng.standard_normal(x.shape) * 0.1, jnp.float32)

    def loss(mod):
        def f(v, x_):
            return jnp.sum(mod.apply(v, x_) * cot)
        return jax.grad(f, argnums=(0, 1))(variables, x)

    gv_h, gx_h = loss(mod_hyb)
    gv_e, gx_e = loss(mod_ein)
    # identical backward graph modulo the projections' cotangent source
    # (hybrid fwd differs from einsum fwd only in fp reassociation)
    np.testing.assert_allclose(np.asarray(gx_h), np.asarray(gx_e),
                               atol=3e-5, rtol=3e-5)
    for (kh, ph), (ke, pe) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(gv_h),
                   key=lambda kp: str(kp[0])),
            sorted(jax.tree_util.tree_leaves_with_path(gv_e),
                   key=lambda kp: str(kp[0]))):
        assert str(kh) == str(ke)
        np.testing.assert_allclose(np.asarray(ph), np.asarray(pe),
                                   atol=3e-5, rtol=3e-5, err_msg=str(kh))
