"""VAE parity and round-trip tests."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from asva_tpu.models.vae import (AutoencoderKL, VAEAttention, VAEConfig,
                                 VAEResnetBlock)

TOL = dict(atol=3e-5, rtol=3e-5)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def conv_w(t):
    return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))


def dense_w(t):
    return jnp.asarray(t.detach().numpy().T)


def test_vae_resnet_block_matches_torch(rng):
    n, h, w, ci, co, g = 2, 8, 8, 8, 12, 4
    x = rng.standard_normal((n, h, w, ci)).astype(np.float32)
    gn1 = torch.nn.GroupNorm(g, ci, eps=1e-6)
    gn2 = torch.nn.GroupNorm(g, co, eps=1e-6)
    conv1 = torch.nn.Conv2d(ci, co, 3, padding=1)
    conv2 = torch.nn.Conv2d(co, co, 3, padding=1)
    convs = torch.nn.Conv2d(ci, co, 1)
    for m in (gn1, gn2):
        with torch.no_grad():
            m.weight.copy_(torch.randn(m.weight.shape))
            m.bias.copy_(torch.randn(m.bias.shape))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    hdn = conv1(torch.nn.functional.silu(gn1(xt)))
    hdn = conv2(torch.nn.functional.silu(gn2(hdn)))
    ref = (convs(xt) + hdn).permute(0, 2, 3, 1).detach().numpy()

    mod = VAEResnetBlock(co, g)
    params = {"params": {
        "norm1": {"scale": t2j(gn1.weight), "bias": t2j(gn1.bias)},
        "norm2": {"scale": t2j(gn2.weight), "bias": t2j(gn2.bias)},
        "conv1": {"kernel": conv_w(conv1.weight), "bias": t2j(conv1.bias)},
        "conv2": {"kernel": conv_w(conv2.weight), "bias": t2j(conv2.bias)},
        "conv_shortcut": {"kernel": conv_w(convs.weight),
                          "bias": t2j(convs.bias)},
    }}
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_vae_asymmetric_downsample_matches_torch(rng):
    """Encoder downsample: stride 2, pad (0,1,0,1) right/bottom only."""
    n, h, w, c = 1, 9, 9, 4
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    conv = torch.nn.Conv2d(c, c, 3, stride=2, padding=0)
    xt = torch.nn.functional.pad(torch.from_numpy(x).permute(0, 3, 1, 2),
                                 (0, 1, 0, 1))
    ref = conv(xt).permute(0, 2, 3, 1).detach().numpy()

    import flax.linen as nn
    out = nn.Conv(c, (3, 3), strides=(2, 2),
                  padding=((0, 1), (0, 1))).apply(
        {"params": {"kernel": conv_w(conv.weight), "bias": t2j(conv.bias)}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_vae_attention_matches_torch(rng):
    n, h, w, c, g = 1, 4, 4, 8, 4
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    gn = torch.nn.GroupNorm(g, c, eps=1e-6)
    wq = torch.nn.Linear(c, c)
    wk = torch.nn.Linear(c, c)
    wv = torch.nn.Linear(c, c)
    wo = torch.nn.Linear(c, c)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    y = gn(xt).permute(0, 2, 3, 1).reshape(n, h * w, c)
    q, k, v = wq(y), wk(y), wv(y)
    a = torch.softmax(q @ k.transpose(1, 2) / np.sqrt(c), dim=-1)
    ref = (torch.from_numpy(x).reshape(n, h * w, c)
           + wo(a @ v)).reshape(n, h, w, c).detach().numpy()

    mod = VAEAttention(g)
    params = {"params": {
        "group_norm": {"scale": t2j(gn.weight), "bias": t2j(gn.bias)},
        "to_q": {"kernel": dense_w(wq.weight), "bias": t2j(wq.bias)},
        "to_k": {"kernel": dense_w(wk.weight), "bias": t2j(wk.bias)},
        "to_v": {"kernel": dense_w(wv.weight), "bias": t2j(wv.bias)},
        "to_out": {"kernel": dense_w(wo.weight), "bias": t2j(wo.bias)},
    }}
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_vae_roundtrip_shapes(rng):
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), dtype=jnp.float32)
    params = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    mean, logvar = vae.apply(params, x, method=vae.encode)
    assert mean.shape == (2, 8, 8, 4)  # one downsample for 2-level tiny cfg
    z = vae.apply(params, x, jax.random.PRNGKey(1),
                  method=vae.sample_latents)
    rec = vae.apply(params, z / cfg.scaling_factor, method=vae.decode)
    assert rec.shape == x.shape
    assert np.isfinite(np.asarray(rec)).all()
