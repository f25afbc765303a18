"""Block-level parity (resnet vs torch composition) and tiny-UNet smoke tests."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from asva_tpu.models.unet3d.model import AudioUNet3D, UNet3DConfig
from asva_tpu.models.unet3d.resnet import FFResnetBlock

TOL = dict(atol=3e-5, rtol=3e-5)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def conv_w(t):
    return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))


def dense_w(t):
    return jnp.asarray(t.detach().numpy().T)


def torch_ff_conv(x, conv, lin):
    """x: (b f h w c) torch tensor -> FF inflated conv output."""
    b, f, h, w, _ = x.shape
    y = conv(x.reshape(b * f, h, w, x.shape[-1]).permute(0, 3, 1, 2))
    y = y.permute(0, 2, 3, 1)
    y = y.reshape(b, f, y.shape[1], y.shape[2], y.shape[3])
    head = y[:, [0] * f]
    prev = y[:, np.clip(np.arange(f) - 1, 0, None)]
    return y + lin(torch.cat([head, prev, y], dim=-1))


def test_ff_resnet_block_matches_torch(rng):
    b, f, h, w, ci, co, temb_c = 2, 3, 6, 6, 8, 12, 16
    groups, eps = 4, 1e-5
    x = rng.standard_normal((b, f, h, w, ci)).astype(np.float32)
    temb = rng.standard_normal((b, f, temb_c)).astype(np.float32)

    gn1 = torch.nn.GroupNorm(groups, ci, eps=eps)
    gn2 = torch.nn.GroupNorm(groups, co, eps=eps)
    for gn in (gn1, gn2):
        with torch.no_grad():
            gn.weight.copy_(torch.randn(gn.weight.shape))
            gn.bias.copy_(torch.randn(gn.bias.shape))
    conv1 = torch.nn.Conv2d(ci, co, 3, padding=1)
    lin1 = torch.nn.Linear(3 * co, co)
    conv2 = torch.nn.Conv2d(co, co, 3, padding=1)
    lin2 = torch.nn.Linear(3 * co, co)
    convs = torch.nn.Conv2d(ci, co, 1)
    lins = torch.nn.Linear(3 * co, co)
    tproj = torch.nn.Linear(temb_c, co)

    xt = torch.from_numpy(x)
    tt = torch.from_numpy(temb)

    def gn_video(t, gn):  # GroupNorm with all-frame stats (torch 5D layout)
        return gn(t.permute(0, 4, 1, 2, 3)).permute(0, 2, 3, 4, 1)

    hdn = torch.nn.functional.silu(gn_video(xt, gn1))
    hdn = torch_ff_conv(hdn, conv1, lin1)
    hdn = hdn + tproj(torch.nn.functional.silu(tt))[:, :, None, None, :]
    hdn = torch.nn.functional.silu(gn_video(hdn, gn2))
    hdn = torch_ff_conv(hdn, conv2, lin2)
    shortcut = torch_ff_conv(xt, convs, lins)
    ref = (shortcut + hdn).detach().numpy()

    mod = FFResnetBlock(out_channels=co, temb_channels=temb_c, groups=groups,
                        eps=eps)
    params = {"params": {
        "norm1": {"scale": t2j(gn1.weight), "bias": t2j(gn1.bias)},
        "norm2": {"scale": t2j(gn2.weight), "bias": t2j(gn2.bias)},
        "conv1": {"conv": {"kernel": conv_w(conv1.weight),
                           "bias": t2j(conv1.bias)},
                  "temp_kernel": dense_w(lin1.weight),
                  "temp_bias": t2j(lin1.bias)},
        "conv2": {"conv": {"kernel": conv_w(conv2.weight),
                           "bias": t2j(conv2.bias)},
                  "temp_kernel": dense_w(lin2.weight),
                  "temp_bias": t2j(lin2.bias)},
        "conv_shortcut": {"conv": {"kernel": conv_w(convs.weight),
                                   "bias": t2j(convs.bias)},
                          "temp_kernel": dense_w(lins.weight),
                          "temp_bias": t2j(lins.bias)},
        "time_emb_proj": {"kernel": dense_w(tproj.weight),
                          "bias": t2j(tproj.bias)},
    }}
    out = mod.apply(params, jnp.asarray(x), jnp.asarray(temb))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def _tiny_inputs(rng, b=1, f=3, hw=16):
    sample = jnp.asarray(rng.standard_normal((b, f, hw, hw, 4)),
                         dtype=jnp.float32)
    t = jnp.asarray([7] * b, dtype=jnp.int32)
    text = jnp.asarray(rng.standard_normal((b, 5, 768)), dtype=jnp.float32)
    audio = jnp.asarray(rng.standard_normal((b, 9, 768)), dtype=jnp.float32)
    mask = jnp.asarray(rng.random((b, f, 9)) > 0.4)
    return sample, t, text, audio, mask


def test_tiny_unet_forward_shape_and_jit(rng):
    cfg = UNet3DConfig.tiny()
    model = AudioUNet3D(cfg)
    sample, t, text, audio, mask = _tiny_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), sample, t, text, audio, mask)
    out = jax.jit(model.apply)(params, sample, t, text, audio, mask)
    assert out.shape == sample.shape
    assert np.isfinite(np.asarray(out)).all()


def test_tiny_unet_audio_mask_matters(rng):
    """Flipping the segment mask must change the output (audio path live),
    and masked-off audio tokens must not influence the output."""
    cfg = UNet3DConfig.tiny()
    model = AudioUNet3D(cfg)
    sample, t, text, audio, mask = _tiny_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), sample, t, text, audio, mask)

    out1 = model.apply(params, sample, t, text, audio, mask)
    out2 = model.apply(params, sample, t, text, audio, ~mask)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))

    # tokens that every frame masks off may take any value
    all_off = np.asarray(~(mask.any(axis=1)))  # (b, 9)
    audio_mod = np.array(audio)
    audio_mod[all_off] += 100.0
    out3 = model.apply(params, sample, t, text, jnp.asarray(audio_mod), mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out3),
                               atol=1e-4, rtol=1e-4)


def test_tiny_unet_remat_matches(rng):
    sample, t, text, audio, mask = _tiny_inputs(rng)
    m1 = AudioUNet3D(UNet3DConfig.tiny())
    m2 = AudioUNet3D(UNet3DConfig.tiny(remat=True))
    params = m1.init(jax.random.PRNGKey(0), sample, t, text, audio, mask)
    o1 = m1.apply(params, sample, t, text, audio, mask)
    o2 = m2.apply(params, sample, t, text, audio, mask)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5,
                               rtol=1e-5)


def test_ff_resnet_pair_input_matches_concat(rng):
    """The up-path split form ((x, skip) parts: joint-stats GroupNorm +
    split-kernel convs, primitives.Conv2DParams) must equal the plain
    concat evaluation with the SAME params.  The part boundary (5) is
    chosen to straddle group boundaries (12ch/4g = 3ch groups)."""
    b, f, h, w = 2, 3, 6, 6
    cx, cs, co, temb_c = 5, 7, 8, 16
    x = jnp.asarray(rng.standard_normal((b, f, h, w, cx)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((b, f, h, w, cs)), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((b, f, temb_c)), jnp.float32)
    mod = FFResnetBlock(out_channels=co, temb_channels=temb_c, groups=4,
                        eps=1e-5)
    params = mod.init(jax.random.PRNGKey(0),
                      jnp.concatenate([x, s], axis=-1), temb)
    # non-trivial temporal mix so the FF path is exercised
    params = jax.tree.map(
        lambda p: p + 0.01 if p.ndim == 2 else p, params)
    ref = mod.apply(params, jnp.concatenate([x, s], axis=-1), temb)
    out = mod.apply(params, (x, s), temb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ff_resnet_pair_identity_shortcut(rng):
    """Pair input whose total width equals out_channels must still produce
    the concat residual (identity shortcut fallback)."""
    b, f, h, w = 1, 2, 4, 4
    x = jnp.asarray(rng.standard_normal((b, f, h, w, 3)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((b, f, h, w, 5)), jnp.float32)
    mod = FFResnetBlock(out_channels=8, temb_channels=None, groups=4,
                        eps=1e-5)
    params = mod.init(jax.random.PRNGKey(0), (x, s))
    ref = mod.apply(params, jnp.concatenate([x, s], axis=-1))
    out = mod.apply(params, (x, s))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
