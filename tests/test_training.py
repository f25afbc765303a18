"""Sharded training-step tests on the 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from asva_tpu.models.imagebind_audio import (ImageBindAudioConfig,
                                             SegmaskAudioEncoder)
from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig
from asva_tpu.models.vae import AutoencoderKL, VAEConfig
from asva_tpu.parallel import (batch_sharding, fsdp_shardings, make_mesh,
                               replicate)
from asva_tpu.parallel.sharding import shard_pytree
from asva_tpu.training import (AnimationTrainConfig, AnimationTrainer,
                               TrainState, build_optimizer, trainable_mask)


def _build(video_length=4):
    unet = AudioUNet3D(UNet3DConfig.tiny())
    vae = AutoencoderKL(VAEConfig.tiny())
    audio_cfg = ImageBindAudioConfig.tiny()
    audio_enc = SegmaskAudioEncoder(audio_cfg, n_segment=video_length)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    unet_params = unet.init(
        k1, jnp.zeros((1, video_length, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 7, 768)), jnp.zeros((1, 229, audio_cfg.embed_dim)),
        jnp.ones((1, video_length, 229), bool))
    vae_params = vae.init(k2, jnp.zeros((1, 16, 16, 3)), k2)
    audio_params = audio_enc.init(k3, jnp.zeros((1, 128, 204, 1)))
    trainer = AnimationTrainer(
        unet=unet, vae=vae, audio_encoder=audio_enc,
        vae_params=vae_params, audio_encoder_params=audio_params,
        null_text_encoding=jnp.zeros((1, 7, 768)),
        config=AnimationTrainConfig(audio_cond_drop_prob=0.2))
    return trainer, unet_params


def _batch(rng, b=8, f=4):
    return {
        "videos": jnp.asarray(rng.random((b, f, 16, 16, 3)),
                              dtype=jnp.float32),
        "mels": jnp.asarray(rng.standard_normal((b, 128, 204, 1)),
                            dtype=jnp.float32),
        "text_encodings": jnp.asarray(rng.standard_normal((b, 7, 768)),
                                      dtype=jnp.float32),
    }


def test_trainable_mask_patterns():
    _, params = _build()
    mask = trainable_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    on = [jax.tree_util.keystr(p) for p, v in flat if v]
    off = [jax.tree_util.keystr(p) for p, v in flat if not v]
    assert on and off
    assert all(("temp" in p or "audio" in p) for p in on)
    # the grafted image-path weights stay frozen
    assert any("attn1" in p for p in off)
    assert any("conv_in" in p for p in off)
    # FF temporal mixers and audio attention train
    assert any("temp_kernel" in p for p in on)
    assert any("attn_audio" in p for p in on)


def test_sharded_train_step_runs_and_respects_freezing(rng):
    trainer, unet_params = _build()
    mesh = make_mesh(8, fsdp=2)
    mask = trainable_mask(unet_params)
    tx = build_optimizer(1e-3, mask=mask)

    shardings = fsdp_shardings(unet_params, mesh, min_size=2 ** 10)
    params = shard_pytree(unet_params, shardings)
    opt_state = tx.init(params)
    state = TrainState(jnp.zeros((), jnp.int32), params, opt_state)

    batch = jax.device_put(_batch(rng), batch_sharding(mesh))
    step = trainer.make_train_step(tx, donate=False)
    with jax.sharding.set_mesh(mesh):
        state2, loss1 = step(state, batch, jax.random.PRNGKey(1))
        state3, loss2 = step(state2, batch, jax.random.PRNGKey(2))

    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert int(state3.step) == 2

    # frozen params identical; at least one trainable param changed
    flat0 = jax.tree_util.tree_flatten_with_path(unet_params)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(state3.params)[0]
    maskf = jax.tree_util.tree_flatten_with_path(mask)[0]
    changed = 0
    for (p0, v0), (p2, v2), (pm, m) in zip(flat0, flat2, maskf):
        assert p0 == p2 == pm
        if m:
            changed += int(not np.allclose(np.asarray(v0), np.asarray(v2)))
        else:
            np.testing.assert_array_equal(np.asarray(v0), np.asarray(v2))
    assert changed > 0


def test_loss_decreases_on_fixed_batch(rng):
    trainer, params = _build()
    mask = trainable_mask(params)
    tx = build_optimizer(2e-3, mask=mask)
    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    batch = _batch(rng, b=2)
    step = trainer.make_train_step(tx, donate=False)
    fixed_rng = jax.random.PRNGKey(3)
    losses = []
    for _ in range(8):
        state, loss = step(state, batch, fixed_rng)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_trainable_mask_config_tokens_select_expected_segments():
    """The YAML trainable_modules tokens (with or without underscores) must
    map to exactly the reference's _temp/_audio parameter set — and never
    an empty set (a silent freeze-everything regression)."""
    import jax
    import jax.numpy as jnp
    from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig
    from asva_tpu.training.optim import (segments_for_trainable_modules,
                                         trainable_mask)

    model = AudioUNet3D(UNet3DConfig.tiny())
    f = 3
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, f, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 5, 768)),
        jnp.zeros((1, 9, 768)), jnp.ones((1, f, 9), bool))
    for tokens in (("temp", "audio"), ("_temp", "_audio")):
        mask = trainable_mask(params,
                              segments_for_trainable_modules(tokens))
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        on = [".".join(str(getattr(k, "key", k)) for k in p)
              for p, v in flat if v]
        off = [".".join(str(getattr(k, "key", k)) for k in p)
               for p, v in flat if not v]
        assert on, "nothing trainable — config token mapping broken"
        for path in on:
            assert any(s in path for s in
                       ("attn_temp", "norm_temp", "pos_embedding_temp",
                        "temp_kernel", "temp_bias", "attn_audio",
                        "norm_audio")), path
        # the grafted image modules stay frozen
        assert any("attn1" in p for p in off)
        assert any("conv_in.conv" in p for p in off)


def test_partition_merge_roundtrip():
    from asva_tpu.training.optim import merge_params, partition_params
    _, params = _build()
    mask = trainable_mask(params)
    t, f = partition_params(params, mask)
    merged = merge_params(t, f)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(merged)[0]
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    # the split is disjoint and complete
    n_t = len(jax.tree.leaves(t))
    n_f = len(jax.tree.leaves(f))
    assert n_t + n_f == len(flat_a) and n_t > 0 and n_f > 0


def test_subtree_grad_step_matches_masked_full_tree(rng):
    """The trainable-subtree flow (no frozen wgrads) must produce the SAME
    training trajectory as the r2 whole-tree + multi_transform-mask flow."""
    from asva_tpu.training.optim import partition_params
    trainer, params = _build()
    mask = trainable_mask(params)
    batch = _batch(rng, b=2)
    key = jax.random.PRNGKey(5)

    # flow A: whole-tree grads + masked optimizer
    tx_a = build_optimizer(2e-3, mask=mask)
    state_a = TrainState(jnp.zeros((), jnp.int32), params, tx_a.init(params))
    step_a = trainer.make_train_step(tx_a, donate=False)

    # flow B: subtree grads + unmasked optimizer over the subtree
    tx_b = build_optimizer(2e-3)
    state_b = TrainState(jnp.zeros((), jnp.int32), params,
                         tx_b.init(partition_params(params, mask)[0]))
    step_b = trainer.make_train_step(tx_b, donate=False, mask=mask)

    for i in range(3):
        k = jax.random.fold_in(key, i)
        state_a, loss_a = step_a(state_a, batch, k)
        state_b, loss_b = step_b(state_b, batch, k)
        np.testing.assert_allclose(float(loss_a), float(loss_b),
                                   rtol=1e-6, atol=1e-7)

    flat_a = jax.tree_util.tree_flatten_with_path(state_a.params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(state_b.params)[0]
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-5, atol=1e-6)

    # accumulation path agrees too: grads from make_grad_step(mask) applied
    # via make_apply_step(mask) equal one more fused step
    k = jax.random.fold_in(key, 99)
    state_a2, _ = step_a(state_a, batch, k)
    gstep = trainer.make_grad_step(mask=mask)
    astep = trainer.make_apply_step(tx_b, mask=mask)
    _, grads = gstep(state_b.params, batch, k)
    state_b2 = astep(state_b, grads)
    for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_flatten_with_path(state_a2.params)[0],
            jax.tree_util.tree_flatten_with_path(state_b2.params)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-5, atol=1e-6)
