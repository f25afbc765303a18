"""AVSync classifier parity (vs torch CNN primitives) + contrastive trainer."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from asva_tpu.models.avsync import (AudioConvNet, AVSyncClassifier,
                                    SyncHead, VideoR2Plus1DNet)
from asva_tpu.models.avsync.classifier import Basic2DBlock, BasicR2P1DBlock
from asva_tpu.training.sync_trainer import (SyncContrastiveTrainer,
                                            SyncTrainState)
from asva_tpu.training.optim import build_optimizer

TOL = dict(atol=3e-5, rtol=3e-5)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def conv2d_w(t):
    return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))


def conv3d_w(t):
    return jnp.asarray(t.detach().numpy().transpose(2, 3, 4, 1, 0))


def bn_params(bn):
    return ({"scale": t2j(bn.weight), "bias": t2j(bn.bias)},
            {"mean": t2j(bn.running_mean), "var": t2j(bn.running_var)})


def test_basic2d_block_matches_torch_eval(rng):
    ci, co = 4, 8
    x = rng.standard_normal((2, 16, 16, ci)).astype(np.float32)
    conv1 = torch.nn.Conv2d(ci, co, 3, stride=2, padding=1, bias=False)
    bn1 = torch.nn.BatchNorm2d(co).eval()
    conv2 = torch.nn.Conv2d(co, co, 3, padding=1, bias=False)
    bn2 = torch.nn.BatchNorm2d(co).eval()
    with torch.no_grad():
        for bn in (bn1, bn2):
            bn.running_mean.copy_(torch.randn(co))
            bn.running_var.copy_(torch.rand(co) + 0.5)
            bn.weight.copy_(torch.randn(co))
            bn.bias.copy_(torch.randn(co))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = torch.relu(bn2(conv2(torch.relu(bn1(conv1(xt))))))
    ref = ref.permute(0, 2, 3, 1).detach().numpy()

    p1, s1 = bn_params(bn1)
    p2, s2 = bn_params(bn2)
    variables = {
        "params": {"conv1": {"kernel": conv2d_w(conv1.weight)}, "bn1": p1,
                   "conv2": {"kernel": conv2d_w(conv2.weight)}, "bn2": p2},
        "batch_stats": {"bn1": s1, "bn2": s2},
    }
    out = Basic2DBlock(co, (2, 2)).apply(variables, jnp.asarray(x),
                                         train=False)
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_r2p1d_block_matches_torch_eval(rng):
    ci, co = 4, 8
    x = rng.standard_normal((1, 4, 8, 8, ci)).astype(np.float32)
    spt1 = torch.nn.Conv3d(ci, co, (1, 3, 3), stride=(1, 2, 2),
                           padding=(0, 1, 1), bias=False)
    tmp1 = torch.nn.Conv3d(co, co, (3, 1, 1), stride=(2, 1, 1),
                           padding=(1, 0, 0), bias=False)
    spt2 = torch.nn.Conv3d(co, co, (1, 3, 3), padding=(0, 1, 1), bias=False)
    tmp2 = torch.nn.Conv3d(co, co, (3, 1, 1), padding=(1, 0, 0), bias=False)
    res = torch.nn.Conv3d(ci, co, 1, stride=(2, 2, 2), bias=False)
    bns = {n: torch.nn.BatchNorm3d(co).eval()
           for n in ("spt_bn1", "tmp_bn1", "spt_bn2", "out_bn")}
    with torch.no_grad():
        for bn in bns.values():
            bn.running_mean.copy_(torch.randn(co))
            bn.running_var.copy_(torch.rand(co) + 0.5)
            bn.weight.copy_(torch.randn(co))
            bn.bias.copy_(torch.randn(co))
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    y = tmp1(torch.relu(bns["spt_bn1"](spt1(xt))))
    y = torch.relu(bns["tmp_bn1"](y))
    y = tmp2(torch.relu(bns["spt_bn2"](spt2(y))))
    ref = torch.relu(bns["out_bn"](y + res(xt)))
    ref = ref.permute(0, 2, 3, 4, 1).detach().numpy()

    params, stats = {}, {}
    for name, conv in [("spt_conv1", spt1), ("tmp_conv1", tmp1),
                       ("spt_conv2", spt2), ("tmp_conv2", tmp2),
                       ("res_conv", res)]:
        params[name] = {"kernel": conv3d_w(conv.weight)}
    for name, bn in bns.items():
        params[name], stats[name] = bn_params(bn)
    out = BasicR2P1DBlock(co, (2, 2, 2)).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_classifier_end_to_end_shapes(rng):
    clf = AVSyncClassifier()
    mels = jnp.asarray(rng.standard_normal((2, 128, 204, 1)),
                       dtype=jnp.float32)
    videos = jnp.asarray(rng.random((2, 4, 32, 32, 3)), dtype=jnp.float32)
    variables = clf.init(jax.random.PRNGKey(0), mels, videos)
    scores = clf.apply(variables, mels, videos)
    assert scores.shape == (2,)
    assert np.isfinite(np.asarray(scores)).all()


def test_contrastive_trainer_step_and_learning(rng):
    clf = AVSyncClassifier()
    b, k, f = 1, 3, 4
    mels = jnp.asarray(rng.standard_normal((b, k, 128, 204, 1)),
                       dtype=jnp.float32)
    videos = jnp.asarray(rng.random((b, k, f, 16, 16, 3)), dtype=jnp.float32)
    variables = clf.init(jax.random.PRNGKey(0), mels[0], videos[0])
    trainer = SyncContrastiveTrainer(clf, tau=0.1)
    tx = build_optimizer(1e-3)
    state = SyncTrainState(jnp.zeros((), jnp.int32), variables["params"],
                           variables["batch_stats"], tx.init(variables["params"]))
    step = trainer.make_train_step(tx, donate=False)
    batch = {"mels": mels, "videos": videos}
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["av_loss"] + metrics["va_loss"]))
        assert 0.0 <= float(metrics["av_acc"]) <= 1.0
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # memorizes a fixed tiny batch
    # batch_stats must have been updated by training
    bs0 = jax.tree.leaves(variables["batch_stats"])
    bs1 = jax.tree.leaves(state.batch_stats)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(bs0, bs1))


def test_eval_metrics_use_running_bn_and_batch_invariance(rng):
    """Reference trainer.eval() semantics (scripts/avsync_train.py:334-335):
    the in-train test pass runs BatchNorm on running averages, so per-item
    metrics are invariant to test-batch composition; train-mode (batch-stat
    BN) metrics are not."""
    clf = AVSyncClassifier()
    b, k, f = 2, 3, 4
    mels = jnp.asarray(rng.standard_normal((b, k, 128, 204, 1)),
                       dtype=jnp.float32)
    videos = jnp.asarray(rng.random((b, k, f, 16, 16, 3)), dtype=jnp.float32)
    variables = clf.init(jax.random.PRNGKey(0), mels[0], videos[0])
    # non-trivial running stats (fresh init is mean 0 / var 1)
    variables = dict(variables)
    variables["batch_stats"] = jax.tree.map(
        lambda x: x + 0.25, variables["batch_stats"])
    trainer = SyncContrastiveTrainer(clf, tau=0.1)
    eval_fn = trainer.make_eval_metrics()

    batch = {"mels": mels, "videos": videos}
    joint = eval_fn(variables["params"], variables["batch_stats"], batch)
    per_item = [eval_fn(variables["params"], variables["batch_stats"],
                        {"mels": mels[i:i + 1], "videos": videos[i:i + 1]})
                for i in range(b)]
    for name in ("av_loss", "va_loss", "av_acc", "va_acc"):
        split_mean = np.mean([float(m[name]) for m in per_item])
        np.testing.assert_allclose(float(joint[name]), split_mean,
                                   rtol=1e-5, atol=1e-6)

    # train-mode metrics differ (batch statistics couple the items) and the
    # eval pass must not equal them — guards against train=True regressions
    _, (train_metrics, _) = trainer.loss_fn(
        variables["params"], variables["batch_stats"], batch)
    assert abs(float(train_metrics["av_loss"]) - float(joint["av_loss"])) \
        > 1e-6
