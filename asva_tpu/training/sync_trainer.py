"""Contrastive AVSync classifier training.

Contract (reference avsync/models/sync_contrastive_trainer.py:24-55): per
video, k time-shifted clips; encode all audio and video clips once, score
every (audio_i, video_j) pair with the MLP head (k^2 head evals per item),
and apply symmetric InfoNCE over rows (a->v) and columns (v->a) with
temperature tau (0.1 in the VGGSS config); batch accuracies are argmax
diagonal hits.

The whole step — both CNN towers over b*k clips, the k^2 pair scores, loss,
grads and the optax update — is one jit program; BatchNorm running stats ride
in the mutable `batch_stats` collection and are cross-replica-averaged by the
partitioner when the batch is sharded.

In-train evaluation matches the reference's `trainer.eval()` + no_grad pass
(scripts/avsync_train.py:334-355): `make_eval_metrics` applies the classifier
with train=False, i.e. BatchNorm uses running averages and per-item metrics
are invariant to batch composition.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class SyncTrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def _pair_metrics(av_logits, va_logits, flat_labels):
    av_loss = optax.softmax_cross_entropy_with_integer_labels(
        av_logits, flat_labels).mean()
    va_loss = optax.softmax_cross_entropy_with_integer_labels(
        va_logits, flat_labels).mean()
    av_acc = (av_logits.argmax(-1) == flat_labels).mean()
    va_acc = (va_logits.argmax(-1) == flat_labels).mean()
    return {"av_loss": av_loss, "va_loss": va_loss,
            "av_acc": av_acc, "va_acc": va_acc}


@dataclasses.dataclass(eq=False)
class SyncContrastiveTrainer:
    classifier: Any          # AVSyncClassifier
    tau: float = 0.1

    def _pair_logits(self, variables, batch: dict, train: bool):
        """Encode b*k clips, score all k x k pairs -> (av, va) logit rows.

        Returns (av_logits (b*k, k), va_logits (b*k, k), labels (b*k,),
        new_batch_stats or None when train=False)."""
        mels, videos = batch["mels"], batch["videos"]
        b, k = mels.shape[:2]
        mels = mels.reshape((b * k,) + mels.shape[2:])
        videos = videos.reshape((b * k,) + videos.shape[2:])

        if train:
            (a_emb, v_emb), new_model_state = self.classifier.apply(
                variables, mels, videos, train=True,
                method=self.classifier.encode, mutable=["batch_stats"])
            new_bs = new_model_state["batch_stats"]
        else:
            a_emb, v_emb = self.classifier.apply(
                variables, mels, videos, train=False,
                method=self.classifier.encode)
            new_bs = None

        # all k x k pairs per item: (b, k, 1, c) x (b, 1, k, c)
        c = a_emb.shape[-1]
        a = jnp.broadcast_to(a_emb.reshape(b, k, 1, c), (b, k, k, c))
        v = jnp.broadcast_to(v_emb.reshape(b, 1, k, c), (b, k, k, c))
        scores = self.classifier.apply(
            variables, a.reshape(b * k * k, c), v.reshape(b * k * k, c),
            method=self.classifier.score_pairs)
        scores = scores.reshape(b, k, k) / self.tau  # rows: audio, cols: video

        labels = jnp.broadcast_to(jnp.arange(k)[None], (b, k))
        av_logits = scores.reshape(b * k, k)                   # audio -> video
        va_logits = jnp.swapaxes(scores, 1, 2).reshape(b * k, k)  # video->audio
        return av_logits, va_logits, labels.reshape(b * k), new_bs

    def loss_fn(self, params, batch_stats, batch: dict):
        """batch: mels (b, k, 128, 204, 1), videos (b, k, f, h, w, 3)."""
        variables = {"params": params, "batch_stats": batch_stats}
        av_logits, va_logits, flat_labels, new_bs = self._pair_logits(
            variables, batch, train=True)
        metrics = _pair_metrics(av_logits, va_logits, flat_labels)
        # reference optimizes (av + va) / 2 (scripts/avsync_train.py:275)
        return (metrics["av_loss"] + metrics["va_loss"]) / 2.0, (metrics,
                                                                 new_bs)

    def make_train_step(self, tx: optax.GradientTransformation,
                        donate: bool = True) -> Callable:
        def step(state: SyncTrainState, batch: dict):
            grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
            (_, (metrics, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, batch)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            return SyncTrainState(state.step + 1, params, new_bs,
                                  opt_state), metrics
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def make_eval_metrics(self) -> Callable:
        """Jitted eval-mode metric pass: running-average BatchNorm
        (classifier applied with train=False), no state mutation — the
        reference's trainer.eval() + torch.no_grad() test loop
        (scripts/avsync_train.py:334-355)."""
        def metrics_fn(params, batch_stats, batch: dict):
            variables = {"params": params, "batch_stats": batch_stats}
            av_logits, va_logits, flat_labels, _ = self._pair_logits(
                variables, batch, train=False)
            return _pair_metrics(av_logits, va_logits, flat_labels)
        return jax.jit(metrics_fn)

    def make_eval_scores(self) -> Callable:
        """(mels (n,...), videos (n,...)) -> (n,) sync scores, eval mode."""
        def scores(params, batch_stats, mels, videos):
            return self.classifier.apply(
                {"params": params, "batch_stats": batch_stats}, mels, videos)
        return jax.jit(scores)
