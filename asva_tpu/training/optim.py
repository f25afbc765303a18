"""Optimizer construction with trainable-parameter masking.

The reference fine-tunes ONLY parameters whose torch names contain "_temp"
or "_audio" (configs/audio-cond_animation/*.yaml `trainable_modules`,
scripts/animation_train.py:115-121); everything else — the grafted SD1.5
image weights — stays frozen.  Here the same policy is a pytree mask fed to
`optax.masked`, so frozen params receive no Adam state (big memory win) and
no weight decay.

AdamW hyperparameters mirror the reference configs: lr 1e-4 constant (or
constant-with-warmup), betas (0.9, 0.999), eps 1e-8, weight decay 1e-2,
global-norm grad clip 1.0.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import optax


# flax path segments corresponding 1:1 to the reference's "_temp"/"_audio"
# torch module names (ff_spatio_audio_temp_transformer_3d.py:211-270
# attn_audio/norm_audio/attn_temp/norm_temp/pos_embedding_temp, and
# FFInflatedConv3d's conv_temp -> our temp_kernel/temp_bias leaves)
TRAINABLE_SEGMENTS = frozenset({
    "attn_audio", "norm_audio", "attn_temp", "norm_temp",
    "pos_embedding_temp", "temp_kernel", "temp_bias",
})


def segments_for_trainable_modules(modules: Sequence[str]) -> frozenset:
    """Translate the reference YAML's trainable_modules tokens (torch-name
    substrings like "_temp"/"_audio") into our exact flax segment names."""
    table = {
        "temp": ("attn_temp", "norm_temp", "pos_embedding_temp",
                 "temp_kernel", "temp_bias"),
        "audio": ("attn_audio", "norm_audio"),
    }
    segs = set()
    for m in modules:
        key = m.strip("_")
        if key not in table:
            import logging
            logging.getLogger("asva_tpu").warning(
                "trainable_modules token %r is not a known module family "
                "(%s); it will be matched as a literal path segment", m,
                sorted(table))
        segs |= set(table.get(key, (m,)))
    return frozenset(segs)


def trainable_mask(params: Any,
                   segments: Optional[Sequence[str]] = None) -> Any:
    """True where any FULL path segment is in `segments` (default:
    TRAINABLE_SEGMENTS, the reference's trainable_modules=["_temp",
    "_audio"] policy).  Exact segment matching — a future parameter whose
    name merely *contains* "temp" cannot silently become trainable.

    segments=() marks everything trainable.
    """
    seg_set = TRAINABLE_SEGMENTS if segments is None else frozenset(segments)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_trainable(path) -> bool:
        if not seg_set:
            return True
        return any(str(getattr(k, "key", k)) in seg_set for k in path)

    marks = [is_trainable(path) for path, _ in flat]
    if seg_set and flat and not any(marks):
        raise ValueError(
            f"trainable_mask: no parameter path matches segments "
            f"{sorted(seg_set)} — a masked optimizer would silently train "
            "nothing")
    treedef = jax.tree.structure(params)
    return jax.tree.unflatten(treedef, marks)


def partition_params(params: Any, mask: Any):
    """Split a nested params dict into (trainable, frozen) sub-dicts by a
    same-structure boolean mask.  Subtrees keep their nesting; leaves land
    in exactly one side.  Used so the train step differentiates ONLY the
    trainable subtree — XLA then never emits weight-gradient contractions
    for the frozen SD1.5 convs (the reference's requires_grad=False
    semantics: torch skips frozen wgrads, scripts/animation_train.py:
    115-121), nor a full-size gradient buffer."""
    if not isinstance(params, dict):
        return (params, None) if mask else (None, params)
    t_out, f_out = {}, {}
    for key, sub in params.items():
        t_sub, f_sub = partition_params(sub, mask[key])
        if t_sub is not None and (not isinstance(t_sub, dict) or t_sub):
            t_out[key] = t_sub
        if f_sub is not None and (not isinstance(f_sub, dict) or f_sub):
            f_out[key] = f_sub
    return t_out, f_out


def merge_params(trainable: Any, frozen: Any):
    """Inverse of partition_params (union of two disjoint nested dicts)."""
    if trainable is None:
        return frozen
    if frozen is None or not isinstance(trainable, dict):
        return trainable
    out = dict(frozen)
    for key, sub in trainable.items():
        out[key] = merge_params(sub, frozen.get(key)) if key in frozen \
            else sub
    return out


def build_optimizer(
    learning_rate: float = 1e-4,
    *,
    mask: Any = None,
    max_grad_norm: float = 1.0,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.999,
    adam_eps: float = 1e-8,
    weight_decay: float = 1e-2,
    warmup_steps: int = 0,
    mu_dtype: Any = None,
) -> optax.GradientTransformation:
    """`mu_dtype` (e.g. jnp.bfloat16) stores the Adam first moment in a
    lower precision — halves that slice of optimizer HBM; the second
    moment stays fp32 (optax.adamw semantics)."""
    if warmup_steps > 0:
        schedule: Any = optax.linear_schedule(0.0, learning_rate, warmup_steps)
    else:
        schedule = learning_rate
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, b1=adam_beta1, b2=adam_beta2, eps=adam_eps,
                    weight_decay=weight_decay, mu_dtype=mu_dtype),
    )
    if mask is not None:
        # frozen leaves get a hard zero update (optax.masked alone would
        # pass their raw gradients through); the global-norm clip then runs
        # over trainable grads only, matching the reference's clipping of
        # requires_grad params.
        tx = optax.multi_transform({True: tx, False: optax.set_to_zero()},
                                   param_labels=mask)
    return tx
