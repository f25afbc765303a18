"""Mint tests/fixtures/null_text_encoding_fixture.npy.

A (1, 77, 768) stand-in for the reference artifact
`pretrained/openai-clip-l_null_text_encoding.pt` (the empty-prompt CLIP
last_hidden_state; reference consumes it at
avgen/models/trainers/audio_cond_animation_trainer.py:45-47).  Real CLIP
weights are unavailable in this sandbox, so the fixture is minted through
the PRODUCTION minting flow (tools/make_null_text_encoding.py's model
path: SD1.5-size CLIPTextModel.apply on the empty-prompt token ids) with
deterministic seeded random parameters — it exercises every production
code path (np.load -> runtime.load_null_text_encoding -> pipeline
null-text CFG branch) while being clearly labeled non-numeric.  Replace
by running tools/make_null_text_encoding.py once real SD1.5 weights are
fetched (docs/REAL_WEIGHTS.md).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _materialize
    from asva_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel

    model = CLIPTextModel(CLIPTextConfig())
    # empty prompt under CLIP's eot-padding convention: [BOS, EOT, EOT, ...]
    ids = jnp.asarray([[49406] + [49407] * 76], jnp.int32)
    params = _materialize(jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), ids)), seed=1234)
    enc = np.asarray(jax.jit(model.apply)(params, ids), np.float32)
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                       "null_text_encoding_fixture.npy")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.save(out, enc)
    print(f"wrote {out} shape={enc.shape} mean={enc.mean():.4f} "
          f"std={enc.std():.4f}")


if __name__ == "__main__":
    main()
