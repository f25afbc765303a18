"""CLIPTextModel forward parity vs transformers.CLIPTextModel (r2 VERDICT
item 2): random-init HF model -> clip_text_key_map conversion -> allclose
on last_hidden_state, which is exactly what the pipeline consumes
(reference avgen/pipelines/pipeline_audio_cond_animation.py:512 loads HF
CLIPTextModel and uses .last_hidden_state; the eos-pooled output is never
used by SD1.5/ASVA, so it has no flax counterpart)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asva_tpu.convert import convert_state_dict
from asva_tpu.convert.torch_to_jax import clip_text_key_map
from asva_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _parity_case(hf_cfg_kwargs, our_cfg, ids, atol):
    hf_cfg = transformers.CLIPTextConfig(**hf_cfg_kwargs)
    torch.manual_seed(0)
    hf = transformers.CLIPTextModel(hf_cfg).eval()
    state = {k: v.float().numpy() for k, v in hf.state_dict().items()}

    net = CLIPTextModel(our_cfg)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    variables, report = convert_state_dict(variables, state,
                                           clip_text_key_map)
    assert report["fresh"] == [], report["fresh"][:5]
    leftover = [k for k in report["unused"] if "position_ids" not in k]
    assert leftover == [], leftover[:5]

    ours = np.asarray(net.apply(variables, jnp.asarray(ids)))
    with torch.no_grad():
        theirs = hf(input_ids=torch.from_numpy(ids)).last_hidden_state
    theirs = theirs.numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=atol, rtol=1e-3)


def test_clip_text_parity_tiny(rng):
    ids = rng.integers(0, 99, (3, 16)).astype(np.int64)
    _parity_case(
        dict(vocab_size=100, hidden_size=32, num_hidden_layers=2,
             num_attention_heads=2, max_position_embeddings=16,
             intermediate_size=64, hidden_act="quick_gelu"),
        CLIPTextConfig.tiny(),
        ids, atol=1e-5)


def test_clip_text_parity_sd15_size(rng):
    """Full SD1.5 text-encoder geometry (vocab 49408, 12x768, 77 pos)."""
    ids = rng.integers(0, 49408, (2, 77)).astype(np.int64)
    _parity_case(
        dict(vocab_size=49408, hidden_size=768, num_hidden_layers=12,
             num_attention_heads=12, max_position_embeddings=77,
             intermediate_size=3072, hidden_act="quick_gelu"),
        CLIPTextConfig(),
        ids, atol=1e-4)
