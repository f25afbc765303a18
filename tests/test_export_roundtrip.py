"""flax -> torch-layout -> flax round trip over the real UNet key space."""
import numpy as np
import jax
import jax.numpy as jnp

from asva_tpu.convert import convert_state_dict, unet_key_map
from asva_tpu.convert.jax_to_torch import export_state_dict
from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig


def test_unet_export_import_roundtrip(rng):
    model = AudioUNet3D(UNet3DConfig.tiny())
    f = 3
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, f, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 5, 768)),
        jnp.zeros((1, 9, 768)), jnp.ones((1, f, 9), bool))
    # randomize so zero-init params do not mask layout errors
    leaves, treedef = jax.tree.flatten(params)
    params = jax.tree.unflatten(
        treedef, [jnp.asarray(rng.standard_normal(l.shape), l.dtype)
                  for l in leaves])

    state = export_state_dict(params, unet_key_map)
    assert all(isinstance(v, np.ndarray) for v in state.values())
    # SD1.5/diffusers expects Conv2d-1x1 rank for the transformer in/out
    # projections (use_linear_projection=False); GEGLU stays Linear
    proj_keys = [k for k in state
                 if k.endswith(("proj_in.weight", "proj_out.weight"))
                 and "ff.net" not in k]
    assert proj_keys and all(state[k].ndim == 4 and state[k].shape[2:] ==
                             (1, 1) for k in proj_keys)
    assert all(state[k].ndim == 2 for k in state
               if k.endswith("ff.net.0.proj.weight"))
    fresh = jax.tree.map(jnp.zeros_like, params)
    restored, report = convert_state_dict(fresh, state, unet_key_map)
    assert not report["fresh"] and not report["unused"]
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
