"""Inverse conversion: flax parameter trees -> torch-layout state dicts.

Lets checkpoints trained here be consumed by the reference (or any
diffusers-based) stack: walk the flax tree, translate each path with the
same key maps used for import, and invert the layout transforms
(conv (kh,kw[,kt],I,O) -> (O,I,kh,kw[,kt]); linear (I,O) -> (O,I)).
"""
from __future__ import annotations

import re
from typing import Callable, Dict

import jax
import numpy as np

# Transformer3DModel proj_in/proj_out are nn.Dense here but Conv2d 1x1 in
# the SD1.5/diffusers UNet (use_linear_projection=False); export must emit
# (O, I, 1, 1) or the reference's load_state_dict rejects the rank.  The
# FF GEGLU "ff.net.0.proj" is a true Linear and must NOT match.
_CONV1X1_KEYS = re.compile(r"(^|\.)proj_(in|out)\.weight$")


def _invert(value: np.ndarray, leaf: str, torch_key: str = "") -> np.ndarray:
    v = np.asarray(value)
    if leaf in ("kernel", "temp_kernel"):
        if v.ndim == 4:
            return v.transpose(3, 2, 0, 1)
        if v.ndim == 5:
            return v.transpose(4, 3, 0, 1, 2)
        if v.ndim == 2:
            v = v.T
            if _CONV1X1_KEYS.search(torch_key):
                v = v[:, :, None, None]
            return v
    return v


def export_state_dict(params, key_fn: Callable[[tuple], object],
                      to_torch: bool = False) -> Dict[str, np.ndarray]:
    """flax tree -> {torch_key: torch-layout array}.

    key_fn is one of asva_tpu.convert's key maps (first candidate is used).
    With to_torch=True values are torch tensors (requires torch).
    """
    out: Dict[str, np.ndarray] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        segs = tuple(str(getattr(k, "key", k)) for k in path)
        keys = key_fn(segs)
        if isinstance(keys, list):
            keys = keys[0] if keys else None
        if keys is None:
            raise ValueError(f"no torch key for {'.'.join(segs)}")
        out[keys] = _invert(np.asarray(leaf, np.float32), segs[-1], keys)
    if to_torch:
        import torch
        out = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in out.items()}
    return out
