"""Inverse conversion: flax parameter trees -> torch-layout state dicts.

Lets checkpoints trained here be consumed by the reference (or any
diffusers-based) stack: walk the flax tree, translate each path with the
same key maps used for import, and invert the layout transforms
(conv (kh,kw[,kt],I,O) -> (O,I,kh,kw[,kt]); linear (I,O) -> (O,I)).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import numpy as np


def _invert(value: np.ndarray, leaf: str) -> np.ndarray:
    v = np.asarray(value)
    if leaf in ("kernel", "temp_kernel"):
        if v.ndim == 4:
            return v.transpose(3, 2, 0, 1)
        if v.ndim == 5:
            return v.transpose(4, 3, 0, 1, 2)
        if v.ndim == 2:
            return v.T
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
        out[keys] = _invert(np.asarray(leaf, np.float32), segs[-1])
    if to_torch:
        import torch
        out = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in out.items()}
    return out
