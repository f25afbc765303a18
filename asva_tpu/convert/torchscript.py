"""TorchScript blob introspection helpers (lazy torch import).

The published FVD I3D (pretrained/i3d_torchscript.pt, consumed at reference
avgen/evaluations/models/download.py:48-55) is a traced TF-converted module
whose BatchNorm epsilon is not documented: the reference's own pytorch_i3d
source says 1e-5 while TF BatchNorm defaults to 1e-3.  Rather than asking
the user to guess (the old --i3d_bn_eps flag), read the value out of the
blob itself.
"""
from __future__ import annotations

import re
from typing import Optional


def detect_bn_eps(module) -> Optional[float]:
    """Best-effort BatchNorm epsilon of a torch.jit module.

    Tries, in order:
      1. `.eps` attributes on (recursively) scripted BatchNorm submodules;
      2. constants feeding the 8th argument of aten::batch_norm /
         aten::instance_norm calls in the inlined graph (traced modules
         bake eps as prim::Constant).
    Returns the value if all call sites agree, the most common one if not
    (ties -> smallest), or None if no BN is found.
    """
    values = []
    stack = [module]
    while stack:
        m = stack.pop()
        stack.extend(m.children())
        eps = getattr(m, "eps", None)
        if isinstance(eps, float):
            values.append(eps)
    if not values:
        try:
            graph = str(module.inlined_graph)
        except Exception:
            graph = ""
        consts = {
            name: float(val)
            for name, val in re.findall(
                r"(%[\w.]+)\s*:\s*float\s*=\s*prim::Constant\[value="
                r"([0-9eE.+-]+)\]", graph)
        }
        for call in re.finditer(
                r"aten::(?:batch_norm|instance_norm)\(([^)]*)\)", graph):
            args = [a.strip() for a in call.group(1).split(",")]
            if len(args) >= 8 and args[7] in consts:
                values.append(consts[args[7]])
    if not values:
        return None
    counts = {}
    for v in values:
        counts[v] = counts.get(v, 0) + 1
    return sorted(counts, key=lambda v: (-counts[v], v))[0]


def extract_state_and_eps(blob_path: str):
    """(float32 state dict, detected bn eps or None) from a jit blob."""
    import torch
    module = torch.jit.load(blob_path, map_location="cpu")
    state = {k: v.float() for k, v in module.state_dict().items()}
    return state, detect_bn_eps(module)
