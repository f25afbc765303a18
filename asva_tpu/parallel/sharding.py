"""FSDP-style parameter sharding rules.

The AVSyncD UNet (~1.3B params inflated) plus Adam state can exceed a single
chip's HBM at large batch; `fsdp_shardings` assigns each parameter a
NamedSharding that splits its largest divisible axis across the `fsdp` mesh
axis (ZeRO-3 style — XLA all-gathers weights per layer and reduce-scatters
gradients automatically).  Small parameters stay replicated.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(shape, fsdp_size: int, min_size: int) -> P:
    if fsdp_size <= 1 or int(np.prod(shape)) < min_size:
        return P()
    # prefer the largest axis divisible by the fsdp size
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[i] = "fsdp"
            return P(*spec)
    return P()


def fsdp_shardings(params: Any, mesh: Mesh,
                   min_size: int = 2 ** 16) -> Any:
    """Pytree of NamedShardings matching `params`' structure."""
    fsdp_size = mesh.shape["fsdp"]

    def assign(p):
        return NamedSharding(mesh, _spec_for(p.shape, fsdp_size, min_size))

    return jax.tree.map(assign, params)


def shard_pytree(params: Any, shardings: Any) -> Any:
    return jax.tree.map(lambda p, s: jax.device_put(p, s), params, shardings)
