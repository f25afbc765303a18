"""Device mesh construction and common shardings.

The reference's distribution layer is HF Accelerate DDP over NCCL
(scripts/animation_train.py:57-61, SURVEY §2.5).  Here distribution is
declarative: one `jax.sharding.Mesh` with axes

  data : pure data parallelism (batch axis)
  fsdp : parameter/optimizer-state sharding axis (also consumes batch)

Gradient all-reduces and parameter all-gathers are inserted by the SPMD
partitioner from sharding annotations — no hand-written collectives.
Multi-host: call `jax.distributed.initialize()` before `make_mesh`; the DCN
axis should map onto `data` (pure DP across slices).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, fsdp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    assert n % fsdp == 0, (n, fsdp)
    arr = np.asarray(devices).reshape(n // fsdp, fsdp)
    return Mesh(arr, ("data", "fsdp"))


def make_gen_mesh(n_devices: Optional[int] = None, seq: int = 1,
                  devices: Optional[Sequence] = None) -> Mesh:
    """(data, seq) mesh for generation: `seq` shards the FRAME axis —
    sequence/context parallelism for videos longer than one chip's memory
    or latency budget.  All frame-axis ops in the UNet (temporal attention,
    conv_temp 3-tap mix, frame-0 K/V broadcast, all-frame GroupNorm stats)
    are jnp ops, so the SPMD partitioner inserts the all-gathers/psums;
    the reference has no equivalent (SURVEY §5.7)."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    assert n % seq == 0, (n, seq)
    arr = np.asarray(devices).reshape(n // seq, seq)
    return Mesh(arr, ("data", "seq"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over every mesh axis."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
