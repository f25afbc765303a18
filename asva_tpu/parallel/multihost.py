"""Multi-host initialization (TPU pods / multi-slice).

Call before any jax usage in train scripts.  On single-host (or when no
cluster env is present) this is a no-op; on TPU pods
`jax.distributed.initialize()` autodetects coordinator/process ids from the
TPU runtime.  The mesh then spans all hosts' devices; batch sharding by
process uses (jax.process_index(), jax.process_count()) in DataLoader.
"""
from __future__ import annotations

import logging
import os

log = logging.getLogger("asva_tpu")


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when a multi-host environment is detected.

    Returns True if distributed mode was initialized.
    """
    import jax

    already = getattr(jax.distributed,
                      "is_initialized", lambda: False)()
    if already:
        return True
    cluster_env = any(k in os.environ for k in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"))
    multi_worker = os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    if not (cluster_env and multi_worker):
        return False
    try:
        jax.distributed.initialize()
        log.info("jax.distributed initialized: process %d/%d",
                 jax.process_index(), jax.process_count())
        return True
    except Exception as e:  # single-host fallbacks must keep working
        log.warning("jax.distributed.initialize failed (%s); continuing "
                    "single-host", e)
        return False
