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
    # An explicit coordinator address is a direct instruction to join a
    # cluster — honor it even when TPU_WORKER_HOSTNAMES is absent or
    # single-entry (e.g. multislice with one host per slice); requiring a
    # comma there would silently run N identical single-host replicas.
    explicit = any(k in os.environ for k in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS"))
    multi_worker = os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    if not (explicit or multi_worker):
        return False
    # jax.distributed.initialize() env-reads JAX_COORDINATOR_ADDRESS but
    # NOT the process count/id — those come only from cluster detection
    # (Slurm/MPI/TPU pods).  For generic clusters pass them from env
    # ourselves (the torch `env://` equivalent).
    kwargs = {}
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if num is not None:
        kwargs["num_processes"] = int(num)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    try:
        jax.distributed.initialize(**kwargs)
        log.info("jax.distributed initialized: process %d/%d",
                 jax.process_index(), jax.process_count())
        return True
    except Exception as e:
        if explicit:
            # an explicitly configured coordinator MUST NOT silently fall
            # back: N independent "single-host" replicas would train on
            # duplicate data and corrupt each other's checkpoint writes
            raise RuntimeError(
                "jax.distributed.initialize failed although a coordinator "
                f"address was explicitly configured: {e}") from e
        log.warning("jax.distributed.initialize failed (%s); continuing "
                    "single-host", e)
        return False


def make_global_batch(tree, sharding):
    """Assemble a global on-device batch from per-PROCESS local arrays.

    Each process passes its own local batch (leading axis = local batch
    size); the result is a global array of leading size local*n_processes
    laid out by `sharding`.  Single-process this is jax.device_put.  This is
    the multi-host-correct path: every host decodes only its own examples
    (the reference's DDP sampler semantics), unlike device_put of a
    "global" array which would silently use 1/n of each host's rows.

    Computations over the result are SPMD across all hosts, so a scalar
    reduction (e.g. the train loss) comes back replicated and already IS
    the cross-rank mean — the TPU-native equivalent of the reference's
    `accelerator.gather(loss).mean()` (scripts/animation_train.py:318).
    """
    import jax
    import numpy as np
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def put(x):
        x = np.asarray(x)
        gshape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, gshape)
    return jax.tree.map(put, tree)


def process_allgather(x, tiled: bool = True):
    """All-gather a host-local numpy array across processes.

    Single-process: identity.  Multi-process: equal-shaped arrays are
    gathered with jax.experimental.multihost_utils; tiled=True concatenates
    along axis 0, else stacks a leading process axis.  The TPU counterpart
    of the reference's accelerator.gather (scripts/avsync_eval.py:150-152).
    """
    import jax
    import numpy as np
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=tiled))


def gather_metric_records(indices, values, value_shape=None):
    """Gather per-example eval records from all processes and dedup by
    example index (reference scripts/avsync_eval.py:158-167: sharded eval
    may evaluate an index on more than one rank).

    indices: (n,) int example ids (host-local); values: (n, ...) floats.
    `value_shape` gives the per-record trailing shape and MUST be passed
    (identically on every process) when a process can end up with zero
    records — an empty np.asarray list has trailing shape (), which would
    disagree with non-empty processes' (k,) and corrupt the gather.
    Returns (unique_indices, values_at_unique) sorted by index; handles
    ragged per-process counts by padding to the global max with index -1.
    """
    import jax
    import numpy as np
    indices = np.asarray(indices, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    if value_shape is not None:
        values = values.reshape((len(indices),) + tuple(value_shape))
    if jax.process_count() > 1:
        counts = process_allgather(np.array([len(indices)]))
        m = int(counts.max())
        pad_idx = np.full((m,), -1, dtype=np.int64)
        pad_idx[:len(indices)] = indices
        pad_val = np.zeros((m,) + values.shape[1:], dtype=np.float64)
        pad_val[:len(values)] = values
        indices = process_allgather(pad_idx).reshape(-1)
        values = process_allgather(pad_val).reshape((-1,) + values.shape[1:])
        keep = indices >= 0
        indices, values = indices[keep], values[keep]
    uniq, first = np.unique(indices, return_index=True)
    return uniq, values[first]


def globalize_host_local(tree, mesh):
    """Re-place host-local leaves as mesh-replicated GLOBAL arrays.

    Eagerly created scalars (TrainState.step, optax Adam counts) live on a
    single local device; in multi-process mode orbax refuses to serialize
    such host-local arrays ("Cannot serialize host local jax.Array"), and
    they are invisible to collective restore.  Leaves that are already
    global (not fully addressable from this process — the exact property
    orbax needs, regardless of whether the sharding is Named or a GSPMD
    output of an earlier jit) pass through untouched; every fully-
    addressable leaf becomes a fully-replicated global array.
    Single-process: identity.  Found by the 2-process checkpoint cycle test
    (tests/test_multihost_train_resume.py).
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    if jax.process_count() == 1:
        return tree
    rep = NamedSharding(mesh, PartitionSpec())

    def fix(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x
        if isinstance(x, (jax.Array, np.ndarray, np.generic, int, float)):
            arr = np.asarray(x)
            return jax.make_array_from_process_local_data(rep, arr,
                                                          arr.shape)
        return x

    return jax.tree.map(fix, tree)
