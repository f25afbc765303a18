"""Prefetching batch loader (host-side), thread or process workers.

Replaces torch DataLoader workers in the reference's input path.  Two
worker modes:

  * "thread" (default): a thread pool decodes each batch's items.  Fine
    for the AVSyncD train item (small, decode-dominated), but MEASURED
    (tools/data_bench.py --gil_probe) ~69% of the 21-clip multipair item
    wall holds the GIL (large numpy stacks/copies do not release it), so
    thread aggregate caps at ~1.4x regardless of host cores.
  * "process": fork worker processes that write item arrays straight into
    fork-inherited shared-memory slabs sized (batch, *item_shape) — the
    parent never copies or unpickles item payloads (a 21-clip item is
    ~150 MB; pickling it would make the parent the serial bottleneck).
    Batch composition, order, and per-item RNG are identical to thread
    mode.  Yielded arrays are views into a recycled slab: valid until the
    NEXT batch is requested (the train loops device_put immediately).
    Workers are forked lazily at first iteration and touch only
    numpy/ctypes — safe after jax initialization in the parent.

Batches are numpy dicts ready for `jax.device_put` with a batch sharding.
Supports per-host sharding for multi-host DP (shard=(host_index, n_hosts)).

Determinism & resume: the shuffle order is a pure function of
(seed, epoch); datasets exposing `set_epoch` get the current epoch so their
per-item augmentation RNG is (seed, epoch, index)-derived — batches are
identical for any num_workers.  The loader tracks (epoch, batch cursor);
`state_dict()/load_state_dict()` let a resumed run skip the batches the
crashed run already consumed instead of re-training on them (the
reference's resume skips consumed steps within the epoch,
scripts/animation_train.py:268-309).
"""
from __future__ import annotations

import queue
import random
import threading
from typing import Iterator, Tuple

import numpy as np


class _SlabPool:
    """Fork-inherited shared-memory batch slabs.

    Each slab holds one batch: key -> (batch_size, *item_shape) array backed
    by multiprocessing.shared_memory.  Created BEFORE the workers fork so
    children inherit the mappings (no name-based attach, no pickling)."""

    def __init__(self, spec: dict, batch_size: int, n_slabs: int):
        from multiprocessing import shared_memory
        self.spec = spec          # key -> (shape, dtype) of ONE item
        self.batch_size = batch_size
        self.shms = []            # flat list for cleanup
        self.slabs = []           # slab_id -> {key: np.ndarray}
        for _ in range(n_slabs):
            slab = {}
            for key, (shape, dtype) in spec.items():
                nbytes = int(np.prod((batch_size,) + shape)
                             ) * np.dtype(dtype).itemsize
                shm = shared_memory.SharedMemory(create=True,
                                                 size=max(nbytes, 1))
                self.shms.append(shm)
                slab[key] = np.ndarray((batch_size,) + shape, dtype,
                                       buffer=shm.buf)
            self.slabs.append(slab)

    def close(self, unlink: bool):
        for shm in self.shms:
            try:
                shm.close()
                if unlink:
                    shm.unlink()
            except Exception:
                pass
        self.shms, self.slabs = [], []


def _process_worker(dataset, slabs, task_q, result_q):
    """Worker-process main: decode items into shared slabs.

    Runs only numpy/ctypes code (fork-safe after jax init in the parent).
    Tasks: (slab_id, slot, dataset_index, epoch) or None to exit."""
    last_epoch = None
    while True:
        task = task_q.get()
        if task is None:
            return
        slab_id, slot, index, epoch = task
        try:
            if epoch != last_epoch and hasattr(dataset, "set_epoch"):
                dataset.set_epoch(epoch)
                last_epoch = epoch
            item = dataset[index]
            slab = slabs[slab_id]
            for key, arr in slab.items():
                arr[slot] = np.asarray(item[key], dtype=arr.dtype)
            result_q.put((slab_id, slot, None))
        except Exception as e:  # surface to the parent, keep the worker up
            result_q.put((slab_id, slot,
                          f"{type(e).__name__}: {e} (item {index})"))


class _ProcessPool:
    """Persistent fork pool + slab ring for DataLoader(worker_mode=
    'process').  One pool serves every epoch of its loader."""

    def __init__(self, dataset, batch_size: int, num_workers: int,
                 n_slabs: int, probe_item: dict):
        import multiprocessing as mp
        ctx = mp.get_context("fork")   # inherit dataset + slab mappings
        spec = {k: (np.asarray(v).shape, np.asarray(v).dtype)
                for k, v in probe_item.items()}
        self.slabs = _SlabPool(spec, batch_size, n_slabs)
        self.task_q = ctx.Queue()
        self.result_q = ctx.Queue()
        self.procs = [ctx.Process(
            target=_process_worker,
            args=(dataset, self.slabs.slabs, self.task_q, self.result_q),
            daemon=True) for _ in range(num_workers)]
        for p in self.procs:
            p.start()

    def close(self):
        try:
            for _ in self.procs:
                self.task_q.put(None)
            for p in self.procs:
                p.join(timeout=10.0)
                if p.is_alive():
                    p.terminate()
                    p.join(timeout=5.0)
        finally:
            self.slabs.close(unlink=True)
            for q in (self.task_q, self.result_q):
                try:
                    q.close()
                except Exception:
                    pass


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 8, drop_last: bool = True,
                 seed: int = 0, shard: Tuple[int, int] = (0, 1),
                 prefetch: int = 4, worker_mode: str = "thread",
                 zero_copy="auto"):
        if worker_mode not in ("thread", "process"):
            raise ValueError(worker_mode)
        # process mode: yielded batches are views into recycled shm slabs.
        # jax's CPU backend ALIASES aligned numpy buffers (device_put /
        # make_array_from_process_local_data are zero-copy), so a recycled
        # slab would corrupt "device" arrays — on a cpu backend batches are
        # copied out at yield.  Real accelerator backends serialize the
        # host buffer during device_put, so views are handed out directly.
        # zero_copy: "auto" (decide from jax.default_backend), True, False.
        self.zero_copy = zero_copy
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.shard = shard
        self.prefetch = prefetch
        self.worker_mode = worker_mode
        self._pool = None     # lazy _ProcessPool (process mode)
        self.epoch = 0        # epoch the NEXT __iter__ will (re)enter
        self._cursor = 0      # batches already consumed within that epoch

    def __len__(self):
        idx, n = self.shard
        per_host = len(self.dataset) // n if n > 1 else len(self.dataset)
        if self.drop_last:
            return per_host // self.batch_size
        return (per_host + self.batch_size - 1) // self.batch_size

    # -- resume state --
    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "cursor": self._cursor,
                "seed": self.seed}

    def load_state_dict(self, state: dict) -> None:
        self.epoch = int(state["epoch"])
        self._cursor = int(state["cursor"])
        saved_seed = state.get("seed")
        if saved_seed is not None and int(saved_seed) != self.seed:
            # the cursor counts batches of the shuffle order generated from
            # the SAVED seed; fast-forwarding a differently-seeded order
            # would re-train some examples and skip others.  Adopt the
            # checkpoint's seed so the resumed order matches what the
            # crashed run actually consumed.
            import logging
            logging.getLogger(__name__).warning(
                "DataLoader resume: checkpoint seed %s != configured seed "
                "%s; adopting the checkpoint seed to keep the consumed-"
                "batch cursor meaningful", saved_seed, self.seed)
            self.seed = int(saved_seed)
            # the dataset's per-item augmentation RNG is (seed, epoch,
            # index)-derived; adopt there too or the resumed items would
            # get different clip starts/flips than the order they were
            # scheduled under
            if hasattr(self.dataset, "seed"):
                self.dataset.seed = int(saved_seed)

    def reset(self) -> None:
        """Forget epoch/cursor state: the next __iter__ starts at the top.

        Use for stateless passes (e.g. periodic in-train eval) that may
        break out early — without this, the persistent cursor would make
        each pass see a different sliding window of the dataset."""
        self.epoch = 0
        self._cursor = 0

    def _indices(self):
        order = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(order)
        idx, n = self.shard
        if n > 1:
            # equal per-host length (reference DistributedSampler
            # semantics): without truncation, len(dataset) % n != 0 gives
            # hosts UNEQUAL batch counts — collective train steps would
            # silently pair batches from different epochs and an epoch-
            # draining loop would deadlock in the collective
            order = order[:(len(order) // n) * n]
            return order[idx::n]
        return order

    def _epoch_batches(self):
        order = self._indices()
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self.epoch)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        # fast-forward past already-consumed batches (resume mid-epoch);
        # skipping index lists costs nothing — no decode happens for them
        return batches[self._cursor:]

    def close(self) -> None:
        """Tear down persistent process workers/slabs (no-op otherwise)."""
        if self._pool is not None:
            self._pool.close()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _iter_process(self) -> Iterator[dict]:
        batches = self._epoch_batches()
        if not batches:
            self.epoch += 1
            self._cursor = 0
            return
        if self._pool is None:
            # one probe decode learns the item spec for slab sizing
            probe = self.dataset[batches[0][0]]
            self._pool = _ProcessPool(self.dataset, self.batch_size,
                                      self.num_workers,
                                      n_slabs=self.prefetch + 2,
                                      probe_item=probe)
        pool = self._pool
        if self.zero_copy == "auto":
            try:
                import jax
                copy_out = jax.default_backend() == "cpu"
            except Exception:
                copy_out = True
        else:
            copy_out = not bool(self.zero_copy)
        n_slabs = len(pool.slabs.slabs)
        free = list(range(n_slabs))
        # slab_id -> [batch_pos, remaining, error]; completed out-of-order
        # batches wait until their turn (yield order == batch order)
        inflight = {}
        done = {}                 # batch_pos -> (slab_id, n_items, error)
        outstanding = 0           # dispatched item tasks not yet reported
        next_dispatch, next_yield = 0, 0
        try:
            while next_yield < len(batches):
                while free and next_dispatch < len(batches):
                    slab_id = free.pop()
                    ids = batches[next_dispatch]
                    inflight[slab_id] = [next_dispatch, len(ids), None]
                    for slot, index in enumerate(ids):
                        pool.task_q.put((slab_id, slot, index, self.epoch))
                        outstanding += 1
                    next_dispatch += 1
                slab_id, slot, err = pool.result_q.get()
                outstanding -= 1
                entry = inflight[slab_id]
                entry[1] -= 1
                if err is not None and entry[2] is None:
                    entry[2] = err
                if entry[1] == 0:
                    done[entry[0]] = (slab_id, len(batches[entry[0]]),
                                      entry[2])
                    del inflight[slab_id]
                while next_yield in done:
                    slab_id, n, err = done.pop(next_yield)
                    if err is not None:
                        raise RuntimeError(f"data worker failed: {err}")
                    views = {k: arr[:n]
                             for k, arr in pool.slabs.slabs[slab_id].items()}
                    self._cursor += 1
                    next_yield += 1
                    if copy_out:
                        batch = {k: np.array(v) for k, v in views.items()}
                        free.append(slab_id)
                        yield batch
                    else:
                        yield views      # valid until the next batch request
                        free.append(slab_id)
            self.epoch += 1
            self._cursor = 0
        finally:
            # early exit / error: flush tasks no worker has picked up yet
            # (so workers don't keep decoding up to prefetch+2 abandoned
            # ~150 MB multipair batches), then drain the results of tasks
            # already in flight so the shared queues are clean for the next
            # __iter__; rebuild the pool on timeout.  A worker may grab a
            # task between flush attempts — its result shows up in result_q
            # and is drained below.
            import queue as _queue
            import time
            while outstanding > 0:
                try:
                    pool.task_q.get_nowait()
                    outstanding -= 1
                except _queue.Empty:
                    break
                except Exception:
                    break
            deadline = time.monotonic() + 60.0
            while outstanding > 0 and time.monotonic() < deadline:
                try:
                    pool.result_q.get(timeout=1.0)
                    outstanding -= 1
                except Exception:
                    continue
            if outstanding > 0:
                self.close()

    def __iter__(self) -> Iterator[dict]:
        if self.worker_mode == "process":
            yield from self._iter_process()
            return
        batches = self._epoch_batches()

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # stop-aware put: a producer blocked on a full queue must still
            # observe an early consumer exit, or it leaks its thread pool
            # and ~prefetch decoded batches forever
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_ids in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__,
                                              batch_ids))
                        collated = {
                            k: np.stack([it[k] for it in items])
                            for k in items[0]}
                        if not put(collated):
                            return
            except Exception as e:  # surface worker errors to the consumer
                put(e)
            finally:
                put(None)  # no-op if the consumer already stopped

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                self._cursor += 1
                yield item
            # epoch fully drained -> next __iter__ starts the next epoch
            self.epoch += 1
            self._cursor = 0
        finally:
            stop.set()
            # unblock a producer mid-put and reap the thread (and its
            # ThreadPoolExecutor) instead of leaking one per early exit
            while True:
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=30.0)
