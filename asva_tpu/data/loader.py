"""Threaded prefetching batch loader (host-side).

Replaces torch DataLoader workers in the reference's input path: decode is
released-GIL C++ (libav) so a thread pool pipelines well; batches are
stacked numpy dicts ready for `jax.device_put` with a batch sharding.
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


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 8, drop_last: bool = True,
                 seed: int = 0, shard: Tuple[int, int] = (0, 1),
                 prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.shard = shard
        self.prefetch = prefetch
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

    def __iter__(self) -> Iterator[dict]:
        order = self._indices()
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self.epoch)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        # fast-forward past already-consumed batches (resume mid-epoch);
        # skipping index lists costs nothing — no decode happens for them
        batches = batches[self._cursor:]

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
