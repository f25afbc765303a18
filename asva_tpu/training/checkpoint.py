"""Orbax checkpointing with the reference's step/milestone retention policy.

Reference behavior (scripts/animation_train.py:346-371, README warning):
save every `checkpointing_steps`; after a successful save, delete the
previous checkpoint unless its step is a multiple of
`checkpointing_milestones`.  Exact resume restores params + optimizer state
+ step (+ host RNG state); `latest_step` supports resume_from_checkpoint=
"latest" (scripts/animation_train.py:268-290).

Saves are async (orbax AsyncCheckpointer): `save()` snapshots the arrays
and returns while the host persists in the background, so the train loop
keeps stepping during the write.  Retention is applied lazily — the
previous checkpoint is deleted only once the newer one has fully
committed (at the next save() or at close()), so a crash mid-write never
leaves zero usable checkpoints.
"""
from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, checkpointing_steps: int = 1000,
                 milestone_steps: int = 0,
                 module_configs: Optional[dict] = None):
        """module_configs: JSON-serializable {module_name: config_dict},
        written as checkpoint-N/modules_config.json alongside every module
        export — the analogue of the reference's HF save_pretrained
        config.json (audio_cond_animation_trainer.py:152-155), so a module
        export is self-describing and load_animation_pipeline can rebuild
        the exact architecture without out-of-band config."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.checkpointing_steps = checkpointing_steps
        self.milestone_steps = milestone_steps
        self.module_configs = module_configs
        # one AsyncCheckpointer PER SAVE SLOT (state, each module): orbax's
        # AsyncCheckpointer.save waits for ITS OWN previous write, so a
        # single instance would serialize the state+module writes of one
        # checkpoint — separate instances let them overlap
        self._ckpts: dict = {}
        self._last_saved: Optional[int] = None   # fully committed
        self._pending: Optional[int] = None      # async save in flight

    @staticmethod
    def _is_primary() -> bool:
        try:
            import jax
            return jax.process_index() == 0
        except Exception:
            return True

    def _ckpt(self, slot: str = "state"):
        if slot not in self._ckpts:
            # generous cross-process barrier timeout: on oversubscribed
            # hosts (or while other processes compile) the async write
            # threads can starve well past orbax's default before the
            # primary's directory-creation signal lands
            self._ckpts[slot] = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler(), timeout_secs=1800)
        return self._ckpts[slot]

    def _wait_all(self):
        for c in self._ckpts.values():
            c.wait_until_finished()

    # -- paths --
    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"checkpoint-{step}")

    def existing_steps(self):
        steps = []
        if not os.path.isdir(self.directory):
            return steps
        for name in os.listdir(self.directory):
            m = re.match(r"^checkpoint-(\d+)$", name)
            # a committed save has its final (renamed) "state" dir; a crash
            # mid-async-write leaves only orbax tmp dirs -> not restorable
            if m and os.path.isdir(os.path.join(self.directory, name,
                                                "state")):
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.existing_steps()
        return steps[-1] if steps else None

    def is_milestone(self, step: int) -> bool:
        return (self.milestone_steps > 0
                and step % self.milestone_steps == 0)

    # -- save/restore --
    def should_save(self, step: int) -> bool:
        return step > 0 and step % self.checkpointing_steps == 0

    def _commit_pending(self):
        """Wait for the in-flight save (if any) and apply retention: once
        the pending step is durable, the previously committed checkpoint is
        deleted unless it is a milestone."""
        self._wait_all()
        if self._pending is None:
            return
        prev = self._last_saved
        if prev is not None and prev != self._pending \
                and not self.is_milestone(prev) and self._is_primary():
            # primary-only: concurrent rmtree from several processes races
            # with each other (and with stragglers still reading)
            shutil.rmtree(self._path(prev), ignore_errors=True)
        self._last_saved = self._pending
        self._pending = None

    @staticmethod
    def _check_serializable(tree: Any) -> None:
        """Multi-process: host-local jax.Arrays are not collectively
        serializable; orbax raises INSIDE its async thread while the peer
        processes hang on the cross-process barrier.  Fail fast on the
        caller's thread instead (fix: parallel.multihost.
        globalize_host_local)."""
        import jax
        if jax.process_count() == 1:
            return
        bad = []

        def visit(path, x):
            if isinstance(x, jax.Array) and x.is_fully_addressable:
                bad.append(jax.tree_util.keystr(path))
            return x

        jax.tree_util.tree_map_with_path(visit, tree)
        if bad:
            raise ValueError(
                "multi-process checkpoint save of host-local arrays would "
                f"hang the collective write; globalize these leaves first "
                f"(globalize_host_local): {bad[:8]}"
                + ("..." if len(bad) > 8 else ""))

    def save(self, step: int, state: Any, force: bool = False,
             modules: Optional[dict] = None,
             extra: Optional[dict] = None) -> bool:
        """Start an async save of the full train state; `modules` optionally
        adds per-module parameter exports under checkpoint-N/modules/<name>
        (the reference's dual-format policy: exact-resume state + inference
        module exports).  `extra` is a small JSON-serializable dict written
        synchronously alongside (host-side state: data-loader cursor, host
        RNG, ...) and recoverable via `restore_extra`.  Returns once the
        arrays are snapshotted — the write continues in the background."""
        if not force and not self.should_save(step):
            return False
        if step in (self._pending, self._last_saved):
            return False   # idempotent: the loop's periodic save at
            #                max_steps + the final force-save are one step
        self._check_serializable(state)
        for tree in (modules or {}).values():
            self._check_serializable(tree)
        if self._last_saved is None and self._pending is None:
            existing = self.existing_steps()
            self._last_saved = existing[-1] if existing else None
        self._commit_pending()   # previous async save (usually already done)
        if extra is not None and self._is_primary():
            # primary-only: two processes truncating/writing the same file
            # can interleave into corrupt JSON (content is identical across
            # ranks — the loader cursor is global)
            os.makedirs(self._path(step), exist_ok=True)
            tmp = os.path.join(self._path(step), ".extra.json.tmp")
            with open(tmp, "w") as f:
                json.dump(extra, f)
            os.replace(tmp, os.path.join(self._path(step), "extra.json"))
        self._ckpt("state").save(os.path.join(self._path(step), "state"),
                                 args=ocp.args.StandardSave(state),
                                 force=True)
        for name, tree in (modules or {}).items():
            self._ckpt(f"modules/{name}").save(
                os.path.join(self._path(step), "modules", name),
                args=ocp.args.StandardSave(tree), force=True)
        if modules and self.module_configs and self._is_primary():
            os.makedirs(self._path(step), exist_ok=True)
            tmp = os.path.join(self._path(step), ".modules_config.json.tmp")
            with open(tmp, "w") as f:
                json.dump(self.module_configs, f, indent=1)
            os.replace(tmp,
                       os.path.join(self._path(step), "modules_config.json"))
        self._pending = step
        return True

    def restore(self, step: int, target: Any) -> Any:
        self._wait_all()
        return self._ckpt("state").restore(
            os.path.join(self._path(step), "state"),
            args=ocp.args.StandardRestore(target))

    def restore_latest(self, target: Any) -> Optional[Any]:
        step = self.latest_step()
        if step is None:
            return None
        return step, self.restore(step, target)

    def restore_extra(self, step: int) -> Optional[dict]:
        """Host-side sidecar saved with `extra=` (None if absent)."""
        path = os.path.join(self._path(step), "extra.json")
        if not os.path.isfile(path):
            return None
        with open(path) as f:
            return json.load(f)

    def restore_module(self, step: int, name: str, target: Any) -> Any:
        self._wait_all()
        return self._ckpt(f"modules/{name}").restore(
            os.path.join(self._path(step), "modules", name),
            args=ocp.args.StandardRestore(target))

    def close(self):
        self._commit_pending()
        for c in self._ckpts.values():
            c.close()
