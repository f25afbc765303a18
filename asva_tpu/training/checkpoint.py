"""Orbax checkpointing with the reference's step/milestone retention policy.

Reference behavior (scripts/animation_train.py:346-371, README warning):
save every `checkpointing_steps`; after a successful save, delete the
previous checkpoint unless its step is a multiple of
`checkpointing_milestones`.  Exact resume restores params + optimizer state
+ step (+ host RNG state); `latest_step` supports resume_from_checkpoint=
"latest" (scripts/animation_train.py:268-290).

Saves are async (orbax) so the TPU keeps stepping while the host writes.
"""
from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, checkpointing_steps: int = 1000,
                 milestone_steps: int = 0):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.checkpointing_steps = checkpointing_steps
        self.milestone_steps = milestone_steps
        self._ckpt = ocp.StandardCheckpointer()
        self._last_saved: Optional[int] = None

    # -- paths --
    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"checkpoint-{step}")

    def existing_steps(self):
        steps = []
        if not os.path.isdir(self.directory):
            return steps
        for name in os.listdir(self.directory):
            m = re.match(r"^checkpoint-(\d+)$", name)
            if m and os.path.isdir(os.path.join(self.directory, name)):
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

    def save(self, step: int, state: Any, force: bool = False,
             modules: Optional[dict] = None) -> bool:
        """Save the full train state; `modules` optionally adds per-module
        parameter exports under checkpoint-N/modules/<name> (the reference's
        dual-format policy: exact-resume state + inference module exports)."""
        if not force and not self.should_save(step):
            return False
        prev = self._last_saved
        if prev is None:
            existing = self.existing_steps()
            prev = existing[-1] if existing else None
        self._ckpt.save(os.path.join(self._path(step), "state"), state,
                        force=True)
        for name, tree in (modules or {}).items():
            self._ckpt.save(
                os.path.join(self._path(step), "modules", name), tree,
                force=True)
        self._ckpt.wait_until_finished()
        # retention: drop the previous checkpoint unless it is a milestone
        if prev is not None and prev != step and not self.is_milestone(prev):
            shutil.rmtree(self._path(prev), ignore_errors=True)
        self._last_saved = step
        return True

    def restore(self, step: int, target: Any) -> Any:
        return self._ckpt.restore(os.path.join(self._path(step), "state"),
                                  target=target)

    def restore_latest(self, target: Any) -> Optional[Any]:
        step = self.latest_step()
        if step is None:
            return None
        return step, self.restore(step, target)

    def restore_module(self, step: int, name: str, target: Any) -> Any:
        return self._ckpt.restore(
            os.path.join(self._path(step), "modules", name), target=target)

    def close(self):
        self._ckpt.wait_until_finished()
