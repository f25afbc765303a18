"""Checkpoint retention + exact resume tests."""
import numpy as np
import jax
import jax.numpy as jnp

from asva_tpu.training.checkpoint import CheckpointManager


def _state(step):
    return {"step": jnp.asarray(step),
            "params": {"w": jnp.full((4, 4), float(step))},
            "opt": {"mu": jnp.full((4, 4), 0.1 * step)}}


def test_retention_keeps_milestones(tmp_path):
    mgr = CheckpointManager(str(tmp_path), checkpointing_steps=10,
                            milestone_steps=30)
    for step in range(1, 61):
        if mgr.should_save(step):
            mgr.save(step, _state(step))
    mgr.close()   # flush the async save + deferred retention
    # milestones 30, 60 survive; plus the latest (60 is both)
    assert mgr.existing_steps() == [30, 60]


def test_retention_keeps_latest_nonmilestone(tmp_path):
    mgr = CheckpointManager(str(tmp_path), checkpointing_steps=10,
                            milestone_steps=100)
    for step in (10, 20, 30):
        mgr.save(step, _state(step))
    # before close, the newest save may still be in flight and the previous
    # committed one is retained (crash safety: never zero usable ckpts)
    mgr.close()
    assert mgr.existing_steps() == [30]


def test_async_save_overlaps_and_resumes(tmp_path):
    """save() returns before commit; a new manager resumes only committed
    checkpoints, and close() makes the pending one durable."""
    mgr = CheckpointManager(str(tmp_path), checkpointing_steps=1,
                            milestone_steps=0)
    mgr.save(1, _state(1))
    mgr.save(2, _state(2))   # waits for save 1, starts save 2 async
    mgr.close()
    assert mgr.existing_steps() == [2]
    mgr2 = CheckpointManager(str(tmp_path), checkpointing_steps=1)
    step, restored = mgr2.restore_latest(
        jax.tree.map(np.zeros_like, _state(0)))
    assert step == 2
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), 2.0)
    mgr2.close()


def test_exact_resume_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path), checkpointing_steps=5)
    state = _state(5)
    mgr.save(5, state)
    mgr.close()
    mgr2 = CheckpointManager(str(tmp_path), checkpointing_steps=5)
    assert mgr2.latest_step() == 5
    step, restored = mgr2.restore_latest(jax.tree.map(np.zeros_like, state))
    assert step == 5
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    np.testing.assert_array_equal(np.asarray(restored["opt"]["mu"]),
                                  np.asarray(state["opt"]["mu"]))


def test_extra_sidecar_roundtrip_and_retention(tmp_path):
    """`extra=` host-state JSON (loader cursor etc.) rides along with the
    checkpoint, is restorable, and is deleted with its checkpoint."""
    mgr = CheckpointManager(str(tmp_path), checkpointing_steps=1,
                            milestone_steps=0)
    mgr.save(1, _state(1), extra={"loader": {"epoch": 0, "cursor": 3,
                                             "seed": 42}})
    mgr.save(2, _state(2), extra={"loader": {"epoch": 1, "cursor": 0,
                                             "seed": 42}})
    mgr.close()
    mgr2 = CheckpointManager(str(tmp_path), checkpointing_steps=1)
    assert mgr2.restore_extra(2) == {"loader": {"epoch": 1, "cursor": 0,
                                                "seed": 42}}
    assert mgr2.restore_extra(1) is None   # retention removed checkpoint-1
    assert mgr2.restore_extra(99) is None  # absent step
    mgr2.close()
