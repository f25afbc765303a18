"""AVSync classifier contrastive training (reference scripts/avsync_train.py).

k=21 time-shifted clips per video, symmetric InfoNCE over the k x k pair
score matrix, periodic in-train eval over the test loader, step/milestone
checkpointing.  The reference's configs/avsync/vggss_sync_contrast.yaml
parses unchanged.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--max_steps_override", type=int, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from asva_tpu.parallel.multihost import (make_global_batch,
                                             maybe_initialize_distributed)
    maybe_initialize_distributed()

    from asva_tpu.config import SyncJobConfig
    from asva_tpu.data.loader import DataLoader
    from asva_tpu.data.multipair import MultiPairAVDataset
    from asva_tpu.models.avsync import AVSyncClassifier
    from asva_tpu.ops.mel import waveform_to_mel
    from asva_tpu.parallel import batch_sharding, make_mesh
    from asva_tpu.observability import GracefulShutdown
    from asva_tpu.training.checkpoint import CheckpointManager
    from asva_tpu.training.optim import build_optimizer
    from asva_tpu.training.sync_trainer import (SyncContrastiveTrainer,
                                                SyncTrainState)
    from asva_tpu.utils import AverageMeter, StepTimer, setup_logging

    cfg = SyncJobConfig.from_yaml(args.config_file)
    max_steps = args.max_steps_override or cfg.optim.max_train_steps
    log = setup_logging(os.path.join(cfg.output_dir, "train.log"))

    mesh = make_mesh(fsdp=1)
    clf = AVSyncClassifier()
    k = cfg.train_dataset.num_clips
    f = cfg.train_dataset.video_num_frames
    s = cfg.train_dataset.image_size
    variables = clf.init(jax.random.PRNGKey(cfg.seed),
                         jnp.zeros((1, 128, 204, 1)),
                         jnp.zeros((1, f, s, s, 3)))

    wanted = tuple(m for m, on in (("audio", cfg.audio_pretrained),
                                   ("video", cfg.video_pretrained)) if on)
    if wanted:
        if os.path.isfile(cfg.avid_cma_path):
            from asva_tpu.runtime import init_avsync_from_avid_cma
            variables, _ = init_avsync_from_avid_cma(
                dict(variables), cfg.avid_cma_path, modules=wanted)
        else:
            log.warning(
                "config requests AVID-CMA pretrained encoders but %s is "
                "missing — training from scratch will NOT reproduce the "
                "reference protocol", cfg.avid_cma_path)

    trainer = SyncContrastiveTrainer(clf, tau=cfg.tau)
    tx = build_optimizer(
        cfg.optim.learning_rate, max_grad_norm=cfg.optim.max_grad_norm,
        weight_decay=cfg.optim.adam_weight_decay,
        warmup_steps=(cfg.optim.lr_warmup_steps
                      if cfg.optim.lr_scheduler == "constant_with_warmup"
                      else 0))
    state = SyncTrainState(jnp.zeros((), jnp.int32), variables["params"],
                           variables["batch_stats"],
                           tx.init(variables["params"]))
    # multi-process: eagerly created leaves are host-local and
    # un-checkpointable; re-place as mesh-replicated global arrays (the
    # classifier is small — replication IS its DP layout)
    from asva_tpu.parallel.multihost import globalize_host_local
    state = globalize_host_local(state, mesh)

    ckpt = CheckpointManager(os.path.join(cfg.output_dir, "ckpts"),
                             cfg.optim.checkpointing_steps,
                             cfg.optim.checkpointing_milestones)
    resumed_extra = None
    restored = ckpt.restore_latest(state)
    if restored is not None:
        step0, state = restored
        resumed_extra = ckpt.restore_extra(step0)
        log.info("resumed from step %d", step0)

    mels_fn = jax.jit(jax.vmap(jax.vmap(waveform_to_mel)))

    def make_ds(dcfg, mode):
        return MultiPairAVDataset(
            dcfg.example_list_path, dcfg.data_root, mode=mode,
            image_size=dcfg.image_size, video_fps=dcfg.video_fps,
            video_num_frames=dcfg.video_num_frames, randflip=dcfg.randflip,
            shift_time=dcfg.shift_time, num_clips=dcfg.num_clips,
            sampling_type=dcfg.sampling_type, seed=cfg.seed)

    local_batch = cfg.batch_size * len(mesh.local_devices)
    # process workers: the 21-clip multipair item holds the GIL for ~69% of
    # its wall (tools/data_bench.py --gil_probe — big numpy stacks/copies),
    # so threads cap at ~1.4x aggregate no matter the cores; fork workers
    # write into shared-memory slabs instead (3x thread throughput measured
    # even on 1 core, scales with cores on real TPU-VM hosts)
    train_loader = DataLoader(make_ds(cfg.train_dataset, "train"),
                              local_batch, shuffle=True,
                              num_workers=os.cpu_count() or 8,
                              seed=cfg.seed, worker_mode="process",
                              shard=(jax.process_index(),
                                     jax.process_count()))
    if resumed_extra and "loader" in resumed_extra:
        train_loader.load_state_dict(resumed_extra["loader"])
        log.info("data order resumed at epoch %d batch %d",
                 train_loader.epoch, train_loader._cursor)
    # sharded like the train loader: evaluate() gathers batch-weighted
    # sums across ranks, so each rank must see a DISTINCT test window
    # (unsharded, the cross-rank mean would just average duplicates)
    test_loader = DataLoader(make_ds(cfg.test_dataset, "test"),
                             cfg.test_batch_size, shuffle=False,
                             num_workers=8, drop_last=False,
                             shard=(jax.process_index(),
                                    jax.process_count()))

    step_fn = trainer.make_train_step(tx)
    bshard = batch_sharding(mesh)
    meter = {k_: AverageMeter(window=cfg.log_steps)
             for k_ in ("av_loss", "va_loss", "av_acc", "va_acc")}
    timer = StepTimer()
    shutdown = GracefulShutdown()
    step = int(state.step)

    if len(train_loader) == 0:
        raise ValueError("dataset smaller than the global batch "
                         f"({len(train_loader.dataset)} examples)")

    with jax.sharding.set_mesh(mesh):
        while step < max_steps:
            for batch in train_loader:
                if step >= max_steps:
                    break
                # build the global batch from HOST arrays, then mel on
                # device from the already-global waveforms — computing the
                # mel first would round-trip it device->host->device inside
                # make_global_batch on multi-process runs
                dev = make_global_batch({"waveforms": batch["waveforms"],
                                         "videos": batch["videos"]}, bshard)
                state, metrics = step_fn(
                    state, {"mels": mels_fn(dev["waveforms"]),
                            "videos": dev["videos"]})
                step = int(state.step)
                for name in meter:
                    meter[name].update(float(metrics[name]))
                timer.tick()
                if step % cfg.log_steps == 0:
                    log.info("step %d av %.3f/%.2f va %.3f/%.2f %.2f it/s",
                             step, meter["av_loss"].avg, meter["av_acc"].avg,
                             meter["va_loss"].avg, meter["va_acc"].avg,
                             timer.steps_per_sec)
                if cfg.test_steps and step % cfg.test_steps == 0:
                    evaluate(trainer, state, test_loader, mels_fn, log,
                             step=step)
                if ckpt.should_save(step):
                    ckpt.save(step, state, modules={
                        "classifier": {"params": state.params,
                                       "batch_stats": state.batch_stats}},
                        extra={"loader": train_loader.state_dict()})
                    log.info("saving checkpoint-%d (async)", step)
                if shutdown.poll(step % cfg.log_steps == 0):
                    log.info("shutdown requested: checkpointing at %d", step)
                    # module exports included so the gen/eval CLIs can
                    # consume the latest checkpoint after a preemption
                    ckpt.save(step, state, force=True, modules={
                        "classifier": {"params": state.params,
                                       "batch_stats": state.batch_stats}},
                        extra={"loader": train_loader.state_dict()})
                    ckpt.close()
                    return
    ckpt.save(step, state, force=True, modules={
        "classifier": {"params": state.params,
                       "batch_stats": state.batch_stats}},
        extra={"loader": train_loader.state_dict()})
    ckpt.close()


def evaluate(trainer, state, test_loader, mels_fn, log, step=0,
             max_batches=50):
    """In-train test pass, reference semantics (scripts/avsync_train.py:
    334-378): eval-mode BatchNorm (trainer.eval() -> running averages, so
    accuracies are invariant to test-batch composition), jitted, metrics
    gathered across processes and averaged weighted by batch size."""
    import jax.numpy as jnp
    import numpy as np

    from asva_tpu.parallel.multihost import process_allgather

    eval_fn = getattr(trainer, "_cached_eval_fn", None)
    if eval_fn is None:
        eval_fn = trainer._cached_eval_fn = trainer.make_eval_metrics()

    sums = {k: 0.0 for k in ("av_loss", "va_loss", "av_acc", "va_acc")}
    count = 0
    # stateless pass: without reset() the loader's persistent resume
    # cursor would make every eval (which breaks at max_batches) see a
    # different sliding window of the test set — eventually none at all
    test_loader.reset()
    for i, batch in enumerate(test_loader):
        if i >= max_batches:
            break
        mels = mels_fn(jnp.asarray(batch["waveforms"]))
        metrics = eval_fn(state.params, state.batch_stats,
                          {"mels": mels,
                           "videos": jnp.asarray(batch["videos"])})
        bsz = len(batch["waveforms"])
        for name in sums:
            sums[name] += float(metrics[name]) * bsz
        count += bsz
    # cross-rank weighted mean (reference accelerator.gather :352-357)
    totals = process_allgather(
        np.array([[sums[k] for k in sorted(sums)] + [float(count)]]))
    totals = totals.sum(axis=0)
    n = max(totals[-1], 1.0)
    mean = dict(zip(sorted(sums), totals[:-1] / n))
    if count:
        log.info("eval step %d: test_loss %.4f av %.4f/%.4f va %.4f/%.4f",
                 step, (mean["av_loss"] + mean["va_loss"]) / 2.0,
                 mean["av_loss"], mean["av_acc"],
                 mean["va_loss"], mean["va_acc"])
    return mean


if __name__ == "__main__":
    main()
