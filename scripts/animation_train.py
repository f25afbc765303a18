"""AVSyncD diffusion fine-tuning (reference scripts/animation_train.py).

One YAML config drives the whole job (the reference's own
configs/audio-cond_animation/*.yaml files parse unchanged).  The step —
frozen encoders, UNet fwd/bwd over only the _temp/_audio parameters, masked
AdamW update — is a single jit program over a (data, fsdp) mesh; gradient
accumulation is a host-level micro-batch loop.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--fsdp", type=int, default=1,
                   help="size of the fsdp mesh axis (1 = pure DP)")
    p.add_argument("--max_steps_override", type=int, default=None)
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of steps 10-15 here")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from asva_tpu.parallel.multihost import (make_global_batch,
                                             maybe_initialize_distributed)
    maybe_initialize_distributed()

    from asva_tpu.config import AnimationJobConfig
    from asva_tpu.data.datasets import AudioVideoDataset
    from asva_tpu.data.loader import DataLoader
    from asva_tpu.parallel import batch_sharding, fsdp_shardings, make_mesh
    from asva_tpu.parallel.sharding import shard_pytree
    from asva_tpu.runtime import (build_audio_encoder, build_unet, build_vae,
                                  load_null_text_encoding)
    from asva_tpu.training import (AnimationTrainConfig, AnimationTrainer,
                                   TrainState, build_optimizer,
                                   trainable_mask)
    from asva_tpu.observability import (GracefulShutdown, MetricsLogger,
                                        profile_steps)
    from asva_tpu.training.checkpoint import CheckpointManager
    from asva_tpu.utils import AverageMeter, StepTimer, setup_logging

    cfg = AnimationJobConfig.from_yaml(args.config_file)
    max_steps = args.max_steps_override or cfg.optim.max_train_steps
    log = setup_logging(os.path.join(cfg.output_dir, "train.log"))
    log.info("config: %s", cfg)

    mesh = make_mesh(fsdp=args.fsdp)
    log.info("mesh: %s", dict(mesh.shape))

    # models (UNet grafted from SD1.5 2D weights when present)
    f = cfg.dataset.video_num_frame
    unet, unet_params = build_unet(
        cfg.unet, jnp.bfloat16,
        weights_dir=(os.path.join(cfg.pretrained_unet_path, "unet")
                     if cfg.pretrained_unet_path else None),
        video_length=f)
    vae, vae_params = build_vae(
        jnp.bfloat16,
        weights_dir=(os.path.join(cfg.pretrained_unet_path, "vae")
                     if cfg.pretrained_unet_path else None))
    audio_enc, audio_params = build_audio_encoder(cfg.n_segment, jnp.bfloat16)
    null_text = load_null_text_encoding(cfg.null_text_encoding_path)
    if null_text is None:
        null_text = jnp.zeros((1, 77, 768))

    trainer = AnimationTrainer(
        unet=unet, vae=vae, audio_encoder=audio_enc,
        vae_params=vae_params, audio_encoder_params=audio_params,
        null_text_encoding=null_text, schedule=cfg.schedule,
        config=AnimationTrainConfig(
            text_cond_drop_prob=cfg.text_cond_drop_prob,
            audio_cond_drop_prob=cfg.audio_cond_drop_prob,
            loss_on_first_frame=cfg.loss_on_first_frame,
            # MUST follow the schedule: training against epsilon while the
            # sampler interprets outputs as v (or vice versa) silently
            # produces garbage generations
            prediction_type=cfg.schedule.prediction_type))

    # partial-training flow: differentiate ONLY the trainable subtree so
    # XLA emits no frozen-conv wgrads and no params-sized grad buffer (the
    # reference's requires_grad=False semantics); the optimizer runs over
    # that subtree unmasked.  train_image_modules=True falls back to the
    # whole-tree flow.
    if cfg.train_image_modules:
        mask = None
    else:
        from asva_tpu.training.optim import segments_for_trainable_modules
        mask = trainable_mask(
            unet_params, segments_for_trainable_modules(cfg.trainable_modules))
    tx = build_optimizer(
        cfg.optim.learning_rate,
        max_grad_norm=cfg.optim.max_grad_norm,
        adam_beta1=cfg.optim.adam_beta1, adam_beta2=cfg.optim.adam_beta2,
        adam_eps=cfg.optim.adam_epsilon,
        weight_decay=cfg.optim.adam_weight_decay,
        warmup_steps=(cfg.optim.lr_warmup_steps
                      if cfg.optim.lr_scheduler == "constant_with_warmup"
                      else 0))

    params = shard_pytree(unet_params,
                          fsdp_shardings(unet_params, mesh))
    if mask is None:
        opt_params = params
    else:
        from asva_tpu.training.optim import partition_params
        opt_params = partition_params(params, mask)[0]
    state = TrainState(jnp.zeros((), jnp.int32), params,
                       tx.init(opt_params))
    # multi-process: eager scalars (step, Adam counts) are host-local and
    # un-checkpointable; re-place them as mesh-replicated global arrays.
    # audio_params ride along because they are exported as a checkpoint
    # module — a host-local tree hangs the collective orbax save (its
    # async op errors while the peers wait on the cross-process barrier)
    from asva_tpu.parallel.multihost import globalize_host_local
    state = globalize_host_local(state, mesh)
    audio_params = globalize_host_local(audio_params, mesh)

    import dataclasses as _dc
    ckpt = CheckpointManager(os.path.join(cfg.output_dir, "ckpts"),
                             cfg.optim.checkpointing_steps,
                             cfg.optim.checkpointing_milestones,
                             module_configs={
                                 "unet": _dc.asdict(cfg.unet),
                                 "audio_encoder": dict(
                                     _dc.asdict(audio_enc.config),
                                     n_segment=cfg.n_segment)})
    resumed_extra = None
    if cfg.optim.resume_from_checkpoint == "latest":
        restored = ckpt.restore_latest(state)
        if restored is not None:
            step0, state = restored
            resumed_extra = ckpt.restore_extra(step0)
            log.info("resumed from step %d", step0)

    dataset = AudioVideoDataset(
        cfg.dataset.example_list_path, cfg.dataset.data_root,
        mode="train", video_fps=cfg.dataset.video_fps,
        video_num_frame=cfg.dataset.video_num_frame,
        img_size=tuple(cfg.dataset.img_size), randflip=cfg.dataset.randflip,
        class_mapping_json=cfg.dataset.class_mapping_json,
        class_text_encoding_mapping_path=
        cfg.dataset.class_text_encoding_mapping_pt,
        seed=cfg.seed)
    # config batch_size is per-device (reference: per-GPU); each process
    # loads its LOCAL slice; make_global_batch assembles the global array
    local_batch = cfg.batch_size * len(mesh.local_devices)
    loader = DataLoader(dataset, local_batch, shuffle=True,
                        num_workers=8, seed=cfg.seed,
                        shard=(jax.process_index(), jax.process_count()))
    if resumed_extra and "loader" in resumed_extra:
        loader.load_state_dict(resumed_extra["loader"])
        log.info("data order resumed at epoch %d batch %d",
                 loader.epoch, loader._cursor)

    accum = cfg.optim.gradient_accumulation_steps
    train_step = trainer.make_train_step(tx, mask=mask)
    grad_step = trainer.make_grad_step(mask=mask)
    apply_step = trainer.make_apply_step(tx, mask=mask)
    add_grads = jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b))
    div_grads = jax.jit(lambda a: jax.tree.map(lambda x: x / accum, a))

    # ONE key for all processes: noise/timesteps/cond-dropout are generated
    # inside the jit over the GLOBAL batch shape, so per-sample randomness
    # needs no per-process salt — and a replicated jit input must be equal
    # on every process (SPMD invariant).  Per-step keys are fold_in(step),
    # not a split chain, so a resumed run replays the exact stream the
    # uninterrupted run would have used (the reference resumes torch RNG
    # state via accelerator.load_state, scripts/animation_train.py:283-284;
    # exactness is asserted by tests/test_multihost_train_resume.py).
    rng = jax.random.PRNGKey(cfg.seed)
    meter, timer = AverageMeter(window=cfg.log_steps), StepTimer()
    metrics = MetricsLogger(os.path.join(cfg.output_dir, "metrics.jsonl"),
                        log_with=cfg.log_with,
                        run_name=os.path.basename(cfg.output_dir))
    shutdown = GracefulShutdown()
    bshard = batch_sharding(mesh)
    step = int(state.step)
    micro = step * accum     # resume-exact micro-batch counter for fold_in
    acc_grads, acc_count = None, 0
    prof = None
    pending = []  # device loss scalars, materialized at log boundaries

    if len(loader) == 0:
        raise ValueError("dataset smaller than the global batch "
                         f"({len(loader.dataset)} examples)")

    with jax.sharding.set_mesh(mesh):
        while step < max_steps:
            for batch in loader:
                if step >= max_steps:
                    break
                sub = jax.random.fold_in(rng, micro)
                micro += 1
                dev_batch = make_global_batch(
                    {"videos": batch["video"],
                     "waveforms": batch["waveform"],
                     "text_encodings": batch["text_encoding"]}, bshard)
                if accum <= 1:
                    state, loss = train_step(state, dev_batch, sub)
                    step += 1  # host-side: int(state.step) would force a
                    #            device sync every step (~54 ms RPC on the
                    #            axon tunnel — 13% of a 417 ms step)
                else:
                    loss, grads = grad_step(state.params, dev_batch, sub)
                    acc_grads = grads if acc_grads is None else \
                        add_grads(acc_grads, grads)
                    acc_count += 1
                    if acc_count == accum:
                        state = apply_step(state, div_grads(acc_grads))
                        acc_grads, acc_count = None, 0
                        step += 1
                    else:
                        continue

                # loss is computed over the GLOBAL sharded batch inside the
                # jit program, so the scalar already is the cross-rank mean
                # (reference gathers explicitly, animation_train.py:318).
                # Keep it on-device until the log boundary: materializing
                # per step would serialize dispatch (a float() still runs
                # every log_steps, so silent device errors surface there)
                pending.append(loss)
                timer.tick()
                if step % cfg.log_steps == 0:
                    for dev_loss in pending:
                        meter.update(float(dev_loss))
                    pending.clear()
                    log.info("step %d loss %.4f %.2f steps/s", step,
                             meter.avg, timer.steps_per_sec)
                    metrics.log(step, loss=meter.avg,
                                steps_per_sec=timer.steps_per_sec)
                if args.profile_dir and step == 10:
                    prof = profile_steps(args.profile_dir)
                    prof.__enter__()
                if args.profile_dir and step == 15 and prof is not None:
                    # prof is None when resuming from a step-10..14
                    # checkpoint (the step==10 branch never ran)
                    prof.__exit__(None, None, None)
                    prof = None
                if ckpt.should_save(step):
                    # async: snapshots device arrays and returns; the write
                    # overlaps subsequent train steps
                    ckpt.save(step, state,
                              modules={"unet": state.params,
                                       "audio_encoder": audio_params},
                              extra={"loader": loader.state_dict()})
                    log.info("saving checkpoint-%d (async)", step)
                if shutdown.poll(step % cfg.log_steps == 0):
                    log.info("shutdown requested: checkpointing at %d", step)
                    # include module exports: without them the latest
                    # checkpoint can't be consumed by the gen/eval CLIs
                    ckpt.save(step, state, force=True,
                              modules={"unet": state.params,
                                       "audio_encoder": audio_params},
                              extra={"loader": loader.state_dict()})
                    ckpt.close()   # block until durable before exiting
                    return

    ckpt.save(step, state, force=True,
              modules={"unet": state.params,
                       "audio_encoder": audio_params},
              extra={"loader": loader.state_dict()})
    ckpt.close()
    log.info("done at step %d", step)


if __name__ == "__main__":
    main()
