"""On-device profile of the full UNet eval via jax.profiler (WORKS through
the axon tunnel — device events land in the trace with per-op
hlo_category, duration and bytes_accessed; this is the ONLY reliable
in-context per-op breakdown, since chained micro-benches carry ~0.65
ms/iter harness overhead and standalone modules compile differently than
in-program).

Run: python tools/trace_eval.py [--batch 4] [--train]
Prints per-eval (or per-train-step) time grouped by HLO category plus
the top ops.

r2 training-step findings (batch 4, 499.5 ms device): convolution
fusions 350.7 ms / 170.7 GB (fwd + highres-remat recompute + dgrad +
the per-step VAE encode of 48 frames @256^2 that the reference protocol
requires), pallas custom-calls 54.4, loop fusions 45.3, formatting+
copies ~41.  Training is conv-compute-bound; 1.84 steps/s = 2.4x est.
A100.

r2 eval findings at batch 4 (CFG pair x 2 clips), 94.7 ms/eval:
  convolution fusion 51.7 ms (convs are ~half the model FLOPs and run at
  84-139 TFLOPS — up-path concat convs with 640/960 in-channels are the
  heavy ones; an input-materialization barrier experiment changed
  nothing), pallas custom-calls 28.2 ms (attn 19.6, geglu 8.6),
  formatting/copies/slices ~8.6 ms.  Average ~79 TFLOPS = 40% of v5e
  peak: the eval is COMPUTE-dominated after the r2 kernel work, no longer
  HBM-bound.
"""
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _eval_step(B, F, DT):
    from asva_tpu.models.imagebind_audio import segment_token_indices
    from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig
    from __graft_entry__ import _materialize

    # fuse_blocks matches the shipped generation path (pipelines/animation)
    unet = AudioUNet3D(UNet3DConfig(), dtype=DT,
                       fuse_blocks="--no_fuse" not in sys.argv)
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.standard_normal((B, F, 32, 32, 4)) * 0.1, DT)
    t = jnp.zeros((B,), jnp.int32)
    text = jnp.asarray(rng.standard_normal((B, 77, 768)) * 0.05, DT)
    audio = jnp.asarray(rng.standard_normal((B, 229, 768)) * 0.05, DT)
    idx = jnp.asarray(segment_token_indices(F, (12, 19)))
    params = _materialize(jax.eval_shape(lambda: unet.init(
        jax.random.PRNGKey(0), sample, t, text, audio, None, idx)))
    fn = jax.jit(lambda p, s: unet.apply(p, s, t, text, audio, None, idx))

    def run():
        return fn(params, sample)
    return run


def _train_step(B, F, DT):
    """Full AVSyncD training step, same build as bench.py --train."""
    from asva_tpu.models.imagebind_audio import (ImageBindAudioConfig,
                                                 SegmaskAudioEncoder)
    from asva_tpu.models.unet3d import AudioUNet3D, UNet3DConfig
    from asva_tpu.models.vae import AutoencoderKL, VAEConfig
    from asva_tpu.training import (AnimationTrainer, TrainState,
                                   build_optimizer, trainable_mask)
    from __graft_entry__ import _materialize

    policy = "saveconv"  # match bench.py --train (the shipped step)
    for pol in ("dots", "highres", "full", "l0", "saveconv"):
        if f"--remat_{pol}" in sys.argv:
            policy = pol
    unet = AudioUNet3D(UNet3DConfig(remat=True, remat_policy=policy),
                       dtype=DT)
    vae = AutoencoderKL(VAEConfig(), dtype=DT)
    audio_enc = SegmaskAudioEncoder(ImageBindAudioConfig(), n_segment=F,
                                    dtype=DT)
    unet_params = _materialize(jax.eval_shape(lambda: unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, F, 32, 32, 4), DT),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768), DT),
        jnp.zeros((1, 229, 768), DT), jnp.ones((1, F, 229), bool))))
    vae_params = _materialize(jax.eval_shape(lambda: vae.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), DT),
        jax.random.PRNGKey(1))), seed=1)
    audio_params = _materialize(jax.eval_shape(lambda: audio_enc.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 128, 204, 1), DT))), seed=2)
    trainer = AnimationTrainer(
        unet=unet, vae=vae, audio_encoder=audio_enc, vae_params=vae_params,
        audio_encoder_params=audio_params,
        null_text_encoding=jnp.zeros((1, 77, 768), DT))
    # subtree flow, same as bench.py --train default (grads/opt state over
    # the trainable _temp/_audio slice only); --full_wgrads for the r2 flow
    mask = trainable_mask(unet_params)
    if "--full_wgrads" in sys.argv:
        tx = build_optimizer(1e-4, mask=mask)
        state = TrainState(jnp.zeros((), jnp.int32), unet_params,
                           tx.init(unet_params))
        step = trainer.make_train_step(tx, donate=True)
    else:
        from asva_tpu.training.optim import partition_params
        tx = build_optimizer(1e-4)
        state = TrainState(jnp.zeros((), jnp.int32), unet_params,
                           tx.init(partition_params(unet_params, mask)[0]))
        step = trainer.make_train_step(tx, donate=True, mask=mask)
    # donate=True: without it two 4.7 GB param+opt states are live and the
    # profiled step OOMs (CLAUDE.md); the state is threaded through a holder
    rng = np.random.default_rng(0)
    batch = {
        "videos": jnp.asarray(rng.random((B, F, 256, 256, 3)), jnp.float32),
        "mels": jnp.asarray(rng.standard_normal((B, 128, 204, 1)),
                            jnp.float32),
        "text_encodings": jnp.asarray(rng.standard_normal((B, 77, 768)),
                                      jnp.float32),
    }
    holder = {"state": state}

    def run():
        s, loss = step(holder["state"], batch, jax.random.PRNGKey(0))
        holder["state"] = s
        return loss
    return run


def main():
    B = 4
    if "--batch" in sys.argv:
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    F, N_ITERS = 12, 3
    DT = jnp.bfloat16
    run = (_train_step if "--train" in sys.argv else _eval_step)(B, F, DT)
    jax.block_until_ready(run())

    tracedir = tempfile.mkdtemp(prefix="asva_trace_")
    with jax.profiler.trace(tracedir):
        for _ in range(N_ITERS):
            out = run()
        jax.block_until_ready(out)

    path = sorted(glob.glob(f"{tracedir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [e for e in ev if e.get("ph") == "X"
           and pids.get(e.get("pid", -1), "") == "/device:TPU:0"
           and not e["name"].startswith("jit")]

    # whole-program spans land on the device track with a bare run-id name
    # and no hlo_category; they cover every op in the step and would
    # double-count the table (saveconv trace: three ~465 ms spans = the
    # 3 profiled steps) — report them as the per-step program time instead
    prog = [e for e in dev if "hlo_category" not in e.get("args", {})
            and e["dur"] > 50e3]
    if prog:
        print(f"program spans: {len(prog)} x "
              f"{np.mean([e['dur'] for e in prog])/1e3:.1f} ms "
              "(whole-step device time; excluded from the table)")
        dev = [e for e in dev if e not in prog]

    cat = collections.Counter()
    byts = collections.Counter()
    for e in dev:
        c = e.get("args", {}).get("hlo_category", "?")
        cat[c] += e["dur"]
        byts[c] += int(e.get("args", {}).get("bytes_accessed", 0))
    total = sum(cat.values()) / (N_ITERS * 1e3)
    print(f"batch {B}: {total:.2f} ms/eval   (trace: {path})")
    print(f"{'category':28s} {'ms/eval':>8s} {'GB/eval':>9s}")
    for c, d in cat.most_common(14):
        print(f"{c[:28]:28s} {d/(N_ITERS*1e3):8.2f} "
              f"{byts[c]/(N_ITERS*1e9):9.3f}")

    ops = collections.Counter()
    for e in dev:
        ops[e["name"]] += e["dur"]
    print("\ntop ops:")
    for nm, d in ops.most_common(15):
        print(f"{d/(N_ITERS*1e3):8.3f} ms  {nm[:70]}")


if __name__ == "__main__":
    main()
